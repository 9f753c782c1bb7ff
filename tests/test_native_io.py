"""Native C++ FITS loader vs the pure-Python reader."""

import numpy as np
import pytest

from conftest import write_spec_file
from gp_dla_detection_tpu.io.native import (
    load_library,
    native_available,
    read_spec_batch,
)
from gp_dla_detection_tpu.spectra import read_spec


@pytest.fixture
def spec_files(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        n = 200 + 50 * i
        loglam = 3.55 + 1e-4 * np.arange(n)
        flux = rng.normal(3.0, 1.0, n)
        ivar = rng.uniform(0.5, 4.0, n)
        ivar[rng.choice(n, 5, replace=False)] = 0.0
        and_mask = np.zeros(n, np.int64)
        and_mask[rng.choice(n, 4, replace=False)] = 1 << 23
        p = tmp_path / f"spec-{i}.fits"
        write_spec_file(p, loglam, flux, ivar, and_mask)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_available(), "native library failed to build/load"
    lib = load_library()
    assert b"gpdla_io" in lib.gpdla_version()


def test_native_matches_python_reader(spec_files):
    w, f, nv, pm, lengths = read_spec_batch(spec_files, max_pixels=512)
    assert np.all(lengths > 0)
    for i, p in enumerate(spec_files):
        w_py, f_py, nv_py, pm_py = read_spec(p)
        n = lengths[i]
        assert n == len(w_py)
        np.testing.assert_allclose(w[i, :n], w_py, rtol=1e-12)
        np.testing.assert_allclose(f[i, :n], f_py, rtol=1e-12)
        finite = np.isfinite(nv_py)
        np.testing.assert_allclose(nv[i, :n][finite], nv_py[finite], rtol=1e-12)
        np.testing.assert_array_equal(np.isinf(nv[i, :n]), ~finite)
        np.testing.assert_array_equal(pm[i, :n], pm_py)


def test_native_missing_file(spec_files, tmp_path):
    paths = [spec_files[0], tmp_path / "nonexistent.fits", spec_files[1]]
    w, f, nv, pm, lengths = read_spec_batch(paths, max_pixels=512)
    assert lengths[0] > 0 and lengths[2] > 0
    assert lengths[1] < 0
