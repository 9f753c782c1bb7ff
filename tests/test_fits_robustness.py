"""Corruption robustness of both FITS readers.

The preload stage (reference: preload_qsos.m:18-71) chews through
~162k externally-downloaded files; a single truncated or corrupted
download must fail only its own slot (lengths[i] < 0 / a caught
exception), never crash or hang the host process, and never flow
garbage into a "successful" parse.  Covers the crafted-header DoS
class explicitly (huge TFIELDS sizing an allocation, TFORM repeat
integer overflow) plus seeded random byte flips and truncations,
differentially checked against the pure-numpy reader.
"""

import numpy as np
import pytest

from conftest import write_spec_file
from gp_dla_detection_tpu.io.native import native_available, read_spec_batch
from gp_dla_detection_tpu.spectra import read_spec

MAX_PIXELS = 512


def _valid_spec_bytes(tmp_path, n=300, seed=0):
    rng = np.random.default_rng(seed)
    loglam = 3.55 + 1e-4 * np.arange(n)
    flux = rng.normal(3.0, 1.0, n)
    ivar = rng.uniform(0.5, 4.0, n)
    and_mask = np.zeros(n, np.int64)
    p = tmp_path / "valid.fits"
    write_spec_file(p, loglam, flux, ivar, and_mask)
    return p.read_bytes()


def _patch_card(raw: bytes, key: str, value: str) -> bytes:
    """Replace the value of an existing 80-byte header card in place."""
    prefix = key.ljust(8).encode() + b"="
    at = raw.find(prefix)
    assert at >= 0, f"card {key} not found"
    card = (key.ljust(8) + "= " + value.rjust(20)).ljust(80).encode()
    return raw[:at] + card + raw[at + 80 :]


def _python_read(path):
    """(length, arrays) on success, (None, None) on a clean exception."""
    try:
        w, f, nv, pm = read_spec(path)
        return len(w), (w, f, nv, pm)
    except Exception:
        return None, None


def _corruption_corpus(raw: bytes):
    """Yield (name, corrupted_bytes)."""
    # truncations: inside primary header, at/inside the extension
    # header, inside the data, one byte short
    for frac in (0.001, 0.02, 0.3, 0.6, 0.95):
        cut = max(1, int(len(raw) * frac))
        yield f"truncate_{frac}", raw[:cut]
    yield "truncate_last_byte", raw[:-1]
    yield "empty", b""
    yield "not_fits", b"#!/bin/sh\necho hello\n" * 40
    # crafted headers: allocation-sizing and overflow vectors
    yield "huge_tfields", _patch_card(raw, "TFIELDS", "999999999999")
    yield "negative_tfields", _patch_card(raw, "TFIELDS", "-7")
    yield "huge_naxis2", _patch_card(raw, "NAXIS2", "99999999999999")
    yield "negative_naxis1", _patch_card(raw, "NAXIS1", "-80")
    yield "huge_naxis1", _patch_card(raw, "NAXIS1", "999999999")
    yield "tform_overflow", _patch_card(
        raw, "TFORM1", "'99999999999999999999E'"
    )
    yield "tform_zero_size_code", _patch_card(raw, "TFORM1", "'1Q'")
    yield "xtension_image", _patch_card(raw, "XTENSION", "'IMAGE   '")
    # seeded random single-byte flips across the whole file
    rng = np.random.default_rng(1234)
    for k in range(40):
        pos = int(rng.integers(0, len(raw)))
        val = int(rng.integers(1, 256))
        mutated = bytearray(raw)
        mutated[pos] ^= val
        yield f"byteflip_{k}_at_{pos}", bytes(mutated)


def test_corrupted_files_fail_their_slot_only(tmp_path):
    raw = _valid_spec_bytes(tmp_path)
    names, paths = [], []
    for name, blob in _corruption_corpus(raw):
        p = tmp_path / f"{name}.fits"
        p.write_bytes(blob)
        names.append(name)
        paths.append(p)
    # a healthy file rides along in the same batch: corruption in one
    # slot must not poison its neighbours
    good = tmp_path / "good.fits"
    good.write_bytes(raw)
    names.append("good")
    paths.append(good)

    # the pure-python reader never crashes the process: every corpus
    # entry either parses or raises a catchable exception.  This runs
    # FIRST so python coverage survives a missing native toolchain.
    python_results = {
        name: _python_read(p) for name, p in zip(names, paths)
    }

    if not native_available():  # pragma: no cover - toolchain in CI
        pytest.skip("native library unavailable (python half still ran)")

    w, f, nv, pm, lengths = read_spec_batch(paths, max_pixels=MAX_PIXELS)
    assert lengths[-1] == 300  # the healthy rider parsed fully
    for i, name in enumerate(names):
        n = int(lengths[i])
        assert -16 <= n <= MAX_PIXELS, f"{name}: insane length {n}"
        py_n, py_arrays = _python_read(paths[i])
        if n >= 0 and py_n is not None:
            # BOTH readers report success: they must agree on the row
            # count (a wrong count from either IS the garbage-flows-
            # into-a-successful-parse failure mode) and bit-for-bit on
            # every value (a corrupt-but-parseable file is data)
            assert py_n == n, (
                f"{name}: readers disagree on length ({n} vs {py_n})"
            )
            if n > 0:
                w_py, f_py, nv_py, pm_py = py_arrays
                # rtol, not equality: C pow(10, x) and numpy 10**x may
                # differ in the last ulp (same bound as test_native_io)
                np.testing.assert_allclose(
                    w[i, :n], np.float64(w_py), rtol=1e-12, err_msg=name
                )
                np.testing.assert_array_equal(
                    f[i, :n], np.float64(f_py), err_msg=name
                )
                finite = np.isfinite(nv_py)
                np.testing.assert_allclose(
                    nv[i, :n][finite], nv_py[finite], rtol=1e-12,
                    err_msg=name,
                )
                np.testing.assert_array_equal(pm[i, :n], pm_py, err_msg=name)
    assert python_results  # (the python half ran on the same corpus)


def test_row_boundary_truncation_raises(tmp_path):
    """A file cut exactly at a row boundary used to parse 'successfully'
    with fewer rows than NAXIS2 claims (np.frombuffer shrinks silently);
    corrupt data must raise, not lose pixels."""
    from gp_dla_detection_tpu.io import read_bintable

    raw = _valid_spec_bytes(tmp_path)
    table = read_bintable(tmp_path / "valid.fits")
    row_bytes = sum(c.dtype.itemsize * (c.shape[1] if c.ndim > 1 else 1)
                    for c in table.columns)
    # data starts one header block after the extension header begins
    # (the writer's extension header always fits in a single block)
    data_start = raw.index(b"XTENSION") + 2880
    cut = data_start + (300 - 10) * row_bytes
    p = tmp_path / "rowcut.fits"
    p.write_bytes(raw[:cut])
    with pytest.raises(ValueError, match="truncated FITS data"):
        read_bintable(p)
    if native_available():
        *_, lengths = read_spec_batch([p], max_pixels=MAX_PIXELS)
        assert lengths[0] < 0


def test_crafted_tfields_does_not_abort_process(tmp_path):
    """The specific DoS regression: TFIELDS=1e12 used to size a
    std::vector allocation; bad_alloc escaping the worker thread would
    std::terminate the whole interpreter."""
    if not native_available():
        pytest.skip("native library unavailable")
    raw = _valid_spec_bytes(tmp_path)
    p = tmp_path / "tfields.fits"
    p.write_bytes(_patch_card(raw, "TFIELDS", "999999999999"))
    *_, lengths = read_spec_batch([p], max_pixels=MAX_PIXELS)
    assert lengths[0] < 0
