"""Faddeeva / Voigt-function accuracy vs the scipy (libcerf-grade) oracle."""

import numpy as np
import pytest
from scipy.special import voigt_profile, wofz

from gp_dla_detection_tpu.ops import lyman_series as lines
from gp_dla_detection_tpu.ops.faddeeva import voigt_function, wofz_real

SIGMA = lines.DOPPLER_SIGMA
SQRT2 = np.sqrt(2.0)

# y = gamma/(sigma*sqrt2) for the Lyman lines actually used (3 of 31)
LINE_YS = lines.LORENTZIAN_WIDTHS / (SIGMA * SQRT2)


def rel_err(approx, exact):
    exact = np.asarray(exact)
    return np.max(np.abs((approx - exact) / exact))


@pytest.mark.parametrize("y", [*LINE_YS[:3], LINE_YS[30], 0.01, 0.5, 3.0])
def test_wofz_real_accuracy(y):
    # wide sweep: through the Doppler core, the branch radius, and far wings
    x = np.concatenate(
        [
            np.linspace(0.0, 10.0, 20001),
            10 ** np.linspace(1.0, 4.2, 5001),
        ]
    )
    exact = wofz(x + 1j * y).real
    ours = np.asarray(wofz_real(x, np.full_like(x, y)))
    assert rel_err(ours, exact) < 5e-8


def test_wofz_real_even_in_x():
    x = np.linspace(-50.0, 50.0, 1001)
    y = LINE_YS[0]
    a = np.asarray(wofz_real(x, np.full_like(x, y)))
    b = np.asarray(wofz_real(-x, np.full_like(x, y)))
    np.testing.assert_array_equal(a, b)


def test_voigt_function_vs_scipy_voigt_profile():
    # scipy.special.voigt_profile(x, sigma, gamma) is the same normalized
    # Voigt profile that libcerf's voigt() computes (voigt.c:288).
    v = np.concatenate([np.linspace(0, 1e7, 2001), 10 ** np.linspace(7, 10, 501)])
    for j in range(3):
        gamma = lines.LORENTZIAN_WIDTHS[j]
        exact = voigt_profile(v, SIGMA, gamma)
        ours = np.asarray(voigt_function(v, SIGMA, gamma))
        assert rel_err(ours, exact) < 5e-8


def test_float32_mode_reasonable():
    # fast mode: float32 inputs stay float32 and are ~1e-4 accurate
    x = np.linspace(0.0, 100.0, 10001, dtype=np.float32)
    y = np.full_like(x, np.float32(LINE_YS[0]))
    ours = np.asarray(wofz_real(x, y))
    assert ours.dtype == np.float32
    exact = wofz(x.astype(np.float64) + 1j * float(LINE_YS[0])).real
    assert rel_err(ours.astype(np.float64), exact) < 5e-4


def test_wofz_real_fast_accuracy():
    """Fast path: <1e-5 relative at all Lyman-series y values (f64 eval)."""
    from gp_dla_detection_tpu.ops.faddeeva import wofz_real_fast

    x = np.concatenate(
        [np.linspace(0.0, 10.0, 20001), 10 ** np.linspace(1.0, 4.2, 3001)]
    )
    for y in LINE_YS[[0, 1, 2, 30]]:
        exact = wofz(x + 1j * y).real
        ours = np.asarray(wofz_real_fast(x, np.full_like(x, y)))
        assert rel_err(ours, exact) < 1e-5


def test_voigt_absorption_fast_close_to_accurate():
    from gp_dla_detection_tpu.ops.voigt import voigt_absorption

    lam = 10 ** (np.log10(3500.0) + 1e-4 * np.arange(900))
    rng = np.random.default_rng(3)
    z = rng.uniform(1.9, 2.4, 6)
    nhi = 10 ** rng.uniform(20, 22.5, 6)
    acc = np.asarray(voigt_absorption(lam, z, nhi, fast=False))
    fastp = np.asarray(voigt_absorption(lam, z, nhi, fast=True))
    assert np.max(np.abs(acc - fastp)) < 2e-5
