"""High-accuracy Faddeeva function (real part) in pure JAX.

TPU-native replacement for libcerf's ``voigt(x, sigma, gamma)``
(reference: voigt.c:5,288 links libcerf for the complex error function).
The reference evaluates, per pixel per Lyman-series line,

    voigt(v, sigma, gamma) = Re[w((v + i*gamma) / (sigma*sqrt(2)))]
                             / (sigma * sqrt(2*pi)),

where ``w(z) = exp(-z^2) erfc(-iz)`` is the Faddeeva function.  We
implement ``Re w`` directly with a three-branch, fully vectorized scheme
(no data-dependent control flow — every branch is evaluated and selected
with ``where``, which is the XLA-friendly formulation):

1. ``|z| >= 7``: the classical continued fraction
   ``w(z) = (i/sqrt(pi)) / (z - (1/2)/(z - 1/(z - (3/2)/(z - ...))))``
   truncated at depth 12 (relative error < 1e-12 there, validated
   against scipy.special.wofz).
2. ``|z| < 7`` and ``y >= 1e-3``: Weideman's (1994, SIAM J. Num. Anal.)
   N-term rational approximation with N=64 (abs. error ~1e-13).
3. ``|z| < 7`` and ``y < 1e-3`` (the DLA regime: the Lyman-series
   Lorentzian widths give y = gamma/(sigma*sqrt(2)) <= 4.8e-4): a
   fourth-order Taylor expansion in y about the real axis,

       w(x+iy) = sum_m (iy)^m w^(m)(x) / m!,

   where the derivatives follow the recurrence
   ``w^(m+1)(x) = -2x w^(m)(x) - 2m w^(m-1)(x)`` (from
   w' = -2zw + 2i/sqrt(pi)) seeded by the Weideman evaluation of
   ``w(x + i0)``.  This sidesteps the catastrophic relative error of
   generic rational approximations where Re w is dominated by the tiny
   Lorentzian wing (~y/(sqrt(pi) x^2)): order-4 truncation is accurate
   to ~3e-14 relative at the largest Lyman-series y.

Worst-case relative error of the composite scheme is ~4e-8 (branch 2
corner) and < 1e-12 in the DLA regime, versus libcerf/scipy.  See
tests/test_faddeeva.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["wofz_real", "voigt_function", "WEIDEMAN_N", "BRANCH_RADIUS"]

WEIDEMAN_N = 64
BRANCH_RADIUS = 7.0   # |z| cutoff between rational and continued fraction
SMALL_Y = 1e-3        # y cutoff for the Taylor-in-y branch
CF_DEPTH = 12
_SQRT_PI = float(np.sqrt(np.pi))


@functools.lru_cache(maxsize=None)
def _weideman_constants(n: int) -> tuple[float, np.ndarray]:
    """Weideman (1994) scale L and polynomial coefficients (highest first).

    Computed once on host in float64 via the FFT construction from the
    paper: sample f(t) = exp(-t^2) (L^2 + t^2) at tangent-mapped points
    and take the real FFT coefficients.
    """
    m = 2 * n
    m2 = 2 * m
    k = np.arange(-m + 1, m)
    ell = np.sqrt(n / np.sqrt(2.0))
    theta = k * np.pi / m
    t = ell * np.tan(theta / 2.0)
    f = np.exp(-(t**2)) * (ell**2 + t**2)
    f = np.concatenate([[0.0], f])
    a = np.real(np.fft.fft(np.fft.fftshift(f))) / m2
    a = a[1 : n + 1][::-1]  # highest-degree coefficient first
    return float(ell), a


def _w_weideman(z, n: int = WEIDEMAN_N):
    """Full complex w(z) via Weideman's rational approximation (Im z >= 0)."""
    ell, coeffs = _weideman_constants(n)
    # numpy float64 scalars would promote complex64 inputs; keep dtype
    coeffs = [float(c) for c in coeffs]
    iz = 1j * z
    recip = 1.0 / (ell - iz)
    big_z = (ell + iz) * recip
    p = jnp.zeros_like(big_z) + coeffs[0]
    for c in coeffs[1:]:
        p = p * big_z + c
    return 2.0 * p * recip * recip + (1.0 / _SQRT_PI) * recip


def _w_continued_fraction(z, depth: int = CF_DEPTH):
    """w(z) by the Gautschi continued fraction; accurate for |z| >= ~6."""
    r = jnp.zeros_like(z)
    for m in range(depth, 0, -1):
        r = (m / 2.0) / (z - r)
    return 1j / _SQRT_PI / (z - r)


def wofz_real(x, y):
    """Re w(x + iy) for y >= 0, elementwise, dtype-preserving.

    ``x`` and ``y`` broadcast against each other.  The result matches
    scipy.special.wofz to ~1e-9 relative in the small-y DLA regime when
    evaluated in float64.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dtype = jnp.result_type(x, y)
    x = x.astype(dtype)
    y = y.astype(dtype)
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    ax = jnp.abs(x)  # w(-x + iy) = conj(w(x + iy)) => Re w is even in x
    r2 = ax * ax + y * y
    outer = r2 >= BRANCH_RADIUS * BRANCH_RADIUS

    # --- branch 1: continued fraction (clamp inner z to avoid 0-division)
    safe_ax = jnp.where(outer, ax, BRANCH_RADIUS)
    z_cf = safe_ax.astype(cdtype) + 1j * y.astype(cdtype)
    w_cf = jnp.real(_w_continued_fraction(z_cf))

    # --- branch 2: Weideman at (|x|, y)
    z_in = ax.astype(cdtype) + 1j * y.astype(cdtype)
    w_in = _w_weideman(z_in)

    # --- branch 3: small-y Taylor about the real axis (order 4)
    w_axis = _w_weideman(ax.astype(cdtype))  # w(|x| + i0)
    # use the numerically exact real part on the axis: Re w(x) = e^{-x^2}
    w_m_prev = jnp.exp(-ax * ax) + 1j * jnp.imag(w_axis)
    w_m = -2.0 * ax * w_m_prev + 2j / _SQRT_PI  # w'(x)
    iy = 1j * y.astype(cdtype)
    series = w_m_prev
    power = jnp.ones_like(iy)
    factorial = 1.0
    for m in range(1, 5):
        power = power * iy
        factorial *= m
        series = series + power * w_m / factorial
        w_m_prev, w_m = w_m, -2.0 * ax * w_m - 2.0 * m * w_m_prev
    re_taylor = jnp.real(series)

    inner_val = jnp.where(y < SMALL_Y, re_taylor, jnp.real(w_in))
    return jnp.where(outer, w_cf, inner_val)


def voigt_function(v, sigma, gamma):
    """libcerf-compatible Voigt function (voigt.c:288).

    Normalized Voigt profile: the convolution of a Gaussian of standard
    deviation ``sigma`` with a Lorentzian of half-width ``gamma``,
    evaluated at ``v`` (all in the same units, e.g. cm/s).
    """
    v = jnp.asarray(v)
    dtype = jnp.result_type(v, jnp.asarray(sigma))
    sqrt2_sigma = jnp.sqrt(jnp.asarray(2.0, dtype)) * sigma
    x = v / sqrt2_sigma
    y = jnp.broadcast_to(jnp.asarray(gamma, dtype) / sqrt2_sigma, x.shape)
    norm = 1.0 / (sigma * jnp.sqrt(jnp.asarray(2.0 * np.pi, dtype)))
    return wofz_real(x, y) * norm
