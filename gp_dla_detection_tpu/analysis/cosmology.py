"""Cosmology utilities for the absorption-distance statistics.

Flat LCDM with WMAP9 Omega_m = 0.279 (calc_cddf.py:978-984).  The
comoving absorption path dX = (1+z)^2 H0/H(z) dz integrals — which the
reference evaluates with one adaptive scipy.integrate.quad per sightline
per redshift bin (calc_cddf.py:374-385, the analysis hot loop) — are
served here from a precomputed antiderivative table: dX(z1, z2) =
F(z2) - F(z1) with F tabulated once by cumulative Simpson integration
on a dense grid (~1e-12 accuracy), making path lengths for 162k
sightlines a vectorized interpolation.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "OMEGA_M_WMAP9",
    "H100_PER_S",
    "hubble_by_h0",
    "path_length_integrand",
    "AbsorptionPath",
    "rho_crit",
]

OMEGA_M_WMAP9 = 0.279
# 100 km/s/Mpc in 1/s (calc_cddf.py:537) — the single definition; the
# Omega_DLA conversions in cddf.py import it so the normalization cannot
# drift between code paths
H100_PER_S = 3.2407789e-18


def hubble_by_h0(z, omega_m: float = OMEGA_M_WMAP9):
    """H(z)/H0 for flat LCDM, neglecting radiation (calc_cddf.py:978-984)."""
    return np.sqrt(omega_m * (1.0 + z) ** 3 + (1.0 - omega_m))


def path_length_integrand(z, omega_m: float = OMEGA_M_WMAP9):
    """dX/dz = (1+z)^2 H0/H(z) (calc_cddf.py:1058-1063)."""
    return (1.0 + z) ** 2 / hubble_by_h0(z, omega_m)


def rho_crit(hubble: float = 0.7) -> float:
    """Critical density at z=0 [g/cm^3] (calc_cddf.py:1065-1072)."""
    h100 = H100_PER_S * hubble  # 100 h km/s/Mpc in 1/s
    grav_cgs = 6.674e-8
    return 3.0 * h100**2 / (8.0 * np.pi * grav_cgs)


class AbsorptionPath:
    """Vectorized dX(z1, z2) via a tabulated antiderivative."""

    def __init__(
        self,
        omega_m: float = OMEGA_M_WMAP9,
        z_max: float = 12.0,
        n_grid: int = 120_001,
    ):
        self.omega_m = omega_m
        self._grid = np.linspace(0.0, z_max, n_grid)
        y = path_length_integrand(self._grid, omega_m)
        dz = self._grid[1] - self._grid[0]
        # cumulative Simpson: trapezoid + third-order slope correction
        dy = np.gradient(y, dz)
        seg = 0.5 * dz * (y[1:] + y[:-1]) - dz**2 / 12.0 * (dy[1:] - dy[:-1])
        self._F = np.concatenate([[0.0], np.cumsum(seg)])

    def antiderivative(self, z):
        return np.interp(z, self._grid, self._F)

    def __call__(self, z1, z2):
        """dX between z1 and z2 (elementwise; clamps negative spans to 0)."""
        return np.maximum(self.antiderivative(z2) - self.antiderivative(z1), 0.0)

    def total_path(self, min_z_dlas, max_z_dlas, z_min, z_max):
        """Summed dX over sightlines restricted to [z_min, z_max]
        (calc_cddf.py:334-385 semantics, vectorized)."""
        lo = np.maximum(np.asarray(min_z_dlas), z_min)
        hi = np.minimum(np.asarray(max_z_dlas), z_max)
        return float(np.sum(self(lo, np.maximum(hi, lo))))
