"""Linear interpolation utilities (MATLAB interp1 / griddedInterpolant
semantics, vectorized for padded spectra).

The reference interpolates the learned model onto each spectrum's rest
wavelengths with griddedInterpolants (process_qsos.m:65-71) and training
spectra onto the rest grid with interp1 (learn_qso_model.m:50-59, which
yields NaN outside the data range).  Both are 1-D linear interpolations;
the (rest_wavelength, 1:k) "2-D" interpolant for M is columnwise 1-D
because the second axis is the integer factor index.

All functions assume ``xp`` is strictly increasing.  ``interp_columns``
computes the bracketing indices once and reuses them for every column,
which is how the engine interpolates mu, M, and log_omega in one pass.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["interp1", "interp_columns"]


def _bracket(xp, x):
    """Indices/weights of the bracketing interval for each x (clamped)."""
    idx = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, xp.shape[0] - 2)
    x0 = xp[idx]
    x1 = xp[idx + 1]
    t = (x - x0) / (x1 - x0)
    return idx, t


def interp1(xp, fp, x):
    """Linear interpolation, edge-clamped (like griddedInterpolant inside
    the data range; queries outside are linearly extrapolated from the
    end interval — the engine never queries outside)."""
    idx, t = _bracket(xp, x)
    return fp[idx] * (1.0 - t) + fp[idx + 1] * t


def interp_columns(xp, columns, x):
    """Interpolate a stack of columns (n_grid, k) at points x (m,).

    Returns (m, k).  Shares the searchsorted/bracketing work across
    columns (the reference's M_interpolator, process_qsos.m:67-68).
    """
    idx, t = _bracket(xp, x)
    return columns[idx, :] * (1.0 - t)[:, None] + columns[idx + 1, :] * t[:, None]
