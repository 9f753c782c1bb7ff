"""Learned low-rank GP null model of quasar emission.

The model artifact of the training stage (learn_qso_model.m:113-123):
a mean vector mu, low-rank factor M (rank k), log pixel noise log_omega
— all on the fixed rest-frame grid — plus the three scalar Lyα-forest
"absorption noise" parameters (log_c_0, log_tau_0, log_beta).

The null-model covariance at rest wavelengths r with absorber redshifts
z_lya per pixel is (spectrum_loss.m:1-12, process_qsos.m:138-147):

    K = M M' + diag(sigma_noise^2 + omega^2 (1 - exp(-tau_0 (1+z)^beta) + c_0)^2)
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ops.interp import interp1, interp_columns

__all__ = ["GPModel"]


@dataclass(frozen=True)
class GPModel:
    """Trained null-model parameters on the rest-frame grid."""

    rest_wavelengths: np.ndarray  # (R,)
    mu: np.ndarray                # (R,)
    M: np.ndarray                 # (R, k)
    log_omega: np.ndarray         # (R,)
    log_c_0: float
    log_tau_0: float
    log_beta: float
    metadata: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        # the inference engine interpolates this model with arithmetic
        # (uniform-grid) bracketing (ops/interp.interp_stack_uniform):
        # correct for any arange-built grid (the framework's training
        # always uses NullModelParams.rest_wavelengths), silently wrong
        # for an arbitrary non-uniform grid — so reject those HERE,
        # where the contract enters, rather than inside a jit
        stored = np.asarray(self.rest_wavelengths)
        grid = stored.astype(np.float64)
        if grid.ndim != 1 or grid.size < 2:
            raise ValueError("rest_wavelengths must be a 1-D grid")
        spacing = np.diff(grid)
        dx = (grid[-1] - grid[0]) / (grid.size - 1)
        # tolerance scales with the STORED dtype's ulp at the grid
        # magnitude: an arange-built grid round-tripped through float32
        # carries spacing jitter up to ~2 ulp(grid[-1]) (~2.9e-4 Å at
        # 1216 Å), which a fixed relative-spacing bound would spuriously
        # reject at coarse dx
        eps = (
            np.finfo(stored.dtype).eps
            if np.issubdtype(stored.dtype, np.floating)
            else np.finfo(np.float64).eps
        )
        tol = max(1e-3 * abs(dx), 4.0 * eps * float(np.max(np.abs(grid))))
        if dx <= 0 or np.max(np.abs(spacing - dx)) > tol:
            raise ValueError(
                "rest_wavelengths must be uniformly spaced and "
                "increasing (the engine uses uniform-grid model "
                "interpolation; got spacing range "
                f"[{spacing.min():.6g}, {spacing.max():.6g}])"
            )

    @property
    def k(self) -> int:
        return self.M.shape[1]

    @property
    def c_0(self) -> float:
        return float(np.exp(self.log_c_0))

    @property
    def tau_0(self) -> float:
        return float(np.exp(self.log_tau_0))

    @property
    def beta(self) -> float:
        return float(np.exp(self.log_beta))

    def interpolate(self, rest_wavelengths):
        """Interpolate (mu, M, log_omega) onto a spectrum's rest grid.

        Equivalent of the three griddedInterpolants in
        process_qsos.m:65-71 + :138-143.

        Host-side / exploratory convenience: the inference engine does
        NOT call this — it receives the model arrays as jit *arguments*
        (inference._prepare_spectrum), because closing over ``self``'s
        numpy arrays would bake them into the compiled HLO as constants.
        """
        grid = jnp.asarray(self.rest_wavelengths)
        mu = interp1(grid, jnp.asarray(self.mu), rest_wavelengths)
        M = interp_columns(grid, jnp.asarray(self.M), rest_wavelengths)
        log_omega = interp1(grid, jnp.asarray(self.log_omega), rest_wavelengths)
        return mu, M, log_omega

    # --- stage artifact I/O (npz + JSON metadata, replacing .mat v7.3) ---

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path,
            rest_wavelengths=np.asarray(self.rest_wavelengths, np.float64),
            mu=np.asarray(self.mu, np.float64),
            M=np.asarray(self.M, np.float64),
            log_omega=np.asarray(self.log_omega, np.float64),
            log_c_0=self.log_c_0,
            log_tau_0=self.log_tau_0,
            log_beta=self.log_beta,
            metadata=json.dumps(self.metadata),
        )

    @classmethod
    def load(cls, path: str | Path) -> "GPModel":
        with np.load(Path(path), allow_pickle=False) as f:
            return cls(
                rest_wavelengths=f["rest_wavelengths"],
                mu=f["mu"],
                M=f["M"],
                log_omega=f["log_omega"],
                log_c_0=float(f["log_c_0"]),
                log_tau_0=float(f["log_tau_0"]),
                log_beta=float(f["log_beta"]),
                metadata=json.loads(str(f["metadata"])),
            )
