"""The shared flagship synthetic workload.

One definition of the benchmark/dry-run problem — padded spectra
spanning the production z range, a learned-model stand-in, and the QMC
sample set — used by both ``bench.py`` and ``__graft_entry__.py``.
(They used to carry near-identical private copies that had already
drifted in the N_HI upper bound.)
"""

from __future__ import annotations

import numpy as np

__all__ = ["synthetic_workload"]


def synthetic_workload(
    batch_size: int,
    num_samples: int,
    pixels: int,
    k: int,
    seed: int = 0,
    nhi_max: float = 22.5,
    dtype=np.float32,
) -> dict:
    """Arrays for one batched DLA-evidence evaluation, all ``dtype``.

    Returns a dict with the engine's argument names plus ``params``.
    """
    from ..params import NullModelParams, Parameters

    rng = np.random.default_rng(seed)
    params = Parameters(null_model=NullModelParams(k=k))
    grid = params.null_model.rest_wavelengths().astype(dtype)

    z = rng.uniform(2.5, 3.4, batch_size).astype(dtype)
    lam = np.stack(
        [10 ** (np.log10(911.9 * (1 + zz)) + 1e-4 * np.arange(pixels)) for zz in z]
    ).astype(dtype)
    offsets = rng.uniform(size=num_samples).astype(dtype)
    return {
        "params": params,
        "grid": grid,
        "wavelengths": lam,
        "flux": rng.normal(1, 0.3, (batch_size, pixels)).astype(dtype),
        "noise_variance": rng.uniform(
            0.05, 0.2, (batch_size, pixels)
        ).astype(dtype),
        "mask": rng.uniform(size=(batch_size, pixels)) > 0.03,
        "z_qso": z,
        "mu": (1 + 0.1 * np.sin(grid / 40)).astype(dtype),
        "M": (rng.normal(size=(grid.size, k)) * 0.08).astype(dtype),
        "log_omega": np.log(0.2 + 0 * grid).astype(dtype),
        "log_c_0": float(np.log(0.1)),
        "log_tau_0": float(np.log(0.0023)),
        "log_beta": float(np.log(3.65)),
        "offsets": offsets,
        "nhis": (10 ** rng.uniform(20, nhi_max, num_samples)).astype(dtype),
    }
