"""Same-process A/B: lean catalog-only driver vs full f16 streaming.

Lean mode (ShardedRunConfig.store_sample_likelihoods=False) reduces
evidence + MAP sample index on device and never fetches the (B, S)
sample-likelihood matrix; through this environment's ~40-50 MB/s HTTP
tunnel the f16 wire matrix is the dominant per-batch fetch, so lean
mode should move the driver from fetch-bound toward the
compute/upload bound.  The tunnel's epoch variance is ~2.5x, so the
two modes are interleaved within ONE process (full, lean, full, lean)
and only intra-process ratios are meaningful.

Usage: python validation/lean_ab.py [n_spectra]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np


def main(n_spectra: int = 8192) -> None:
    import jax

    from gp_dla_detection_tpu.inference import PaddedSpectra
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.parallel.sharded_inference import (
        ShardedRunConfig,
        process_spectra_sharded,
    )
    from gp_dla_detection_tpu.utils import enable_compilation_cache
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    enable_compilation_cache()
    prob = synthetic_workload(n_spectra, 10000, 1274, 20, seed=0)
    model = GPModel(
        rest_wavelengths=prob["grid"], mu=prob["mu"], M=prob["M"],
        log_omega=prob["log_omega"], log_c_0=prob["log_c_0"],
        log_tau_0=prob["log_tau_0"], log_beta=prob["log_beta"],
    )
    spectra = PaddedSpectra(
        prob["wavelengths"], prob["flux"], prob["noise_variance"],
        prob["mask"], prob["z_qso"],
    )
    rng = np.random.default_rng(1)
    prior_z = rng.uniform(2.0, 4.0, 4096)
    prior_flags = rng.uniform(size=4096) < 0.1

    def run(lean: bool, ckpt_dir):
        cfg = ShardedRunConfig(
            per_device_batch=1024, backend="pallas", dtype="float32",
            stream_dtype="float16", checkpoint_dir=ckpt_dir,
            pipeline_depth=4, store_sample_likelihoods=not lean,
        )
        return process_spectra_sharded(
            model, prob["offsets"], prob["nhis"], spectra.slice(slice(0, n_spectra)),
            prior_z, prior_flags, config=cfg,
        )

    # warm both jit caches before timing
    warm_full = process_spectra_sharded(
        model, prob["offsets"], prob["nhis"],
        spectra.slice(slice(0, 1024)), prior_z, prior_flags,
        config=ShardedRunConfig(
            per_device_batch=1024, backend="pallas", dtype="float32",
            stream_dtype="float16", pipeline_depth=4,
            store_sample_likelihoods=True,
        ),
    )
    warm_lean = process_spectra_sharded(
        model, prob["offsets"], prob["nhis"],
        spectra.slice(slice(0, 1024)), prior_z, prior_flags,
        config=ShardedRunConfig(
            per_device_batch=1024, backend="pallas", dtype="float32",
            stream_dtype="float16", pipeline_depth=4,
            store_sample_likelihoods=False,
        ),
    )
    # numerics cross-check: lean's device-reduced evidence must match
    # the full path's host-side logsumexp on the same spectra
    np.testing.assert_allclose(
        warm_lean.log_likelihoods_dla[:1024],
        warm_full.log_likelihoods_dla[:1024],
        rtol=5e-5, atol=5e-4,
        err_msg="lean device-reduced evidence diverges from full path",
    )
    print("warm-up + lean-vs-full evidence cross-check OK", flush=True)

    results: dict[str, list[float]] = {"full": [], "lean": []}
    last = {}
    for rep in range(2):
        for mode in ("full", "lean"):
            with tempfile.TemporaryDirectory() as tmp:
                t0 = time.perf_counter()
                res = run(mode == "lean", f"{tmp}/ckpt")
                dt = time.perf_counter() - t0
            rate = n_spectra / dt
            results[mode].append(rate)
            last[mode] = res
            print(f"rep{rep} {mode}: {dt:.1f}s = {rate:.1f}/s", flush=True)

    # decision parity across the timed reps too
    np.testing.assert_allclose(
        last["lean"].log_likelihoods_dla, last["full"].log_likelihoods_dla,
        rtol=5e-5, atol=5e-4,
    )
    summary = {
        "n_spectra": n_spectra,
        "full_rates": [round(r, 1) for r in results["full"]],
        "lean_rates": [round(r, 1) for r in results["lean"]],
        "lean_over_full": round(
            float(np.mean(results["lean"]) / np.mean(results["full"])), 3
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
