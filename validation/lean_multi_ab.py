"""Same-process A/B: fused lean two-stage driver vs the classic
two-pass {0,1,2}-DLA flow.

Classic = process_spectra_sharded (full f16 matrix streaming) followed
by process_spectra_multi_sharded's pair pass (which fetches a second
(B, S) f16 matrix per batch AND uploads two (B, S) f32 base-value
arrays per batch).  Fused lean = ONE pass per batch, base resampled on
device, eight per-spectrum vectors fetched.  Interleaved within one
process (tunnel epochs vary ~2.5x).

Usage: python validation/lean_multi_ab.py [n_spectra]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np


def main(n_spectra: int = 4096) -> None:
    from gp_dla_detection_tpu.inference import PaddedSpectra
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.parallel import ShardedRunConfig
    from gp_dla_detection_tpu.parallel.sharded_multi import (
        process_spectra_multi_sharded,
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
    prior_num = rng.choice([0, 0, 0, 0, 0, 0, 0, 0, 1, 2], 4096)

    def run(lean: bool, n: int, ckpt_dir):
        cfg = ShardedRunConfig(
            per_device_batch=1024, backend="pallas", dtype="float32",
            stream_dtype="float16", checkpoint_dir=ckpt_dir,
            pipeline_depth=4, store_sample_likelihoods=not lean,
        )
        return process_spectra_multi_sharded(
            model, prob["offsets"], prob["nhis"],
            spectra.slice(slice(0, n)), prior_z, prior_num, config=cfg,
        )

    # warm both jit caches, then cross-check the catalog outputs
    warm_full = run(False, 1024, None)
    warm_lean = run(True, 1024, None)
    np.testing.assert_allclose(
        warm_lean.single.log_likelihoods_dla,
        warm_full.single.log_likelihoods_dla,
        rtol=5e-5, atol=5e-4,
    )
    # pair evidence: the f32 device base draw differs from the host f64
    # draw on knife-edge samples only; the Monte Carlo evidence over 10k
    # pairs moves by O(1/S) per flipped draw
    d2 = np.abs(
        warm_lean.log_likelihoods_dla2 - warm_full.log_likelihoods_dla2
    )
    finite = np.isfinite(warm_full.log_likelihoods_dla2)
    scale = np.maximum(np.abs(warm_full.log_likelihoods_dla2[finite]), 1.0)
    print(
        "pair evidence lean-vs-classic: max rel "
        f"{np.max(d2[finite] / scale):.2e}, "
        f"multiplicity agreement {np.mean(np.argmax(warm_lean.model_posteriors, 1) == np.argmax(warm_full.model_posteriors, 1)):.4f}",
        flush=True,
    )

    results: dict[str, list[float]] = {"classic": [], "fused_lean": []}
    for rep in range(2):
        for mode, lean in (("classic", False), ("fused_lean", True)):
            with tempfile.TemporaryDirectory() as tmp:
                t0 = time.perf_counter()
                run(lean, n_spectra, f"{tmp}/ckpt")
                dt = time.perf_counter() - t0
            rate = n_spectra / dt
            results[mode].append(rate)
            print(f"rep{rep} {mode}: {dt:.1f}s = {rate:.1f}/s", flush=True)

    summary = {
        "n_spectra": n_spectra,
        "classic_rates": [round(r, 1) for r in results["classic"]],
        "fused_lean_rates": [round(r, 1) for r in results["fused_lean"]],
        "fused_over_classic": round(
            float(np.mean(results["fused_lean"]) / np.mean(results["classic"])),
            3,
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
