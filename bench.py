"""Flagship benchmark: DLA-evidence throughput (spectra/sec/chip).

Workload: the full per-spectrum Bayesian model selection of
process_qsos.m at production scale — 10,000 QMC (z_DLA, log N_HI)
samples x 1274-pixel padded spectra (the production pixel_pad:
extended grid 1280 px, an exact 128-lane multiple) x rank-20 GP (null + 10k DLA
evidences each, Voigt profiles with 3 Lyman-series lines and
instrumental broadening) — in float32 on the local accelerator.
Batch of 1024 spectra per chip (a v5e-64 survey run holds ~2.5k per
chip, and throughput plateaus from B=1024 up).

Backends: "pallas" (fused windowed evidence kernel, fastest verified on
v5e), "xla" (lax.map chunked path), "auto" (pallas with xla fallback).

Baseline: the driver-supplied target of processing all 162,861 DR12Q
sightlines in under one hour on a v5e-64, i.e. 162861/3600/64 = 0.707
spectra/sec/chip.  vs_baseline > 1 beats the target.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SPECTRA_PER_SEC_PER_CHIP = 162861 / 3600 / 64  # v5e-64, <1 hour


def main(batch_size: int = 1024, num_samples: int = 10000, pixels: int = 1274,
         k: int = 20, sample_chunk: int = 2500, iters: int = 5,
         backend: str = "auto") -> None:
    import jax

    from gp_dla_detection_tpu.inference import (
        batch_log_likelihoods,
        compute_sample_window,
    )
    from gp_dla_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from gp_dla_detection_tpu.ops.evidence_pallas import SAMPLE_TILE
    from gp_dla_detection_tpu.params import NullModelParams, Parameters

    rng = np.random.default_rng(0)
    dtype = np.float32
    params = Parameters(null_model=NullModelParams(k=k))
    grid = params.null_model.rest_wavelengths().astype(dtype)

    z = rng.uniform(2.5, 3.4, batch_size).astype(dtype)
    lam = np.stack(
        [10 ** (np.log10(911.9 * (1 + zz)) + 1e-4 * np.arange(pixels)) for zz in z]
    ).astype(dtype)
    offsets = rng.uniform(size=num_samples).astype(dtype)
    args = (
        jax.numpy.asarray(lam),
        jax.numpy.asarray(rng.normal(1, 0.3, (batch_size, pixels)).astype(dtype)),
        jax.numpy.asarray(rng.uniform(0.05, 0.2, (batch_size, pixels)).astype(dtype)),
        jax.numpy.asarray(rng.uniform(size=(batch_size, pixels)) > 0.03),
        jax.numpy.asarray(z),
        jax.numpy.asarray(grid),
        jax.numpy.asarray((1 + 0.1 * np.sin(grid / 40)).astype(dtype)),
        jax.numpy.asarray((rng.normal(size=(grid.size, k)) * 0.08).astype(dtype)),
        jax.numpy.asarray(np.log(0.2 + 0 * grid).astype(dtype)),
        float(np.log(0.1)),
        float(np.log(0.0023)),
        float(np.log(3.65)),
        jax.numpy.asarray(offsets),
        jax.numpy.asarray((10 ** rng.uniform(20, 22.5, num_samples)).astype(dtype)),
    )

    def make_run(chosen: str):
        windowed = chosen == "pallas"
        chunk = SAMPLE_TILE if chosen == "pallas" else sample_chunk
        sample_window = (
            compute_sample_window(
                offsets, chunk, pixels + 2 * params.instrument.width
            )
            if windowed
            else None
        )

        @jax.jit
        def reduced(*a):
            out = batch_log_likelihoods(
                *a, params=params, sample_chunk=sample_chunk,
                backend=chosen, sample_window=sample_window,
            )
            # reduce on device; force completion via ONE tiny host fetch
            # (full (B, S) fetches are trivial on locally-attached TPUs
            # but dominate timing through this environment's HTTP tunnel,
            # and each separate fetch costs a tunnel round trip)
            return jax.numpy.concatenate(
                [
                    out["log_likelihood_no_dla"],
                    jax.numpy.sum(out["sample_log_likelihoods_dla"], axis=-1),
                ]
            )

        def run():
            fetched = np.asarray(reduced(*args))
            return fetched[:batch_size], fetched[batch_size:]

        return run, reduced

    if backend == "auto":
        try:
            run, reduced = make_run("pallas")
            run()  # compile; fall back if the kernel cannot lower here
        except Exception:
            run, reduced = make_run("xla")
            run()
    else:
        run, reduced = make_run(backend)
        run()

    # enqueue every iteration, then force completion with ONE host fetch:
    # execution serializes on the device queue, so the aggregate wall
    # time is honest device throughput without paying one tunnel round
    # trip per iteration (dispatch through this environment's HTTP
    # tunnel is async; a per-iteration np.asarray adds ~25 ms each)
    t0 = time.perf_counter()
    outs = [reduced(*args) for _ in range(iters)]
    fetched = np.asarray(outs[-1])
    elapsed = (time.perf_counter() - t0) / iters
    assert bool(np.isfinite(fetched).all())  # null AND sample halves

    value = batch_size / elapsed
    print(
        json.dumps(
            {
                "metric": "spectra/sec/chip (DLA evidence, 10k QMC samples)",
                "value": round(value, 3),
                "unit": "spectra/s",
                "vs_baseline": round(value / BASELINE_SPECTRA_PER_SEC_PER_CHIP, 2),
            }
        )
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-samples", type=int, default=10000)
    p.add_argument("--pixels", type=int, default=1274)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--sample-chunk", type=int, default=2500)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"])
    a = p.parse_args()
    main(a.batch_size, a.num_samples, a.pixels, a.k, a.sample_chunk, a.iters,
         a.backend)
