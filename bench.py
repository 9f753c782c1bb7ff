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
import subprocess
import sys
import time

import numpy as np

BASELINE_SPECTRA_PER_SEC_PER_CHIP = 162861 / 3600 / 64  # v5e-64, <1 hour


def wait_for_backend(max_wait_s: float = 1500.0, probe_timeout_s: float = 180.0):
    """Block until the accelerator backend initializes, up to max_wait_s.

    The remote (tunneled) TPU service has observed ~30-minute outages
    during which backend init raises UNAVAILABLE; a benchmark launched
    into one would otherwise fail instantly and record nothing.  Probe
    in a SUBPROCESS: a failed in-process jax backend init is cached for
    the life of the process, so the retry must happen before this
    process first touches jax.  Returns once a probe succeeds, or after
    max_wait_s (letting the real run surface the real error).
    """
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        attempt += 1
        if time.monotonic() >= deadline:
            print(
                f"warning: backend still unavailable after {attempt} probes; "
                "proceeding anyway",
                file=sys.stderr,
            )
            return
        print(
            f"backend unavailable (probe {attempt}); retrying in 60 s",
            file=sys.stderr,
        )
        time.sleep(60.0)


def _synthetic_problem(batch_size, num_samples, pixels, k, seed=0):
    """Shared synthetic workload for both benchmark modes (the single
    definition lives in utils/synthetic.py, shared with the driver's
    __graft_entry__ checks)."""
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    return synthetic_workload(batch_size, num_samples, pixels, k, seed=seed)


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

    prob = _synthetic_problem(batch_size, num_samples, pixels, k)
    params = prob["params"]
    offsets = prob["offsets"]
    args = (
        jax.numpy.asarray(prob["wavelengths"]),
        jax.numpy.asarray(prob["flux"]),
        jax.numpy.asarray(prob["noise_variance"]),
        jax.numpy.asarray(prob["mask"]),
        jax.numpy.asarray(prob["z_qso"]),
        jax.numpy.asarray(prob["grid"]),
        jax.numpy.asarray(prob["mu"]),
        jax.numpy.asarray(prob["M"]),
        jax.numpy.asarray(prob["log_omega"]),
        prob["log_c_0"],
        prob["log_tau_0"],
        prob["log_beta"],
        jax.numpy.asarray(offsets),
        jax.numpy.asarray(prob["nhis"]),
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

    chosen = backend
    if backend == "auto":
        try:
            run, reduced = make_run("pallas")
            run()  # compile; fall back if the kernel cannot lower here
            chosen = "pallas"
        except Exception as e:
            # only lowering/compile/VMEM-class failures justify the
            # ~4x-slower XLA fallback — a transient tunnel error must
            # surface, not get silently recorded as an XLA-rate "result"
            from gp_dla_detection_tpu.inference import ladder_recoverable

            if not ladder_recoverable(e):
                raise
            run, reduced = make_run("xla")
            run()
            chosen = "xla"
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
                "backend": chosen,
                "vs_baseline": round(value / BASELINE_SPECTRA_PER_SEC_PER_CHIP, 2),
            }
        ),
        flush=True,
    )


def main_driver(n_spectra: int = 8192, per_device_batch: int = 1024,
                num_samples: int = 10000, pixels: int = 1274, k: int = 20,
                backend: str = "pallas", checkpoint: bool = True,
                pipeline_depth: int = 4, lean: bool = False,
                two_stage: bool = False,
                base_replicates: int | None = None) -> None:
    """Sustained END-TO-END throughput through the production sharded
    driver: device_put + execute + f16 result streaming + background
    checkpointing per super-batch — everything a survey run pays, not
    just the happy kernel loop.  The kernel metric (plain `bench.py`)
    and this driver metric bracket the system: kernel = device ceiling,
    driver = what a user actually sustains.
    """
    import tempfile
    import jax  # noqa: F401  (device init before timing)

    if backend == "auto":
        # the sharded driver carries its own degradation ladder, so
        # "auto" simply means "start from the fused kernel" here (the
        # raw string would otherwise reach batch_log_likelihoods and
        # fail with "unknown backend" after paying the warm-up upload)
        backend = "pallas"

    from gp_dla_detection_tpu.inference import PaddedSpectra
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.parallel.sharded_inference import (
        ShardedRunConfig,
        process_spectra_sharded,
    )
    from gp_dla_detection_tpu.parallel.sharded_multi import (
        process_spectra_multi_sharded,
    )
    from gp_dla_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # base_replicates=None rides through to the driver's auto default
    # (R=4 when the pallas pair-kernel fast path engages, else 1); an
    # explicit value pins R.  The label below reports what was asked.
    prob = _synthetic_problem(n_spectra, num_samples, pixels, k)
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
    prior_num = rng.choice([0, 0, 0, 0, 0, 0, 0, 0, 1, 2], 4096)

    def run(sl, ckpt_dir):
        cfg = ShardedRunConfig(
            per_device_batch=per_device_batch, backend=backend,
            dtype="float32", stream_dtype="float16",
            checkpoint_dir=ckpt_dir, pipeline_depth=pipeline_depth,
            store_sample_likelihoods=not lean,
            base_replicates=base_replicates,
        )
        if two_stage:
            # FUSED lean two-stage {0,1,2}-DLA selection (requires lean)
            return process_spectra_multi_sharded(
                model, prob["offsets"], prob["nhis"], spectra.slice(sl),
                prior_z, prior_num, config=cfg,
            ).single
        return process_spectra_sharded(
            model, prob["offsets"], prob["nhis"], spectra.slice(sl),
            prior_z, prior_flags, config=cfg,
        )

    with tempfile.TemporaryDirectory() as tmp:
        # warm-up: one super-batch populates the jit cache at the run
        # shapes, so the timed section measures sustained throughput
        run(slice(0, per_device_batch), None)
        # STEADY-STATE timing (VERDICT r4 #3): each driver call pays
        # per-run fixed costs — the fused chain's first-batch
        # force-completion verification (~5 s through the tunnel),
        # manifest setup — that a short capture folds into the rate.
        # Time a one-batch run and the full run in the same process and
        # report the MARGINAL rate, which cancels the fixed costs and
        # matches the GPDLA_DRIVER_TIMING steady state.
        t0 = time.perf_counter()
        run(slice(0, per_device_batch), f"{tmp}/w" if checkpoint else None)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = run(slice(0, n_spectra), f"{tmp}/ckpt" if checkpoint else None)
        t_long = time.perf_counter() - t0
    bad = ~np.isfinite(res.log_likelihoods_dla)
    assert not bad.any(), (
        f"non-finite DLA evidences for {bad.sum()} spectra "
        f"(rows {np.flatnonzero(bad)[:8]})"
    )

    # process_spectra_sharded runs over the full default mesh; normalize
    # to per-chip so the metric and vs_baseline stay comparable across
    # machine sizes (the kernel metric in main() is single-device)
    n_chips = len(jax.devices())
    elapsed = max(t_long - t_short, 1e-9)
    value = (n_spectra - per_device_batch) / elapsed / n_chips
    # adjacent tunnel-epoch calibration (upload stream), so the recorded
    # rate can be normalized across epochs (~2.5x day-to-day variance)
    epoch = None
    try:
        import pathlib
        import sys as _sys

        _sys.path.insert(
            0, str(pathlib.Path(__file__).resolve().parent / "validation")
        )
        from epoch_probe import measure as _epoch_measure

        epoch = _epoch_measure(B=min(per_device_batch, 1024), iters=2)
    except Exception:
        pass  # the probe must never sink the benchmark record
    print(
        json.dumps(
            {
                "metric": "spectra/sec/chip (sustained end-to-end driver, "
                f"{num_samples} QMC samples, "
                + ("fused two-stage {0,1,2} catalog, "
                   if two_stage else "")
                + ("lean device-reduced results"
                   if lean else "f16 streaming")
                + (", base_replicates=auto"
                   if base_replicates is None
                   else f", base_replicates={base_replicates}"
                   if base_replicates != 1 else "")
                + ", checkpointing, steady-state marginal rate)",
                "value": round(value, 3),
                "unit": "spectra/s",
                "mesh_chips": n_chips,
                "first_batch_s": round(t_short, 2),
                "epoch_upload_ms_per_batch": (
                    None if epoch is None
                    else epoch["upload_ms_per_batch"]
                ),
                "epoch_upload_mb_s": (
                    None if epoch is None else epoch["upload_mb_s"]
                ),
                "vs_baseline": round(value / BASELINE_SPECTRA_PER_SEC_PER_CHIP, 2),
            }
        ),
        flush=True,
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
    p.add_argument("--backend", default=None,
                   choices=[None, "auto", "xla", "pallas"])
    p.add_argument("--driver", action="store_true",
                   help="sustained end-to-end driver benchmark instead of "
                   "the kernel loop")
    p.add_argument("--n-spectra", type=int, default=8192,
                   help="--driver: total spectra for the sustained run")
    p.add_argument("--no-checkpoint", action="store_true",
                   help="--driver: disable per-batch checkpointing")
    p.add_argument("--pipeline-depth", type=int, default=4,
                   help="--driver: super-batches in flight (1 = serial)")
    p.add_argument("--lean", action="store_true",
                   help="--driver: catalog-only mode — evidence + MAP "
                        "reduced on device, no (B, S) matrix fetch")
    p.add_argument("--two-stage", action="store_true",
                   help="--driver --lean: the FUSED two-stage {0,1,2}-DLA "
                        "catalog chain (both kernels + device base "
                        "resample per batch)")
    p.add_argument("--base-replicates", type=int, default=None,
                   help="--two-stage: share each base draw between a "
                        "kernel tile's lanes (default: the production "
                        "ShardedRunConfig default)")
    p.add_argument("--kernel-only", action="store_true",
                   help="suppress the default invocation's second JSON "
                        "line (the fused two-stage driver rate)")
    a = p.parse_args()
    if a.two_stage and not a.lean:
        p.error("--two-stage requires --lean (the fused chain is the "
                "lean catalog driver)")
    wait_for_backend()
    if a.driver:
        main_driver(a.n_spectra, a.batch_size, a.num_samples, a.pixels, a.k,
                    a.backend or "pallas", not a.no_checkpoint,
                    a.pipeline_depth, lean=a.lean, two_stage=a.two_stage,
                    base_replicates=a.base_replicates)
    else:
        main(a.batch_size, a.num_samples, a.pixels, a.k, a.sample_chunk,
             a.iters, a.backend or "auto")
        if not a.kernel_only:
            # second line: the PRODUCTION path (fused two-stage lean
            # catalog driver at the production default R) so the
            # captured per-round benchmark tracks driver-level work,
            # not just the single kernel (VERDICT r3 #2).  16384
            # spectra = 16 super-batches reaches steady state (~45 s
            # warm-cache); the marginal-rate timing excludes the
            # per-run fixed costs (VERDICT r4 #3).
            main_driver(16384, a.batch_size, a.num_samples, a.pixels,
                        a.k, a.backend or "pallas", True,
                        a.pipeline_depth, lean=True, two_stage=True)
