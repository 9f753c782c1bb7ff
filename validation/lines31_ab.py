"""Same-process A/B: 31-line WINDOWED grouped-unroll kernel vs the
full-grid unrolled kernel (VERDICT r3 #6).

The reference treats num_lines=31 as first-class
(/root/reference/voigt.c:266 defaults to all 31 Lyman-series members;
the pipeline default 3 is set_parameters.m:63).  History on TPU:

  - 31 UNROLLED windowed passes crash the remote compiler outright;
  - the r3b pure fori_loop line pass compiles but measured ~2x slower
    than straight-line code (B=256: 107/s windowed-looped vs 181-195/s
    full-grid unrolled), so 31-line runs took the full-grid unrolled
    kernel and windowing was gated off above UNROLL_LINES.

r4's GROUPED unroll (fori over blocks of UNROLL_LINES lines,
straight-line inside each block, remainder lines table-padded with
zero leading constants — exact no-ops) aims to recover Mosaic's
straight-line scheduling while keeping each compiled body at the size
known to compile.  This harness measures, same-process interleaved on
one chip at 31 lines:

  A. full-grid UNROLLED (the r3 driver choice above UNROLL_LINES)
  B. windowed GROUPED-loop (the new form), tiles 128 and 256
  C. full-grid GROUPED-loop (isolates loop overhead from the window win)

and checks A-vs-B agreement at the windowed-mode tolerance (the window
skips Gaussian cores beyond the slice, a deliberate <1e-5-relative
approximation, plus loop-body FMA reassociation).

Usage: python validation/lines31_ab.py [B] [S] [iters]
Prints one JSON summary line; measured results are recorded in the
commit that lands the decision (and in CLAUDE.md / docs/COVERAGE.md).

MEASURED (r4, v5e-1, B=256, S=10k, same process):
  fullgrid_unrolled_t256   194.0 spectra/s
  windowed_grouped_t128    138.4 (0.713x — windowing LOSES at 31 lines)
  windowed_grouped_t256    scoped VMEM OOM
  fullgrid_grouped_t256    194.0 (grouping fully erases the r3b 2x
                           loop penalty; bit-identical values)
  windowed-vs-fullgrid parity 2.5e-7 max rel (B=16 probe; the B=256
  sampled-slice comparison is bitwise)
Decision: the UNROLL_LINES gate stays — 31-line runs start full-grid
unrolled; the grouped loop form stays as the line_loop implementation
(correct + speed-neutral, needed by anyone forcing line_loop=True).
The r4 OOB-table bug this A/B exposed (under-sized SMEM table read
past its end by the last block -> all-NaN windowed output on hardware)
is pinned by test_line_loop_matches_unrolled's nl=9 case.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(B: int = 256, S: int = 10000, iters: int = 5,
         backend: str = "pallas") -> None:
    # backend="pallas_interpret" smoke-tests the harness on CPU
    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.inference import (
        batch_log_likelihoods,
        compute_sample_window,
    )
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.ops.evidence_pallas import SAMPLE_TILE
    from gp_dla_detection_tpu.params import Parameters
    from gp_dla_detection_tpu.utils import enable_compilation_cache
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    enable_compilation_cache()
    params = Parameters(num_lines=31)
    prob = synthetic_workload(B, S, 1274, 20, seed=0)
    model = GPModel(
        rest_wavelengths=prob["grid"], mu=prob["mu"], M=prob["M"],
        log_omega=prob["log_omega"], log_c_0=prob["log_c_0"],
        log_tau_0=prob["log_tau_0"], log_beta=prob["log_beta"],
    )
    order = np.argsort(prob["offsets"])
    off_sorted = prob["offsets"][order].astype(np.float32)
    nh_sorted = prob["nhis"][order].astype(np.float32)
    P6 = prob["wavelengths"].shape[1] + 2 * params.instrument.width
    # the window-size formula depends only on the tile's z spread (the
    # num_lines argument is the availability gate this A/B re-litigates)
    window = compute_sample_window(
        off_sorted, SAMPLE_TILE, P6, num_lines=3,
        pixel_spacing=params.instrument.pixel_spacing,
    )
    assert window is not None

    f32 = lambda a: jax.device_put(np.asarray(a, np.float32))
    args = (
        f32(prob["wavelengths"]), f32(prob["flux"]),
        f32(prob["noise_variance"]), jax.device_put(prob["mask"]),
        f32(prob["z_qso"]), f32(model.rest_wavelengths), f32(model.mu),
        f32(model.M), f32(model.log_omega), model.log_c_0,
        model.log_tau_0, model.log_beta, f32(off_sorted), f32(nh_sorted),
    )

    configs = [
        ("fullgrid_unrolled_t256", None, 256),
        ("windowed_grouped_t128", window, 128),
        ("windowed_grouped_t256", window, 256),
        ("fullgrid_grouped_t256", "loop", 256),
    ]
    out: dict = {"B": B, "S": S, "num_lines": 31, "window": window}
    vals: dict = {}
    for name, win, tile in configs:
        if win == "loop":
            # full-grid grouped loop (isolates loop overhead):
            # batch_log_likelihoods has no line_loop knob — it is a
            # kernel-internal choice — so force it at the evidence layer
            from gp_dla_detection_tpu.ops import evidence_pallas as ep

            real = ep.pallas_sample_log_likelihoods

            def forced(*a, _real=real, **k):
                k["line_loop"] = True
                return _real(*a, **k)

            ep.pallas_sample_log_likelihoods = forced
            try:
                dt, v = _time_one(
                    batch_log_likelihoods, args, params, None, tile,
                    iters, jnp, np, backend,
                )
            except Exception as exc:
                msg = str(exc)
                out[name] = (
                    "scoped_vmem_oom" if "vmem" in msg.lower() else
                    f"failed: {msg[:120]}"
                )
                print(f"{name}: FAILED ({out[name]})", flush=True)
                continue
            finally:
                ep.pallas_sample_log_likelihoods = real
        else:
            try:
                dt, v = _time_one(
                    batch_log_likelihoods, args, params, win, tile,
                    iters, jnp, np, backend,
                )
            except Exception as exc:  # scoped VMEM OOM etc: record, go on
                msg = str(exc)
                out[name] = (
                    "scoped_vmem_oom" if "vmem" in msg.lower() else
                    f"failed: {msg[:120]}"
                )
                print(f"{name}: FAILED ({out[name]})", flush=True)
                continue
        rate = B / dt
        out[name] = round(rate, 1)
        vals[name] = v
        print(f"{name}: {rate:.1f} spectra/s", flush=True)

    if "fullgrid_unrolled_t256" in vals and "windowed_grouped_t128" in vals:
        a = vals["fullgrid_unrolled_t256"]
        b = vals["windowed_grouped_t128"]
        fin = np.isfinite(a)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        rel = float(
            np.max(np.abs(a[fin] - b[fin]) / np.maximum(np.abs(a[fin]), 1.0))
        )
        out["windowed_vs_fullgrid_max_rel"] = rel
        wins = [
            out[k] for k in ("windowed_grouped_t128", "windowed_grouped_t256")
            if isinstance(out.get(k), float)
        ]
        if wins:
            out["windowed_speedup"] = round(
                max(wins) / out["fullgrid_unrolled_t256"], 3
            )
        assert rel < 1e-4, rel
    print(json.dumps(out))


def _time_one(batch_fn, args, params, window, tile, iters, jnp, np_,
              backend="pallas"):
    import functools

    import jax

    fn = jax.jit(
        functools.partial(
            batch_fn, params=params, sample_chunk=2500, backend=backend,
            sample_window=window, tile=tile, samples_sorted=True,
        )
    )
    r = fn(*args)
    v = np_.asarray(r["sample_log_likelihoods_dla"][:4, :64], np_.float64)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np_.asarray(jnp.nansum(r["sample_log_likelihoods_dla"][:, ::997]))
    return (time.perf_counter() - t0) / iters, v


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]),
         **({"backend": sys.argv[4]} if len(sys.argv) > 4 else {}))
