"""Same-process A/B: r4 kernel-layout + G-degree cuts vs the r3 kernel.

Two independent FLOP/layout cuts to the fused evidence kernels, each
with a validation-only knob so one process can time both settings:

  1. ``pad_align``: the r3 kernel dynamic-sliced the window on the
     pixel LANE axis, which Mosaic only allows at 128-aligned starts —
     so the extended grid was padded 1292 -> 1408 px and ~8% of every
     elementwise/MXU op ran on masked pad rows.  r4 moves wavelengths
     to a (P6, 1) COLUMN layout so the window slices pixel SUBLANES
     (8-row granularity): padding drops to 1292 -> 1296 and the
     window's static width shrinks by ~120 px of slack.
     ``pad_align=128`` reproduces the r3 padding for A/B.
  2. ``g_degree``: the global G polynomial's weighted-error floor is
     nearly flat past degree 12 (1.29e-4 / 3.50e-5 / 8.33e-6 / 7.42e-6
     / 6.23e-6 at degrees 8/10/12/14/16), so production drops 16 -> 12:
     4 fewer fma per element per Lyman line on every full-grid Voigt
     axis, composite fast-path error 7.5e-6 -> 1.2e-5 — both orders of
     magnitude below the ~2e-3 evidence sensitivity of catalog
     decisions (RESULTS_F32.md).

This harness interleaves, same-process on one chip (tunnel epochs vary
~2.5x; only same-process comparisons are meaningful):

  A. r3 baseline      (pad_align=128, g_degree=16)
  B. layout only      (pad_align=8,   g_degree=16)
  C. production (r4)  (pad_align=8,   g_degree=12)

over BOTH production kernels: the windowed single-DLA evidence path
(bench.py config, B=1024) and the R=4 pair evaluator
(make_batch_dla2_fn, the fused lean chain's 58% phase).  Parity: the
layout change only reshapes f32 reduction trees (roundoff-level
drift); the degree change moves Voigt wing values by ~1e-5 relative —
both must stay far below the 2e-3 decision sensitivity.

Usage: python validation/pad_align_ab.py [B] [S] [iters]
Prints one JSON summary line; measured results are recorded in the
commit that lands the decision (and in CLAUDE.md / docs/COVERAGE.md).

MEASURED (r4, v5e-1, B=1024, S=10k, iters=5, same process):
  single evaluator (batch_log_likelihoods incl. prepare):
    r3 1284.0 -> layout 1300.9 (+1.3%) -> production 1394.9 (+8.6%)
  pair evaluator R=4 (make_batch_dla2_fn):
    r3 1097.6 -> layout 1107.5 (+0.9%) -> production 1196.4 (+9.0%)
  parity: layout BIT-IDENTICAL on both paths (masked pad rows append
  exact zeros to the reductions); degree-12 drift 7.6e-7 / 8.7e-7 max
  rel — five orders below the 2e-3 decision sensitivity.
Decision: pad_align=8 + degree-12 G are the production defaults; the
f32 run fingerprint is bumped ("f32kernel:v2",
parallel/sharded_inference.py) so stale checkpoints cannot resume
across the numerics change.

Harness gotcha this A/B caught: batch_log_likelihoods is module-level
@jax.jit, so without clear_cache() every variant silently reuses the
first variant's compiled program — the first run reported three
bit-identical "variants" at identical speed.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

VARIANTS = (
    ("r3_base_pa128_g16", 128, 16),
    ("layout_pa8_g16", 8, 16),
    ("production_pa8_g12", 8, 12),
)


class _ForcedKernel:
    """Patch the module-level kernel entry with forced static kwargs
    (both production call sites import it function-locally, so the
    module attribute is read at call time)."""

    def __init__(self, pad_align: int, g_degree: int):
        self.kw = {"pad_align": pad_align, "g_degree": g_degree}

    def __enter__(self):
        from gp_dla_detection_tpu.ops import evidence_pallas as ep

        self._ep = ep
        self._real = ep.pallas_sample_log_likelihoods

        @functools.wraps(self._real)
        def forced(*a, _real=self._real, _kw=self.kw, **k):
            k.update(_kw)
            return _real(*a, **k)

        ep.pallas_sample_log_likelihoods = forced
        return self

    def __exit__(self, *exc):
        self._ep.pallas_sample_log_likelihoods = self._real


def single_ab(B: int, S: int, iters: int, backend: str) -> dict:
    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.inference import (
        batch_log_likelihoods,
        compute_sample_window,
    )
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.ops.evidence_pallas import SAMPLE_TILE
    from gp_dla_detection_tpu.params import Parameters
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    params = Parameters()
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
    window = compute_sample_window(
        off_sorted, SAMPLE_TILE, P6, num_lines=params.num_lines,
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

    out: dict = {}
    vals: dict = {}
    for name, pa, gd in VARIANTS:
        # batch_log_likelihoods is module-level @jax.jit: its GLOBAL
        # cache keys on shapes + its own statics only, so without a
        # clear every variant would silently reuse the first variant's
        # compiled program (the patched kernel kwargs are invisible to
        # it) — caught when the first run of this A/B reported three
        # bit-identical "variants"
        batch_log_likelihoods.clear_cache()
        with _ForcedKernel(pa, gd):
            fn = jax.jit(
                functools.partial(
                    batch_log_likelihoods, params=params, sample_chunk=2500,
                    backend=backend, sample_window=window, tile=SAMPLE_TILE,
                    samples_sorted=True,
                )
            )
            r = fn(*args)
            # strided FULL-coverage subsample (not a corner): rows span
            # all spectra, columns hit every sample tile incl. the
            # padded final one, so layout bugs anywhere in (B, S) fail
            # the parity assert
            vals[name] = np.asarray(
                r["sample_log_likelihoods_dla"][:: max(1, B // 8), ::17],
                np.float64,
            )
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*args)
            np.asarray(jnp.nansum(r["sample_log_likelihoods_dla"][:, ::997]))
            dt = (time.perf_counter() - t0) / iters
        out[f"single_{name}"] = round(B / dt, 1)
        print(f"single {name}: {B / dt:.1f} spectra/s", flush=True)
    _parity(out, vals, "single")
    return out


def pair_ab(B: int, S: int, iters: int, backend: str, reps: int = 4) -> dict:
    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.inference import compute_sample_window
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.multi_dla import (
        make_batch_dla2_fn,
        replicate_draw_pattern,
    )
    from gp_dla_detection_tpu.ops.evidence_pallas import SAMPLE_TILE
    from gp_dla_detection_tpu.params import Parameters, kms_to_z
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    params = Parameters()
    prob = synthetic_workload(B, S, 1274, 20, seed=0)
    model = GPModel(
        rest_wavelengths=prob["grid"], mu=prob["mu"], M=prob["M"],
        log_omega=prob["log_omega"], log_c_0=prob["log_c_0"],
        log_tau_0=prob["log_tau_0"], log_beta=prob["log_beta"],
    )
    rng = np.random.default_rng(3)
    order = np.argsort(prob["offsets"])
    off_sorted = prob["offsets"][order].astype(np.float32)
    nh_sorted = prob["nhis"][order].astype(np.float32)
    di, nd = replicate_draw_pattern(S, SAMPLE_TILE, reps)
    off_b = rng.uniform(size=(B, nd)).astype(np.float32)[:, di]
    nh_b = (10 ** rng.uniform(20, 22, (B, nd))).astype(np.float32)[:, di]

    P6 = prob["wavelengths"].shape[1] + 2 * params.instrument.width
    window = compute_sample_window(
        off_sorted, SAMPLE_TILE, P6, num_lines=params.num_lines,
        pixel_spacing=params.instrument.pixel_spacing,
    )
    # without a window the pair path silently falls back to full-grid
    # and the pad_align variants become no-ops (mislabeled speedups)
    assert window is not None

    f32 = lambda a: jax.device_put(np.asarray(a, np.float32))
    call_args = (
        f32(prob["wavelengths"]), f32(prob["flux"]),
        f32(prob["noise_variance"]), jax.device_put(prob["mask"]),
        f32(prob["z_qso"]), f32(model.rest_wavelengths), f32(model.mu),
        f32(model.M), f32(model.log_omega), f32(off_sorted), f32(nh_sorted),
        f32(off_b), f32(nh_b),
    )

    out: dict = {}
    vals: dict = {}
    for name, pa, gd in VARIANTS:
        with _ForcedKernel(pa, gd):
            fn = make_batch_dla2_fn(
                model, params, S, 2500, kms_to_z(3000.0), backend, window,
                base_replicates=reps,
            )
            r = fn(*call_args)
            # strided full-coverage subsample — see single_ab
            vals[name] = np.asarray(r[:: max(1, B // 8), ::17], np.float64)
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*call_args)
            np.asarray(jnp.nansum(r[:, ::997]))
            dt = (time.perf_counter() - t0) / iters
        out[f"pair_R{reps}_{name}"] = round(B / dt, 1)
        print(f"pair R={reps} {name}: {B / dt:.1f} spectra/s", flush=True)
    _parity(out, vals, f"pair_R{reps}")
    return out


def _parity(out: dict, vals: dict, tag: str) -> None:
    base_name = VARIANTS[0][0]
    a = vals[base_name]
    fin = np.isfinite(a)
    for name, _, _ in VARIANTS[1:]:
        b = vals[name]
        assert np.array_equal(np.isnan(a), np.isnan(b)), (tag, name)
        rel = float(
            np.max(np.abs(a[fin] - b[fin]) / np.maximum(np.abs(a[fin]), 1.0))
        )
        out[f"{tag}_{name}_vs_r3_max_rel"] = rel
        print(f"{tag} {name} vs r3 max rel {rel:.2e}", flush=True)
        # layout-only drift is f32 reduction-tree reshaping; the degree
        # change adds ~1e-5-relative Voigt wing movement — both must sit
        # far below the ~2e-3 evidence sensitivity of catalog decisions
        assert rel < 1e-3, (tag, name, rel)
    for name, _, _ in VARIANTS[1:]:
        out[f"{tag}_speedup_{name}"] = round(
            out[f"{tag}_{name}"] / out[f"{tag}_{base_name}"], 3
        )


def main(B: int = 1024, S: int = 10000, iters: int = 5,
         backend: str = "pallas") -> None:
    if backend == "pallas_interpret":
        # CPU smoke mode (the sitecustomize forces axon; the env var
        # alone is dead — CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from gp_dla_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    summary: dict = {"B": B, "S": S}
    summary.update(single_ab(B, S, iters, backend))
    summary.update(pair_ab(B, S, iters, backend))
    print(json.dumps(summary))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]),
         **({"backend": sys.argv[4]} if len(sys.argv) > 4 else {}))
