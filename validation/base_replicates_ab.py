"""Same-process A/B: base-replicated draws (base_replicates R > 1) vs
the classic one-draw-per-column fused lean driver.

Two phases:
  1. RAW PAIR KERNEL: pallas two-DLA likelihoods at B x 10k with the
     base axis pattern-replicated — the kernel computes the base-axis
     Voigt math once per unique draw (half lanes at R=2; pixel-folded
     fully packed vregs at R>=4, ops/evidence_pallas), so the rate
     gain isolates the kernel-level win.  Measured (v5e, B=1024):
     R=1 817.5/s, R=2 981.8, R=4 1080.6 (the knee), R=8 1036.6 —
     all bit-exact vs R=1 on pattern inputs.
  2. FUSED LEAN DRIVER: end-to-end two-stage {0,1,2} catalogs, every
     R in the list interleaved (tunnel epochs vary ~2.5x; only
     same-process comparisons are meaningful), plus catalog agreement
     vs R=1 — each R is a DIFFERENT (equally valid) Monte Carlo base
     draw, so evidences move by O(1/sqrt(S/R)) sampling noise while
     multiplicity decisions should almost never flip.

Usage: python validation/base_replicates_ab.py [n_spectra] [kernel_B]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np


def kernel_ab(B: int = 1024, S: int = 10000, reps_list=(1, 2)) -> dict:
    """Time the production pair evaluator (make_batch_dla2_fn: prepare
    + fused pair kernel in one jit) with pattern-replicated base values,
    every R in reps_list on identical inputs — the outputs must be
    bit-identical; each R's rate isolates its kernel-level win."""
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

    # labels and output keys compare against R1 — a list not starting
    # at 1 would silently mislabel every comparison (ADVICE r3)
    assert reps_list[0] == 1, reps_list
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

    # build the base arrays with the FINEST replication pattern among
    # reps_list: pattern-R equality at lane offset tile/R implies every
    # coarser pattern too, so one input set serves all R (and timing is
    # value-independent)
    di, nd = replicate_draw_pattern(S, SAMPLE_TILE, max(reps_list))
    off_b = rng.uniform(size=(B, nd)).astype(np.float32)[:, di]
    nh_b = (10 ** rng.uniform(20, 22, (B, nd))).astype(np.float32)[:, di]

    num_pixels_ext = prob["wavelengths"].shape[1] + 2 * params.instrument.width
    window = compute_sample_window(
        off_sorted, SAMPLE_TILE, num_pixels_ext,
        num_lines=params.num_lines,
        pixel_spacing=params.instrument.pixel_spacing,
    )

    f32 = lambda a: jax.device_put(np.asarray(a, np.float32))
    call_args = (
        f32(prob["wavelengths"]), f32(prob["flux"]),
        f32(prob["noise_variance"]), jax.device_put(prob["mask"]),
        f32(prob["z_qso"]), f32(model.rest_wavelengths), f32(model.mu),
        f32(model.M), f32(model.log_omega), f32(off_sorted), f32(nh_sorted),
        f32(off_b), f32(nh_b),
    )

    out = {}
    vals = {}
    for reps in reps_list:
        fn = make_batch_dla2_fn(
            model, params, S, 2500, kms_to_z(3000.0), "pallas", window,
            base_replicates=reps,
        )
        r = fn(*call_args)
        vals[reps] = np.asarray(r[:4, :512])  # tiny fetch forces completion
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*call_args)
        np.asarray(jnp.nansum(r[:, ::997]))  # host fetch = real barrier
        dt = (time.perf_counter() - t0) / iters
        out[f"pair_eval_R{reps}"] = round(B / dt, 1)
        print(f"pair evaluator R={reps}: {B / dt:.1f} spectra/s", flush=True)
    # interpret mode proves bit-identity (tests/test_base_replicates);
    # on hardware the per-R PROGRAMS may contract FMAs differently, so
    # allow compiled-rounding-level noise but nothing larger.  The NaN
    # (too-close-pair) pattern must match exactly.
    v1 = vals[reps_list[0]]
    fin = np.isfinite(v1)
    for reps in reps_list[1:]:
        vr = vals[reps]
        assert np.array_equal(np.isnan(v1), np.isnan(vr)), reps
        rel = np.max(
            np.abs(v1[fin] - vr[fin]) / np.maximum(np.abs(v1[fin]), 1.0)
        )
        out[f"kernel_R{reps}_vs_R1_max_rel"] = float(rel)
        print(f"R{reps}-vs-R1 likelihoods max rel {rel:.2e}", flush=True)
        assert rel < 1e-4, (reps, rel)
        out[f"kernel_speedup_R{reps}"] = round(
            out[f"pair_eval_R{reps}"] / out[f"pair_eval_R{reps_list[0]}"], 3
        )
    return out


def driver_ab(n_spectra: int, reps_list=(1, 2, 4)) -> dict:
    assert reps_list[0] == 1, reps_list  # R1-vs labels/keys (ADVICE r3)
    from gp_dla_detection_tpu.inference import PaddedSpectra
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.parallel import ShardedRunConfig
    from gp_dla_detection_tpu.parallel.sharded_multi import (
        process_spectra_multi_sharded,
    )
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

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

    def run(reps: int, n: int, ckpt_dir):
        cfg = ShardedRunConfig(
            per_device_batch=1024, backend="pallas", dtype="float32",
            checkpoint_dir=ckpt_dir, pipeline_depth=4,
            store_sample_likelihoods=False, base_replicates=reps,
        )
        return process_spectra_multi_sharded(
            model, prob["offsets"], prob["nhis"],
            spectra.slice(slice(0, n)), prior_z, prior_num, config=cfg,
        )

    # warm every program once and check catalog agreement vs R=1:
    # each R is a DIFFERENT (equally valid) Monte Carlo base redraw
    warm = {reps: run(reps, 1024, None) for reps in reps_list}
    out: dict = {"n_spectra": n_spectra}
    base = warm[reps_list[0]]
    m_base = np.argmax(base.model_posteriors, 1)
    for reps in reps_list[1:]:
        m_r = np.argmax(warm[reps].model_posteriors, 1)
        finite = np.isfinite(base.log_likelihoods_dla2) & np.isfinite(
            warm[reps].log_likelihoods_dla2
        )
        d2 = np.abs(
            base.log_likelihoods_dla2[finite]
            - warm[reps].log_likelihoods_dla2[finite]
        )
        agreement = float(np.mean(m_base == m_r))
        out[f"multiplicity_agreement_R{reps}_1024"] = agreement
        # d2 can be empty when no sightline has finite pair evidence
        # under both R values (all-clean warm batch) — don't crash the
        # A/B after the expensive warm-up (ADVICE r3)
        med2 = float(np.median(d2)) if d2.size else float("nan")
        max2 = float(np.max(d2)) if d2.size else float("nan")
        out[f"pair_evidence_delta_median_R{reps}"] = round(med2, 4)
        out[f"pair_evidence_delta_max_R{reps}"] = round(max2, 4)
        print(
            f"catalog R{reps}-vs-R1 @1024: multiplicity agreement "
            f"{agreement:.4f}, pair evidence |delta| median "
            f"{med2:.3f} max {max2:.3f} (MC redraw noise; "
            f"{d2.size} finite pairs)",
            flush=True,
        )

    rates: dict[int, list[float]] = {reps: [] for reps in reps_list}
    for rep in range(2):
        for reps in reps_list:
            with tempfile.TemporaryDirectory() as tmp:
                t0 = time.perf_counter()
                run(reps, n_spectra, f"{tmp}/ckpt")
                dt = time.perf_counter() - t0
            rates[reps].append(n_spectra / dt)
            print(
                f"rep{rep} fused lean R{reps}: {dt:.1f}s = "
                f"{n_spectra / dt:.1f}/s",
                flush=True,
            )
    for reps in reps_list:
        out[f"lean_R{reps}_rates"] = [round(r, 1) for r in rates[reps]]
    for reps in reps_list[1:]:
        out[f"driver_speedup_R{reps}"] = round(
            float(np.mean(rates[reps]) / np.mean(rates[reps_list[0]])), 3
        )
    return out


def main(n_spectra: int = 4096, kernel_B: int = 1024) -> None:
    from gp_dla_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    summary = kernel_ab(kernel_B, reps_list=(1, 2, 4))
    summary.update(driver_ab(n_spectra, reps_list=(1, 2, 4)))
    print(json.dumps(summary))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
