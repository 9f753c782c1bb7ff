"""Roofline certification for the hot kernels (VERDICT r4 #8 -> PERF.md).

Measures, in one process on the real chip:

  1. device ceilings: VPU f32 FMA rate, VPU transcendental (exp) rate,
     MXU f32 (Precision.HIGHEST) matmul rate — microbenchmarks at the
     kernels' own operand scales;
  2. achieved kernel rates: the fused single evaluator and the pair
     evaluator at R=1 and R=4 (production configs, B=1024);
  3. an analytic op model of the windowed kernel, built from the SAME
     code constants the kernel compiles with (polynomial degree, taps,
     window size, k, grid padding) — documented per-element counts,
     VPU flops / transcendentals / MXU flops split;

and certifies: achieved fraction of the composite speed-of-light time
(sum of each op class at its measured ceiling — a LOWER bound on
attainable time since it assumes perfect overlap of nothing and ideal
utilization of everything).  Writes PERF.md at the repo root.

Run: python validation/roofline.py  (TPU, ~10 min incl. compiles)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))


# ---------------------------------------------------------------------------
# op model (counts derived from ops/evidence_pallas.py + ops/faddeeva.py;
# each constant is annotated with the code it counts)
# ---------------------------------------------------------------------------

def op_model(S: int = 10000, P: int = 1274, k: int = 20,
             num_lines: int = 3, R: int = 1, two_dla: bool = False) -> dict:
    from gp_dla_detection_tpu.inference import compute_sample_window
    from gp_dla_detection_tpu.ops.evidence_pallas import SAMPLE_TILE
    from gp_dla_detection_tpu.ops.faddeeva import _g_global_coeffs
    from gp_dla_detection_tpu.params import Parameters
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    params = Parameters()
    w = params.instrument.width
    P6 = P + 2 * w
    pad_align = 8
    # the padded grid the kernel actually runs on (pallas_sample_log_
    # likelihoods pads P6 to the sublane-aligned tile grid)
    P6p = -(-P6 // 16) * 16  # 16-aligned padding (R-fold invariant)

    # window size at the production sample set (z-sorted QMC offsets)
    prob = synthetic_workload(8, S, P, k, seed=0)
    off_sorted = np.sort(prob["offsets"])
    win = compute_sample_window(
        off_sorted, SAMPLE_TILE, P6, num_lines=num_lines,
        pixel_spacing=params.instrument.pixel_spacing,
    )
    W = min(-(-(min(win, P6) + pad_align) // pad_align) * pad_align, P6p)

    nc = len(_g_global_coeffs(12))
    # g_function: x2 (1 mul) + s = 1/(1 + x2*c) (mul, add, recip=1) +
    # Horner over nc coeffs (2*(nc-1)) + s*num (1)
    g_flops = 1 + 3 + 2 * (nc - 1) + 1
    # windowed line pass, per (pixel, sample) element per line:
    # x = (lam*mult - c)*inv (3) + (2y/sqrt(pi))*g (1; the 2y/sqrt(pi)
    # factor is per-line-constant) + accumulate scale*h (2)
    wing_el = 3 + g_flops + 1 + 2
    # window correction per in-window element per line: x_win (3) +
    # exp_core's polynomial part (x2, 2x2-1, *y2, +1, *exp ~ 6 + the
    # min clamp 1) + accumulate (2); 1 transcendental (exp)
    corr_el = 3 + 7 + 2

    # per (pixel, sample) epilogue: exp(total) (1 transc) + instrument
    # convolution (2w+1 taps = 2*(2w+1) flops) + observation model
    # (d = flux - a*mu, omega2*a^2 + noise pieces ~ 8) + Woodbury
    # diagonal scalings (~6)
    epi_el = 2 * (2 * w + 1) + 8 + 6

    n_absorbers = 2 if two_dla else 1
    # the pair kernel's FRESH axis is windowed; its BASE axis runs
    # full-grid (win=None) with the R-fold: unique lanes = S/R
    lines = num_lines
    vpu = 0.0
    transc = 0.0
    # fresh (windowed) axis — always present
    vpu += S * P6p * lines * wing_el
    vpu += S * W * lines * corr_el
    transc += S * W * lines  # exp in the window correction
    if two_dla:
        # base axis: full-grid pass on S/R unique lanes; exp_core runs
        # everywhere there (no window): wing + core on the full grid
        uniq = S // R
        full_el = 3 + g_flops + 1 + 2 + 7  # x + g + core polynomial + acc
        vpu += uniq * P6p * lines * full_el
        transc += uniq * P6p * lines  # exp in exp_core
        vpu += S * P6p * 1  # per-line N_HI fold (scale mul, two-DLA mode)
    vpu += S * P6p * epi_el
    transc += S * P6p  # exp(total) -> absorption
    # MXU: pair-product Gram k(k+1)/2 dot products over P6 pixels per
    # sample + Cholesky/solve (k^3/3 + ~3k^2 per sample, negligible)
    mxu = S * (k * (k + 1) / 2 * 2 * P6p) + S * (k**3 / 3 + 3 * k * k)
    return {
        "vpu_flops": vpu, "transcendentals": transc, "mxu_flops": mxu,
        "P6_padded": P6p, "window_px": W, "g_flops_per_el": g_flops,
        "wing_flops_per_el_line": wing_el,
    }


# ---------------------------------------------------------------------------
# device ceilings
# ---------------------------------------------------------------------------

def measure_ceilings() -> dict:
    """Microbenchmark the three op-class ceilings on the real chip.

    Tunnel discipline: each fetch through the axon tunnel costs ~34 ms
    round trip, so every timed segment must carry SECONDS of device
    work behind ONE final scalar fetch (the first cut of this harness
    timed ~35 ms of work per fetch and "measured" the round trip:
    0.121 "TFLOP/s").  lax.fori_loop keeps the whole chain in one
    dispatch; runtime vector coefficients keep XLA's algebraic
    simplifier from collapsing the affine FMA chain to a closed form.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 1 << 23
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(0.5, 1.0, n).astype(np.float32))
    u = jax.device_put(rng.uniform(0.999999, 1.000001, n).astype(np.float32))
    v = jax.device_put(rng.uniform(0.0, 1e-7, n).astype(np.float32))

    # 4 independent accumulators (ILP so the FMA latency chain doesn't
    # serialize the VPU) x 32 unrolled FMAs per fori step (so each HBM
    # round trip of the carries amortizes over 256 flops/element —
    # compute-bound at any plausible HBM rate).
    fma_outer, fma_inner, fma_acc = 256, 32, 4

    @jax.jit
    def fma_chain(a, u, v):
        def body(_, accs):
            a1, a2, a3, a4 = accs
            for _ in range(fma_inner):
                a1 = a1 * u + v
                a2 = a2 * u + v
                a3 = a3 * u + v
                a4 = a4 * u + v
            return (a1, a2, a3, a4)
        accs = lax.fori_loop(
            0, fma_outer, body, (a, a * 1.1, a * 0.9, a * 1.05)
        )
        return jnp.sum(accs[0] + accs[1] + accs[2] + accs[3])

    exp_outer, exp_inner, exp_acc = 128, 8, 2

    @jax.jit
    def exp_chain(a):
        def body(_, accs):
            a1, a2 = accs
            for _ in range(exp_inner):
                a1 = jnp.exp(-a1) + 1e-3
                a2 = jnp.exp(-a2) + 2e-3
            return (a1, a2)
        accs = lax.fori_loop(0, exp_outer, body, (a, a * 0.7))
        return jnp.sum(accs[0] + accs[1])

    m = 4096
    mm_steps = 64

    @jax.jit
    def mm_chain(a):
        def body(_, acc):
            return jnp.dot(
                acc, a, precision=jax.lax.Precision.HIGHEST
            ) * 1e-4 + a * 1e-6
        return jnp.sum(lax.fori_loop(0, mm_steps, body, a))

    a_mm = jax.device_put(np.random.default_rng(1).uniform(
        0.9, 1.1, (m, m)).astype(np.float32))

    def timed(fn, args, work):
        np.asarray(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        np.asarray(fn(*args))
        dt = (time.perf_counter() - t0) / 2
        return work / dt

    return {
        "vpu_f32_flops": timed(
            fma_chain, (x, u, v),
            2.0 * fma_outer * fma_inner * fma_acc * n,
        ),
        "transc_per_s": timed(
            exp_chain, (x,), float(exp_outer * exp_inner * exp_acc) * n
        ),
        "mxu_f32_flops": timed(mm_chain, (a_mm,), mm_steps * 2.0 * m**3),
    }


# ---------------------------------------------------------------------------
# achieved kernel rates (production configs)
# ---------------------------------------------------------------------------

def measure_kernels(B: int = 1024, S: int = 10000, iters: int = 5) -> dict:
    import functools

    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.inference import (
        batch_log_likelihoods,
        compute_sample_window,
    )
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.multi_dla import (
        make_batch_dla2_fn,
        packed_base_tables,
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
    base_args = (
        f32(prob["wavelengths"]), f32(prob["flux"]),
        f32(prob["noise_variance"]), jax.device_put(prob["mask"]),
        f32(prob["z_qso"]),
    )
    model_args = (
        f32(model.rest_wavelengths), f32(model.mu), f32(model.M),
        f32(model.log_omega),
    )

    out = {}
    fn1 = jax.jit(functools.partial(
        batch_log_likelihoods, params=params, sample_chunk=2500,
        backend="pallas", sample_window=window, tile=SAMPLE_TILE,
        samples_sorted=True,
    ))
    args1 = (*base_args, *model_args, model.log_c_0, model.log_tau_0,
             model.log_beta, f32(off_sorted), f32(nh_sorted))
    r = fn1(*args1)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn1(*args1)
    np.asarray(jnp.nansum(r["sample_log_likelihoods_dla"][:, ::997]))
    out["single_spectra_s"] = B / ((time.perf_counter() - t0) / iters)

    min_sep_z = kms_to_z(3000.0)
    tables = f32(packed_base_tables(
        prob["offsets"].astype(np.float32), prob["nhis"].astype(np.float32),
        np.float32,
    ))
    rng = np.random.default_rng(3)
    for R in (1, 4):
        fn2 = make_batch_dla2_fn(
            model, params, S, 2500, min_sep_z, "pallas", window,
            tile=SAMPLE_TILE, base_replicates=R,
        )
        if R == 1:
            cols = rng.integers(0, S, (B, S)).astype(np.int32)
        else:
            draw_idx, n_draws = replicate_draw_pattern(S, SAMPLE_TILE, R)
            cols = rng.integers(0, S, (B, n_draws)).astype(np.int32)[
                :, draw_idx
            ]
        cols_d = jax.device_put(cols)

        @jax.jit
        def chainR(cols_d, args=base_args):
            vals = tables[cols_d]
            return fn2(
                *args, *model_args, f32(off_sorted), f32(nh_sorted),
                vals[..., 0], vals[..., 1],
            )

        r2 = chainR(cols_d)
        t0 = time.perf_counter()
        for _ in range(iters):
            r2 = chainR(cols_d)
        np.asarray(jnp.nansum(r2[:, ::997]))
        out[f"pair_r{R}_spectra_s"] = B / ((time.perf_counter() - t0) / iters)
    return out


def main() -> None:
    from gp_dla_detection_tpu.utils import enable_compilation_cache

    from epoch_probe import run_epoch_probe

    enable_compilation_cache()
    ceil = measure_ceilings()
    rates = measure_kernels()
    probe = run_epoch_probe()
    m1 = op_model(two_dla=False)
    m2r1 = op_model(two_dla=True, R=1)
    m2r4 = op_model(two_dla=True, R=4)

    def light_speed(m):
        return (
            m["vpu_flops"] / ceil["vpu_f32_flops"]
            + m["transcendentals"] / ceil["transc_per_s"]
            + m["mxu_flops"] / ceil["mxu_f32_flops"]
        )

    rows = []
    for name, m, rate in (
        ("single evaluator", m1, rates["single_spectra_s"]),
        ("pair evaluator R=1", m2r1, rates["pair_r1_spectra_s"]),
        ("pair evaluator R=4", m2r4, rates["pair_r4_spectra_s"]),
    ):
        t_meas = 1.0 / rate
        t_ls = light_speed(m)
        rows.append({
            "kernel": name,
            "rate_spectra_s": round(rate, 1),
            "vpu_gflop_per_spectrum": round(m["vpu_flops"] / 1e9, 2),
            "transc_m_per_spectrum": round(m["transcendentals"] / 1e6, 1),
            "mxu_gflop_per_spectrum": round(m["mxu_flops"] / 1e9, 2),
            "achieved_vpu_tflops": round(
                m["vpu_flops"] * rate / 1e12, 3
            ),
            "light_speed_spectra_s": round(1.0 / t_ls, 1),
            "fraction_of_light_speed": round(t_ls / t_meas, 3),
        })

    report = {
        "ceilings": {k: round(v / 1e12, 3) if "flops" in k else round(v / 1e9, 3)
                     for k, v in ceil.items()},
        "ceiling_units": {"vpu_f32_flops": "TFLOP/s",
                          "mxu_f32_flops": "TFLOP/s (Precision.HIGHEST)",
                          "transc_per_s": "Gtransc/s (exp)"},
        "kernels": rows,
        "model": {
            "window_px": m1["window_px"], "P6_padded": m1["P6_padded"],
            "g_flops_per_el": m1["g_flops_per_el"],
            "wing_flops_per_el_line": m1["wing_flops_per_el_line"],
        },
        "epoch_probe": probe,
    }
    (HERE / "roofline.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
