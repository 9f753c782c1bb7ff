"""Bound the two-pass sorted base-axis design at R=4 (VERDICT r3 #3).

The r2b ruled-out entry ("two-pass sorted base axis: tau to HBM +
permute — the HBM round trip eats the residual win") was measured at
R=1, where the pair kernel evaluated full-grid Voigt math for every
one of the tile's 256 base lanes.  The R=4 pixel-fold is new data: the
base-axis transcendental work is now done once per UNIQUE draw (64 per
tile), which changes the compute-vs-round-trip economics the ruling
was based on.  This harness re-runs the trade's arithmetic from
same-process measurements instead of re-building the two-pass design
blind:

  1. single windowed / single full-grid  (t_w, t_fg per spectrum)
  2. pair R=1 / pair R=4                 (t_p1, t_p4)

Derived quantities:

  base-axis residual at R=4:   t_base = t_p4 - t_w
     (everything the pair kernel does that the single kernel does not:
      deduped base line math, fold/roll shuffles, per-line N_HI
      scaling, the pair NaN mask)
  windowable-core cost of a full S-sample axis: d_core = t_fg - t_w
     (exactly the Gaussian-core work a sorted+windowed pass skips)
  two-pass MAX win = d_core / R
     (the base pass has S/R unique draws; windowing it can save at
      most the per-draw core work — every other base cost is moved,
      not removed, and the move ADDS an (S/R, P6) tau round trip
      through HBM plus a dynamic row gather per tile)

Decision rule: if max_win/t_p4 is small against the known round-trip
costs (the r2 measurement charged ~20% of pair time at B=64; the r4
floor is the (S/R, P6) slab write+gather-read), the ruling stands at
R=4 — recorded with these numbers in CLAUDE.md's ruled-out list.

Usage: python validation/pair_base_axis_bound.py [B] [S] [iters]
Prints one JSON line.

MEASURED (r4, v5e-1, B=1024, S=10k, same process):
  single windowed 1286.9 / full-grid 1161.3 spectra/s
  pair R=1 817.6 / R=4 1081.0
  base-axis residual at R=4: 151.6 ms/1024 = 16.0% of the pair kernel
  windowable core of a full axis: 86.0 ms/1024
  two-pass MAX win = 86.0/4 = 21.5 ms = 2.3% of the pair kernel
    (~1.3% of the fused chain)
  tau slab the design must round-trip: 13.1 GB per 1024-batch
    (>= 32 ms of pure HBM traffic at v5e's ~819 GB/s, before the
    dynamic row gather or the extra launch)
Decision: ruled out at R=4 as well — the ceiling is below the design's
own floor.  Recorded in CLAUDE.md's ruled-out list (dated r4).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main(B: int = 1024, S: int = 10000, iters: int = 5) -> None:
    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.inference import (
        batch_log_likelihoods,
        compute_sample_window,
    )
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.multi_dla import (
        make_batch_dla2_fn,
        replicate_draw_pattern,
    )
    from gp_dla_detection_tpu.ops.evidence_pallas import SAMPLE_TILE
    from gp_dla_detection_tpu.params import Parameters, kms_to_z
    from gp_dla_detection_tpu.utils import enable_compilation_cache
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    enable_compilation_cache()
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
    di, nd = replicate_draw_pattern(S, SAMPLE_TILE, 4)
    off_b = rng.uniform(size=(B, nd)).astype(np.float32)[:, di]
    nh_b = (10 ** rng.uniform(20, 22, (B, nd))).astype(np.float32)[:, di]

    P6 = prob["wavelengths"].shape[1] + 2 * params.instrument.width
    window = compute_sample_window(
        off_sorted, SAMPLE_TILE, P6, num_lines=params.num_lines,
        pixel_spacing=params.instrument.pixel_spacing,
    )

    f32 = lambda a: jax.device_put(np.asarray(a, np.float32))
    single_args = (
        f32(prob["wavelengths"]), f32(prob["flux"]),
        f32(prob["noise_variance"]), jax.device_put(prob["mask"]),
        f32(prob["z_qso"]), f32(model.rest_wavelengths), f32(model.mu),
        f32(model.M), f32(model.log_omega), model.log_c_0,
        model.log_tau_0, model.log_beta, f32(off_sorted), f32(nh_sorted),
    )
    pair_args = single_args[:9] + (
        f32(off_sorted), f32(nh_sorted), f32(off_b), f32(nh_b),
    )

    def time_single(win):
        fn = jax.jit(functools.partial(
            batch_log_likelihoods, params=params, sample_chunk=2500,
            backend="pallas", sample_window=win, tile=SAMPLE_TILE,
            samples_sorted=True,
        ))
        r = fn(*single_args)
        np.asarray(jnp.nansum(r["sample_log_likelihoods_dla"][:, ::997]))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*single_args)
        np.asarray(jnp.nansum(r["sample_log_likelihoods_dla"][:, ::997]))
        return (time.perf_counter() - t0) / iters

    def time_pair(reps):
        fn = make_batch_dla2_fn(
            model, params, S, 2500, kms_to_z(3000.0), "pallas", window,
            base_replicates=reps,
        )
        r = fn(*pair_args)
        np.asarray(jnp.nansum(r[:, ::997]))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*pair_args)
        np.asarray(jnp.nansum(r[:, ::997]))
        return (time.perf_counter() - t0) / iters

    out = {"B": B, "S": S}
    t_w = time_single(window)
    out["single_windowed"] = round(B / t_w, 1)
    print(f"single windowed: {B / t_w:.1f} spectra/s", flush=True)
    t_fg = time_single(None)
    out["single_fullgrid"] = round(B / t_fg, 1)
    print(f"single full-grid: {B / t_fg:.1f} spectra/s", flush=True)
    t_p1 = time_pair(1)
    out["pair_R1"] = round(B / t_p1, 1)
    print(f"pair R=1: {B / t_p1:.1f} spectra/s", flush=True)
    t_p4 = time_pair(4)
    out["pair_R4"] = round(B / t_p4, 1)
    print(f"pair R=4: {B / t_p4:.1f} spectra/s", flush=True)

    ms = lambda t: round(1e3 * t / B * 1024, 2)  # ms per 1024 spectra
    base_res = t_p4 - t_w
    d_core = t_fg - t_w
    max_win = d_core / 4.0
    out["ms_per_1024"] = {
        "single_windowed": ms(t_w), "single_fullgrid": ms(t_fg),
        "pair_R1": ms(t_p1), "pair_R4": ms(t_p4),
        "base_axis_residual_R4": ms(base_res),
        "windowable_core_full_axis": ms(d_core),
        "two_pass_max_win": ms(max_win),
    }
    out["base_residual_frac_of_pair_R4"] = round(base_res / t_p4, 4)
    out["two_pass_max_win_frac_of_pair_R4"] = round(max_win / t_p4, 4)
    # the slab the two-pass design must round-trip per 1024 spectra
    slab_mb = 1024 * (S / 4) * P6 * 4 / 1e6
    out["tau_slab_mb_per_1024"] = round(slab_mb, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]))
