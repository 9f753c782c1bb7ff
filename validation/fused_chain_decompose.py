"""Decompose the fused lean two-stage driver's per-batch wall time.

The one-dispatch fused chain (sharded_multi._FusedChainRunner) measures
~350 spectra/s sustained at B=1024 — the same as the five-dispatch
chain it replaced — so the bound is NOT dispatch overhead.  This probe
separates the remaining candidates on the real TPU:

  1. chain-only: N async dispatches of the fused program on
     device-resident args + one tiny fetch (pure device rate);
  2. upload+chain serial: per-iter device_put of the per-batch arrays
     (wavelengths/flux/noise/mask/z_qso, ~17 MB f32) before each
     dispatch, same fetch (what a non-overlapping driver would pay);
  3. upload-only: the device_put stream alone, timed through a
     device sum fetch.

If (1) matches the driver's sustained rate, the driver is compute-bound
and upload overlap is working; if the driver sits near (2), dispatch
threading is failing to hide the uploads.

Usage: python validation/fused_chain_decompose.py [B] [iters] [base_replicates]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(B: int = 1024, iters: int = 4, base_replicates: int = 1) -> None:
    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.inference import PaddedSpectra
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.multi_dla import (
        base_sample_perm,
        device_inverse_cdf_grid,
        make_batch_dla2_fn,
        pack_lean_pair,
        replicate_draw_pattern,
    )
    from gp_dla_detection_tpu.parallel import ShardedRunConfig
    from gp_dla_detection_tpu.parallel.mesh import make_mesh, replicated
    from gp_dla_detection_tpu.parallel.sharded_inference import (
        build_single_ladder,
    )
    from gp_dla_detection_tpu.parallel.streaming import pack_lean
    from gp_dla_detection_tpu.params import Parameters, kms_to_z
    from gp_dla_detection_tpu.utils import enable_compilation_cache
    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    enable_compilation_cache()
    S = 10000
    prob = synthetic_workload(B, S, 1274, 20, seed=0)
    model = GPModel(
        rest_wavelengths=prob["grid"], mu=prob["mu"], M=prob["M"],
        log_omega=prob["log_omega"], log_c_0=prob["log_c_0"],
        log_tau_0=prob["log_tau_0"], log_beta=prob["log_beta"],
    )
    spectra = PaddedSpectra(
        prob["wavelengths"], prob["flux"], prob["noise_variance"],
        prob["mask"], prob["z_qso"],
    )
    params = Parameters()
    config = ShardedRunConfig(
        per_device_batch=B, backend="pallas", dtype="float32",
        store_sample_likelihoods=False,
    )
    mesh = make_mesh(num_devices=1)
    dtype = np.float32
    offsets = np.asarray(prob["offsets"])
    nhis = np.asarray(prob["nhis"])
    num_pixels_ext = spectra.wavelengths.shape[1] + 2 * params.instrument.width

    # mirror _process_multi_lean_fused's construction at rung (0, 0)
    from gp_dla_detection_tpu.inference import (
        LadderRunner,
        compute_sample_window,
        ladder_configs,
    )
    from gp_dla_detection_tpu.ops.evidence_pallas import SAMPLE_TILE

    runner1 = build_single_ladder(
        model, params, config, mesh, dtype, offsets, num_pixels_ext,
    )
    order = np.argsort(offsets)
    window = compute_sample_window(
        offsets, SAMPLE_TILE, num_pixels_ext,
        num_lines=params.num_lines,
        pixel_spacing=params.instrument.pixel_spacing,
    )
    min_sep_z = kms_to_z(3000.0)

    def make_fn2(run_backend, tile, windowed=True):
        return make_batch_dla2_fn(
            model, params, S, config.sample_chunk, min_sep_z,
            run_backend, window if windowed else None, tile=tile,
            base_replicates=(
                base_replicates if tile == SAMPLE_TILE else 1
            ),
        )

    runner2 = LadderRunner(
        ladder_configs(config.backend, num_pixels_ext, dtype,
                       two_dla=True, windowed=True),
        make_fn2, what="two-DLA",
    )
    repl = replicated(mesh)
    off_j = jax.device_put(np.asarray(offsets[order], dtype), repl)
    nh_j = jax.device_put(np.asarray(nhis[order], dtype), repl)
    if base_replicates == 1:
        kvec, grid_size = base_sample_perm(S, 0)[order], S
    else:  # mirror the driver's replicated-draw layout
        draw_idx, grid_size = replicate_draw_pattern(
            S, SAMPLE_TILE, base_replicates
        )
        kvec = base_sample_perm(grid_size, 0)[draw_idx]
    cols_dev = jax.device_put(np.asarray(kvec, np.int32), repl)
    base_tables = jax.device_put(
        np.stack([offsets, nhis], axis=1).astype(dtype), repl
    )
    model_args = (
        jax.device_put(np.asarray(model.rest_wavelengths, dtype), repl),
        jax.device_put(np.asarray(model.mu, dtype), repl),
        jax.device_put(np.asarray(model.M, dtype), repl),
        jax.device_put(np.asarray(model.log_omega, dtype), repl),
    )
    off_orig = jax.device_put(np.asarray(offsets, dtype), repl)
    nh_orig = jax.device_put(np.asarray(nhis, dtype), repl)

    fn1, fn2 = runner1.fn, runner2.fn

    @jax.jit
    def fused(*args1):
        out1 = fn1(*args1)
        sll = out1["sample_log_likelihoods_dla"]
        ev1, map1 = pack_lean(sll)
        base_cols = device_inverse_cdf_grid(sll, cols_dev, grid_size=grid_size)
        vals = base_tables[base_cols]
        lls2 = fn2(*args1[:9], off_j, nh_j, vals[..., 0], vals[..., 1])
        ev2, map2, map_base = pack_lean_pair(lls2, base_cols)
        small = [
            out1["log_likelihood_no_dla"], out1["min_z_dla"],
            out1["max_z_dla"], ev1, map1, ev2, map2, map_base,
        ]
        wide = jnp.result_type(*(a.dtype for a in small))
        return jnp.stack([a.astype(wide) for a in small])

    host = (
        np.asarray(spectra.wavelengths, dtype),
        np.asarray(spectra.flux, dtype),
        np.asarray(spectra.noise_variance, dtype),
        np.asarray(spectra.mask),
        np.asarray(spectra.z_qso, dtype),
    )

    def upload():
        return tuple(jax.device_put(a) for a in host)

    batch_dev = upload() + model_args + (off_orig, nh_orig)

    # warm up (compile) + first fetch
    t0 = time.time()
    np.asarray(fused(*batch_dev)[0, :1])
    compile_s = time.time() - t0
    print(f"compile+first: {compile_s:.1f}s", flush=True)

    mb = sum(a.nbytes for a in host) / 1e6

    def timed(tag, fn_iter):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn_iter()
        np.asarray(out[0, :1])  # one tiny fetch drains the queue
        dt = (time.time() - t0) / iters
        print(f"{tag}: {dt:.3f}s/batch = {B / dt:.1f}/s", flush=True)
        return dt

    chain_s = timed("chain-only (device-resident args)",
                    lambda: fused(*batch_dev))

    def upload_then_chain():
        args = upload() + model_args + (off_orig, nh_orig)
        return fused(*args)

    both_s = timed("upload+chain serial", upload_then_chain)

    @jax.jit
    def touch(*a):
        return jnp.stack([x.astype(jnp.float32).sum() for x in a])

    def upload_only():
        a = upload()
        return touch(*a)[None]

    up_s = timed(f"upload-only ({mb:.1f} MB)", upload_only)

    # driver-exact dispatch: slice + pad + np.asarray(dtype) + sharded
    # device_put, as _process_multi_lean_fused.dispatch does
    from gp_dla_detection_tpu.parallel.mesh import data_sharding

    data_spec = data_sharding(mesh)
    data_spec2 = data_sharding(mesh, 1)

    def driver_exact():
        batch = spectra.slice(slice(0, B)).pad_to(B)
        args1 = (
            jax.device_put(np.asarray(batch.wavelengths, dtype), data_spec2),
            jax.device_put(np.asarray(batch.flux, dtype), data_spec2),
            jax.device_put(np.asarray(batch.noise_variance, dtype), data_spec2),
            jax.device_put(np.asarray(batch.mask), data_spec2),
            jax.device_put(np.asarray(batch.z_qso, dtype), data_spec),
            *model_args, off_orig, nh_orig,
        )
        return fused(*args1)

    drv_s = timed("driver-exact serial (slice+pad+sharded put)", driver_exact)

    def slice_pad_only():
        batch = spectra.slice(slice(0, B)).pad_to(B)
        arrs = (
            np.asarray(batch.wavelengths, dtype),
            np.asarray(batch.flux, dtype),
            np.asarray(batch.noise_variance, dtype),
            np.asarray(batch.mask),
            np.asarray(batch.z_qso, dtype),
        )
        return [arrs[0][:1, :1]]

    t0 = time.time()
    for _ in range(iters):
        slice_pad_only()
    sp_s = (time.time() - t0) / iters
    print(f"slice+pad host-only: {sp_s:.3f}s/batch", flush=True)

    def sharded_put_only():
        a = (
            jax.device_put(host[0], data_spec2),
            jax.device_put(host[1], data_spec2),
            jax.device_put(host[2], data_spec2),
            jax.device_put(host[3], data_spec2),
            jax.device_put(host[4], data_spec),
        )
        return touch(*a)[None]

    spu_s = timed("sharded-put-only", sharded_put_only)

    print(json.dumps({
        "B": B, "chain_s": round(chain_s, 3), "upload_s": round(up_s, 3),
        "serial_s": round(both_s, 3), "driver_exact_s": round(drv_s, 3),
        "slice_pad_s": round(sp_s, 3), "sharded_put_s": round(spu_s, 3),
        "chain_rate": round(B / chain_s, 1),
        "driver_exact_rate": round(B / drv_s, 1),
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
