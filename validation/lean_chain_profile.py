"""Profile the fused lean two-stage driver's MID-CHAIN device pieces.

The fused driver (parallel/sharded_multi._process_multi_lean_fused)
measures 217-231 spectra/s against a ~522/s serial two-kernel bound;
the residual is attributed to the resample/gather chain between the
kernels.  This probe times each production mid-chain piece in
isolation on the real TPU — pack_lean, device_base_sample_inds (split
into its cumsum and searchsorted halves), the order/value gathers,
pack_lean_pair — plus candidate replacements:

  - searchsorted(method='sort'): co-sorting instead of the default
    binary-search scan (14 rounds of (B, S) dynamic gathers);
  - a search-free histogram inverse-CDF that exploits u being a
    permutation of the uniform grid (k+0.5)/S: bucket each CDF step
    into its grid cell (scatter-add) and cumsum, with a 2-step exact
    correction against the grid arithmetic so results match
    searchsorted bit-for-bit.

Timing: N async dispatches of one jitted piece + ONE tiny scalar fetch
(axon round trips are ~34 ms; block_until_ready does not block on
remote execution, so everything is timed through a host fetch).

Usage: python validation/lean_chain_profile.py [B] [S]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(B: int = 1024, S: int = 10000) -> None:
    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.multi_dla import (
        base_sample_grid,
        device_base_sample_inds,
        pack_lean_pair,
    )
    from gp_dla_detection_tpu.parallel.streaming import pack_lean
    from gp_dla_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    sll_h = (rng.normal(-20.0, 4.0, (B, S))).astype(np.float32)
    lls2_h = (rng.normal(-25.0, 4.0, (B, S))).astype(np.float32)
    lls2_h[rng.random((B, S)) < 0.05] = np.nan  # too-close pairs
    u_h = base_sample_grid(S, 0).astype(np.float32)
    perm_h = np.round(u_h * S - 0.5).astype(np.int32)  # u = (perm+0.5)/S
    order_h = np.argsort(rng.normal(size=S)).astype(np.int32)
    table_h = rng.normal(size=S).astype(np.float32)

    sll = jax.device_put(sll_h)
    lls2 = jax.device_put(lls2_h)
    u = jax.device_put(u_h)
    order_dev = jax.device_put(order_h)
    off_orig = jax.device_put(table_h)
    nh_orig = jax.device_put(table_h * 2.0)
    combined_h = perm_h[order_h]
    combined = jax.device_put(combined_h)

    # ---- production pieces (IMPORTED, not copied: the probe must time
    # exactly what production runs) ----
    from gp_dla_detection_tpu.multi_dla import (
        _grid_counts,
        _posterior_cdf,
        device_inverse_cdf_grid,
    )

    cdf_of = jax.jit(_posterior_cdf)

    @jax.jit
    def search_scan(cdf):
        inds = jax.vmap(lambda row: jnp.searchsorted(row, u.astype(row.dtype)))(cdf)
        return jnp.clip(inds, 0, S - 1).astype(jnp.int32)

    @jax.jit
    def search_sort(cdf):
        inds = jax.vmap(
            lambda row: jnp.searchsorted(row, u.astype(row.dtype), method="sort")
        )(cdf)
        return jnp.clip(inds, 0, S - 1).astype(jnp.int32)

    perm_dev = jax.device_put(perm_h)

    @jax.jit
    def search_hist(cdf):
        # the production search half (multi_dla._grid_counts), read out
        # at the grid permutation
        return _grid_counts(cdf, S)[:, perm_dev]

    @jax.jit
    def derive_prod(sll):
        base = device_base_sample_inds(sll, u)
        base_cols = base[:, order_dev]
        return base_cols, off_orig[base_cols], nh_orig[base_cols]

    @jax.jit
    def gathers_only(base):
        base_cols = base[:, order_dev]
        return base_cols, off_orig[base_cols], nh_orig[base_cols]

    @jax.jit
    def value_gathers(base_cols):
        return off_orig[base_cols], nh_orig[base_cols]

    @jax.jit
    def derive_hist(sll):
        # the PRODUCTION fused path: grid inverse-CDF with the order
        # fold composed into the readout permutation, then value gathers
        base_cols = device_inverse_cdf_grid(sll, combined)
        return base_cols, off_orig[base_cols], nh_orig[base_cols]

    def scal(x):
        if isinstance(x, tuple):
            return sum(jnp.sum(v.astype(jnp.float32)) for v in x)
        if isinstance(x, dict):
            return sum(jnp.sum(v.astype(jnp.float32)) for v in x.values())
        return jnp.sum(x.astype(jnp.float32))

    scal_j = jax.jit(scal)

    def bench(name, fn, *args, iters=8):
        out = fn(*args)
        np.asarray(scal_j(out))  # compile + force
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(scal_j(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:24s} {dt * 1e3:9.2f} ms/batch  ({B / dt:8.1f} spec/s)",
              flush=True)
        return dt

    cdf = cdf_of(sll)
    np.asarray(scal_j(cdf))
    base = search_scan(cdf)
    np.asarray(scal_j(base))
    base_cols = base[:, order_dev]
    np.asarray(scal_j(base_cols))

    # correctness of the candidates vs production
    i_scan = np.asarray(search_scan(cdf))
    i_sort = np.asarray(search_sort(cdf))
    i_hist = np.asarray(search_hist(cdf))
    agree_sort = float((i_scan == i_sort).mean())
    agree_hist = float((i_scan == i_hist).mean())
    print(f"agreement vs scan: sort {agree_sort:.6f}, hist {agree_hist:.6f}",
          flush=True)

    times = {}
    times["pack_lean"] = bench("pack_lean", pack_lean, sll)
    times["cdf"] = bench("cdf (weights+cumsum)", cdf_of, sll)
    times["search_scan"] = bench("searchsorted scan", search_scan, cdf)
    times["search_sort"] = bench("searchsorted sort", search_sort, cdf)
    times["search_hist"] = bench("searchsorted hist", search_hist, cdf)
    times["gathers"] = bench("order+value gathers", gathers_only, base)
    times["value_gathers"] = bench("value gathers only", value_gathers, base_cols)
    times["derive_prod"] = bench("derive_base PROD", derive_prod, sll)
    times["derive_hist"] = bench("derive_base HIST", derive_hist, sll)
    times["pack_lean_pair"] = bench("pack_lean_pair", pack_lean_pair, lls2, base)

    mid_prod = times["pack_lean"] + times["derive_prod"] + times["pack_lean_pair"]
    mid_hist = times["pack_lean"] + times["derive_hist"] + times["pack_lean_pair"]
    kern = B / 1364.0 + B / 846.0  # measured kernel rates, CLAUDE.md
    print(json.dumps({
        "B": B, "S": S,
        "mid_chain_prod_ms": round(mid_prod * 1e3, 1),
        "mid_chain_hist_ms": round(mid_hist * 1e3, 1),
        "kernels_ms": round(kern * 1e3, 1),
        "serial_rate_prod": round(B / (mid_prod + kern), 1),
        "serial_rate_hist": round(B / (mid_hist + kern), 1),
        "agree_sort": agree_sort, "agree_hist": agree_hist,
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
