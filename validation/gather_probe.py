"""Probe value-gather variants for the fused lean driver's base-value
fetch: two (S,) table gathers at (B, S) indices measured ~151 ms/batch
(lean_chain_profile.py).  Variants: packed (S, 2) table (one gather of
pairs), flat reshape, take_along_axis broadcast form.

Usage: python validation/gather_probe.py [B] [S]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(B: int = 1024, S: int = 10000) -> None:
    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    inds = jax.device_put(rng.integers(0, S, (B, S)).astype(np.int32))
    off = jax.device_put(rng.normal(size=S).astype(np.float32))
    nh = jax.device_put((rng.normal(size=S) * 2).astype(np.float32))
    packed = jax.device_put(
        np.stack([np.asarray(off), np.asarray(nh)], axis=1)
    )

    @jax.jit
    def two_gathers(i):
        return off[i], nh[i]

    @jax.jit
    def packed_gather(i):
        v = packed[i]  # (B, S, 2)
        return v[..., 0], v[..., 1]

    @jax.jit
    def flat_gathers(i):
        f = i.reshape(-1)
        return off[f].reshape(i.shape), nh[f].reshape(i.shape)

    @jax.jit
    def take_gathers(i):
        return (
            jnp.take(off, i, axis=0, unique_indices=False,
                     indices_are_sorted=False, mode="clip"),
            jnp.take(nh, i, axis=0, mode="clip"),
        )

    @jax.jit
    def onehot_matmul(i):
        # (B,S) indices -> segment-sum style: not materializing one-hot;
        # use take for comparison of sorted hint
        return (
            jnp.take(off, i, axis=0, indices_are_sorted=True, mode="clip"),
            jnp.take(nh, i, axis=0, indices_are_sorted=True, mode="clip"),
        )

    scal = jax.jit(lambda t: sum(jnp.sum(x) for x in t))

    def bench(name, fn, iters=8):
        out = fn(inds)
        np.asarray(scal(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(inds)
        np.asarray(scal(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:20s} {dt * 1e3:8.2f} ms/batch", flush=True)
        return dt

    a = np.asarray(two_gathers(inds)[0])
    b = np.asarray(packed_gather(inds)[0])
    np.testing.assert_array_equal(a, b)

    bench("two_gathers", two_gathers)
    bench("packed_gather", packed_gather)
    bench("flat_gathers", flat_gathers)
    bench("take_gathers", take_gathers)
    bench("sorted_hint", onehot_matmul)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
