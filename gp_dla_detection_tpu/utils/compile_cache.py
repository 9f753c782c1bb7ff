"""Persistent XLA compilation cache.

The fused evidence kernels take 30 s - 10 min to compile on remote
(tunneled) TPU backends; the reference has no equivalent cost (MATLAB
JIT is immediate) so repeat-run latency is a rebuild-specific concern.
JAX's persistent compilation cache works through the remote-compile
path too (measured: 1.2 s -> 0.2 s across *processes* on the axon
backend), so every pipeline entry point enables it by default: a
resumed or repeated survey run skips straight to execution.
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = "~/.cache/gp_dla_detection_tpu/jax"


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Default: $GPDLA_JAX_CACHE_DIR or ~/.cache/gp_dla_detection_tpu/jax.
    Safe to call repeatedly; a no-op if the user already configured a
    cache (jax_compilation_cache_dir set or JAX_COMPILATION_CACHE_DIR
    in the environment).  Returns the directory in effect, or None if
    configuration failed (old jax); never raises.
    """
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        return None
    if current:
        return current
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    if cache_dir is None:
        cache_dir = os.environ.get(
            "GPDLA_JAX_CACHE_DIR", os.path.expanduser(_DEFAULT_DIR)
        )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # the kernels worth caching all take >1 s to compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return str(cache_dir)
