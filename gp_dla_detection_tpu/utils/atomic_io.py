"""Atomic file writes (tmp + os.replace).

A SIGKILL mid-write leaves either the old file or the new file, never a
torn one — load-bearing for the kill/resume contract of every stage
artifact and per-batch checkpoint (the reference has no such contract:
process_qsos.m:234-249 saves once at the end and a crash loses the run).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

__all__ = ["atomic_savez", "atomic_write_json"]


def atomic_savez(path: str | Path, compress: bool = True, **arrays) -> None:
    """np.savez(_compressed) with atomic replace (no torn files on kill).

    ``compress=False`` skips zlib entirely — the per-batch checkpoint
    matrices are high-entropy f32/f16 log-likelihoods that barely
    compress, and the zlib CPU (and its GIL pressure on the dispatch
    thread) costs more than the disk bytes save.
    """
    path = Path(path)
    if path.suffix != ".npz":  # mirror np.savez's filename behaviour
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    save = np.savez_compressed if compress else np.savez
    with open(tmp, "wb") as f:
        save(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_json(path: str | Path, obj) -> None:
    """JSON dump with atomic replace (manifests survive a mid-write kill)."""
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps(obj))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
