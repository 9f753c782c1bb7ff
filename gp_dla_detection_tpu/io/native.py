"""ctypes bindings for the native C++ bulk FITS loader.

The reference's preload stage is a sequential MATLAB loop over ~162k
FITS files (preload_qsos.m:18-71) — pure host I/O.  native/gpdla_io.cc
replaces it with a multithreaded C++ parser; this module loads (and, if
necessary, builds) the shared library and exposes
:func:`read_spec_batch`.  Everything degrades gracefully to the pure
numpy reader in io/fits.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["native_available", "read_spec_batch", "load_library"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgpdla_io.so"
_lib = None
_lib_error: str | None = None


def _make() -> None:
    subprocess.run(
        ["make", "-s"], cwd=_NATIVE_DIR, check=True,
        capture_output=True, text=True,
    )


def load_library(rebuild: bool = False):
    """Load (building on first use) the native library; None on failure.

    `make -s` always runs (a no-op when the .so is newer than the
    source): an existing library must never shadow edited sources, and
    a stale/incompatible binary (e.g. copied from another machine) gets
    one rebuild-and-retry before the native path is disabled.
    """
    global _lib, _lib_error
    if _lib is not None and not rebuild:
        return _lib
    if _lib_error is not None and not rebuild:
        return None  # build already failed; don't re-spawn make per call
    try:
        try:
            _make()
        except (OSError, subprocess.CalledProcessError):
            # no toolchain: an existing (e.g. previously built) library
            # may still load; a missing one fails below
            if not _LIB_PATH.exists():
                raise
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            # incompatible prebuilt binary: rebuild from source and retry
            _LIB_PATH.unlink(missing_ok=True)
            _make()
            lib = ctypes.CDLL(str(_LIB_PATH))
        lib.gpdla_read_spec_batch.restype = ctypes.c_int
        lib.gpdla_read_spec_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.gpdla_version.restype = ctypes.c_char_p
        _lib = lib
        _lib_error = None
    except (OSError, subprocess.CalledProcessError) as e:
        _lib = None
        _lib_error = str(e)
    return _lib


def native_available() -> bool:
    return load_library() is not None


def read_spec_batch(
    paths: list[str | Path],
    max_pixels: int = 8192,
    n_threads: int = 0,
):
    """Read many speclite FITS files in parallel (read_spec semantics).

    Returns (wavelengths, flux, noise_variance, pixel_mask, lengths):
    (N, max_pixels) float64/bool arrays + (N,) int32 valid pixel counts
    (< 0 where a file failed to parse).  Row tails beyond ``lengths[i]``
    (and whole rows of failed files) hold defined filler — zero
    wavelengths/flux, infinite noise, masked pixels — so a caller that
    forgets to slice by ``lengths`` sees deterministic invalid pixels,
    never uninitialized memory.
    """
    lib = load_library()
    n = len(paths)
    wavelengths = np.zeros((n, max_pixels), np.float64)
    flux = np.zeros((n, max_pixels), np.float64)
    noise = np.full((n, max_pixels), np.inf)
    mask = np.ones((n, max_pixels), np.uint8)
    lengths = np.empty(n, np.int32)

    if lib is None:
        # pure-python fallback
        from ..spectra import read_spec

        for i, p in enumerate(paths):
            try:
                w, f, nv, pm = read_spec(p)
                m = min(len(w), max_pixels)
                wavelengths[i, :m] = w[:m]
                flux[i, :m] = f[:m]
                noise[i, :m] = nv[:m]
                mask[i, :m] = pm[:m]
                lengths[i] = m
            except Exception:
                lengths[i] = -1
        return wavelengths, flux, noise, mask.astype(bool), lengths

    encoded = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*encoded)
    lib.gpdla_read_spec_batch(
        arr,
        n,
        max_pixels,
        n_threads,
        wavelengths.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flux.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        noise.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return wavelengths, flux, noise, mask.astype(bool), lengths
