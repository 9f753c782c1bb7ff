"""Bayesian DLA model selection — the flagship inference engine.

TPU-native rebuild of process_qsos.m:1-249.  The reference runs a
sequential loop over quasars with a parfor over 10,000 QMC samples,
calling a C MEX Voigt kernel and a MATLAB Woodbury solve ~1.63e9 times
for the full DR12Q catalog.  Here the whole computation is a single
jitted function per *batch* of spectra:

  - spectra are fixed-width padded arrays with validity masks (replacing
    the reference's ragged per-spectrum slicing, process_qsos.m:102-116),
  - the 10k-sample axis is an array axis chunked with lax.map (bounding
    the (samples x pixels) working set in HBM),
  - the batch axis is vmapped and, in the sharded driver
    (parallel/sharded_inference.py), distributed over a TPU mesh.

Reference-quirk note (documented, intentionally NOT reproduced): at
process_qsos.m:180 the reference computes ``ind = ~this_pixel_mask(ind)``
*after* ``ind`` was already restricted to unmasked pixels, which yields
an all-true mask and therefore selects the *first* nnz(ind) pixels of
the absorption profile — misaligned whenever a masked pixel lies in the
modelling range.  We align the absorption profile with the pixels it was
computed for (the scientifically intended behaviour).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .models.qso_model import GPModel
from .ops.low_rank_mvn import batched_dla_log_likelihoods, log_mvnpdf_low_rank
from .ops.voigt import voigt_absorption
from .params import LYA_WAVELENGTH, LYMAN_LIMIT, Parameters

__all__ = [
    "PaddedSpectra",
    "InferenceResults",
    "LadderRunner",
    "dla_rate_priors",
    "correct_prior_dla_flags",
    "fetch_with_ladder",
    "force_completion",
    "ladder_recoverable",
    "spectrum_log_likelihoods",
    "batch_log_likelihoods",
    "process_spectra",
]


@dataclass
class PaddedSpectra:
    """A batch of spectra as fixed-width padded arrays.

    wavelengths must be strictly increasing along the pixel axis for
    every spectrum (real pixels continue in uniform log-lambda spacing
    into the padded tail; see spectra.py, which constructs this layout).
    """

    wavelengths: np.ndarray     # (B, P) observed-frame [Å]
    flux: np.ndarray            # (B, P) normalized flux
    noise_variance: np.ndarray  # (B, P) normalized noise variance
    mask: np.ndarray            # (B, P) bool; True = real, unmasked pixel
    z_qso: np.ndarray           # (B,)

    def __len__(self) -> int:
        return self.wavelengths.shape[0]

    def slice(self, sl) -> "PaddedSpectra":
        return PaddedSpectra(
            self.wavelengths[sl],
            self.flux[sl],
            self.noise_variance[sl],
            self.mask[sl],
            self.z_qso[sl],
        )

    def pad_to(self, size: int) -> "PaddedSpectra":
        """Pad the batch axis to ``size`` by repeating the final
        spectrum (results for padded rows are discarded by callers)."""
        pad = size - len(self)
        if pad <= 0:
            return self
        return PaddedSpectra(
            *(
                np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
                for a in (
                    self.wavelengths,
                    self.flux,
                    self.noise_variance,
                    self.mask,
                    self.z_qso,
                )
            )
        )


# ---------------------------------------------------------------------------
# model prior (process_qsos.m:4-27, 122-132)
# ---------------------------------------------------------------------------


def correct_prior_dla_flags(prior_z_qsos, prior_dla_flags, prior_z_dlas):
    """Drop prior DLAs whose Lyα line falls below the QSO's Lyman limit.

    (process_qsos.m:15-27.)  ``prior_z_dlas`` is a list (per prior
    quasar) of absorber redshift arrays (empty/None when no DLA).  As in
    the reference's vectorized ``if``, the flag is cleared only when
    *all* of a quasar's DLAs fail the cut.
    """
    flags = np.array(prior_dla_flags, bool).copy()
    for i in np.flatnonzero(flags):
        entry = prior_z_dlas[i]
        if entry is None:
            # documented "no DLA" marker: np.atleast_1d(None) would be a
            # size-1 object array and crash in the arithmetic below
            continue
        z_dlas = np.atleast_1d(np.asarray(entry, dtype=float))
        if z_dlas.size and np.all(
            LYA_WAVELENGTH * (1 + z_dlas) < LYMAN_LIMIT * (1 + prior_z_qsos[i])
        ):
            flags[i] = False
    return flags


def dla_rate_priors(z_qsos, prior_z_qsos, prior_dla_flags, params: Parameters):
    """z-dependent counting prior (process_qsos.m:122-132), vectorized.

    For each test quasar: among prior quasars with z < z_qso + dz
    (dz = 30000 km/s), the fraction hosting a DLA.

    Returns (log_priors_dla, log_priors_no_dla), each (B,).
    """
    order = np.argsort(prior_z_qsos, kind="stable")
    z_sorted = np.asarray(prior_z_qsos)[order]
    dla_sorted = np.asarray(prior_dla_flags, dtype=np.int64)[order]
    cum_dlas = np.concatenate([[0], np.cumsum(dla_sorted)])

    counts = np.searchsorted(z_sorted, np.asarray(z_qsos) + params.prior_z_qso_increase, side="left")
    num_dlas = cum_dlas[counts]
    # Degenerate edge: counts == 0 (no prior quasar below the z cut).
    # The reference computes log(0) - log(0) = NaN here and lets it
    # propagate into the posteriors (process_qsos.m:122-132); we define
    # the documented limit instead: zero observed occurrences -> zero
    # prior weight on the DLA model (log p_dla = -inf, p_no_dla = 1).
    # num_dlas == 0 with counts > 0 already falls out naturally as
    # log p_dla = -inf, log p_no_dla = 0.
    safe_counts = np.maximum(counts, 1)
    with np.errstate(divide="ignore"):
        log_p_dla = np.log(num_dlas) - np.log(safe_counts)
        log_p_no_dla = np.log(counts - num_dlas) - np.log(safe_counts)
    log_p_dla = np.where(counts > 0, log_p_dla, -np.inf)
    log_p_no_dla = np.where(counts > 0, log_p_no_dla, 0.0)
    return log_p_dla, log_p_no_dla


# ---------------------------------------------------------------------------
# per-spectrum likelihoods (process_qsos.m:102-209)
# ---------------------------------------------------------------------------


def _extend_wavelengths(wavelengths, width: int, pixel_spacing: float):
    """Append `width` log-continuation pixels at each end
    (process_qsos.m:169-177: the ±width logspace padding for the
    instrumental convolution)."""
    dex = 10.0 ** (pixel_spacing * jnp.arange(1, width + 1, dtype=wavelengths.dtype))
    left = wavelengths[0] / dex[::-1]
    right = wavelengths[-1] * dex
    return jnp.concatenate([left, wavelengths, right])


def compute_sample_window(
    offset_samples, sample_chunk: int, num_pixels: int, num_lines: int = 3,
    pixel_spacing: float | None = None,
):
    """Static window size (pixels) for the windowed Voigt fast path.

    A z-sorted chunk spanning offset fraction ``s`` covers exactly
    log10((1+z(f+s))/(1+z(f)))/pixel_spacing pixels of line centers
    (ops/voigt.py windowed contract), which is bounded by
    log10(1 + s*R)/pixel_spacing with R = (1+max_z)/(1+min_z) - 1 <=
    LYA_WAVELENGTH/LYMAN_LIMIT - 1 for EVERY spectrum (the z_DLA search
    range, set_parameters.m:65-73).  The naive linear bound
    s*num_pixels understates the low-z end of the log-uniform grid by
    up to ~13% (pixel density per unit offset is highest there), so the
    window is sized by the LARGER of the two bounds, plus WINDOW_MARGIN
    pixels of slack on each side (consumers offset the window start by
    exactly WINDOW_MARGIN).  Returns None when windowing would not help:
    window >= grid, or ``num_lines`` above the PALLAS kernel's unroll
    limit — windowing LOSES at high line counts (r4 measurement,
    validation/lines31_ab.py at 31 lines, v5e B=256: windowed
    grouped-loop 138 spectra/s vs 194 full-grid unrolled; the 31 window
    passes' dynamic slices cost more than the skipped Gaussian cores
    save once the per-line windows tile the grid several times over).
    The grouped-unroll loop form itself is speed-neutral (full-grid
    loop 194 = unrolled 194; the r3b pure per-line loop's 2x penalty is
    gone), so the gate is purely the measured window economics.
    Callers sizing a window for the XLA path should keep the default
    ``num_lines`` (the XLA evaluator handles any line count).
    """
    from .ops.evidence_pallas import UNROLL_LINES
    from .ops.voigt import WINDOW_MARGIN

    if num_lines > UNROLL_LINES:
        return None
    off = np.sort(np.asarray(offset_samples))
    m = min(sample_chunk, len(off))
    if m <= 1 or len(off) == 0:
        return None
    spread = float(np.max(off[m - 1 :] - off[: len(off) - m + 1]))
    if pixel_spacing is None:
        from .params import InstrumentParams

        pixel_spacing = InstrumentParams().pixel_spacing
    from .params import LYA_WAVELENGTH, LYMAN_LIMIT

    ratio = LYA_WAVELENGTH / LYMAN_LIMIT - 1.0
    exact = np.log10(1.0 + spread * ratio) / pixel_spacing
    window = int(np.ceil(max(spread * num_pixels, exact))) + 2 * WINDOW_MARGIN
    window = -(-window // 8) * 8
    return window if window < num_pixels else None


# Empirical per-kernel VMEM ceiling on v5e (f32, k=20): the fused
# evidence kernel scoped-OOMs once the dominant (P6, tile) live set
# exceeds roughly 3200 px x 256 samples; a pair (two-DLA) kernel keeps
# two absorbers' intermediates live, halving the budget.  Tiles larger
# than 256 hit other limits even at small P (CLAUDE.md), so plans never
# exceed the default SAMPLE_TILE.
_PALLAS_VMEM_ELEMENTS = 3200 * 256
_PALLAS_MIN_TILE = 128  # Mosaic lane width: smaller tiles pad back up


def pallas_tile_plan(
    num_pixels_ext: int, tile: int | None = None, two_dla: bool = False
) -> int | None:
    """Largest sample tile expected to fit VMEM for this spectrum length,
    or None when even the minimum tile would blow the measured ceiling
    (callers should use the XLA backend instead)."""
    from .ops.evidence_pallas import SAMPLE_TILE

    budget = _PALLAS_VMEM_ELEMENTS // (2 if two_dla else 1)
    t = min(tile or SAMPLE_TILE, SAMPLE_TILE)
    # lane-align: tiles must be multiples of the 128-lane Mosaic
    # minimum, or the kernel fails to lower (a request like tile=192
    # must plan 128, not halve to the sub-minimum 96)
    t = max(t // _PALLAS_MIN_TILE * _PALLAS_MIN_TILE, _PALLAS_MIN_TILE)
    while t > _PALLAS_MIN_TILE and num_pixels_ext * t > budget:
        t = max(t // 2 // _PALLAS_MIN_TILE * _PALLAS_MIN_TILE, _PALLAS_MIN_TILE)
    return t if num_pixels_ext * t <= budget else None


def pallas_config_ladder(
    backend: str,
    num_pixels_ext: int,
    tile: int | None = None,
    two_dla: bool = False,
    windowed: bool = True,
) -> list[tuple[str, int | None, bool]]:
    """(backend, tile, windowed) configs from fastest to safest.

    For a pallas backend: the planned tile windowed, then the same tile
    full-grid, then progressively halved tiles (each windowed then
    full-grid) down to one lane group, then the XLA fallback.  Drivers
    walk this ladder when a kernel fails to fit (scoped VMEM OOM) or to
    lower on the current device, instead of hard-failing on a config
    the API accepts.  The window rung also guards against unforeseen
    windowed-lowering failures — dropping the window keeps such runs on
    the fused kernel instead of falling all the way back to XLA.  (The
    historical case, 31 unrolled dynamic-slice window passes crashing
    the TPU compiler, no longer reaches here: compute_sample_window
    returns None above the kernel's unroll limit because windowing
    measurably LOSES at 31 lines — grouped-loop windowed 138 vs 194
    spectra/s full-grid, validation/lines31_ab.py — so those runs
    start full-grid directly.)
    """
    if backend not in ("pallas", "pallas_interpret"):
        return [(backend, None, False)]
    ladder: list[tuple[str, int | None, bool]] = []
    t = pallas_tile_plan(num_pixels_ext, tile, two_dla)
    while t is not None and t >= _PALLAS_MIN_TILE:
        if windowed:
            ladder.append((backend, t, True))
        ladder.append((backend, t, False))
        t = t // 2 if t > _PALLAS_MIN_TILE else None
    ladder.append(("xla", None, False))
    return ladder


def ladder_configs(
    backend: str,
    num_pixels_ext: int,
    dtype,
    tile: int | None = None,
    two_dla: bool = False,
    windowed: bool = True,
) -> list[tuple[str, int | None, bool]]:
    """pallas_config_ladder gated on the pallas-capable dtype, with the
    shared loud warning when the requested backend cannot even start
    (spectrum longer than the minimum-tile VMEM ceiling)."""
    if backend in ("pallas", "pallas_interpret"):
        if np.dtype(dtype) != np.float32:
            # without this the ladder would hold a single rung that can
            # never start (Mosaic has no f64) and hard-fail mid-run with
            # an opaque kernel error instead of a config-time message
            raise ValueError(
                f"backend={backend!r} is float32-only (Mosaic has no f64 "
                f"support); use backend='xla' for dtype={np.dtype(dtype)} "
                "parity runs"
            )
        configs = pallas_config_ladder(
            backend, num_pixels_ext, tile=tile, two_dla=two_dla,
            windowed=windowed,
        )
    else:
        configs = [(backend, None, False)]
    if configs[0][0] != backend:
        import warnings

        warnings.warn(
            f"spectrum length exceeds the pallas VMEM ceiling even at the "
            f"minimum tile; using backend={configs[0][0]!r}",
            stacklevel=3,
        )
    return configs


def ladder_recoverable(exc: BaseException) -> bool:
    """True for compile/lowering/VMEM-class failures — the ones a
    degradation ladder can fix by choosing a smaller/safer config.

    Data-dependent errors (bad shapes from a caller, assertion failures,
    numerics guards) return False: silently retrying those on
    progressively slower configs would mask the real bug behind a
    warning, possibly "succeeding" on a rung that hides it.
    """
    try:
        from jax.errors import JaxRuntimeError as _XlaError
    except ImportError:  # older jax
        from jaxlib.xla_extension import XlaRuntimeError as _XlaError
    if isinstance(exc, (_XlaError, NotImplementedError, MemoryError)):
        # XlaRuntimeError covers TPU compile failures, Mosaic lowering
        # errors, and RESOURCE_EXHAUSTED (scoped-VMEM OOM) at execution;
        # NotImplementedError is how Pallas lowering reports unsupported
        # ops on the current device
        return True
    # Substring classification is a last resort for non-Xla exception
    # types raised by lowering/compile machinery; keep the patterns
    # SPECIFIC — generic words ("lower", "XLA", "pallas") would classify
    # ordinary data errors ("min_z must be lower than max_z", a bad
    # backend= argument echoing 'pallas') as recoverable and silently
    # retry the real bug on every slower rung.
    text = f"{type(exc).__name__}: {exc}"
    return any(
        p in text
        for p in (
            "RESOURCE_EXHAUSTED",
            "Mosaic",
            "mosaic",
            "VMEM",
            "vmem",
            "lowering",
            "out of memory",
            "remote_compile",
            "tpu_compile_helper",
            # pallas_call's CPU lowering rejection ("Only interpret mode
            # is supported on CPU backend") is a ValueError by type but a
            # device-capability failure by nature
            "interpret mode",
        )
    )


def force_completion(out) -> None:
    """Complete ``out``'s execution and surface any failure NOW.

    ``jax.block_until_ready`` alone is not enough on remote backends
    (axon: it returns before remote execution finishes, so an
    execution-time failure would escape to the caller's later fetch) —
    also pull one tiny scalar reduction through the host, which blocks
    until the producing computation has actually run.
    """
    jax.block_until_ready(out)
    leaves = [
        leaf
        for leaf in jax.tree_util.tree_leaves(out)
        if hasattr(leaf, "dtype")
        and getattr(leaf, "is_fully_addressable", True)
        and jnp.issubdtype(leaf.dtype, jnp.number)
        and leaf.size
    ]
    if leaves:
        np.asarray(jnp.sum(min(leaves, key=lambda leaf: leaf.size)))


class LadderRunner:
    """Evaluate through a degradation ladder of (backend, tile) configs.

    ``build(backend, tile, windowed)`` returns the batch evaluator for
    one rung; calls walk the ladder on compile/lowering/VMEM failure
    (with a warning) instead of hard-failing — every config the API
    accepts must complete.  Any other exception type re-raises
    immediately (see :func:`ladder_recoverable`).  The reached rung
    persists across calls, so later batches skip the rungs that already
    failed.  Shared by all four inference drivers (single/two-DLA x
    local/sharded).

    Dispatch is async once a rung is verified: only the FIRST call on
    each rung forces completion (surfacing compile/VMEM failures
    immediately); later calls enqueue and return, letting drivers
    overlap compute with result fetches.  A failure that surfaces at a
    driver's fetch instead is routed back through :meth:`recover`.
    """

    def __init__(self, configs, build, what: str = "evidence"):
        import threading

        self.configs = list(configs)
        self.build = build
        self.what = what
        self.idx = 0
        self.fn = build(*self.configs[0])
        self._verified = False
        # pipelined drivers dispatch from a worker thread while the main
        # thread recovers fetch failures (parallel/overlap.run_pipelined
        # threaded mode) — rung state must be serialized between them
        self.lock = threading.RLock()

    @property
    def config(self) -> tuple[str, int | None, bool]:
        return self.configs[self.idx]

    def _advance(self, exc: BaseException) -> bool:
        """Move to the next rung if ``exc`` is ladder-recoverable and a
        rung remains; False means the caller should re-raise."""
        if not ladder_recoverable(exc) or self.idx + 1 >= len(self.configs):
            return False
        import warnings

        cur = self.configs[self.idx]
        nxt = self.configs[self.idx + 1]
        desc = lambda c: (
            f"{c[0]!r} (tile={c[1]}" + (", windowed" if c[2] else "") + ")"
        )
        reason = f"{type(exc).__name__}: {exc}"
        if len(reason) > 300:
            reason = reason[:300] + "..."
        warnings.warn(
            f"{self.what} backend {desc(cur)} failed to "
            f"compile/fit; falling back to {desc(nxt)} [{reason}]",
            stacklevel=3,
        )
        self.idx += 1
        self.fn = self.build(*nxt)
        self._verified = False
        return True

    def __call__(self, *args):
        with self.lock:
            while True:
                try:
                    out = self.fn(*args)
                    if not self._verified:
                        # surface compile/VMEM failures here, not at the
                        # fetch; once a rung survives one full batch,
                        # later batches dispatch asynchronously
                        force_completion(out)
                        self._verified = True
                    return out
                except Exception as exc:
                    if not self._advance(exc):
                        raise

    def call_with_rung(self, *args):
        """``(self(*args), rung)`` with the rung read atomically with
        the call — under threaded dispatch, reading ``self.idx`` after
        the call returns could observe a rung another thread has since
        advanced to, and the stale-failure logic in
        :func:`fetch_with_ladder` needs the rung this batch actually
        dispatched on."""
        with self.lock:
            return self(*args), self.idx

    def recover(self, exc: BaseException) -> None:
        """Walk the ladder after ``exc`` surfaced at a result fetch
        (dispatch being async past the first batch of a rung);
        re-raises when the error is not ladder-recoverable or the
        ladder is exhausted."""
        with self.lock:
            if not self._advance(exc):
                raise exc

    def try_advance(self, exc: BaseException) -> bool:
        """Like :meth:`recover` but returns False instead of re-raising
        when this ladder cannot absorb ``exc`` — for drivers that chain
        SEVERAL runners in one dispatch (the fused lean two-stage
        driver) and fall through to the next runner's ladder."""
        with self.lock:
            return self._advance(exc)


def fetch_with_ladder(
    runner: LadderRunner, out, args, fetch, repack=None, dispatch_idx=None
):
    """``fetch(out)`` with ladder recovery: if the asynchronously
    dispatched execution failed after :class:`LadderRunner` returned,
    walk the ladder and re-run this batch on the new rung.

    ``repack`` (optional) post-processes ``runner(*args)`` on the retry
    path into whatever representation ``fetch`` expects — used by
    drivers that enqueue result packing at dispatch time.

    ``dispatch_idx`` is the ``runner.idx`` captured when THIS batch was
    dispatched.  With pipelined drivers (depth >= 2) several batches are
    in flight on the same rung; when the rung starts failing, every
    in-flight batch surfaces the same stale failure at its fetch — the
    first one advances the ladder, and the rest must retry on the
    already-advanced rung instead of each burning a further rung (which
    would skip viable fast configs or exhaust the ladder outright).
    Defaults to the runner's current rung, correct for serial drivers.
    """
    idx = runner.idx if dispatch_idx is None else dispatch_idx
    while True:
        try:
            return fetch(out)
        except Exception as exc:
            # under the runner lock: threaded dispatch may be advancing
            # the rung concurrently, and the stale-vs-fresh decision
            # plus the retry dispatch must see one consistent rung
            with runner.lock:
                if runner.idx > idx:
                    # stale failure from a rung another in-flight batch
                    # already abandoned — re-run on the current rung
                    # without advancing further
                    if not ladder_recoverable(exc):
                        raise
                else:
                    runner.recover(exc)  # re-raises when not recoverable
                idx = runner.idx
                out = runner(*args)
                if repack is not None:
                    out = repack(out)


def _prepare_spectrum(
    wavelengths,
    flux,
    noise_variance,
    mask,
    z_qso,
    model_grid,
    model_mu,
    model_M,
    model_log_omega,
    log_c_0,
    log_tau_0,
    log_beta,
    params: Parameters,
):
    """Shared per-spectrum preparation: model interpolation, forest
    scaling, validity mask, null evidence, z_DLA search range, and the
    convolution-extended wavelength grid (process_qsos.m:102-177).
    Used by both the XLA and Pallas evidence backends."""
    dtype = flux.dtype
    wavelengths = wavelengths.astype(dtype)

    rest = wavelengths / (1.0 + z_qso)
    nm = params.null_model
    in_range = (rest >= nm.min_lambda) & (rest <= nm.max_lambda)
    valid = mask & in_range

    # interpolate the learned model onto this spectrum (process_qsos.m:138-143);
    # the model rest grid is arange-built (params.NullModelParams
    # .rest_wavelengths, set_parameters.m:33-35), so the uniform-grid
    # bracketing applies, and mu/M/log_omega share one bracketing and
    # one fused row gather — bit-identical to the generic searchsorted
    # path, at ~half the cost of even the uniform per-array version
    # (the searchsorted original was ~19% of a B=1024 inference step)
    from .ops.interp import interp_stack_uniform

    grid = jnp.asarray(model_grid, dtype)
    mu, log_omega, M = interp_stack_uniform(
        grid,
        (
            jnp.asarray(model_mu, dtype),
            jnp.asarray(model_log_omega, dtype),
            jnp.asarray(model_M, dtype),
        ),
        rest,
    )

    # Lyα-forest scaling of omega^2 (process_qsos.m:145-147)
    c_0 = jnp.exp(jnp.asarray(log_c_0, dtype))
    tau_0 = jnp.exp(jnp.asarray(log_tau_0, dtype))
    beta = jnp.exp(jnp.asarray(log_beta, dtype))
    lya_zs = (wavelengths - LYA_WAVELENGTH) / LYA_WAVELENGTH
    scaling = 1.0 - jnp.exp(-tau_0 * (1.0 + lya_zs) ** beta) + c_0
    omega2 = jnp.exp(2.0 * log_omega) * scaling**2

    # null-model evidence (process_qsos.m:149-152)
    log_likelihood_no_dla = log_mvnpdf_low_rank(
        flux, mu, M, omega2 + noise_variance, mask=valid
    )

    # z_DLA search range over unmasked modelled pixels (process_qsos.m:160-165);
    # the range policy itself lives on Parameters (set_parameters.m:65-73)
    big = jnp.asarray(np.inf, dtype)
    wmin = jnp.min(jnp.where(valid, wavelengths, big))
    wmax = jnp.max(jnp.where(valid, wavelengths, -big))
    max_z_dla = params.max_z_dla_from_wmax(wmax)
    min_z_dla = params.min_z_dla_from_wmin(wmin, z_qso)

    return {
        "mu": mu,
        "M": M,
        "omega2": omega2,
        "valid": valid,
        "log_likelihood_no_dla": log_likelihood_no_dla,
        "min_z_dla": min_z_dla,
        "max_z_dla": max_z_dla,
        "padded_wavelengths": _extend_wavelengths(
            wavelengths, params.instrument.width, params.instrument.pixel_spacing
        ),
    }


def spectrum_log_likelihoods(
    wavelengths,
    flux,
    noise_variance,
    mask,
    z_qso,
    model_grid,
    model_mu,
    model_M,
    model_log_omega,
    log_c_0,
    log_tau_0,
    log_beta,
    offset_samples,
    nhi_samples,
    params: Parameters,
    sample_chunk: int = 1000,
    sample_window: int | None = None,
    reference_misaligned_absorption: bool = False,
    samples_sorted: bool = False,
):
    """Null + per-sample DLA log likelihoods for one padded spectrum.

    ``samples_sorted=True`` asserts offset_samples arrive z-ascending,
    skipping the windowed path's in-graph argsort and un-sort gather
    (the caller gets columns in its own — sorted — order either way).

    Pure jittable function of arrays; the sample axis is processed in
    lax.map chunks of ``sample_chunk`` to bound the (S, P) working set.

    ``reference_misaligned_absorption=True`` reproduces the reference's
    absorption-alignment quirk bit-structurally (process_qsos.m:180:
    ``ind = ~this_pixel_mask(ind)`` — after ``ind`` was already
    restricted to unmasked pixels this is all-true, so MATLAB's logical
    indexing takes the FIRST nnz values of the in-range absorption
    profile, shifting it whenever a masked pixel lies in the modelling
    range).  Off by default: the aligned profile is the scientifically
    intended behaviour (module docstring); the switch exists so a
    MATLAB-output comparison can hold on every spectrum, completing the
    quirk-switch family (training ``prior_in_value``, ascii
    ``reference_quirk_drop_name``).

    Returns dict with log_likelihood_no_dla, sample_log_likelihoods_dla
    (S,), min_z_dla, max_z_dla.
    """
    prep = _prepare_spectrum(
        wavelengths, flux, noise_variance, mask, z_qso,
        model_grid, model_mu, model_M, model_log_omega,
        log_c_0, log_tau_0, log_beta, params,
    )
    dtype = flux.dtype
    mu, M, omega2, valid = prep["mu"], prep["M"], prep["omega2"], prep["valid"]
    log_likelihood_no_dla = prep["log_likelihood_no_dla"]
    min_z_dla, max_z_dla = prep["min_z_dla"], prep["max_z_dla"]

    offsets = jnp.asarray(offset_samples, dtype)
    nhis = jnp.asarray(nhi_samples, dtype)
    windowed = sample_window is not None and dtype == jnp.float32
    sort_in_graph = windowed and not samples_sorted
    if sort_in_graph:
        # z-sort the samples so each chunk spans a narrow pixel window
        # (undone after the chunked evaluation)
        order = jnp.argsort(offsets)
        offsets = offsets[order]
        nhis = nhis[order]
        unsort = jnp.argsort(order)
    z_dlas = min_z_dla + (max_z_dla - min_z_dla) * offsets
    padded_wavelengths = prep["padded_wavelengths"]

    misalign_idx = None
    if reference_misaligned_absorption:
        # The in-range window is a contiguous pixel interval, so the
        # reference's "first nnz" selection maps the j-th VALID pixel to
        # the absorption value at in-range pixel i0 + j (i0 = first
        # in-range pixel, j counting valid pixels only); on a uniform
        # log-lambda grid the profile value at that pixel equals the
        # reference's (computed on the in-range + log-pad grid).
        rest = wavelengths / (1.0 + z_qso)
        nm = params.null_model
        in_range = (rest >= nm.min_lambda) & (rest <= nm.max_lambda)
        i0 = jnp.argmax(in_range)  # first in-range pixel (0 if none)
        rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
        misalign_idx = jnp.clip(i0 + rank, 0, wavelengths.shape[0] - 1)

    num_samples = offsets.shape[0]
    if num_samples == 0:
        # prep-only mode (the pallas backend computes sample evidences
        # itself): skip the sample loop entirely
        return {
            "log_likelihood_no_dla": log_likelihood_no_dla,
            "sample_log_likelihoods_dla": jnp.zeros((0,), dtype),
            "min_z_dla": min_z_dla,
            "max_z_dla": max_z_dla,
        }
    # pad by replicating the LAST sample: in windowed mode samples are
    # z-ascending, so this keeps the final chunk sorted and its pad
    # columns' line cores inside the chunk window (first-sample padding
    # would put the lowest-z core outside the window, computing
    # wrong-but-discarded values in the pad columns)
    pad = (-num_samples) % sample_chunk
    z_pad = jnp.concatenate([z_dlas, jnp.full((pad,), z_dlas[-1], dtype)])
    n_pad = jnp.concatenate([nhis, jnp.full((pad,), nhis[-1], dtype)])
    z_chunks = z_pad.reshape(-1, sample_chunk)
    n_chunks = n_pad.reshape(-1, sample_chunk)

    def one_chunk(args):
        z_c, n_c = args
        if windowed:
            from .ops.voigt import voigt_absorption_windowed

            absorption = voigt_absorption_windowed(
                padded_wavelengths,
                z_c,
                n_c,
                num_lines=params.num_lines,
                instrument=params.instrument,
                window=sample_window,
            )
        else:
            absorption = voigt_absorption(
                padded_wavelengths,
                z_c,
                n_c,
                num_lines=params.num_lines,
                instrument=params.instrument,
            )
        if misalign_idx is not None:
            # reference quirk (see docstring): valid pixel j reads the
            # absorption computed for in-range pixel i0 + j
            absorption = absorption[:, misalign_idx]
        return batched_dla_log_likelihoods(
            flux, mu, M, omega2, noise_variance, valid, absorption
        )

    sample_lls = jax.lax.map(one_chunk, (z_chunks, n_chunks)).reshape(-1)[
        :num_samples
    ]
    if sort_in_graph:
        sample_lls = sample_lls[unsort]

    return {
        "log_likelihood_no_dla": log_likelihood_no_dla,
        "sample_log_likelihoods_dla": sample_lls,
        "min_z_dla": min_z_dla,
        "max_z_dla": max_z_dla,
    }


@partial(
    jax.jit,
    static_argnames=(
        "params",
        "sample_chunk",
        "backend",
        "sample_window",
        "tile",
        "reference_misaligned_absorption",
        "samples_sorted",
    ),
)
def batch_log_likelihoods(
    wavelengths,
    flux,
    noise_variance,
    mask,
    z_qso,
    model_grid,
    model_mu,
    model_M,
    model_log_omega,
    log_c_0,
    log_tau_0,
    log_beta,
    offset_samples,
    nhi_samples,
    *,
    params: Parameters,
    sample_chunk: int = 1000,
    backend: str = "xla",
    sample_window: int | None = None,
    tile: int | None = None,
    reference_misaligned_absorption: bool = False,
    samples_sorted: bool = False,
):
    """vmapped batch version of :func:`spectrum_log_likelihoods`.

    backend="xla": lax.map over sample chunks (any dtype, any device).
    backend="pallas": the fused TPU kernel in ops/evidence_pallas.py for
    the per-sample evidences (float32); null model and search ranges
    still go through the XLA path.

    samples_sorted=True asserts offset_samples arrive z-ascending (the
    sample-axis-sharded drivers pre-sort on the host and un-sort columns
    after the gather), skipping the windowed path's in-graph argsort and
    the identity un-sort gather of the full (B, S) likelihood matrix.
    """
    if backend == "xla":
        fn = lambda w, f, n, m, z: spectrum_log_likelihoods(
            w,
            f,
            n,
            m,
            z,
            model_grid,
            model_mu,
            model_M,
            model_log_omega,
            log_c_0,
            log_tau_0,
            log_beta,
            offset_samples,
            nhi_samples,
            params,
            sample_chunk,
            sample_window,
            reference_misaligned_absorption,
            samples_sorted,
        )
        return jax.vmap(fn)(wavelengths, flux, noise_variance, mask, z_qso)

    if reference_misaligned_absorption:
        raise ValueError(
            "reference_misaligned_absorption is a MATLAB-parity mode and "
            "is only implemented on the XLA backend (use backend='xla', "
            "typically with dtype=float64)"
        )
    if backend not in ("pallas", "pallas_interpret"):
        raise ValueError(f"unknown backend {backend!r}")

    from .ops.evidence_pallas import pallas_sample_log_likelihoods

    def prepare(w, f, n, m, z):
        prep = _prepare_spectrum(
            w, f, n, m, z,
            model_grid, model_mu, model_M, model_log_omega,
            log_c_0, log_tau_0, log_beta, params,
        )
        z_dlas = prep["min_z_dla"] + (
            prep["max_z_dla"] - prep["min_z_dla"]
        ) * jnp.asarray(offset_samples, f.dtype)
        return (
            prep["log_likelihood_no_dla"],
            prep["min_z_dla"],
            prep["max_z_dla"],
            prep["mu"],
            prep["M"],
            prep["omega2"],
            prep["valid"],
            prep["padded_wavelengths"],
            z_dlas,
        )

    sort_in_graph = sample_window is not None and not samples_sorted
    if sort_in_graph:
        # z-sorted samples: each pallas tile spans a narrow pixel window
        order = jnp.argsort(jnp.asarray(offset_samples))
        unsort = jnp.argsort(order)
        offset_samples = jnp.asarray(offset_samples)[order]
        nhi_samples = jnp.asarray(nhi_samples)[order]

    (null_ll, min_z, max_z, mu_b, M_b, omega2_b, valid_b, ext_b, z_b) = (
        jax.vmap(prepare)(wavelengths, flux, noise_variance, mask, z_qso)
    )
    nhi_b = jnp.broadcast_to(
        jnp.asarray(nhi_samples, flux.dtype)[None, :],
        (flux.shape[0], len(nhi_samples)),
    )
    sample_lls = pallas_sample_log_likelihoods(
        ext_b,
        flux,
        mu_b,
        M_b,
        omega2_b,
        noise_variance,
        valid_b,
        z_b,
        nhi_b,
        num_lines=params.num_lines,
        instrument=params.instrument,
        interpret=(backend == "pallas_interpret"),
        window=sample_window,
        **({"tile": tile} if tile is not None else {}),
    )
    if sort_in_graph:
        sample_lls = sample_lls[:, unsort]
    return {
        "log_likelihood_no_dla": null_ll,
        "sample_log_likelihoods_dla": sample_lls,
        "min_z_dla": min_z,
        "max_z_dla": max_z,
    }


# ---------------------------------------------------------------------------
# results container + host driver (process_qsos.m:73-86, 200-249)
# ---------------------------------------------------------------------------


@dataclass
class InferenceResults:
    """Everything processed_qsos_<set>.mat stores (process_qsos.m:235-243).

    Lean (catalog-only) runs — ShardedRunConfig(store_sample_likelihoods
    =False) — carry ``sample_log_likelihoods_dla=None`` and instead hold
    the device-reduced ``map_sample_inds``; everything a DLA *catalog*
    needs is present, while posterior-sample consumers (the two-DLA
    stage, the CDDF analysis) raise a clear error.
    """

    min_z_dlas: np.ndarray
    max_z_dlas: np.ndarray
    log_priors_no_dla: np.ndarray
    log_priors_dla: np.ndarray
    log_likelihoods_no_dla: np.ndarray
    log_likelihoods_dla: np.ndarray
    sample_log_likelihoods_dla: np.ndarray | None  # (N, num_dla_samples)
    log_posteriors_no_dla: np.ndarray
    log_posteriors_dla: np.ndarray
    model_posteriors: np.ndarray            # (N, 2): [no_dla, dla]
    p_no_dlas: np.ndarray
    p_dlas: np.ndarray
    # per-spectrum argmax over samples, device-reduced on lean runs
    # (None otherwise: the catalog writer argmaxes the matrix directly)
    map_sample_inds: np.ndarray | None = None

    def save(self, path: str | Path) -> None:
        from .utils.atomic_io import atomic_savez

        # atomic: a kill during this (large) write must leave either the
        # old artifact or the new one, never a torn npz.  Uncompressed:
        # the (N, S) log-likelihood matrix dominates the file and is
        # high-entropy (zlib gains ~2% for minutes of CPU at survey
        # scale — measured 41 MB compressed vs 40 MB raw per 1024-row
        # block).  None fields (lean runs / full runs' map inds) are
        # simply omitted; load() restores them as None.
        atomic_savez(
            path,
            compress=False,
            **{
                f.name: getattr(self, f.name)
                for f in dataclasses.fields(self)
                if getattr(self, f.name) is not None
            },
        )

    # the ONLY fields save() may legitimately omit (lean runs omit the
    # matrix; full runs omit the device-reduced MAP) — any other
    # missing key is a corrupt/incompatible artifact and must fail
    # loudly, not default to None
    _OPTIONAL_FIELDS = ("sample_log_likelihoods_dla", "map_sample_inds")

    @classmethod
    def load(cls, path: str | Path) -> "InferenceResults":
        with np.load(Path(path)) as f:
            data = {k: f[k] for k in f.files}
        for name in cls._OPTIONAL_FIELDS:
            data.setdefault(name, None)
        missing = [
            fld.name
            for fld in dataclasses.fields(cls)
            if fld.name not in data
        ]
        if missing:
            raise ValueError(
                f"{path} is not a results artifact: missing {missing}"
            )
        return cls(**data)


def finalize_posteriors(
    log_priors_no_dla,
    log_priors_dla,
    log_likelihoods_no_dla,
    sample_log_likelihoods_dla,
):
    """Evidence aggregation + model posteriors (process_qsos.m:200-232).

    DLA evidence is the sample mean in a numerically safe form:
    max + log(mean(exp(ll - max))).
    """
    sample_lls = np.asarray(sample_log_likelihoods_dla)
    max_ll = np.max(sample_lls, axis=-1)
    log_likelihoods_dla = max_ll + np.log(
        np.mean(np.exp(sample_lls - max_ll[:, None]), axis=-1)
    )
    return posteriors_from_evidence(
        log_priors_no_dla,
        log_priors_dla,
        log_likelihoods_no_dla,
        log_likelihoods_dla,
    )


def posteriors_from_evidence(
    log_priors_no_dla,
    log_priors_dla,
    log_likelihoods_no_dla,
    log_likelihoods_dla,
):
    """Model posteriors from already-aggregated evidences — the second
    half of :func:`finalize_posteriors`, used directly by lean
    (catalog-only) runs whose evidence was reduced on device
    (parallel/streaming.pack_lean)."""
    log_likelihoods_dla = np.asarray(log_likelihoods_dla)
    log_posteriors_no_dla = log_priors_no_dla + log_likelihoods_no_dla
    log_posteriors_dla = log_priors_dla + log_likelihoods_dla

    both = np.stack([log_posteriors_no_dla, log_posteriors_dla], axis=-1)
    both_max = np.max(both, axis=-1, keepdims=True)
    model_posteriors = np.exp(both - both_max)
    model_posteriors /= model_posteriors.sum(axis=-1, keepdims=True)

    return {
        "log_likelihoods_dla": log_likelihoods_dla,
        "log_posteriors_no_dla": log_posteriors_no_dla,
        "log_posteriors_dla": log_posteriors_dla,
        "model_posteriors": model_posteriors,
        "p_no_dlas": model_posteriors[:, 0],
        "p_dlas": 1.0 - model_posteriors[:, 0],
    }


def resolve_dtype(dtype, caller: str = "process_spectra"):
    """float64 without jax_enable_x64 would be truncated silently by
    every jnp.asarray call — warn ONCE and downgrade explicitly."""
    if np.dtype(dtype) == np.float64 and not jax.config.jax_enable_x64:
        import warnings

        warnings.warn(
            f"{caller}(dtype=float64) requested but jax_enable_x64 is "
            "off — JAX would silently truncate to float32. Running in "
            "float32; enable x64 (jax.config.update('jax_enable_x64', "
            "True)) for the double-precision parity path.",
            stacklevel=3,
        )
        return np.float32
    return dtype


def process_spectra(
    model: GPModel,
    offset_samples,
    nhi_samples,
    spectra: PaddedSpectra,
    prior_z_qsos,
    prior_dla_flags,
    params: Parameters | None = None,
    batch_size: int = 16,
    sample_chunk: int = 1000,
    dtype=np.float64,
    progress: bool = False,
    backend: str = "xla",
    reference_misaligned_absorption: bool = False,
) -> InferenceResults:
    """Single-host inference driver over a set of spectra.

    The multi-chip sharded driver lives in parallel/sharded_inference.py;
    this one runs fixed-size jitted batches sequentially on the default
    device (padding the final partial batch).

    ``reference_misaligned_absorption``: opt-in reproduction of the
    reference's absorption-alignment quirk (XLA backend only; see
    :func:`spectrum_log_likelihoods`).
    """
    if reference_misaligned_absorption and backend != "xla":
        raise ValueError(
            "reference_misaligned_absorption requires backend='xla'"
        )
    if params is None:
        params = Parameters()
    dtype = resolve_dtype(dtype)

    n = len(spectra)
    log_p_dla, log_p_no_dla = dla_rate_priors(
        spectra.z_qso, prior_z_qsos, prior_dla_flags, params
    )

    num_samples = len(np.asarray(offset_samples))
    out_null = np.empty(n)
    # the (N, S) sample matrix is the dominant host-memory term at
    # survey scale (162k x 10k f32 = 6.5 GB; f64 would double it for
    # values computed at the run dtype anyway) — store at that dtype
    out_samples = np.empty((n, num_samples), np.dtype(dtype))
    out_min_z = np.empty(n)
    out_max_z = np.empty(n)

    sample_window = None
    unsort_cols = None
    offsets_host = np.asarray(offset_samples, dtype)
    nhis_host = np.asarray(nhi_samples, dtype)
    # gate matches the sharded driver: interpret mode runs the SAME
    # windowed kernel as production pallas, so interpret tests/debug
    # runs cover the windowed code path
    if backend in ("pallas", "pallas_interpret") and np.dtype(dtype) == np.float32:
        from .ops.evidence_pallas import SAMPLE_TILE

        sample_window = compute_sample_window(
            offset_samples,
            SAMPLE_TILE,
            spectra.wavelengths.shape[1] + 2 * params.instrument.width,
            pixel_spacing=params.instrument.pixel_spacing,
            num_lines=params.num_lines,
        )
        if sample_window is not None:
            # sort ONCE on the host (the sample set is static) instead
            # of per-batch in-graph, and un-sort columns on the host —
            # the sharded driver's layout (samples_sorted)
            order = np.argsort(offsets_host, kind="stable")
            unsort_cols = np.argsort(order, kind="stable")
            offsets_host = offsets_host[order]
            nhis_host = nhis_host[order]

    model_args = (
        jnp.asarray(model.rest_wavelengths, dtype),
        jnp.asarray(model.mu, dtype),
        jnp.asarray(model.M, dtype),
        jnp.asarray(model.log_omega, dtype),
        model.log_c_0,
        model.log_tau_0,
        model.log_beta,
        jnp.asarray(offsets_host),
        jnp.asarray(nhis_host),
    )

    # Degradation ladder: a pallas request that cannot fit VMEM (long
    # spectra) or lower on this device retries with halved sample tiles,
    # then the XLA path, instead of hard-failing.  The window is sized
    # for SAMPLE_TILE chunks, so it stays valid for any smaller tile;
    # the XLA fallback drops it (its chunks are sample_chunk-sized).
    def build(run_backend, tile, windowed):
        def call(w, f, nv, mk, zq):
            return batch_log_likelihoods(
                w, f, nv, mk, zq, *model_args,
                params=params,
                sample_chunk=sample_chunk,
                backend=run_backend,
                sample_window=sample_window if windowed else None,
                tile=tile,
                reference_misaligned_absorption=reference_misaligned_absorption,
                # the host pre-sorted whenever a window was computed;
                # every ladder rung then emits columns in that sorted
                # order (windowed or not), un-sorted at the store below
                samples_sorted=unsort_cols is not None,
            )

        return call

    runner = LadderRunner(
        ladder_configs(
            backend,
            spectra.wavelengths.shape[1] + 2 * params.instrument.width,
            dtype,
            windowed=sample_window is not None,
        ),
        build,
    )

    fetch = lambda o: {k: np.asarray(v) for k, v in o.items()}
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        batch = spectra.slice(slice(start, stop)).pad_to(batch_size)
        args = (
            jnp.asarray(batch.wavelengths, dtype),
            jnp.asarray(batch.flux, dtype),
            jnp.asarray(batch.noise_variance, dtype),
            jnp.asarray(batch.mask),
            jnp.asarray(batch.z_qso, dtype),
        )
        # dispatch is async past each rung's first batch; a failure
        # surfacing at the fetch below still walks the ladder
        out = fetch_with_ladder(runner, runner(*args), args, fetch)
        keep = stop - start
        out_null[start:stop] = out["log_likelihood_no_dla"][:keep]
        rows = out["sample_log_likelihoods_dla"][:keep]
        out_samples[start:stop] = (
            rows[:, unsort_cols] if unsort_cols is not None else rows
        )
        out_min_z[start:stop] = out["min_z_dla"][:keep]
        out_max_z[start:stop] = out["max_z_dla"][:keep]
        if progress:
            print(f"processed {stop}/{n} spectra", flush=True)

    post = finalize_posteriors(log_p_no_dla, log_p_dla, out_null, out_samples)
    from .utils import debug_print

    for i in range(n):  # fprintf_debug equivalents (process_qsos.m:134-217)
        debug_print(
            "quasar %d: log p(D|no DLA) = %0.2f, log p(D|DLA) = %0.2f, "
            "p(DLA|D) = %0.4f",
            i,
            out_null[i],
            post["log_likelihoods_dla"][i],
            post["p_dlas"][i],
        )
    return InferenceResults(
        min_z_dlas=out_min_z,
        max_z_dlas=out_max_z,
        log_priors_no_dla=log_p_no_dla,
        log_priors_dla=log_p_dla,
        log_likelihoods_no_dla=out_null,
        log_likelihoods_dla=post["log_likelihoods_dla"],
        sample_log_likelihoods_dla=out_samples,
        log_posteriors_no_dla=post["log_posteriors_no_dla"],
        log_posteriors_dla=post["log_posteriors_dla"],
        model_posteriors=post["model_posteriors"],
        p_no_dlas=post["p_no_dlas"],
        p_dlas=post["p_dlas"],
    )
