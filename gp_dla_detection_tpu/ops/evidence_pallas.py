"""Fused Pallas TPU kernel for the DLA sample-evidence computation.

One kernel evaluates, for a tile of QMC samples of one spectrum, the
entire per-sample chain that the reference runs as 10,000 separate
voigt-MEX + Woodbury-solve calls (process_qsos.m:184-198):

    Voigt absorption (3 Lyman lines, fast small-y Faddeeva)
      -> instrumental 7-tap convolution
      -> per-sample diagonal weights / residuals
      -> Gram matrix B_s = I + M' diag(a^2/d) M    (MXU matmul)
      -> projected residual b_s = M' (a yc / d)    (MXU matmul)
      -> unrolled k x k Cholesky + forward solve + log det (VPU)
      -> log N(y; mu a, (Ma)(Ma)' + D)

entirely in VMEM — no (samples x pixels) intermediate ever touches HBM.

Layout: the sample axis lives on the TPU *lane* dimension (tiles of
128 samples), pixels on sublanes; the Gram accumulation is a
(k(k+1)/2, P) x (P, T) MXU contraction against the precomputed
PACKED-lower-triangle pair-product matrix (210 rows at k=20 — only
unique pairs; the Cholesky consumes the packed form directly), so no
in-kernel gather is needed to symmetrize.

Grid: (spectrum, sample_tile); per-spectrum blocks (wavelengths, model,
pair products) are revisited across the sample-tile axis, which Pallas
serves from VMEM without recopying.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import InstrumentParams
from . import lyman_series as lines
from .low_rank_mvn import LOG_2PI

__all__ = ["pallas_sample_log_likelihoods", "SAMPLE_TILE"]

SAMPLE_TILE = 256
# Batch shape with an empirical XLA:TPU/Mosaic miscompile (see
# pallas_sample_log_likelihoods); batches of exactly this size are
# split in two.  Module-level so tests can exercise the split path at
# interpret-friendly sizes.
MISCOMPILED_BATCH = 512
# Above this many Lyman-series lines the WINDOWED per-line pass runs
# as a lax.fori_loop over SMEM-resident line constants instead of a
# Python unroll: 31 unrolled dynamic-slice window passes crash the TPU
# compiler outright, while the loop form compiles in seconds.  The
# full-grid pass keeps the unroll at every line count — it compiles
# fine and Mosaic schedules the straight-line form ~2x faster (v5e,
# 31 lines, B=256 tile128: 181 spectra/s unrolled vs 94 looped,
# bitwise-identical results), which is also why drivers prefer
# full-grid-unrolled over windowed-looped above this limit
# (inference.compute_sample_window).
UNROLL_LINES = 8
_SQRT_2 = float(np.sqrt(2.0))
_SQRT_2PI = float(np.sqrt(2.0 * np.pi))


def _line_tables(num_lines: int, pad_to: int | None = None) -> np.ndarray:
    """(4, pad_to or num_lines) f32 per-line constants for the looped
    line pass, rounded EXACTLY as the unrolled kernel's weak-typed
    literals round (f64 host products cast to f32 at the point of use),
    so the two forms are bit-identical:

      row 0: c / (lambda_t * 1e8)     [f32(c) / f32(lambda_t*1e8)]
      row 1: gamma_t / (sqrt(2) sigma) [f32(gamma) * f32(1/(sqrt2 sigma))]
      row 2: leading_const / (sigma sqrt(2 pi)) [f64 product -> f32]
      row 3: lambda_t * 1e8            [f64 product -> f32]

    Columns past ``num_lines`` (the grouped-unroll remainder of the
    last block) replicate the last real line's constants with row 2
    zeroed: the pass's every contribution is scaled by that leading
    constant, so a pad line adds exactly 0.0 while its intermediate
    Faddeeva values stay finite (they are the last real line's).
    """
    lt18 = (
        np.asarray(lines.TRANSITION_WAVELENGTHS[:num_lines], np.float64)
        * 1e8
    )
    gamma = np.asarray(lines.LORENTZIAN_WIDTHS[:num_lines], np.float64)
    lead = np.asarray(lines.LEADING_CONSTANTS[:num_lines], np.float64)
    voigt_norm = 1.0 / (lines.DOPPLER_SIGMA * _SQRT_2PI)
    tbl = np.stack(
        [
            np.float32(lines.C_CGS) / lt18.astype(np.float32),
            gamma.astype(np.float32)
            * np.float32(1.0 / (_SQRT_2 * lines.DOPPLER_SIGMA)),
            (lead * voigt_norm).astype(np.float32),
            lt18.astype(np.float32),
        ]
    )
    if pad_to is not None and pad_to > num_lines:
        pad = np.repeat(tbl[:, -1:], pad_to - num_lines, axis=1)
        pad[2] = 0.0
        tbl = np.concatenate([tbl, pad], axis=1)
    return tbl


def _evidence_kernel(
    lam_ref,      # (1, P6, 1) extended wavelengths [Å], COLUMN layout:
                  # the windowed pass dynamic-slices the pixel axis, and
                  # only SUBLANE slices go at 8-pixel granularity (lane
                  # slices would force 128, see pad_align)
    flux_ref,     # (1, P)
    mu_ref,       # (1, P)
    omega2_ref,   # (1, P)
    noise_ref,    # (1, P)
    maskf_ref,    # (1, P)    1.0 = valid pixel
    mt_ref,       # (1, k, P) M transposed
    ptri_ref,     # (1, k(k+1)/2, P) lower-triangle pair products,
                  # column-major: rows [off_j, off_j + k - j) hold
                  # M_i * M_j for i = j..k-1, off_j = j*k - j(j-1)/2
    *rest,        # [tbl_ref,] z_ref, nhi_ref [, z2_ref, nhi2_ref],
                  # out_ref, total_ref
                  # tbl_ref (4, num_lines) SMEM line constants, present
                  # iff line_loop; z/nhi blocks are (1, 1, T); out
                  # (1, 1, T); total_ref (P6, T) VMEM scratch: -tau
    num_lines: int,
    taps: tuple,
    k: int,
    window: int | None,
    pixel_spacing: float,
    two_dla: bool = False,
    line_loop: bool = False,
    base_replicates: int = 1,
    pad_align: int = 8,
    g_degree: int | None = None,
):
    if line_loop:
        tbl_ref, *rest = rest
    if two_dla:
        z_ref, nhi_ref, z2_ref, nhi2_ref, out_ref, total_ref = rest
        # the second (posterior-resampled) absorber's redshifts are not
        # z-sorted, so it always takes the full-grid Faddeeva branch.
        # With base_replicates R > 1 the caller guarantees lanes l and
        # l + T/R of every z2/nhi2 tile are identical (multi_dla.
        # replicate_draw_pattern + the wrapper's padded-tail fix), so
        # the base line math runs on T/R lanes and broadcasts —
        # bit-identical output, ~1/R the base-axis transcendental cost
        absorbers = [
            (z_ref, nhi_ref, window, 1),
            (z2_ref, nhi2_ref, None, base_replicates),
        ]
    else:
        z_ref, nhi_ref, out_ref, total_ref = rest
        absorbers = [(z_ref, nhi_ref, window, 1)]

    dtype = flux_ref.dtype
    P6 = lam_ref.shape[-2]
    P = flux_ref.shape[-1]
    T = z_ref.shape[-1]
    # refs arrive as (1, 1, X) blocks: leading dims are the grid axes

    lam = lam_ref[0]                                        # (P6, 1)

    c_cgs = jnp.asarray(lines.C_CGS, dtype)
    inv_sqrt2_sigma = jnp.asarray(
        1.0 / (_SQRT_2 * lines.DOPPLER_SIGMA), dtype
    )
    voigt_norm = 1.0 / (lines.DOPPLER_SIGMA * _SQRT_2PI)

    # ---- Voigt optical depth over the extended grid (voigt.c:277-291);
    # with two absorbers the optical depths add (absorption multiplies),
    # so each line contribution is N_HI-scaled into the shared total
    from .faddeeva import _SQRT_PI, exp_core, g_function
    from .voigt import WINDOW_MARGIN

    total_ref[...] = jnp.zeros((P6, T), dtype)

    def line_pass(c_over_lt18, y, lead_norm, lt18, zr, z, nhi, win, reps):
        """One Lyman-series line's optical-depth contribution.

        ``c_over_lt18``/``y``/``lead_norm``/``lt18`` are the per-line
        constants — Python/trace-time values on the unrolled path, SMEM
        scalar loads on the fori_loop path (same f32 values either way,
        see _line_tables).  ``reps`` > 1: the tile's lanes repeat with
        period T/reps (base-replicated axis), so the Faddeeva math runs
        on the unique lanes and broadcasts.
        """
        # single-absorber mode scales by N_HI once at the exp (saves
        # a (P6, T) broadcast multiply per line); with two absorbers
        # the N_HI factor must be folded per line so the shared
        # total accumulates the combined optical depth
        scale = lead_norm * nhi if two_dla else lead_norm
        if win is None:
            width = T // reps
            z_u = z[:, :width] if reps > 1 else z
            mult = c_over_lt18 / (1.0 + z_u)                # (1, width)
            # fold the PIXEL axis into the spare lanes when the unique
            # draws no longer fill a 128-lane vreg (R >= 4 at tile 256):
            # f pixel blocks ride lanes [i*width, (i+1)*width), so the
            # transcendental math below runs on fully packed vregs —
            # (P6/f, 128) costs f x less than a width-lane (P6, width)
            # array, whose lane dim Mosaic pads to 128 anyway
            fold = 1
            if reps > 1 and width < 128:
                fold = 128 // width
                # each pixel block must also start at a sublane (8-row)
                # boundary for the static value slices of the (P6, 1)
                # column-layout lam below
                while fold > 1 and (P6 % fold or (P6 // fold) % 8):
                    fold //= 2
            if fold > 1:
                blk = P6 // fold
                lam_f = jnp.concatenate(
                    [
                        jnp.broadcast_to(
                            lam[i * blk : (i + 1) * blk], (blk, width)
                        )
                        for i in range(fold)
                    ],
                    axis=1,
                )                                           # (P6/f, f*width)
                mult_f = jnp.concatenate([mult] * fold, axis=1)
                x = (lam_f * mult_f - c_cgs) * inv_sqrt2_sigma
            else:
                x = (lam * mult - c_cgs) * inv_sqrt2_sigma  # (P6, width)
            h = exp_core(x * x, y) + (2.0 / _SQRT_PI) * y * g_function(
                x, degree=g_degree
            )
            if fold > 1:
                # un-fold: lane block i holds pixel rows [i*blk, (i+1)*blk).
                # Mosaic cannot sublane-concat slices at nonzero LANE
                # offsets ("offset mismatch on non-concat dimension"),
                # so rotate each block down to lane 0 first (a cheap
                # register shuffle) before slicing
                lanes = fold * width
                parts = []
                for i in range(fold):
                    # roll is a RIGHT rotation with a non-negative
                    # shift: bring lane block i down to lane 0
                    blk_h = (
                        pltpu.roll(h, lanes - i * width, 1) if i else h
                    )
                    parts.append(blk_h[:, :width])
                h = jnp.concatenate(parts, axis=0)          # (P6, width)
            if reps > 1:
                h = jnp.concatenate([h] * reps, axis=1)     # (P6, T)
            total_ref[...] = total_ref[...] - scale * h
        else:
            # z-sorted tile: the Lorentzian term (global rational G)
            # is exact everywhere; the Gaussian core e^{-x^2}(...) —
            # negligible beyond ~5 px of a line center — is added
            # only within a `window`-pixel slice around the tile's
            # line centers.  Dynamic-slice access goes through the
            # VMEM scratch ref (Mosaic has no dynamic_slice on
            # values).
            # The window slices the PIXEL axis, which lives on sublanes
            # for both sliced refs (lam_ref's column layout and the
            # total scratch), so the dynamic start only needs sublane
            # (8-row) alignment — lane slices would force 128 and an
            # extra ~116 px of grid padding (see pad_align).  The start
            # rounds DOWN to an aligned boundary (losing at most
            # pad_align-1 px of right coverage), so widen the static
            # window by one group; the clip bound must itself stay
            # aligned or the pl.multiple_of promise is violated for
            # near-red-edge windows
            W = min(
                -(-(min(win, P6) + pad_align) // pad_align) * pad_align,
                P6,
            )
            mult = c_over_lt18 / (1.0 + z)                  # (1, T)
            x = (lam * mult - c_cgs) * inv_sqrt2_sigma      # (P6, T)
            h_wing = (2.0 / _SQRT_PI) * y * g_function(x, degree=g_degree)
            total_ref[...] = total_ref[...] - scale * h_wing
            center = jnp.log10(lt18 * (1.0 + zr[0, 0, 0]))
            log_lam0 = jnp.log10(lam_ref[0, 0, 0])
            start_raw = jnp.floor(
                (center - log_lam0) / pixel_spacing
            ).astype(jnp.int32) - WINDOW_MARGIN
            # index literals must be explicit int32: under
            # jax_enable_x64, weak Python ints cross floor_divide /
            # clip's inner-jit boundary as i64[] consts, and Mosaic's
            # 64-bit convert lowering recurses without terminating
            # (tests/test_evidence_pallas.py::test_kernel_jaxpr_x64_safe)
            grp = jnp.int32(pad_align)
            start = jnp.clip(
                (start_raw // grp) * grp,
                jnp.int32(0),
                jnp.int32(max(((P6 - W) // pad_align) * pad_align, 0)),
            )
            start = pl.multiple_of(start, pad_align)
            lam_win = lam_ref[0, pl.ds(start, W), :]        # (W, 1)
            x_win = (lam_win * mult - c_cgs) * inv_sqrt2_sigma
            corr = exp_core(x_win * x_win, jnp.asarray(y, dtype))
            total_ref[pl.ds(start, W), :] = (
                total_ref[pl.ds(start, W), :] - scale * corr
            )

    for zr, nr, win, reps in absorbers:
        z = zr[0, 0].reshape(1, T)
        nhi = nr[0, 0].reshape(1, T)
        if line_loop:
            # GROUPED unroll: fori over blocks of UNROLL_LINES lines,
            # straight-line inside each block.  The pure per-line loop
            # measured ~2x slower than straight-line code (Mosaic does
            # not software-pipeline across fori iterations); a fully
            # unrolled windowed pass above UNROLL_LINES crashes the TPU
            # compiler.  Blocks keep each body at the size known to
            # compile while recovering most of the scheduling win.
            # Remainder lines in the last block are table-padded with
            # zero leading constants (exact no-ops; _line_tables).
            block = min(UNROLL_LINES, num_lines)
            n_blocks = -(-num_lines // block)

            def body(jb, _, zr=zr, z=z, nhi=nhi, win=win, reps=reps):
                base = jb * block
                for i in range(block):
                    j = base + i
                    line_pass(
                        tbl_ref[0, j], tbl_ref[1, j], tbl_ref[2, j],
                        tbl_ref[3, j], zr, z, nhi, win, reps,
                    )
                return _

            jax.lax.fori_loop(0, n_blocks, body, 0, unroll=False)
        else:
            for j in range(num_lines):
                lambda_t = float(lines.TRANSITION_WAVELENGTHS[j])
                gamma_j = float(lines.LORENTZIAN_WIDTHS[j])
                lead_j = float(lines.LEADING_CONSTANTS[j])
                line_pass(
                    c_cgs / (lambda_t * 1e8),
                    jnp.asarray(gamma_j, dtype) * inv_sqrt2_sigma,
                    lead_j * voigt_norm,
                    lambda_t * 1e8,
                    zr, z, nhi, win, reps,
                )

    if two_dla:
        raw = jnp.exp(total_ref[...])                       # (P6, T)
    else:
        nhi1 = nhi_ref[0, 0].reshape(1, T)
        raw = jnp.exp(nhi1 * total_ref[...])                # (P6, T)

    # ---- instrumental broadening, 'valid' (voigt.c:294-299)
    absorption = jnp.zeros((P, T), dtype)
    for m, tap in enumerate(taps):
        absorption = absorption + jnp.asarray(tap, dtype) * raw[m : m + P, :]

    # ---- per-sample weights (log_mvnpdf_low_rank.m semantics, masked)
    flux = flux_ref[0, 0].reshape(P, 1)
    mu = mu_ref[0, 0].reshape(P, 1)
    omega2 = omega2_ref[0, 0].reshape(P, 1)
    noise = noise_ref[0, 0].reshape(P, 1)
    maskf = maskf_ref[0, 0].reshape(P, 1)

    a = absorption
    d = omega2 * a * a + noise
    d_safe = d + (1.0 - maskf)
    inv_d = maskf / d_safe
    yc = flux - mu * a
    w_ = a * a * inv_d                                      # (P, T)
    u_ = a * yc * inv_d
    quad0 = jnp.sum(yc * yc * inv_d, axis=0, keepdims=True)     # (1, T)
    logdet_d = jnp.sum(maskf * jnp.log(d_safe), axis=0, keepdims=True)
    n_eff = jnp.sum(maskf)

    # ---- MXU: Gram matrix (lower triangle only) and projected residual
    prec = jax.lax.Precision.HIGHEST  # Mosaic dots support DEFAULT/HIGHEST only
    btri = jax.lax.dot_general(
        ptri_ref[0], w_, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=dtype,
    )                                                       # (k(k+1)/2, T)
    b = jax.lax.dot_general(
        mt_ref[0], u_, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=dtype,
    )                                                       # (k, T)

    # ---- unrolled lazy column-Crout Cholesky + forward solve on the
    # packed lower triangle (see low_rank_mvn.batched_spd_quad_logdet;
    # sample axis on lanes; cols[m] holds L[m:, m], length k - m)
    cols: list = []
    ys: list = []
    quad = jnp.zeros((1, T), dtype)
    logdet = jnp.zeros((1, T), dtype)
    off = 0
    for j in range(k):
        c = btri[off : off + (k - j), :]                    # B[j:, j]
        off += k - j
        y_j = b[j : j + 1, :]
        for m in range(j):
            lmj = cols[m][j - m : j - m + 1, :]             # L[j, m]
            c = c - cols[m][j - m :, :] * lmj
            y_j = y_j - lmj * ys[m]
        djj = c[0:1, :] + 1.0                               # + I
        # (avoid a zero-size slice at the last column — Mosaic rejects it)
        c = jnp.concatenate([djj, c[1:, :]], axis=0) if k - j > 1 else djj
        inv_sqrt = jax.lax.rsqrt(djj)
        cols.append(c * inv_sqrt)
        y_j = y_j * inv_sqrt
        ys.append(y_j)
        quad = quad + y_j * y_j
        logdet = logdet + jnp.log(djj)

    out = -0.5 * (quad0 - quad + logdet_d + logdet + n_eff * LOG_2PI)
    out_ref[0, 0, :] = out[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_lines", "instrument", "tile", "interpret", "window", "line_loop",
        "base_replicates", "pad_align", "g_degree",
    ),
)
def pallas_sample_log_likelihoods(
    ext_wavelengths,   # (B, P+2*width)
    flux,              # (B, P)
    mu,                # (B, P)
    M,                 # (B, P, k)
    omega2,            # (B, P)
    noise_variance,    # (B, P)
    mask,              # (B, P) bool
    z_dlas,            # (B, S)
    nhi,               # (B, S)
    num_lines: int = 3,
    instrument: InstrumentParams | None = None,
    tile: int = SAMPLE_TILE,
    interpret: bool = False,
    window: int | None = None,
    z_dlas2=None,      # (B, S) second absorber redshifts (optional)
    nhi2=None,         # (B, S)
    line_loop: bool | None = None,
    base_replicates: int = 1,
    pad_align: int = 8,
    g_degree: int | None = None,
):
    """Fused per-sample DLA log likelihoods, (B, S).  float32 only.

    ``pad_align`` sets the pixel-axis padding/window granularity (8 =
    the Mosaic sublane group, the production default; 128 reproduces
    the r3 lane-aligned layout for A/B — it only adds masked pad work).
    ``g_degree`` overrides the G-polynomial degree (validation A/B
    hook; production follows faddeeva._G_NUM_DEG).

    ``line_loop`` selects the fori_loop-over-SMEM-constants line pass
    (bit-identical to the unrolled pass on the full grid, FMA-level
    reassociation noise in windowed mode; see UNROLL_LINES).  Default:
    loop iff windowed AND ``num_lines > UNROLL_LINES`` — the only
    configuration whose unrolled form cannot compile.

    With ``window`` set, z_dlas must be ascending along the sample axis
    (the engine sorts and unsorts) and ``window`` must bound each
    tile's line-center pixel spread plus margin (compute_sample_window
    with the TILE as chunk size).

    With ``z_dlas2``/``nhi2`` set, each sample is a PAIR of absorbers
    (two-DLA model, multi_dla.py): optical depths add in-kernel before
    the shared broadening/evidence chain.  The second absorber is
    evaluated full-grid (its redshifts need not be sorted), so
    ``window`` still applies to the first axis only.

    ``base_replicates`` R > 1 (two-DLA only) promises that lanes l and
    l + tile/R of every z_dlas2/nhi2 TILE carry identical values
    (multi_dla.replicate_draw_pattern lays draws out this way; padding
    is re-patterned here).  The kernel then computes the base-axis
    Faddeeva math on tile/R lanes and broadcasts — bit-identical
    results at ~1/R the base-axis transcendental cost.  A violated
    pattern silently evaluates the FIRST tile/R draws for the whole
    tile; callers own the contract.
    """
    if instrument is None:
        instrument = InstrumentParams()
    taps = tuple(float(t) for t in instrument.profile())
    if ext_wavelengths.shape[-1] != flux.shape[-1] + 2 * instrument.width:
        # a padding/width disagreement would pass every in-kernel bounds
        # check (the taps loop reads raw[m:m+P] for any wider grid) and
        # silently evaluate absorption a few pixels off its wavelength
        raise ValueError(
            f"ext_wavelengths has {ext_wavelengths.shape[-1]} px but flux "
            f"has {flux.shape[-1]}; expected exactly 2*width="
            f"{2 * instrument.width} convolution-padding pixels"
        )

    # Tracing this kernel builds a deep Python expression stack (the
    # k=20 Cholesky/solve is fully unrolled: 210 dependent triangle
    # entries) that overflows CPython's default 1000-frame recursion
    # limit when the caller itself sits a few dozen frames deep (seen
    # from the sharded driver's pipelined dispatch).  Raise it for the
    # trace; never lower a user's higher setting.
    import sys

    if sys.getrecursionlimit() < 50_000:
        sys.setrecursionlimit(50_000)

    B, S = z_dlas.shape
    if B == MISCOMPILED_BATCH and B % 2 == 0:
        # Empirical XLA:TPU/Mosaic miscompile at EXACTLY B=512 (v5e,
        # 2026-08): the fused program returns NaN for the LAST batch
        # row — every sample column AND the XLA-computed null evidence
        # of that row — while B=256, 384, 640, 768 and 1024 are
        # bit-clean on identical data, transfers round-trip exactly,
        # and the same row computes fine at other batch sizes.  Split
        # into two kernel calls at the verified B=256 shape (zero
        # extra FLOPs, one extra launch).
        half = B // 2
        halves = [
            pallas_sample_log_likelihoods(
                ext_wavelengths[sl], flux[sl], mu[sl], M[sl], omega2[sl],
                noise_variance[sl], mask[sl], z_dlas[sl], nhi[sl],
                num_lines=num_lines, instrument=instrument,
                z_dlas2=None if z_dlas2 is None else z_dlas2[sl],
                nhi2=None if nhi2 is None else nhi2[sl],
                interpret=interpret, window=window, tile=tile,
                line_loop=line_loop, base_replicates=base_replicates,
                pad_align=pad_align, g_degree=g_degree,
            )
            for sl in (slice(0, half), slice(half, B))
        ]
        return jnp.concatenate(halves, axis=0)
    P = flux.shape[-1]
    P6 = ext_wavelengths.shape[-1]
    k = M.shape[-1]
    dtype = flux.dtype
    if dtype != jnp.float32:
        raise ValueError(
            "the Pallas evidence kernel is float32-only (Mosaic has no "
            f"f64 support); got {dtype}. Use backend='xla' for float64 "
            "parity mode."
        )
    if pad_align <= 0 or pad_align % 8:
        # window starts are pl.multiple_of(pad_align) dynamic SUBLANE
        # slices: anything not a POSITIVE multiple of the 8-row f32
        # sublane group would hand Mosaic an unaligned promise (and a
        # start the clamp math no longer covers); 0 divides the W
        # rounding, negatives invert the clamp
        raise ValueError(
            f"pad_align must be a positive multiple of 8, got {pad_align}"
        )

    # Pad the pixel axis so the EXTENDED grid P6 is a multiple of the
    # window-slice alignment: the windowed kernel's dynamic window start
    # is clamped to pad_align-aligned values <= P6 - W (with W itself
    # rounded up to a pad_align multiple), so coverage ends
    # (P6 - W) % pad_align px short of the red edge — an unaligned grid
    # whose remainder exceeds the window margin would leave the
    # highest-z samples' line cores UNCORRECTED, accumulating the
    # rational G's negative core as positive optical depth and
    # overflowing exp to inf.  Padding is masked (zero weight) and
    # replicates the last wavelength, so evidences are unchanged.  The
    # production alignment is the 8-row sublane group (the window slices
    # pixel SUBLANES — lam rides in column layout precisely so no lane
    # dim is ever dynamically sliced): at the BOSS grid this pads
    # 1292 -> 1296 px where the r3 lane-aligned kernel padded to 1408,
    # ~8% of every elementwise/MXU op spent on masked pad rows.
    # The PADDING alignment is 16 even though windows slice at 8: the
    # R>=4 pixel fold needs P6 % fold == 0 AND (P6 // fold) sublane-
    # aligned (the kernel silently degrades the fold otherwise), so
    # P6 % 16 == 0 guarantees the production fold=2 on every grid —
    # and it must NOT depend on base_replicates, because the padded
    # reduction-tree shape must be identical at every R for the
    # replicated kernel's bit-identity-vs-R=1 contract
    # (tests/test_base_replicates.py).  R=8's fold=4 may degrade to 2
    # on grids that are not 32-multiples; R=4 is the measured knee.
    align = max(pad_align, 16)
    ppad = (-P6) % align
    if ppad:
        last = lambda a: jnp.repeat(a[:, -1:], ppad, axis=1)
        ext_wavelengths = jnp.concatenate(
            [ext_wavelengths, last(ext_wavelengths)], axis=1
        )
        zeros = jnp.zeros((B, ppad), dtype)
        flux = jnp.concatenate([flux, zeros], axis=1)
        mu = jnp.concatenate([mu, zeros], axis=1)
        omega2 = jnp.concatenate([omega2, zeros], axis=1)
        noise_variance = jnp.concatenate([noise_variance, zeros], axis=1)
        mask = jnp.concatenate(
            [mask, jnp.zeros((B, ppad), bool)], axis=1
        )
        M = jnp.concatenate([M, jnp.zeros((B, ppad, k), dtype)], axis=1)
        P += ppad
        P6 += ppad

    two_dla = z_dlas2 is not None
    if base_replicates != 1:
        if not two_dla:
            raise ValueError("base_replicates applies to two-DLA mode only")
        if base_replicates not in (2, 4, 8) or tile % base_replicates:
            raise ValueError(
                f"base_replicates must be 2, 4, or 8 and divide the tile "
                f"(got {base_replicates} at tile {tile})"
            )
    pad = (-S) % tile
    if pad:
        # replicate the LAST sample: with window mode's z-ascending
        # contract this keeps the final tile sorted, so pad columns stay
        # inside that tile's window and compute finite (discarded)
        # values — first-column padding would put the lowest-z core
        # outside the window and overflow exp in the pad lanes
        rep = lambda a: jnp.concatenate(
            [a, jnp.repeat(a[:, -1:], pad, axis=1)], axis=1
        )
        z_dlas, nhi = rep(z_dlas), rep(nhi)
        if two_dla:
            z_dlas2, nhi2 = rep(z_dlas2), rep(nhi2)
            if base_replicates > 1:
                # last-sample padding breaks the replication pattern in
                # the final tile; re-impose it by mirroring the first
                # width-block onto the others.  Real lanes in later
                # blocks already equal their first-block twins by the
                # caller contract (a no-op for them); pad lanes are
                # discarded by the [:, :S] slice below, so any finite
                # value serves
                t0 = S + pad - tile
                width = tile // base_replicates

                def fix(a):
                    first = a[:, t0 : t0 + width]
                    return a.at[:, t0 + width :].set(
                        jnp.concatenate(
                            [first] * (base_replicates - 1), axis=1
                        )
                    )

                z_dlas2, nhi2 = fix(z_dlas2), fix(nhi2)
    S_pad = S + pad

    maskf = mask.astype(dtype)
    # neutralize masked pixels against non-finite values (NaN flux at
    # ivar==0 pixels, inf noise variance, omega2 = exp(2*log_omega)
    # overflowing where the model is extrapolated far beyond the rest
    # grid into a short spectrum's masked padding): the kernel relies on
    # maskf multiplication, but NaN*0 = NaN and log(inf)*0 = NaN in
    # logdet_d; the XLA path uses where() guards
    flux = jnp.where(mask, flux, 0.0)
    noise_variance = jnp.where(mask, noise_variance, 0.0)
    mu = jnp.where(mask, mu, 0.0)
    omega2 = jnp.where(mask, omega2, 0.0)
    # leading singleton dims keep every block's trailing two dims equal
    # to the array's (the Mosaic tiling constraint for (1, X) blocks)
    expand = lambda a: a[:, None, :]
    mt = jnp.swapaxes(M, -1, -2)                       # (B, k, P)
    # lower-triangle pair products, column-major packing
    li = np.concatenate([np.arange(j, k) for j in range(k)])
    lj = np.concatenate([np.full(k - j, j) for j in range(k)])
    ptri = M[..., li] * M[..., lj]                     # (B, P, k(k+1)/2)
    ptri = jnp.swapaxes(ptri, -1, -2)                  # (B, k(k+1)/2, P)

    grid = (B, S_pad // tile)
    spec_block = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i, t: (i, *([0] * len(shape))),
        memory_space=pltpu.VMEM,
    )
    tile_block = pl.BlockSpec(
        (1, 1, tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM
    )

    use_loop = (
        num_lines > UNROLL_LINES and window is not None
        if line_loop is None
        else bool(line_loop)
    )
    loop_inputs, loop_specs = [], []
    if use_loop:
        # pad the table to a whole number of unroll blocks: the grouped
        # loop body indexes every column of its last block, and the pad
        # columns must be real (zero-leading-constant) entries — an
        # out-of-bounds SMEM read returns garbage constants on hardware
        # (misplaced windows, nonzero scales -> inf/NaN)
        block = min(UNROLL_LINES, num_lines)
        padded_lines = -(-num_lines // block) * block
        loop_inputs.append(
            jnp.asarray(_line_tables(num_lines, pad_to=padded_lines))
        )
        loop_specs.append(
            pl.BlockSpec(
                (4, padded_lines), lambda i, t: (0, 0),
                memory_space=pltpu.SMEM,
            )
        )
    sample_inputs = [expand(z_dlas), expand(nhi)]
    if two_dla:
        sample_inputs += [expand(z_dlas2), expand(nhi2)]
    # Trace the kernel with x64 promotion OFF regardless of the caller's
    # jax_enable_x64: weak Python int/float literals inside the kernel
    # otherwise become 64-bit consts, which Mosaic cannot legalize
    # ("failed to legalize operation 'func.return'" on i64 scalars; the
    # convert path recurses without terminating).  All kernel inputs are
    # explicitly 32-bit already, so this changes only literal promotion.
    # (jax._src.config.enable_x64 is the only context-manager form; the
    # old jax.experimental.{enable,disable}_x64 aliases were removed.)
    from jax._src.config import enable_x64 as _enable_x64_scope

    with _enable_x64_scope(False):
        out = pl.pallas_call(
            functools.partial(
                _evidence_kernel, num_lines=num_lines, taps=taps, k=k,
                window=window, pixel_spacing=instrument.pixel_spacing,
                two_dla=two_dla, line_loop=use_loop,
                base_replicates=base_replicates, pad_align=pad_align,
                g_degree=g_degree,
            ),
            grid=grid,
            in_specs=[
                spec_block((P6, 1)),
                spec_block((1, P)),
                spec_block((1, P)),
                spec_block((1, P)),
                spec_block((1, P)),
                spec_block((1, P)),
                spec_block((k, P)),
                spec_block((k * (k + 1) // 2, P)),
            ] + loop_specs + [tile_block] * len(sample_inputs),
            out_specs=tile_block,
            out_shape=jax.ShapeDtypeStruct((B, 1, S_pad), dtype),
            scratch_shapes=[pltpu.VMEM((P6, tile), dtype)],
            interpret=interpret,
        )(
            ext_wavelengths[:, :, None], expand(flux), expand(mu),
            expand(omega2), expand(noise_variance), expand(maskf),
            mt, ptri, *loop_inputs, *sample_inputs,
        )
    return out[:, 0, :S]
