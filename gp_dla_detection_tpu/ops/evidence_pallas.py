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
(k^2, P) x (P, T) MXU contraction against the precomputed full
pair-product matrix, so no in-kernel gather is needed to symmetrize.

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
from .faddeeva import wofz_real_fast
from .low_rank_mvn import LOG_2PI

__all__ = ["pallas_sample_log_likelihoods", "SAMPLE_TILE"]

SAMPLE_TILE = 256
_SQRT_2 = float(np.sqrt(2.0))
_SQRT_2PI = float(np.sqrt(2.0 * np.pi))


def _evidence_kernel(
    lam_ref,      # (1, P6)   extended wavelengths [Å]
    flux_ref,     # (1, P)
    mu_ref,       # (1, P)
    omega2_ref,   # (1, P)
    noise_ref,    # (1, P)
    maskf_ref,    # (1, P)    1.0 = valid pixel
    mt_ref,       # (1, k, P) M transposed
    ptri_ref,     # (1, k*k, P) full pair products M_i * M_j
    z_ref,        # (1, T)    absorber redshifts
    nhi_ref,      # (1, T)    column densities
    out_ref,      # (1, T)    log likelihoods
    *,
    num_lines: int,
    taps: tuple,
    k: int,
):
    dtype = flux_ref.dtype
    P6 = lam_ref.shape[-1]
    P = flux_ref.shape[-1]
    T = z_ref.shape[-1]
    width = (len(taps) - 1) // 2

    lam = lam_ref[0].reshape(P6, 1)
    z = z_ref[0].reshape(1, T)
    nhi = nhi_ref[0].reshape(1, T)

    c_cgs = jnp.asarray(lines.C_CGS, dtype)
    inv_sqrt2_sigma = jnp.asarray(
        1.0 / (_SQRT_2 * lines.DOPPLER_SIGMA), dtype
    )
    voigt_norm = 1.0 / (lines.DOPPLER_SIGMA * _SQRT_2PI)

    # ---- Voigt optical depth over the extended grid (voigt.c:277-291)
    total = jnp.zeros((P6, T), dtype)
    for j in range(num_lines):
        lambda_t = float(lines.TRANSITION_WAVELENGTHS[j])
        gamma_j = float(lines.LORENTZIAN_WIDTHS[j])
        lead_j = float(lines.LEADING_CONSTANTS[j])
        mult = (c_cgs / (lambda_t * 1e8)) / (1.0 + z)      # (1, T)
        velocity = lam * mult - c_cgs                       # (P6, T)
        x = velocity * inv_sqrt2_sigma
        y = jnp.asarray(gamma_j, dtype) * inv_sqrt2_sigma
        h = wofz_real_fast(x, jnp.full_like(x, y))
        total = total - (lead_j * voigt_norm) * h

    raw = jnp.exp(nhi * total)                              # (P6, T)

    # ---- instrumental broadening, 'valid' (voigt.c:294-299)
    absorption = jnp.zeros((P, T), dtype)
    for m, tap in enumerate(taps):
        absorption = absorption + jnp.asarray(tap, dtype) * raw[m : m + P, :]

    # ---- per-sample weights (log_mvnpdf_low_rank.m semantics, masked)
    flux = flux_ref[0].reshape(P, 1)
    mu = mu_ref[0].reshape(P, 1)
    omega2 = omega2_ref[0].reshape(P, 1)
    noise = noise_ref[0].reshape(P, 1)
    maskf = maskf_ref[0].reshape(P, 1)

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

    # ---- MXU: Gram matrix and projected residual
    prec = jax.lax.Precision.HIGH
    bfull = jax.lax.dot_general(
        ptri_ref[0], w_, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=dtype,
    )                                                       # (k*k, T)
    b = jax.lax.dot_general(
        mt_ref[0], u_, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=dtype,
    )                                                       # (k, T)

    # ---- unrolled lazy column-Crout Cholesky + forward solve
    # (see low_rank_mvn.batched_spd_quad_logdet; sample axis on lanes)
    cols: list = []
    ys: list = []
    quad = jnp.zeros((1, T), dtype)
    logdet = jnp.zeros((1, T), dtype)
    for j in range(k):
        c = bfull[j * k : (j + 1) * k, :]                   # column j
        y_j = b[j : j + 1, :]
        for m in range(j):
            c = c - cols[m] * cols[m][j : j + 1, :]
            y_j = y_j - cols[m][j : j + 1, :] * ys[m]
        djj = c[j : j + 1, :] + 1.0                         # + I
        c = c + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0) == j, 1.0, 0.0
        )
        inv_sqrt = jax.lax.rsqrt(djj)
        cols.append(c * inv_sqrt)
        y_j = y_j * inv_sqrt
        ys.append(y_j)
        quad = quad + y_j * y_j
        logdet = logdet + jnp.log(djj)

    out = -0.5 * (quad0 - quad + logdet_d + logdet + n_eff * LOG_2PI)
    out_ref[0, :] = out[0]


@functools.partial(
    jax.jit,
    static_argnames=("num_lines", "instrument", "tile", "interpret"),
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
):
    """Fused per-sample DLA log likelihoods, (B, S).  float32 only."""
    if instrument is None:
        instrument = InstrumentParams()
    taps = tuple(float(t) for t in instrument.profile())

    B, S = z_dlas.shape
    P = flux.shape[-1]
    P6 = ext_wavelengths.shape[-1]
    k = M.shape[-1]
    dtype = flux.dtype

    pad = (-S) % tile
    if pad:
        z_dlas = jnp.concatenate(
            [z_dlas, jnp.repeat(z_dlas[:, :1], pad, axis=1)], axis=1
        )
        nhi = jnp.concatenate(
            [nhi, jnp.repeat(nhi[:, :1], pad, axis=1)], axis=1
        )
    S_pad = S + pad

    maskf = mask.astype(dtype)
    mt = jnp.swapaxes(M, -1, -2)                       # (B, k, P)
    ptri = (M[..., :, None] * M[..., None, :]).reshape(B, P, k * k)
    ptri = jnp.swapaxes(ptri, -1, -2)                  # (B, k*k, P)

    grid = (B, S_pad // tile)
    spec_block = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i, t: (i, *([0] * len(shape))),
        memory_space=pltpu.VMEM,
    )
    tile_block = pl.BlockSpec(
        (1, tile), lambda i, t: (i, t), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(
            _evidence_kernel, num_lines=num_lines, taps=taps, k=k
        ),
        grid=grid,
        in_specs=[
            spec_block((P6,)),
            spec_block((P,)),
            spec_block((P,)),
            spec_block((P,)),
            spec_block((P,)),
            spec_block((P,)),
            spec_block((k, P)),
            spec_block((k * k, P)),
            tile_block,
            tile_block,
        ],
        out_specs=tile_block,
        out_shape=jax.ShapeDtypeStruct((B, S_pad), dtype),
        interpret=interpret,
    )(
        ext_wavelengths, flux, mu, omega2, noise_variance, maskf,
        mt, ptri, z_dlas, nhi,
    )
    return out[:, :S]
