"""QMC (z_DLA offset, log N_HI) prior samples.

Rebuild of generate_dla_samples.m:1-63: a scrambled 2-D Halton sequence
whose first dimension is used directly as the uniform normalized z_DLA
offset and whose second dimension is pushed through the inverse CDF of a
mixture prior over log10 N_HI:

    p(log N) = alpha * (quadratic-log-fit to a KDE of observed
               concordance-catalog log N values, normalized on
               [fit_min, 25]) + (1 - alpha) * U[uniform_min, uniform_max]

Differences from the reference, by design:
  - Halton scrambling: we implement the deterministic reverse-radix
    (RR2, Kocis & Whiten 1997) digit permutation that MATLAB's
    ``scramble(haltonset(2),'rr2')`` names; since MATLAB's internal
    permutation tables are not published, bit-exact sample parity with a
    specific MATLAB run is obtained by importing its dla_samples.mat
    with :meth:`DLASamples.from_matlab` instead of regenerating.
  - The 10,000 per-sample ``fzero`` root-finds (generate_dla_samples.m:50-54)
    become one vectorized inverse-CDF interpolation on a dense
    Simpson-integrated grid (~1e-10 accurate).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from .params import DLASamplingParams, Parameters

__all__ = ["DLASamples", "halton_rr2", "generate_dla_samples", "matlab_ksdensity"]


def _rr2_permutation(base: int) -> np.ndarray:
    """Reverse-radix-2 digit permutation for a prime base.

    Bit-reverse each digit value in ceil(log2(base)) bits and keep the
    values < base, preserving order (Kocis & Whiten 1997).
    """
    nbits = max(1, int(np.ceil(np.log2(base))))
    values = np.arange(2**nbits)
    reversed_bits = np.zeros_like(values)
    v = values.copy()
    for _ in range(nbits):
        reversed_bits = (reversed_bits << 1) | (v & 1)
        v >>= 1
    return reversed_bits[reversed_bits < base]


def halton_rr2(n: int, dims: int = 2, scramble: bool = True) -> np.ndarray:
    """First n points of the (RR2-scrambled) Halton sequence, (n, dims).

    Point 0 is the origin, matching MATLAB haltonset's default Skip=0
    (generate_dla_samples.m:8-13 uses sequence(1:n, :)).
    """
    primes = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    out = np.zeros((n, dims))
    idx = np.arange(n, dtype=np.int64)
    for d in range(dims):
        base = primes[d]
        perm = _rr2_permutation(base) if scramble else np.arange(base)
        i = idx.copy()
        factor = 1.0 / base
        value = np.zeros(n)
        while np.any(i > 0):
            digit = i % base
            value += perm[digit] * factor
            factor /= base
            i //= base
        out[:, d] = value
    return out


def matlab_ksdensity(data: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Gaussian KDE with MATLAB ksdensity's default bandwidth.

    MATLAB's default is Silverman's normal-optimal width with a robust
    scale estimate: sig = median(|x - median(x)|)/0.6745 (falling back
    to std when degenerate), bw = sig * (4/(3n))^(1/5).
    """
    data = np.asarray(data, np.float64).ravel()
    n = data.size
    med = np.median(data)
    sig = np.median(np.abs(data - med)) / 0.6745
    if sig <= 0:
        sig = np.std(data, ddof=1)
    bw = sig * (4.0 / (3.0 * n)) ** 0.2
    if not np.isfinite(bw) or bw <= 0:
        raise ValueError(
            f"degenerate KDE bandwidth (bw={bw!r}) — the {n} data "
            "point(s) have zero spread; the KDE mixture component needs "
            "at least two distinct observed values"
        )
    z = (points[:, None] - data[None, :]) / bw
    return np.exp(-0.5 * z**2).sum(axis=1) / (n * bw * np.sqrt(2 * np.pi))


def _simpson_cumulative(y: np.ndarray, dx: float) -> np.ndarray:
    """Cumulative integral with local parabolic (Simpson-grade) correction."""
    # composite: integrate each interval with the trapezoid rule plus a
    # third-order endpoint correction from neighboring slopes
    cum = np.zeros_like(y)
    trap = 0.5 * dx * (y[1:] + y[:-1])
    # derivative estimates (central where possible)
    dy = np.gradient(y, dx)
    corr = -(dx**2) / 12.0 * (dy[1:] - dy[:-1])
    cum[1:] = np.cumsum(trap + corr)
    return cum


@dataclass(frozen=True)
class DLASamples:
    """The dla_samples stage artifact (generate_dla_samples.m:56-63)."""

    offset_samples: np.ndarray   # (S,) uniform z-offset samples in [0, 1)
    log_nhi_samples: np.ndarray  # (S,) log10 N_HI
    nhi_samples: np.ndarray      # (S,) N_HI = 10**log_nhi
    config: DLASamplingParams = dataclasses.field(default_factory=DLASamplingParams)

    def __len__(self) -> int:
        return self.offset_samples.shape[0]

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path,
            offset_samples=self.offset_samples,
            log_nhi_samples=self.log_nhi_samples,
            nhi_samples=self.nhi_samples,
            config=json.dumps(dataclasses.asdict(self.config)),
        )

    @classmethod
    def from_matlab(cls, path: str | Path) -> "DLASamples":
        """Import a reference-produced dla_samples.mat (v7.3) — the
        fixture route for bit-exact QMC parity with a MATLAB run
        (MATLAB's internal 'rr2' scramble permutations are unpublished,
        so regeneration cannot be bit-identical; see module docstring).
        """
        from .io.matio import read_mat

        raw = read_mat(path)
        get = lambda k: np.asarray(raw[k]).ravel()
        # only pass keys present in the file; DLASamplingParams supplies
        # the defaults (single source of truth)
        cfg_kwargs = {
            name: float(get(name)[0])
            for name in (
                "alpha",
                "uniform_min_log_nhi",
                "uniform_max_log_nhi",
                "fit_min_log_nhi",
                "fit_max_log_nhi",
            )
            if name in raw
        }
        cfg = DLASamplingParams(
            num_dla_samples=int(get("offset_samples").size), **cfg_kwargs
        )
        return cls(
            offset_samples=get("offset_samples"),
            log_nhi_samples=get("log_nhi_samples"),
            nhi_samples=get("nhi_samples")
            if "nhi_samples" in raw
            else 10.0 ** get("log_nhi_samples"),
            config=cfg,
        )

    @classmethod
    def load(cls, path: str | Path) -> "DLASamples":
        with np.load(Path(path)) as f:
            cfg = (
                DLASamplingParams(**json.loads(str(f["config"])))
                if "config" in f.files
                else DLASamplingParams()
            )
            return cls(
                offset_samples=f["offset_samples"],
                log_nhi_samples=f["log_nhi_samples"],
                nhi_samples=f["nhi_samples"],
                config=cfg,
            )


def generate_dla_samples(
    observed_log_nhis: np.ndarray,
    params: Parameters | None = None,
    grid_points: int = 200_001,
) -> DLASamples:
    """Generate the QMC prior samples (generate_dla_samples.m:8-63).

    Args:
      observed_log_nhis: log10 N_HI values of DLAs in the training
        (concordance) catalog, used for the KDE component
        (generate_dla_samples.m:23-28).
      grid_points: resolution of the dense CDF grid used for the
        vectorized inverse transform.
    """
    if params is None:
        params = Parameters()
    cfg = params.dla_sampling

    observed_log_nhis = np.atleast_1d(np.asarray(observed_log_nhis, float))
    if observed_log_nhis.size == 0:
        raise ValueError(
            "generate_dla_samples needs at least one observed log N_HI "
            "for the KDE mixture component — the DLA catalog used for "
            "the prior is empty (check dla_catalog_name / catalog "
            "cross-match)"
        )

    sequence = halton_rr2(cfg.num_dla_samples, dims=2)
    offset_samples = sequence[:, 0]
    u2 = sequence[:, 1]

    # quadratic fit to log KDE over [fit_min, fit_max] (gen..samples.m:30-34)
    x = np.linspace(cfg.fit_min_log_nhi, cfg.fit_max_log_nhi, 1000)
    kde_pdf = matlab_ksdensity(observed_log_nhis, x)
    coeffs = np.polyfit(x, np.log(kde_pdf), 2)

    # mixture pdf on a dense grid over [fit_min, 25] (gen..samples.m:36-47)
    upper = 25.0
    grid = np.linspace(cfg.fit_min_log_nhi, upper, grid_points)
    dx = grid[1] - grid[0]
    unnormalized = np.exp(np.polyval(coeffs, grid))
    Z = _simpson_cumulative(unnormalized, dx)[-1]
    uniform_pdf = np.where(
        (grid >= cfg.uniform_min_log_nhi) & (grid <= cfg.uniform_max_log_nhi),
        1.0 / (cfg.uniform_max_log_nhi - cfg.uniform_min_log_nhi),
        0.0,
    )
    mixture = cfg.alpha * unnormalized / Z + (1.0 - cfg.alpha) * uniform_pdf

    cdf = _simpson_cumulative(mixture, dx)
    # the Simpson gradient correction can overshoot by ~1e-8 in the
    # interval just past the uniform component's step down at
    # uniform_max_log_nhi, leaving one locally DECREASING cdf step —
    # np.interp requires increasing xp, and a u2 landing in the inverted
    # band would get an arbitrary bracket.  Monotonize (the change is at
    # the correction's own error floor).
    cdf = np.maximum.accumulate(cdf)
    cdf /= cdf[-1]

    # vectorized inverse transform (replaces the per-sample fzero loop,
    # generate_dla_samples.m:50-54)
    log_nhi_samples = np.interp(u2, cdf, grid)

    return DLASamples(
        offset_samples=offset_samples,
        log_nhi_samples=log_nhi_samples,
        nhi_samples=10.0**log_nhi_samples,
        config=cfg,
    )
