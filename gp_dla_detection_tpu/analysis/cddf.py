"""Column-density statistics from the DLA posterior samples.

Rebuild of the reference's CDDF engine (CDDF_analysis/calc_cddf.py:37-1081):
from the per-spectrum posterior sample likelihoods, compute

  - the column density distribution function f(N) = n/ΔN/ΔX,
  - the line density dN/dX,
  - Omega_DLA (both by CDDF summation and by direct first-moment sum),

with full Bayesian confidence intervals from the exact Poisson-binomial
count distribution (DFT) convolved with a Le Cam Poisson approximation
for the low-probability tail, plus z-stratified bootstrap resampling,
SNR/redshift/proximity filters, and optional noisy-pixel path excision.

Known reference warts intentionally fixed rather than replicated
(SURVEY.md section 2 #15): the ``np.logaddexp`` misuse on the 2-DLA
path (calc_cddf.py:274 — should be a reduction, here scipy logsumexp),
the dead ``if True or ...`` branch (:993), and deprecated ``np.bool``
(:83).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from .cosmology import H100_PER_S, OMEGA_M_WMAP9, AbsorptionPath, rho_crit
from .pb import combine_with_poisson, interval, pdf_confidence, poisson_binomial_pdf

__all__ = ["DLACatalogue", "compute_all_snrs", "compute_pixel_noise"]

PROTON_MASS = 1.67262178e-24      # g (calc_cddf.py:535)
LIGHT_CMS = 2.99e10               # cm/s as used by the reference (:539)
LYB_OVER_LYA = 1026.72 / 1215.67  # calc_cddf.py:694-698


class DLACatalogue:
    """Posterior DLA catalogue statistics (calc_cddf.py DLACatalogue).

    Constructed from arrays (decoupled from storage):

    Args:
      p_dla: (N,) P(>=1 DLA | D) per processed spectrum.
      min_z_dlas, max_z_dlas: (N,) per-spectrum search ranges.
      sample_log_likelihoods: (N, S) per-sample DLA log likelihoods.
      log_likelihoods_dla: (N,) total DLA log evidence per spectrum.
      offset_samples, log_nhi_samples: (S,) the QMC prior samples.
      snrs: (N,) signal-to-noise ratios (optional; None disables cuts).
      pixel_noise: optional list of per-spectrum normalized pixel noise
        arrays spanning [min_z, max_z] (enables noisy-pixel excision).
      sample_log_likelihoods_2, base_sample_inds, p_dla_2: optional
        second-DLA posterior (the multi-DLA output format of later
        pipeline versions, calc_cddf.py:40,102-116,248-277): per-sample
        log likelihoods of the two-DLA model, the index of the second
        DLA's (z, logN) sample for each first-DLA sample, and
        P(exactly 2 DLAs) per spectrum.
    """

    def __init__(
        self,
        p_dla,
        min_z_dlas,
        max_z_dlas,
        sample_log_likelihoods,
        log_likelihoods_dla,
        offset_samples,
        log_nhi_samples,
        snrs=None,
        pixel_noise=None,
        snr_thresh: float = -2.0,
        lowzcut: bool = False,
        omega_m: float = OMEGA_M_WMAP9,
        sample_log_likelihoods_2=None,
        base_sample_inds=None,
        p_dla_2=None,
    ):
        self.p_dla = np.asarray(p_dla, np.float64)
        self._z_min = np.asarray(min_z_dlas, np.float64)
        self._z_max = np.asarray(max_z_dlas, np.float64)
        n, s = np.shape(sample_log_likelihoods)

        # thresholds (calc_cddf.py:42-56)
        self.p_thresh_spec = 5e-2
        self.p_thresh_sample = 1e-4
        self.p_switch = 0.25          # Le Cam 1960
        self.bins_per_z = 6
        self.lowzcut = lowzcut
        self.proximity_zone = 0.1
        self.noise_thresh = 0.5**2
        self.snr_thresh = snr_thresh
        self.tophat_prior = False

        # normalized per-sample probabilities: sum_s exp(lnl) == 1
        # (calc_cddf.py:87-99).  Memory discipline: at full DR12Q scale
        # one (N, S) float64 matrix is 13 GB, so the normalization runs
        # IN PLACE on an owned copy and the verification is blockwise —
        # the naive expression peaks at 2-3 extra matrices and OOM'd a
        # 125 GB host on the 162k two-stage catalogue.
        sll = np.asarray(sample_log_likelihoods)
        sll = sll.copy() if sll.dtype == np.float64 else sll.astype(np.float64)
        sll -= np.asarray(log_likelihoods_dla, np.float64)[:, None]
        sll -= np.log(s)
        self.log_norm_like = sll
        keep = self.p_dla > self.p_thresh_spec
        for lo in range(0, n, 16384):
            rows = self.log_norm_like[lo:lo + 16384][keep[lo:lo + 16384]]
            if rows.size == 0:
                continue
            check = np.exp(rows).sum(axis=1)
            assert np.all(
                (check > 0.95) & (check < 1.05)
            ), "sample probs unnormalized"

        self.z_offsets = np.asarray(offset_samples, np.float64)
        self.lnhi_vals = np.asarray(log_nhi_samples, np.float64)
        self.snrs = None if snrs is None else np.asarray(snrs, np.float64)
        self.pixel_noise = pixel_noise
        self.filter_noisy_pixels = pixel_noise is not None
        self.condition = np.ones(n, dtype=bool)

        # optional second-DLA posterior (calc_cddf.py:102-116, with the
        # reference's np.logaddexp normalization bug replaced by a real
        # logsumexp, and its NaN masking kept: NaN samples are absorber
        # pairs that were too close to evaluate)
        self.second_dla = sample_log_likelihoods_2 is not None
        if self.second_dla:
            ll2 = np.asarray(sample_log_likelihoods_2)
            ll2 = (
                ll2.copy() if ll2.dtype == np.float64
                else ll2.astype(np.float64)
            )
            np.copyto(ll2, -1e30, where=~np.isfinite(ll2))
            ll2 += self.log_norm_like
            # blockwise in-place logsumexp normalization (the scipy
            # call allocates a full (N, S) exp temporary)
            for lo in range(0, n, 4096):
                blk = ll2[lo:lo + 4096]
                m = blk.max(axis=1, keepdims=True)
                lse = m + np.log(
                    np.exp(blk - m).sum(axis=1, keepdims=True)
                )
                blk -= lse
            self.log_norm_like_2 = ll2
            # fancy indexing accepts any integer dtype — keep the wire
            # format's (int32/uint16) instead of widening to 13 GB int64
            bsi = np.asarray(base_sample_inds)
            if not np.issubdtype(bsi.dtype, np.integer):
                bsi = bsi.astype(np.int64)
            self.base_sample_inds = bsi
            self.p_dla_2 = np.asarray(p_dla_2, np.float64)

        self._path = AbsorptionPath(omega_m)
        self.do_resample = False
        self._resample = None
        self._rng = np.random.default_rng(0)

    # ------------------------------------------------------------------
    @classmethod
    def from_run(
        cls,
        workdir: str | Path,
        test_set_name: str = "dr12q",
        multi: bool = False,
        **kwargs,
    ) -> "DLACatalogue":
        """Load from pipeline.py stage artifacts.

        ``multi=True`` loads the {0,1,2}-DLA stage artifact
        (processed_qsos_multi_<set>.npz) and enables the second-DLA
        statistics path.
        """
        workdir = Path(workdir)
        fname = (
            f"processed_qsos_multi_{test_set_name}.npz"
            if multi
            else f"processed_qsos_{test_set_name}.npz"
        )
        with np.load(workdir / fname) as f:
            results = {k: f[k] for k in f.files}
        if "sample_log_likelihoods_dla" not in results:
            from ..cddf_inputs import CDDFInputs

            if multi and CDDFInputs.npz_present(results):
                # lean run that device-reduced the CDDF inputs
                # (ShardedRunConfig.store_cddf_inputs): the statistics
                # run from the binned masses + exact top-k entries
                from .lean_catalogue import LeanDLACatalogue

                with np.load(workdir / "dla_samples.npz") as f:
                    offsets = f["offset_samples"]
                    lnhi = f["log_nhi_samples"]
                snrs = None
                snrs_path = workdir / "snrs.npz"
                if snrs_path.exists():
                    with np.load(snrs_path) as f:
                        snrs = f["snrs"]
                return LeanDLACatalogue(
                    results["p_dlas"],
                    results["min_z_dlas"],
                    results["max_z_dlas"],
                    CDDFInputs.from_npz_dict(results),
                    offsets,
                    lnhi,
                    snrs=snrs,
                    p_dla_2=results["multi_model_posteriors"][:, 2],
                    **kwargs,
                )
            raise ValueError(
                f"{fname} was written by a lean (catalog-only) run and "
                "has no sample_log_likelihoods_dla matrix; the CDDF "
                "marginalizes posterior sample weights (calc_cddf.py) — "
                "rerun with store_sample_likelihoods=True, or run the "
                "fused lean two-stage driver with store_cddf_inputs="
                "True to device-reduce the statistics' inputs"
            )
        if multi:
            kwargs.setdefault(
                "sample_log_likelihoods_2",
                results["sample_log_likelihoods_dla2"],
            )
            kwargs.setdefault("base_sample_inds", results["base_sample_inds"])
            kwargs.setdefault("p_dla_2", results["multi_model_posteriors"][:, 2])
        with np.load(workdir / "dla_samples.npz") as f:
            offsets = f["offset_samples"]
            lnhi = f["log_nhi_samples"]
        snrs_path = workdir / "snrs.npz"
        snrs = None
        if snrs_path.exists():
            with np.load(snrs_path) as f:
                snrs = f["snrs"]
        return cls(
            results["p_dlas"],
            results["min_z_dlas"],
            results["max_z_dlas"],
            results["sample_log_likelihoods_dla"],
            results["log_likelihoods_dla"],
            offsets,
            lnhi,
            snrs=snrs,
            **kwargs,
        )

    # --- resampling (calc_cddf.py:126-184) ----------------------------

    def resample(self, do_it: bool = True, nspec: int = 0, seed=None) -> None:
        """Bootstrap: draw a new spectrum sample with replacement,
        stratified in z_max so rare high-z quasars keep representation.

        Works with the second-DLA posterior too (the reference raises
        there, calc_cddf.py:128): every per-spectrum array — first- and
        second-DLA likelihoods, base sample indices, p(2 DLAs) — is read
        through the same resample view, so a bootstrap draw carries a
        sightline's whole multi-DLA posterior with it."""
        self.do_resample = do_it
        if not do_it:
            return
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        n = np.size(self.p_dla)
        if nspec == 0:
            nspec = n
        z_max = self._z_max
        newmax = np.max(z_max) - 0.2
        while newmax > np.min(z_max) and np.sum(z_max > newmax) * nspec / n < 10:
            newmax -= 0.2
        newmin = np.min(self._z_min) + 0.2
        # (bounded, unlike calc_cddf.py:146-148: degenerate z
        # distributions would loop forever there)
        while newmin < np.max(self._z_min) and (
            np.sum(self._z_min > newmin) * nspec / n < 10
        ):
            newmin += 0.2
        newmin = min(newmin, newmax - 1e-3)
        z_bins = np.linspace(newmin, newmax, 10)
        z_bins[0] = np.min(self._z_min)
        z_bins[-1] = np.max(z_max)
        out = np.empty(nspec, dtype=int)
        total = 0
        for zm, zp in zip(z_bins[:-1], z_bins[1:]):
            ii = np.flatnonzero((z_max > zm) & (z_max <= zp))
            nthis = min(int(np.floor(ii.size / n * nspec)), nspec - total)
            if nthis <= 0:
                continue
            out[total : total + nthis] = ii[self._rng.integers(0, ii.size, nthis)]
            total += nthis
        # fill any remainder (rounding) uniformly
        if total < nspec:
            out[total:] = self._rng.integers(0, n, nspec - total)
        self._resample = out

    def _view(self, arr):
        return arr[self._resample] if self.do_resample else arr

    def _idx(self, spec):
        """Per-spectrum index into the STORED arrays, resolving bootstrap
        resampling.  Accessors use this instead of ``_view(arr)[spec]``,
        which would fancy-index a full copy of the array (for the (N, S)
        likelihood matrix that is ~13 GB per single-row access at DR12
        scale) before selecting one row."""
        return self._resample[spec] if self.do_resample else spec

    def z_min(self, spec=None):
        if spec is None:
            return self._view(self._z_min)
        return self._z_min[self._idx(spec)]

    def z_max(self, spec=None):
        if spec is None:
            return self._view(self._z_max)
        return self._z_max[self._idx(spec)]

    def _log_norm_like(self, spec, second=False):
        arr = self.log_norm_like_2 if second else self.log_norm_like
        return arr[self._idx(spec)]

    def _p_dla(self, second=False):
        if second:
            return self._view(self.p_dla_2)
        return self._view(self.p_dla)

    # --- filters (calc_cddf.py:283-299) -------------------------------

    def _filter_snr_spectra(self):
        cond = self._view(self.condition)
        if self.snrs is None:
            return cond
        return (self._view(self.snrs) > self.snr_thresh) & cond

    def filter_dla_spectra(self, second=False):
        return np.flatnonzero(
            (self._p_dla(second=second) > self.p_thresh_spec)
            & self._filter_snr_spectra()
        )

    def proximity(self, zqso):
        return zqso - self.proximity_zone

    def lymanbeta(self, zqso):
        return (1.0 + zqso) * LYB_OVER_LYA - 1.0

    # --- path length (calc_cddf.py:334-438) ---------------------------

    def path_length(self, z_min: float, z_max: float) -> float:
        """Total absorption path dX searched within [z_min, z_max]."""
        assert z_min < z_max
        keep = self._filter_snr_spectra()
        max_z_orig = self.z_max()[keep]
        min_z = self.z_min()[keep]
        max_z = max_z_orig
        if self.lowzcut:
            max_z = np.maximum(
                np.minimum(max_z_orig, self.proximity(max_z_orig)), min_z
            )

        if not self.filter_noisy_pixels:
            return self._path.total_path(min_z, max_z, z_min, z_max)

        # noisy-pixel excision: integrate only contiguous good regions
        pixel_noise = [
            pn for pn, k in zip(self.pixel_noise, keep) if k
        ] if not self.do_resample else [
            self.pixel_noise[i] for i, k in zip(self._resample, keep) if k
        ]
        total = 0.0
        for zmin_s, zmax_s, zmax_o, pn in zip(
            min_z, max_z, max_z_orig, pixel_noise
        ):
            lo, hi = max(zmin_s, z_min), min(zmax_s, z_max)
            if hi <= lo:
                continue
            pn = np.asarray(pn)
            if pn.size == 0 or np.all(pn < self.noise_thresh):
                total += float(self._path(lo, hi))
                continue
            # the pixel grid spans the spectrum's FULL search range
            # [zmin_s, zmax_o] (the noise arrays were captured before any
            # proximity cut); the cut acts through the [lo, hi] clip.
            # Reference wart intentionally not replicated: calc_cddf maps
            # pixels over the truncated range under lowzcut, compressing
            # the pixel->redshift mapping and excising the wrong
            # intervals.  max(size-1, 1) guards the one-pixel case.
            zzs = zmin_s + (zmax_o - zmin_s) * np.arange(pn.size) / max(
                pn.size - 1, 1
            )
            good = (pn < self.noise_thresh) & (zzs >= lo) & (zzs <= hi)
            if not good.any():
                continue
            # contiguous runs of good pixels
            edges = np.diff(good.astype(int))
            starts = np.flatnonzero(edges == 1) + 1
            ends = np.flatnonzero(edges == -1) + 1
            if good[0]:
                starts = np.concatenate([[0], starts])
            if good[-1]:
                ends = np.concatenate([ends, [pn.size]])
            for s_, e_ in zip(starts, ends):
                total += float(self._path(zzs[s_], zzs[e_ - 1]))
        return total

    # --- sample bookkeeping (calc_cddf.py:683-692, 724-780) ------------

    def _get_sample_params(self, spec, second=False):
        redshifts = self.z_min(spec) + (
            self.z_max(spec) - self.z_min(spec)
        ) * self.z_offsets
        lnhi_vals = self.lnhi_vals
        if second:
            # the second DLA's parameters for (first-DLA) sample j live
            # at sample index base_sample_inds[spec, j]
            # (calc_cddf.py:683-692)
            base = self.base_sample_inds[self._idx(spec)]
            lnhi_vals = lnhi_vals[base]
            redshifts = redshifts[base]
        return lnhi_vals, redshifts

    def _split_distributions(
        self, q_bins, lred, ured, lnhi_min=20.3, lnhi_max=23.0, nhi=False
    ):
        """Combine first- and (optional) second-DLA contributions
        (calc_cddf.py:664-681)."""
        probs, poissons = self._split_distributions_single(
            q_bins, lred, ured, lnhi_min, lnhi_max, nhi, second=False
        )
        if self.second_dla:
            probs2, poissons2 = self._split_distributions_single(
                q_bins, lred, ured, lnhi_min, lnhi_max, nhi, second=True
            )
            probs = [a + b for a, b in zip(probs, probs2)]
            poissons = poissons + poissons2
        return probs, poissons

    def _split_distributions_single(
        self, q_bins, lred, ured, lnhi_min=20.3, lnhi_max=23.0, nhi=False,
        second=False,
    ):
        """Per bin: exact-list probabilities (p >= p_switch) and the
        Poisson mean of the small-p tail (calc_cddf.py:724-780)."""
        nbins = len(q_bins) - 1
        probs = [[] for _ in range(nbins)]
        poisson_lists = [[] for _ in range(nbins)]
        p_dla_all = self._p_dla(second=second)

        for spec in self.filter_dla_spectra(second=second):
            lnhi_vals, redshifts = self._get_sample_params(spec, second=second)
            upper_z = ured
            if self.lowzcut:
                upper_z = min(self.proximity(self.z_max(spec)), ured)
            desired = (
                (lnhi_vals > lnhi_min)
                & (lnhi_vals < lnhi_max)
                & (redshifts > lred)
                & (redshifts < upper_z)
            )
            if self.filter_noisy_pixels:
                pn = np.asarray(self.pixel_noise[self._idx(spec)])
                if pn.size:
                    pind = np.clip(
                        (
                            (redshifts - self.z_min(spec))
                            / (self.z_max(spec) - self.z_min(spec))
                            * pn.size
                        ).astype(int),
                        0,
                        pn.size - 1,
                    )
                    desired &= pn[pind] < self.noise_thresh
            idx = np.flatnonzero(desired)
            if idx.size == 0:
                continue
            p_each = (
                np.exp(self._log_norm_like(spec, second=second)[idx])
                * p_dla_all[spec]
            )
            big_enough = p_each > self.p_thresh_sample
            if not big_enough.any():
                continue
            quantity = (lnhi_vals if nhi else redshifts)[idx]
            for b in range(nbins):
                sel = (
                    big_enough
                    & (quantity > q_bins[b])
                    & (quantity < q_bins[b + 1])
                )
                if not sel.any():
                    continue
                p_here = p_each[sel]
                small = p_here < self.p_switch
                if small.any():
                    poisson_lists[b].append(math.fsum(p_here[small]))
                if (~small).any():
                    probs[b].append(p_here[~small])
        poissons = np.array([math.fsum(pl) for pl in poisson_lists])
        return probs, poissons

    def _get_confidence_intervals(
        self, q_bins, lred, ured, lnhi_min=20.3, lnhi_max=23.0, nhi=False
    ):
        """MAP count + 68/95% intervals per bin (calc_cddf.py:800-827)."""
        probs, poissons = self._split_distributions(
            q_bins, lred, ured, lnhi_min=lnhi_min, lnhi_max=lnhi_max, nhi=nhi
        )
        maxlikes, levels68, levels95 = [], [], []
        for pp, pmean in zip(probs, poissons):
            pdf = poisson_binomial_pdf(pp)
            pdf_comb, offset = combine_with_poisson(pdf, pmean)
            maxlike, ll68, ll95 = pdf_confidence(pdf_comb, offset)
            maxlikes.append(maxlike)
            levels68.append(ll68)
            levels95.append(ll95)
        return maxlikes, levels68, levels95

    # --- the headline statistics --------------------------------------

    def column_density_function(
        self, z_min=1.0, z_max=6.0, lnhi_nbins=30, lnhi_min=20.0, lnhi_max=23.0
    ):
        """f(N) = n_DLA / ΔN / ΔX in log-N bins (calc_cddf.py:440-464).

        Returns (log10 N centers, cddf, cddf68 (nbins, 2), cddf95, xerrs).
        """
        l_nhi = np.linspace(lnhi_min, lnhi_max, num=lnhi_nbins + 1)
        ndlas, l68, l95 = self._get_confidence_intervals(
            l_nhi, z_min, z_max, lnhi_min=lnhi_min, lnhi_max=lnhi_max,
            nhi=True,
        )
        dX = self.path_length(z_min, z_max)
        if dX == 0.0:  # no searched path in this z range
            dX = np.inf
        dN = 10.0 ** l_nhi[1:] - 10.0 ** l_nhi[:-1]
        cddf = np.array(ndlas) / dX / dN
        cddf68 = np.array(l68) / dX / dN[:, None]
        cddf95 = np.array(l95) / dX / dN[:, None]
        l_cent = 0.5 * (l_nhi[1:] + l_nhi[:-1])
        xerrs = (10.0**l_cent - 10.0 ** l_nhi[:-1], 10.0 ** l_nhi[1:] - 10.0**l_cent)
        return l_cent, cddf, cddf68, cddf95, xerrs

    def line_density(self, z_min=2.0, z_max=4.0):
        """dN/dX in z bins for N > 10^20.3 (calc_cddf.py:490-507)."""
        nbins = max(int((z_max - z_min) * self.bins_per_z), 1)
        z_bins = np.linspace(z_min, z_max, nbins + 1)
        maxlike, l68, l95 = self._get_confidence_intervals(
            z_bins, z_min, z_max, lnhi_min=20.3, nhi=False
        )
        dX = np.array(
            [self.path_length(zm, zx) for zm, zx in zip(z_bins[:-1], z_bins[1:])]
        )
        ii = dX > 0
        dNdX = np.array(maxlike)[ii] / dX[ii]
        dndx68 = np.array(l68)[ii] / dX[ii][:, None]
        dndx95 = np.array(l95)[ii] / dX[ii][:, None]
        z_cent = 0.5 * (z_bins[1:] + z_bins[:-1])
        xerrs = (z_cent[ii] - z_bins[:-1][ii], z_bins[1:][ii] - z_cent[ii])
        return z_cent[ii], dNdX, dndx68, dndx95, xerrs

    def _get_omega_confidence_intervals(
        self, lnhi_bins, lred, ured, tailprob=5e-4
    ):
        """Distribution of total N_HI in a z bin by convolving per-N-bin
        count PDFs scaled by bin-center N (calc_cddf.py:562-636)."""
        probs, poissons = self._split_distributions(
            lnhi_bins, lred, ured, lnhi_min=lnhi_bins[0],
            lnhi_max=lnhi_bins[-1], nhi=True,
        )
        pdf_comb = np.ones(1)
        nhi_comb = np.zeros(1)
        nhi_cent = 10.0 ** (0.5 * (lnhi_bins[1:] + lnhi_bins[:-1]))
        for pp, pmean, nhi_cc in zip(probs, poissons, nhi_cent):
            pdf = poisson_binomial_pdf(pp)
            pdf_one, offset_one = combine_with_poisson(pdf, pmean)
            dlow, dhigh = interval(np.cumsum(pdf_one), 1 - 1e-4)
            maxr = min(dhigh + 1, np.size(pdf_one))
            counts = np.arange(dlow, maxr)
            # outer product: every (existing total, count in this bin) pair
            pdf_comb = np.ravel(pdf_comb[:, None] * pdf_one[dlow:maxr][None, :])
            nhi_comb = np.ravel(
                nhi_comb[:, None] + (offset_one + counts)[None, :] * nhi_cc
            )
            order = np.argsort(nhi_comb)
            nhi_comb = nhi_comb[order]
            pdf_comb = pdf_comb[order]

            # prune tails below tailprob into single boundary masses
            cdf = np.cumsum(pdf_comb)
            t2 = np.flatnonzero(cdf > 1 - tailprob)
            if t2.size:
                pdf_comb = np.append(pdf_comb[: t2[0]], math.fsum(pdf_comb[t2]))
                nhi_comb = np.append(nhi_comb[: t2[0]], np.min(nhi_comb[t2]))
            t1 = np.flatnonzero(np.cumsum(pdf_comb) < tailprob)
            if t1.size:
                pdf_comb = np.insert(
                    pdf_comb[t1[-1] + 1 :], 0, math.fsum(pdf_comb[t1])
                )
                nhi_comb = np.insert(
                    nhi_comb[t1[-1] + 1 :], 0, np.max(nhi_comb[t1])
                )

            # merge totals within 0.1% of each other
            if nhi_comb.size > 2:
                new_pdf = [pdf_comb[0]]
                new_nhi = [nhi_comb[0]]
                i = 1
                while i < nhi_comb.size - 1:
                    group = [i]
                    j = i + 1
                    while (
                        j < nhi_comb.size - 1
                        and nhi_comb[j] / nhi_comb[i] < 1 + 1e-3
                    ):
                        group.append(j)
                        j += 1
                    new_pdf.append(math.fsum(pdf_comb[group]))
                    new_nhi.append(float(np.median(nhi_comb[group])))
                    i = j
                new_pdf.append(pdf_comb[-1])
                new_nhi.append(nhi_comb[-1])
                pdf_comb = np.array(new_pdf)
                nhi_comb = np.array(new_nhi)
            total = math.fsum(pdf_comb)
            assert 0.99 < total < 1.01
            pdf_comb = pdf_comb / total

        maxlike, l68, l95 = pdf_confidence(pdf_comb, 0)
        hi95 = min(l95[1], np.size(nhi_comb) - 1)
        hi68 = min(l68[1], np.size(nhi_comb) - 1)
        return (
            nhi_comb[maxlike],
            (nhi_comb[l68[0]], nhi_comb[hi68]),
            (nhi_comb[l95[0]], nhi_comb[hi95]),
        )

    def omega_dla_cddf(self, z_min=2.0, z_max=4.0, hubble=0.7, lnhi_nbins=30):
        """Omega_DLA(z) by summing the CDDF with full Bayesian errors
        (calc_cddf.py:521-560)."""
        nbins = max(int((z_max - z_min) * self.bins_per_z), 1)
        z_bins = np.linspace(z_min, z_max, nbins + 1)
        conversion = (
            PROTON_MASS / LIGHT_CMS * H100_PER_S * hubble / rho_crit(hubble)
        )
        lnhi_bins = np.linspace(20.3, 23.0, num=int(lnhi_nbins) + 1)
        omega, om68, om95, z_cent, xerrs = [], [], [], [], []
        for zz in range(nbins):
            dX = self.path_length(z_bins[zz], z_bins[zz + 1])
            if dX == 0.0:
                continue
            nhi_like, nhi_68, nhi_95 = self._get_omega_confidence_intervals(
                lnhi_bins, z_bins[zz], z_bins[zz + 1]
            )
            assert nhi_95[0] <= nhi_68[0] <= nhi_like
            assert nhi_95[1] >= nhi_68[1] >= nhi_like
            omega.append(conversion * nhi_like / dX)
            om68.append(np.array(nhi_68) * conversion / dX)
            om95.append(np.array(nhi_95) * conversion / dX)
            z_c = 0.5 * (z_bins[zz] + z_bins[zz + 1])
            z_cent.append(z_c)
            xerrs.append((z_c - z_bins[zz], z_bins[zz + 1] - z_c))
        return (
            np.array(z_cent),
            np.array(omega),
            np.array(om68).reshape(-1, 2),
            np.array(om95).reshape(-1, 2),
            np.array(xerrs).reshape(-1, 2).T,
        )

    def _get_z_nhi_hist(
        self, q_bins, lred, ured, lnhi_min=20.3, lnhi_max=23.0,
        nhi=False, moment=False,
    ):
        """Mean + binomial variance of the (weighted) DLA count per bin
        (calc_cddf.py:829-870)."""
        means = np.zeros(np.size(q_bins) - 1)
        variances = np.zeros_like(means)
        p_dla_all = self._p_dla()
        for spec in self.filter_dla_spectra():
            lnhi_vals, redshifts = self._get_sample_params(spec)
            idx = np.flatnonzero(
                (lnhi_vals > lnhi_min)
                & (lnhi_vals < lnhi_max)
                & (redshifts > lred)
                & (redshifts < ured)
            )
            if idx.size == 0:
                continue
            p_each = np.exp(self._log_norm_like(spec)[idx]) * p_dla_all[spec]
            weight = 10.0 ** lnhi_vals[idx] if moment else 1.0
            quantity = (lnhi_vals if nhi else redshifts)[idx]
            t_hist, _ = np.histogram(quantity, bins=q_bins, weights=weight * p_each)
            means += t_hist
            t_var, _ = np.histogram(
                quantity, bins=q_bins,
                weights=weight * weight * (1 - p_each) * p_each,
            )
            variances += t_var
        variances += means  # Poisson sampling term (calc_cddf.py:863-869)
        return means, variances

    def omega_dla(self, z_min=2.0, z_max=4.0, hubble=0.7,
                  lnhi_max=23.0, lnhi_min=20.3):
        """Omega_DLA(z) by direct first-moment summation
        (calc_cddf.py:638-662)."""
        nbins = max(int((z_max - z_min) * self.bins_per_z), 1)
        z_bins = np.linspace(z_min, z_max, nbins + 1)
        mean, variance = self._get_z_nhi_hist(
            z_bins, z_min, z_max, lnhi_min=lnhi_min, lnhi_max=lnhi_max,
            nhi=False, moment=True,
        )
        dX = np.array(
            [self.path_length(zm, zx) for zm, zx in zip(z_bins[:-1], z_bins[1:])]
        )
        # empty-path bins yield 0 (not inf/NaN), like the other statistics
        dX = np.where(dX > 0, dX, np.inf)
        conversion = PROTON_MASS * H100_PER_S * hubble / LIGHT_CMS / dX / rho_crit(hubble)
        omega = mean * conversion
        err = np.sqrt(variance) * conversion
        z_cent = 0.5 * (z_bins[1:] + z_bins[:-1])
        return z_cent, omega, err, z_bins

    def get_sample_errors(self, z_min=2.0, z_max=5.0, nsample=5, seed=0):
        """Bootstrap error bars on dN/dX and Omega_DLA
        (calc_cddf.py:186-209).

        Per-draw statistics are aligned onto the COMMON z grid before
        aggregation: line_density/omega_dla_cddf drop z bins whose
        resampled path length is zero, so draws can return different bin
        sets (np.array over ragged lists raises on numpy >= 1.24; equal-
        length rags would silently misalign).  Missing bins are NaN and
        aggregated with the nan-aware median/percentile; the returned
        ``z_cent`` is the grid the medians/intervals index.
        """
        nbins = max(int((z_max - z_min) * self.bins_per_z), 1)
        z_bins = np.linspace(z_min, z_max, nbins + 1)
        z_cent = 0.5 * (z_bins[1:] + z_bins[:-1])
        dndx_sample = np.full((nsample, nbins), np.nan)
        om_sample = np.full((nsample, nbins), np.nan)

        def place(row, zc_draw, values):
            idx = np.searchsorted(z_cent, zc_draw)
            assert np.allclose(z_cent[idx], zc_draw)  # same linspace
            row[idx] = values

        for i in range(nsample):
            self.resample(True, seed=seed + i)
            zc_d, dNdX, _, _, _ = self.line_density(z_min=z_min, z_max=z_max)
            place(dndx_sample[i], zc_d, dNdX)
            zc_o, omega, _, _, _ = self.omega_dla_cddf(
                z_min=z_min, z_max=z_max, lnhi_nbins=15
            )
            place(om_sample[i], zc_o, 1000 * omega)
        self.resample(False)
        import warnings

        with warnings.catch_warnings():
            # a bin with zero path in EVERY draw is legitimately NaN
            warnings.simplefilter("ignore", RuntimeWarning)
            out = {
                "z_cent": z_cent,
                "dndx_median": np.nanmedian(dndx_sample, axis=0),
                "dndx_68": np.array(
                    [np.nanpercentile(dndx_sample, 16, axis=0),
                     np.nanpercentile(dndx_sample, 84, axis=0)]
                ),
                "omega_median": np.nanmedian(om_sample, axis=0),
                "omega_68": np.array(
                    [np.nanpercentile(om_sample, 16, axis=0),
                     np.nanpercentile(om_sample, 84, axis=0)]
                ),
            }
        return out

    # --- per-spectrum diagnostics (calc_cddf.py:872-903) ---------------

    def find_delta_nhi(self, spec):
        likes = self._log_norm_like(spec)
        nvals = self.lnhi_vals[likes > np.max(likes) - 2]
        return np.max(nvals) - np.min(nvals)

    def find_delta_z(self, spec):
        likes = self._log_norm_like(spec)
        zvals = (
            self.z_min(spec)
            + (self.z_max(spec) - self.z_min(spec)) * self.z_offsets
        )[likes > np.max(likes) - 2]
        return np.max(zvals) - np.min(zvals)

    def find_max_like(self, spec, second=False):
        likes = self._log_norm_like(spec, second=second)
        m = int(np.argmax(likes))
        lnhi_vals, redshifts = self._get_sample_params(spec, second=second)
        return lnhi_vals[m], redshifts[m]


def compute_pixel_noise(spectra, indices, min_z_dlas, max_z_dlas) -> list:
    """Per-spectrum normalized pixel noise over the DLA search range
    (calc_cddf.py:937-955 find_pixel_noise): noise_variance at pixels
    whose Lyα redshift lies in [min_z, max_z], already normalized by the
    preload stage.  Feeds DLACatalogue(pixel_noise=...) for noisy-pixel
    path excision."""
    out = []
    for row, i in enumerate(indices):
        w, _, noise_var, _ = spectra.row(int(i))
        ipix = (w > 1215.67 * (1 + min_z_dlas[row])) & (
            w < 1215.67 * (1 + max_z_dlas[row])
        )
        out.append(np.asarray(noise_var[ipix], np.float64))
    return out


def compute_all_snrs(spectra, indices, min_z_dlas, max_z_dlas) -> np.ndarray:
    """SNR per processed spectrum (calc_cddf.py:906-934, 957-976).

    Median flux/noise ratio over pixels redward of the Lyα search range
    (wavelength > 1215.67 (1 + max_z)), with normalized flux floored at
    0.1 to avoid absorber-driven underestimates.

    Note: the reference floors at ``flux/norm < 0.1 -> norm*0.1``
    although the stored flux is already normalized (calc_cddf.py:921-923)
    — a unit quirk; we floor the normalized flux at 0.1 (the behaviour
    of the reference's own KeyError fallback, :925-926).
    """
    snrs = np.empty(len(indices))
    for row, i in enumerate(indices):
        w, flux, noise_var, _ = spectra.row(int(i))
        ipix = w > 1215.67 * (1 + max_z_dlas[row])
        f = np.array(flux[ipix])
        nv = np.asarray(noise_var[ipix])
        if f.size == 0:
            snrs[row] = -1.0
            continue
        f[f < 0.1] = 0.1
        good = np.isfinite(nv) & (nv > 0)
        if not good.any():
            snrs[row] = -1.0
            continue
        snrs[row] = 1.0 / np.median(np.sqrt(nv[good]) / np.abs(f[good]))
    return snrs
