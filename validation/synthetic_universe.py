"""Synthetic-universe end-to-end statistical validation.

Injects DLAs into synthetic quasar spectra at a KNOWN line density and
column-density distribution, runs the full inference stack (Voigt +
GP evidence, pallas backend) and the analysis layer, and checks that
the recovered dN/dX and CDDF agree with the injected truth — the
"science parity" validation that needs no proprietary survey data.

Run: python validation/synthetic_universe.py [--n-spectra 512]
Writes validation/RESULTS.md.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main(n_spectra: int = 512, rate_dndx: float = 0.12, seed: int = 12):
    from gp_dla_detection_tpu import Parameters
    from gp_dla_detection_tpu.analysis import AbsorptionPath, DLACatalogue
    from gp_dla_detection_tpu.inference import PaddedSpectra
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.ops.voigt import (
        extend_wavelengths,
        voigt_absorption,
    )
    from gp_dla_detection_tpu.parallel import (
        ShardedRunConfig,
        make_mesh,
        process_spectra_sharded,
    )
    from gp_dla_detection_tpu.params import NullModelParams
    from gp_dla_detection_tpu.samples import generate_dla_samples

    rng = np.random.default_rng(seed)
    params = Parameters(null_model=NullModelParams(k=20))
    grid = params.null_model.rest_wavelengths()

    # the generating ("true") quasar emission model
    model = GPModel(
        rest_wavelengths=grid,
        mu=1.0 + 0.3 * np.exp(-0.5 * ((grid - 1215.67) / 25.0) ** 2)
        + 0.1 * np.sin(grid / 60.0),
        M=rng.normal(size=(grid.size, 20)) * 0.04,
        log_omega=np.log(0.12 + 0 * grid),
        log_c_0=np.log(0.1),
        log_tau_0=np.log(0.0023),
        log_beta=np.log(3.65),
    )

    # sightlines
    P = 1280
    z_qso = rng.uniform(2.4, 3.4, n_spectra)
    lam = (911.9 * (1 + z_qso))[:, None] * 10 ** (1e-4 * np.arange(P))[None, :]

    path = AbsorptionPath()
    noise_sd = 0.1

    # injected population: constant dN/dX = rate, logN ~ truncated
    # power law on [20.3, 22.0] with slope -1.8 in N
    lya = 1215.6701
    injected = []
    flux = np.empty((n_spectra, P))
    for i in range(n_spectra):
        rest = lam[i] / (1 + z_qso[i])
        mu_i = np.interp(rest, grid, model.mu)
        latent = np.interp(rest, grid, model.M @ rng.normal(size=20))
        f = mu_i + latent + rng.normal(0, noise_sd, P)

        zmin = max(lam[i, 0] / lya - 1, 911.7633 * (1 + z_qso[i]) / lya - 1
                   + params.min_z_cut)
        # the engine's search range tops out at the last MODELLED pixel
        # (rest <= max_lambda, _prepare_spectrum), not the last pixel of
        # the grid — injecting beyond it would deflate recovered dN/dX
        lam_search_max = min(
            lam[i, -1], params.null_model.max_lambda * (1 + z_qso[i])
        )
        zmax = lam_search_max / lya - 1 - params.max_z_cut
        dX = float(path(zmin, zmax))
        n_dla = rng.poisson(rate_dndx * dX)
        n_dla = min(n_dla, 1)  # the model selects between 0 and 1 DLA
        if n_dla:
            # uniform in X within the searchable range
            u = rng.uniform()
            zgrid = np.linspace(zmin, zmax, 4001)
            cdf = path(zmin, zgrid) / dX
            z_dla = float(np.interp(u, cdf, zgrid))
            # p(N) ~ N^-1.8 on [20.3, 22.0]
            a = 1.0 - 1.8
            nlo, nhi_ = 10**20.3, 10**22.0
            nhi = (rng.uniform() * (nhi_**a - nlo**a) + nlo**a) ** (1 / a)
            ext = extend_wavelengths(lam[i], params.instrument)
            absorption = np.asarray(
                voigt_absorption(ext, z_dla, nhi, num_lines=3)
            )
            f *= absorption
            injected.append((i, z_dla, np.log10(nhi)))
        flux[i] = f

    spectra = PaddedSpectra(
        lam, flux, np.full((n_spectra, P), noise_sd**2),
        np.ones((n_spectra, P), bool), z_qso,
    )

    # QMC prior samples from a synthetic concordance catalog
    observed_log_nhis = rng.normal(20.7, 0.4, 400).clip(20.05, 22.4)
    samples = generate_dla_samples(observed_log_nhis, params)

    # a flat, neutral DLA-rate prior catalog (p ~ 0.1)
    prior_z = rng.uniform(2.2, 3.6, 5000)
    prior_f = rng.uniform(size=5000) < 0.1

    t0 = time.time()
    results = process_spectra_sharded(
        model, samples.offset_samples, samples.nhi_samples, spectra,
        prior_z, prior_f, params=params, mesh=make_mesh(),
        config=ShardedRunConfig(
            per_device_batch=min(256, n_spectra), sample_chunk=2500,
            dtype="float32", backend="pallas",
        ),
    )
    wall = time.time() - t0

    cat = DLACatalogue(
        results.p_dlas, results.min_z_dlas, results.max_z_dlas,
        results.sample_log_likelihoods_dla, results.log_likelihoods_dla,
        samples.offset_samples, samples.log_nhi_samples,
    )

    # --- truth vs recovery ------------------------------------------------
    n_inj = len(injected)
    detections = results.p_dlas > 0.9
    inj_idx = np.array([i for i, _, _ in injected])
    tp = int(detections[inj_idx].sum())
    fp = int(detections.sum() - tp)

    # dN/dX over [2.0, 3.4] (sightline search ranges extend below 2.0;
    # truth must be restricted to the same window)
    z_lo, z_hi = 2.0, 3.4
    z_cent, dNdX, dndx68, dndx95, _ = cat.line_density(z_min=z_lo, z_max=z_hi)
    dX_total = cat.path_length(z_lo, z_hi)
    from _universe import recovered_dla_total

    recovered_total = recovered_dla_total(cat, z_cent, dNdX, z_lo, z_hi)
    recovered_rate = recovered_total / dX_total
    n_in_range = sum(
        1 for _, z, logn in injected if z_lo < z < z_hi and logn > 20.3
    )

    lines = [
        "# Synthetic-universe validation",
        "",
        f"- spectra: {n_spectra}, injected DLAs: {n_inj} "
        f"(rate dN/dX = {rate_dndx})",
        f"- inference wall time (pallas backend, 1 chip, incl. fetches): "
        f"{wall:.1f} s",
        f"- detections at p > 0.9: {int(detections.sum())} "
        f"(true positives {tp}/{n_inj}, false positives {fp})",
        f"- recovered DLA count in z=[{z_lo}, {z_hi}]: "
        f"{recovered_total:.0f} (injected in range: {n_in_range})",
        f"- recovered mean dN/dX = {recovered_rate:.4f} "
        f"(injected in-range rate {n_in_range / dX_total:.4f}; "
        f"nominal {rate_dndx} before the <=1-DLA truncation and the "
        f"z window)",
    ]

    # MAP parameter accuracy for true positives
    errs_z, errs_n = [], []
    for i, z_true, logn_true in injected:
        if not detections[i]:
            continue
        mi = int(np.argmax(results.sample_log_likelihoods_dla[i]))
        z_map = results.min_z_dlas[i] + (
            results.max_z_dlas[i] - results.min_z_dlas[i]
        ) * samples.offset_samples[mi]
        errs_z.append(z_map - z_true)
        errs_n.append(samples.log_nhi_samples[mi] - logn_true)
    if errs_z:
        lines.append(
            f"- MAP accuracy (true positives): |dz| median "
            f"{np.median(np.abs(errs_z)):.4f}, |dlogN| median "
            f"{np.median(np.abs(errs_n)):.3f}"
        )

    report = "\n".join(lines) + "\n"
    out = Path(__file__).parent / "RESULTS.md"
    out.write_text(report)
    print(report)

    # hard checks
    assert tp / max(n_inj, 1) > 0.85, "detection completeness too low"
    assert fp <= max(2, 0.02 * n_spectra), "too many false positives"
    # compare recovered MAP counts against the in-window injected count
    # (MAP modes sit slightly below the mean when posterior mass spreads
    # over bin/logN edges, hence the 15% / 2-sigma tolerance)
    assert abs(recovered_total - n_in_range) < max(
        0.15 * n_in_range, 2 * np.sqrt(max(n_in_range, 1))
    ), "recovered dN/dX inconsistent with injected rate"
    print("VALIDATION OK")


def main_multi(n_spectra: int = 256, rate_dndx: float = 0.35, seed: int = 21):
    """Two-DLA injection/recovery: up to TWO absorbers per sightline,
    classified by the {0, 1, 2}-DLA model selection (sharded pallas).

    Writes validation/RESULTS_MULTI.md.
    """
    from gp_dla_detection_tpu import Parameters, kms_to_z
    from gp_dla_detection_tpu.analysis import AbsorptionPath
    from gp_dla_detection_tpu.inference import PaddedSpectra
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.ops.voigt import (
        extend_wavelengths,
        voigt_absorption,
    )
    from gp_dla_detection_tpu.parallel import (
        ShardedRunConfig,
        make_mesh,
        process_spectra_multi_sharded,
    )
    from gp_dla_detection_tpu.params import NullModelParams
    from gp_dla_detection_tpu.samples import generate_dla_samples

    rng = np.random.default_rng(seed)
    params = Parameters(null_model=NullModelParams(k=20))
    grid = params.null_model.rest_wavelengths()
    model = GPModel(
        rest_wavelengths=grid,
        mu=1.0 + 0.3 * np.exp(-0.5 * ((grid - 1215.67) / 25.0) ** 2)
        + 0.1 * np.sin(grid / 60.0),
        M=rng.normal(size=(grid.size, 20)) * 0.04,
        log_omega=np.log(0.12 + 0 * grid),
        log_c_0=np.log(0.1),
        log_tau_0=np.log(0.0023),
        log_beta=np.log(3.65),
    )

    P = 1280
    z_qso = rng.uniform(2.4, 3.4, n_spectra)
    lam = (911.9 * (1 + z_qso))[:, None] * 10 ** (1e-4 * np.arange(P))[None, :]
    path = AbsorptionPath()
    noise_sd = 0.1
    lya = 1215.6701
    min_sep = float(kms_to_z(3000.0)) * 3  # comfortably outside the NaN cut

    injected: dict[int, list] = {}
    flux = np.empty((n_spectra, P))
    for i in range(n_spectra):
        rest = lam[i] / (1 + z_qso[i])
        f = (
            np.interp(rest, grid, model.mu)
            + np.interp(rest, grid, model.M @ rng.normal(size=20))
            + rng.normal(0, noise_sd, P)
        )
        zmin = max(lam[i, 0] / lya - 1, 911.7633 * (1 + z_qso[i]) / lya - 1
                   + params.min_z_cut)
        lam_search_max = min(
            lam[i, -1], params.null_model.max_lambda * (1 + z_qso[i])
        )
        zmax = lam_search_max / lya - 1 - params.max_z_cut
        dX = float(path(zmin, zmax))
        n_dla = min(rng.poisson(rate_dndx * dX), 2)
        zs: list[float] = []
        zgrid = np.linspace(zmin, zmax, 4001)
        cdf = path(zmin, zgrid) / dX
        for _ in range(n_dla):
            for _attempt in range(20):
                u = rng.uniform()
                z_dla = float(np.interp(u, cdf, zgrid))
                if all(
                    abs(np.log1p(z_dla) - np.log1p(z0)) > np.log1p(min_sep)
                    for z0 in zs
                ):
                    break
            else:
                continue
            zs.append(z_dla)
            a = 1.0 - 1.8
            nlo, nhi_ = 10**20.3, 10**22.0
            nhi = (rng.uniform() * (nhi_**a - nlo**a) + nlo**a) ** (1 / a)
            ext = extend_wavelengths(lam[i], params.instrument)
            f *= np.asarray(voigt_absorption(ext, z_dla, nhi, num_lines=3))
            injected.setdefault(i, []).append((z_dla, np.log10(nhi)))
        flux[i] = f

    spectra = PaddedSpectra(
        lam, flux, np.full((n_spectra, P), noise_sd**2),
        np.ones((n_spectra, P), bool), z_qso,
    )
    samples = generate_dla_samples(
        rng.normal(20.7, 0.4, 400).clip(20.05, 22.4), params
    )
    prior_z = rng.uniform(2.2, 3.6, 5000)
    prior_num = np.minimum(rng.poisson(0.35, 5000), 2)

    t0 = time.time()
    res = process_spectra_multi_sharded(
        model, samples.offset_samples, samples.nhi_samples, spectra,
        prior_z, prior_num, params=params, mesh=make_mesh(),
        config=ShardedRunConfig(
            per_device_batch=min(64, n_spectra), sample_chunk=2500,
            dtype="float32", backend="pallas",
        ),
    )
    wall = time.time() - t0

    truth = np.array([len(injected.get(i, [])) for i in range(n_spectra)])
    picks = np.argmax(res.model_posteriors, axis=1)
    conf = np.zeros((3, 3), int)
    for t, p_ in zip(truth, picks):
        conf[t, p_] += 1

    # pair-parameter recovery on correctly-classified 2-DLA sightlines
    errs = []
    for i in np.flatnonzero((truth == 2) & (picks == 2)):
        j = int(np.nanargmax(res.sample_log_likelihoods_dla2[i]))
        zr = res.single.max_z_dlas[i] - res.single.min_z_dlas[i]
        z_f = res.single.min_z_dlas[i] + zr * samples.offset_samples[j]
        z_b = res.single.min_z_dlas[i] + zr * samples.offset_samples[
            res.base_sample_inds[i, j]
        ]
        found = sorted([z_f, z_b])
        true_z = sorted(z for z, _ in injected[i])
        errs.extend([abs(a - b) for a, b in zip(found, true_z)])

    acc2 = conf[2, 2] / max(conf[2].sum(), 1)
    acc_ge1 = (conf[1, 1:].sum() + conf[2, 1:].sum()) / max(
        conf[1].sum() + conf[2].sum(), 1
    )
    fp0 = conf[0, 1:].sum()
    lines = [
        "# Synthetic-universe validation: two-DLA model selection",
        "",
        f"- spectra: {n_spectra}; injected multiplicities "
        f"0/1/2 = {conf[0].sum()}/{conf[1].sum()}/{conf[2].sum()}",
        f"- inference wall time (sharded pallas, 1 chip): {wall:.1f} s",
        "- confusion matrix (rows = injected count, cols = MAP model):",
        "",
        "  | truth\\pick | 0 | 1 | 2 |",
        "  |---|---|---|---|",
    ] + [
        f"  | {t} | {conf[t,0]} | {conf[t,1]} | {conf[t,2]} |"
        for t in range(3)
    ] + [
        "",
        f"- 2-DLA exact-classification rate: {acc2:.2f}",
        f"- >=1-DLA detection rate on hosting sightlines: {acc_ge1:.2f}",
        f"- clean sightlines misclassified as hosting: {fp0}",
    ]
    if errs:
        lines.append(
            f"- best-pair redshift accuracy (both absorbers, "
            f"correctly-classified 2-DLA sightlines): |dz| median "
            f"{np.median(errs):.4f}, max {np.max(errs):.4f}"
        )
    report = "\n".join(lines) + "\n"
    out = Path(__file__).parent / "RESULTS_MULTI.md"
    out.write_text(report)
    print(report)

    assert acc_ge1 > 0.85, "multi-DLA detection completeness too low"
    assert acc2 > 0.7, "2-DLA classification rate too low"
    assert fp0 <= max(2, 0.02 * conf[0].sum()), "too many false positives"
    if errs:
        assert np.median(errs) < 0.01, "pair redshift recovery too loose"
    print("MULTI VALIDATION OK")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-spectra", type=int, default=None,
                   help="default: 512 single / 256 multi")
    p.add_argument("--rate", type=float, default=None,
                   help="injected dN/dX (default: 0.12 single / 0.35 multi)")
    p.add_argument("--multi", action="store_true",
                   help="two-DLA injection/recovery instead of single")
    args = p.parse_args()
    if args.multi:
        main_multi(
            args.n_spectra if args.n_spectra is not None else 256,
            args.rate if args.rate is not None else 0.35,
        )
    else:
        main(
            args.n_spectra if args.n_spectra is not None else 512,
            args.rate if args.rate is not None else 0.12,
        )
