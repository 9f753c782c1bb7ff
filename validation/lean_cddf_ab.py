"""Lean-fed L7 statistics vs the classic full-matrix path, at scale.

The fused lean two-stage driver with store_cddf_inputs=True reduces the
CDDF/dN_dX/Omega_DLA inputs on device (gp_dla_detection_tpu/
cddf_inputs.py); this harness verifies the resulting statistics against
the classic path bin by bin on a DLA-injected synthetic universe, and
measures the reduction's throughput cost on the fused chain.

Three runs on the same universe:
  classic     — full-matrix two-stage driver -> DLACatalogue
  lean R=1    — fused lean + cddf inputs, base_replicates=1: the tight
                quantization A/B (same base-draw pattern as classic up
                to f32 knife edges; residuals = the documented binning
                quantization classes, cddf_inputs.py docstring)
  lean R=4    — the production default: a 4x-coarser (equally valid)
                posterior base redraw — second-DLA deltas here are MC
                redraw noise, not reduction error

Usage: python validation/lean_cddf_ab.py [n_spectra]
Writes validation/RESULTS_LEAN_CDDF.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))


def build_universe(n_spectra: int, seed: int = 33, rate_dndx: float = 0.3):
    from _universe import (
        inject_dlas,
        injection_bounds,
        standard_model,
        standard_samples,
        synth_continua,
    )
    from gp_dla_detection_tpu import Parameters
    from gp_dla_detection_tpu.inference import PaddedSpectra
    from gp_dla_detection_tpu.params import NullModelParams

    rng = np.random.default_rng(seed)
    params = Parameters(null_model=NullModelParams(k=20))
    model = standard_model(rng, params)
    P = 1280
    z_qso = rng.uniform(2.4, 3.4, n_spectra)
    lam = (911.9 * (1 + z_qso))[:, None] * 10 ** (
        1e-4 * np.arange(P)
    )[None, :]
    flux = synth_continua(lam, z_qso, model, 0.1, rng)

    # two-sided universe: ~55% clean / 30% single / 15% double
    inj = []
    truth = np.zeros(n_spectra, np.int64)
    for i in range(n_spectra):
        zmin, zmax = injection_bounds(lam[i, 0], lam[i, -1], z_qso[i], params)
        if zmax <= zmin + 0.05:
            continue
        u = rng.uniform()
        k = 0 if u < 0.55 else (1 if u < 0.85 else 2)
        truth[i] = k
        zs = np.sort(rng.uniform(zmin, zmax, k))
        if k == 2 and (zs[1] - zs[0]) < 0.03:  # keep pairs resolvable
            zs[1] = min(zs[0] + 0.05, zmax)
        for z in zs[:k]:
            inj.append((i, float(z), float(rng.uniform(20.4, 21.8))))
    inject_dlas(lam, flux, inj, params)

    spectra = PaddedSpectra(
        lam, flux, np.full((n_spectra, P), 0.01),
        np.ones((n_spectra, P), bool), z_qso,
    )
    samples = standard_samples(rng, params)
    prior_z = rng.uniform(2.2, 3.6, 5000)
    prior_num = rng.choice([0, 0, 0, 0, 0, 0, 1, 1, 1, 2], 5000)
    return params, model, spectra, samples, prior_z, prior_num, truth


def main(n_spectra: int = 16384) -> None:
    from gp_dla_detection_tpu.analysis.cddf import DLACatalogue
    from gp_dla_detection_tpu.analysis.lean_catalogue import LeanDLACatalogue
    from gp_dla_detection_tpu.parallel import ShardedRunConfig
    from gp_dla_detection_tpu.parallel.sharded_multi import (
        process_spectra_multi_sharded,
    )
    from gp_dla_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    (
        params, model, spectra, samples, prior_z, prior_num, truth,
    ) = build_universe(n_spectra)

    def run(lean: bool, cddf: bool, R, ckpt):
        cfg = ShardedRunConfig(
            per_device_batch=1024, backend="pallas", dtype="float32",
            stream_dtype="float16", checkpoint_dir=ckpt,
            pipeline_depth=4,
            store_sample_likelihoods=not lean,
            store_cddf_inputs=cddf,
            base_replicates=R,
        )
        t0 = time.perf_counter()
        out = process_spectra_multi_sharded(
            model, samples.offset_samples, samples.nhi_samples, spectra,
            prior_z, prior_num, params=params, config=cfg,
        )
        return out, time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as tmp:
        classic, t_classic = run(False, False, 1, f"{tmp}/classic")
        lean1, t_lean1 = run(True, True, 1, f"{tmp}/lean1")
        lean4, t_lean4 = run(True, True, None, f"{tmp}/lean4")
        # reduction overhead: fused lean WITHOUT the reduction, R=auto
        lean_plain, t_plain = run(True, False, None, f"{tmp}/lean0")

    cat = DLACatalogue(
        classic.single.p_dlas,
        classic.single.min_z_dlas,
        classic.single.max_z_dlas,
        classic.single.sample_log_likelihoods_dla,
        classic.single.log_likelihoods_dla,
        samples.offset_samples,
        samples.log_nhi_samples,
        sample_log_likelihoods_2=classic.sample_log_likelihoods_dla2,
        base_sample_inds=classic.base_sample_inds,
        p_dla_2=classic.model_posteriors[:, 2],
    )
    lcat1 = LeanDLACatalogue.from_results(
        lean1, samples.offset_samples, samples.log_nhi_samples
    )
    lcat4 = LeanDLACatalogue.from_results(
        lean4, samples.offset_samples, samples.log_nhi_samples
    )

    z_lo, z_hi = 2.0, 3.5  # grid-aligned (6 bins/unit), covers the sky

    def stats(c):
        out = {}
        t0 = time.perf_counter()
        l_cent, cddf, c68, c95, _ = c.column_density_function(
            z_min=z_lo, z_max=z_hi
        )
        out["cddf"] = (cddf, c68, c95)
        zc, dndx, d68, d95, _ = c.line_density(z_min=z_lo, z_max=z_hi)
        out["dndx"] = (dndx, d68, d95)
        _, om, om_err, _ = c.omega_dla(z_min=z_lo, z_max=z_hi)
        out["omega_direct"] = (om, om_err)
        _, omc, o68, o95, _ = c.omega_dla_cddf(z_min=z_lo, z_max=z_hi)
        out["omega_cddf"] = (omc, o68, o95)
        out["wall"] = time.perf_counter() - t0
        return out

    s_classic = stats(cat)
    s_lean1 = stats(lcat1)
    s_lean4 = stats(lcat4)

    def cmp(a, b):
        """max relative deviation + exact-match fraction, elementwise
        over every returned array of one statistic."""
        rels, eq, tot = [], 0, 0
        for x, y in zip(a, b):
            x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
            denom = np.maximum(np.abs(x), np.abs(x).max() * 1e-3 + 1e-300)
            rels.append(np.max(np.abs(y - x) / denom) if x.size else 0.0)
            eq += int((y == x).sum())
            tot += x.size
        return float(np.max(rels)), eq / max(tot, 1)

    lines = [
        "# Lean-fed CDDF statistics vs the classic full-matrix path",
        "",
        f"- universe: {n_spectra} sightlines, two-sided "
        f"({int((truth == 1).sum())} singles, {int((truth == 2).sum())} "
        "doubles), pallas f32, f16 classic wire",
        f"- wall: classic {t_classic:.0f}s, lean+cddf R=1 {t_lean1:.0f}s, "
        f"lean+cddf R=4 {t_lean4:.0f}s, lean (no cddf) R=4 {t_plain:.0f}s "
        f"-> reduction overhead {(t_lean4 - t_plain) / t_plain * 100:.1f}%"
        " (same-process sequential; tunnel epochs vary)",
        f"- statistics wall (host): classic {s_classic['wall']:.0f}s, "
        f"lean {s_lean1['wall']:.1f}s",
        "",
        "| statistic | R=1 max rel | R=1 exact | R=4 max rel | R=4 exact |",
        "|---|---|---|---|---|",
    ]
    summary = {}
    for key in ("cddf", "dndx", "omega_direct", "omega_cddf"):
        r1, e1 = cmp(s_classic[key], s_lean1[key])
        r4, e4 = cmp(s_classic[key], s_lean4[key])
        summary[key] = {"r1_max_rel": r1, "r1_exact_frac": e1,
                        "r4_max_rel": r4, "r4_exact_frac": e4}
        lines.append(
            f"| {key} | {r1:.2e} | {e1:.3f} | {r4:.2e} | {e4:.3f} |"
        )

    lines += [
        "",
        "R=1 isolates the reduction's quantization (f32 device binning +"
        " thresholds, f16 classic wire on the OTHER side; "
        "cddf_inputs.py); R=4 is the production default, whose "
        "second-DLA deltas are a 4x-coarser posterior base REDRAW "
        "(valid MC), not reduction error.",
        "",
        f"```json\n{json.dumps(summary)}\n```",
    ]
    report = "\n".join(lines) + "\n"
    (Path(__file__).parent / "RESULTS_LEAN_CDDF.md").write_text(report)
    print(report)

    # hard gates: the dominant (exact-entry) statistics must agree
    assert summary["cddf"]["r1_max_rel"] < 0.05, summary["cddf"]
    assert summary["dndx"]["r1_max_rel"] < 0.05, summary["dndx"]
    assert summary["omega_direct"]["r1_max_rel"] < 0.02
    print("LEAN CDDF A/B OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
