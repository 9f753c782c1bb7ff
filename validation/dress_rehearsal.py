"""Mid-scale dress rehearsal: every pipeline stage on a 512-quasar
synthetic release, from FITS files on disk to CDDF statistics.

Unlike synthetic_universe.py (which enters at the inference API), this
exercises the FULL production path: catalog FITS + DLA text catalogs ->
build_catalog -> preload (native loader if built) -> GP training
(L-BFGS from scratch) -> QMC samples -> sharded pallas inference ->
two-DLA stage -> SNRs -> ASCII catalog -> analysis layer.  Detection is
scored against the release's own concordance catalog (the injected
truth).

Two-process workflow (stage-level resume across heterogeneous hosts):

    JAX_PLATFORMS= python validation/dress_rehearsal.py --phase cpu \
        --root /tmp/rehearsal     # fabricate + catalog/preload/learn/samples
    python validation/dress_rehearsal.py --phase tpu --root /tmp/rehearsal
                                  # inference + multi on the accelerator
    (--phase all runs both in one process)

Writes validation/RESULTS_REHEARSAL.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path

import numpy as np

N_QSO = 512
SEED = 4


def fabricate_release(root: Path, params):
    """A 512-quasar synthetic DR12Q release: FITS catalogs, DLA text
    catalogs, and per-plate speclite files drawn from a known GP."""
    from gp_dla_detection_tpu.io.fits import write_bintable
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.ops.voigt import voigt_absorption

    rng = np.random.default_rng(SEED)
    grid = params.null_model.rest_wavelengths()
    truth_model = GPModel(
        rest_wavelengths=grid,
        mu=1.0 + 0.3 * np.exp(-0.5 * ((grid - 1215.67) / 25.0) ** 2)
        + 0.1 * np.sin(grid / 60.0),
        M=rng.normal(size=(grid.size, 20)) * 0.04,
        log_omega=np.log(0.10 + 0 * grid),
        log_c_0=np.log(0.1),
        log_tau_0=np.log(0.0023),
        log_beta=np.log(3.65),
    )

    N = N_QSO
    thing_ids = np.arange(1001, 1001 + N, dtype=np.int64)
    z_qsos = rng.uniform(2.4, 3.4, N).round(4)
    plates = (4000 + np.arange(N) // 64).astype(np.int32)  # 64 fibers/plate
    mjds = np.full(N, 55359, np.int32)
    fibers = (1 + np.arange(N) % 64).astype(np.int32)

    names, cols = [], []
    add = lambda n, c: (names.append(n), cols.append(c))
    add("SDSS_NAME", np.array([f"J{i:017d}" for i in range(N)], dtype="S18"))
    add("RA", rng.uniform(0, 360, N)); add("DEC", rng.uniform(-10, 70, N))
    add("THING_ID", thing_ids.astype(np.int32))
    add("PLATE", plates); add("MJD", mjds); add("FIBERID", fibers)
    add("Z_VI", z_qsos)
    for j in range(9, 33):
        add(f"PAD{j}", np.zeros(N, np.float32))
    add("SNR_SPEC", rng.uniform(5, 20, N))
    for j in range(34, 56):
        add(f"PAD{j}", np.zeros(N, np.float32))
    add("BAL_FLAG_VI", np.zeros(N, np.int32))
    d12 = params.distfiles_directory("dr12q"); d12.mkdir(parents=True)
    write_bintable(d12 / "DR12Q.fits", names, cols)

    n_dr9 = 400
    for rel, fname, members in [("dr9q", "DR9Q.fits", thing_ids[:n_dr9]),
                                ("dr10q", "DR10Q_v2.fits", thing_ids)]:
        d = params.distfiles_directory(rel); d.mkdir(parents=True)
        write_bintable(d / fname, ["SDSS_NAME", "RA", "DEC", "THING_ID"],
                       [np.array(["x"] * len(members), dtype="S18"),
                        np.zeros(len(members)), np.zeros(len(members)),
                        members.astype(np.int32)])

    # concordance truth: ~20% of DR9 sightlines host a DLA in the
    # searchable range, ~15% of those host two (well separated)
    lya, lyl = 1215.6701, 911.7633
    dla_rows = []
    for i in range(n_dr9):
        if rng.uniform() > 0.2:
            continue
        zmin = max(lyl * (1 + z_qsos[i]) / lya - 1 + 0.01, 890.0 * (1 + z_qsos[i]) / lya - 1)
        zmax = z_qsos[i] - 0.04
        if zmax - zmin < 0.1:
            continue
        k = 2 if rng.uniform() < 0.15 and zmax - zmin > 0.3 else 1
        zs = []
        for _ in range(k):
            for _try in range(20):
                z = rng.uniform(zmin, zmax)
                if all(abs(z - z0) > 0.1 for z0 in zs):
                    zs.append(z); break
        for z in zs:
            dla_rows.append((thing_ids[i], z, rng.uniform(20.3, 21.5)))
    for name, los, rows in [
        ("dr9q_concordance", thing_ids[:n_dr9], dla_rows),
        ("dr12q_noterdaeme", thing_ids, dla_rows[:5]),
        ("dr12q_visual", thing_ids, dla_rows[:5]),
    ]:
        d = params.dla_catalog_directory(name); d.mkdir(parents=True)
        np.savetxt(d / "los_catalog", los, fmt="%d")
        np.savetxt(d / "dla_catalog", np.array(rows))

    dlas_by_thing: dict[int, list] = {}
    for t, z, n_ in dla_rows:
        dlas_by_thing.setdefault(int(t), []).append((z, n_))

    spec_dir = params.spectra_directory("dr12q"); spec_dir.mkdir(parents=True)
    noise_sd = 0.1
    for i in range(N):
        z = z_qsos[i]
        lam0 = 890.0 * (1 + z)
        n_px = int(np.log10(1400.0 / 890.0) / 1e-4)
        loglam = np.log10(lam0) + 1e-4 * np.arange(n_px)
        lam = 10.0 ** loglam
        rest = lam / (1 + z)
        f = np.where(
            rest <= 1250.0,
            np.interp(rest, grid, truth_model.mu)
            + np.interp(rest, grid, truth_model.M @ rng.normal(size=20)),
            1.0,
        ) + rng.normal(0, noise_sd, n_px)
        for z_dla, log_n in dlas_by_thing.get(int(thing_ids[i]), []):
            from gp_dla_detection_tpu.ops.voigt import (
                extend_wavelengths,
                voigt_absorption as va,
            )

            ext = extend_wavelengths(lam)
            f *= np.asarray(va(ext, z_dla, 10.0 ** log_n, num_lines=3))
        plate_dir = spec_dir / str(plates[i]); plate_dir.mkdir(exist_ok=True)
        write_bintable(
            plate_dir / f"spec-{plates[i]}-{mjds[i]}-{fibers[i]:04d}.fits",
            ["FLUX", "LOGLAM", "IVAR", "AND_MASK", "OR_MASK"],
            [f.astype(np.float32), loglam.astype(np.float32),
             np.full(n_px, 1.0 / noise_sd**2, np.float32),
             np.zeros(n_px, np.int32), np.zeros(n_px, np.int32)])
    return dlas_by_thing


def make_pipeline(root: Path):
    from gp_dla_detection_tpu.params import (
        DLASamplingParams, OptimizationParams, Parameters)
    from gp_dla_detection_tpu.pipeline import Pipeline, PipelineConfig

    params = Parameters(
        base_directory=str(root / "data"),
        optimization=OptimizationParams(max_iterations=300, max_fun_evals=600),
        dla_sampling=DLASamplingParams(num_dla_samples=5000),
    )
    config = PipelineConfig(
        workdir=str(root / "run"), per_device_batch=128,
        sample_chunk=2500, dtype="float32", backend="pallas",
        multi_dla=True,
    )
    return params, Pipeline(params, config)


def phase_cpu(root: Path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    params, pipe = make_pipeline(root)
    timings = {}
    if not (root / "data").exists():
        t0 = time.time(); fabricate_release(root, params)
        timings["fabricate"] = time.time() - t0
    t0 = time.time(); catalog = pipe.run_catalog()
    timings["catalog"] = time.time() - t0
    t0 = time.time(); spectra = pipe.run_preload(catalog)
    timings["preload"] = time.time() - t0
    t0 = time.time(); pipe.run_learn(catalog, spectra)
    timings["learn (CPU L-BFGS)"] = time.time() - t0
    t0 = time.time(); pipe.run_samples(catalog)
    timings["samples"] = time.time() - t0
    print({k: round(v, 1) for k, v in timings.items()})
    np.savez(root / "timings_cpu.npz", **timings)


def phase_tpu(root: Path):
    params, pipe = make_pipeline(root)
    timings = {}
    catalog = pipe.run_catalog()
    spectra = pipe.run_preload(catalog)
    model = pipe.run_learn(catalog, spectra)
    samples = pipe.run_samples(catalog)
    test_mask = pipe.default_test_mask(catalog, spectra)
    t0 = time.time()
    results = pipe.run_inference(catalog, spectra, model, samples, test_mask)
    timings["inference (pallas)"] = time.time() - t0
    t0 = time.time()
    multi = pipe.run_multi(catalog, spectra, model, samples, results, test_mask)
    timings["two-DLA stage"] = time.time() - t0
    t0 = time.time()
    pipe.run_snrs(spectra, results, test_mask)
    pipe.run_ascii(catalog, samples, results, test_mask)
    timings["snrs + ascii"] = time.time() - t0
    print({k: round(v, 1) for k, v in timings.items()})
    np.savez(root / "timings_tpu.npz", **timings)
    report(root, params, pipe, catalog, results, multi, test_mask)


def report(root, params, pipe, catalog, results, multi, test_mask):
    from gp_dla_detection_tpu.analysis import DLACatalogue

    dc = catalog.dla_catalogs["dr9q_concordance"]
    idx = np.flatnonzero(test_mask)
    truth_n = np.array([len(dc.z_dlas[int(i)]) for i in idx])
    picks = np.argmax(multi.model_posteriors, axis=1)
    conf = np.zeros((3, 3), int)
    for t, p in zip(np.minimum(truth_n, 2), picks):
        conf[t, p] += 1

    det = results.p_dlas > 0.9
    hosts = truth_n > 0
    tp = int(det[hosts].sum()); fp = int(det[~hosts].sum())

    cat = DLACatalogue.from_run(pipe.workdir, multi=True)
    z_c, dndx, _, _, _ = cat.line_density(z_min=2.0, z_max=3.4)

    t_cpu = dict(np.load(root / "timings_cpu.npz"))
    t_tpu = dict(np.load(root / "timings_tpu.npz"))
    lines = [
        "# Dress rehearsal: 512-quasar synthetic release, all stages",
        "",
        "Stage timings (CPU phase = fabrication + host stages + L-BFGS",
        "training; TPU phase = sharded pallas inference through ASCII):",
        "",
    ]
    for d in (t_cpu, t_tpu):
        for k, v in d.items():
            lines.append(f"- {k}: {float(v):.1f} s")
    lines += [
        "",
        f"- processed spectra: {int(test_mask.sum())} of {len(catalog)}",
        f"- single-DLA detection at p>0.9: TP {tp}/{int(hosts.sum())}, FP {fp}",
        "- multiplicity confusion (rows = truth 0/1/2, cols = MAP pick):",
        "",
        "  | truth\\pick | 0 | 1 | 2 |",
        "  |---|---|---|---|",
    ] + [f"  | {t} | {conf[t,0]} | {conf[t,1]} | {conf[t,2]} |" for t in range(3)] + [
        "",
        f"- dN/dX over z=[2.0, 3.4]: {np.round(dndx, 3).tolist()}",
    ]
    out = Path(__file__).parent / "RESULTS_REHEARSAL.md"
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))

    assert tp / max(hosts.sum(), 1) > 0.85, "rehearsal completeness too low"
    assert fp <= max(2, 0.02 * (~hosts).sum()), "rehearsal FP rate too high"
    print("REHEARSAL OK")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/rehearsal")
    p.add_argument("--phase", default="all", choices=["cpu", "tpu", "all"])
    args = p.parse_args()
    root = Path(args.root)
    if args.phase == "all":
        # the CPU phase pins jax to CPU (host-loop L-BFGS is
        # tunnel-bound on remote TPUs) — run it in a subprocess so this
        # process keeps the accelerator for the inference phase
        import subprocess
        import sys

        subprocess.run(
            [sys.executable, __file__, "--root", str(root), "--phase", "cpu"],
            check=True,
        )
        phase_tpu(root)
    elif args.phase == "cpu":
        phase_cpu(root)
    else:
        phase_tpu(root)
