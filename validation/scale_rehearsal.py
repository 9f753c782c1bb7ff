"""Survey-scale rehearsal: 16k+ sightlines with a mid-run SIGKILL/resume.

Proves the failure-recovery contract the reference lacks (process_qsos.m
saves once at the very end, :234-249 — a crash loses the whole run) at a
scale where it matters: the full two-stage {0,1,2}-DLA pipeline
(pipeline.run_inference + run_multi, sharded pallas drivers,
checkpointing + f16 streaming) over 16,384 synthetic sightlines x 10k
QMC samples, killed with SIGKILL mid-stage (once during the single-DLA
pass, once during the pair pass), resumed, and required to produce
BIT-IDENTICAL results to an uninterrupted run.

Protocol (orchestrated by `python validation/scale_rehearsal.py`):
  1. build  — synthesize the universe once, save stage artifacts
  2. run A  — SIGKILL while the single-DLA manifest is mid-flight
  3. run A  — resume; SIGKILL while the pair manifest is mid-flight
  4. run A  — resume to completion
  5. run B  — uninterrupted, fresh checkpoint dir
  6. compare A vs B field-by-field (np.array_equal, NaN-aware)
Writes validation/RESULTS_SCALE.md.

Subcommands `build` / `run` exist so the orchestrator can execute the
worker in a separate OS process (a SIGKILL must take down a real
process, not a thread).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
DEFAULT_N = 16384
PER_DEVICE_BATCH = 1024  # overridable via --batch (workers inherit it)


def _artifacts(workdir: Path) -> Path:
    return workdir / "artifacts"


def _maybe_force_cpu() -> None:
    """Honor GPDLA_REHEARSAL_CPU in EVERY process that touches jax —
    build() compiles the injection Voigt kernel, so an orchestrator
    that only gated the worker would still initialize the remote TPU
    backend (and hang through a tunnel outage) just to build the
    universe.  Must run before first device use."""
    import os

    if os.environ.get("GPDLA_REHEARSAL_CPU"):
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (caller's responsibility)


def build(workdir: Path, n_spectra: int = DEFAULT_N, seed: int = 40) -> None:
    """Synthesize the universe and save the stage artifacts the two
    inference stages consume (catalog, ragged spectra, model, samples)."""
    _maybe_force_cpu()
    from gp_dla_detection_tpu import Parameters
    from gp_dla_detection_tpu.catalog import Catalog, DLACatalog
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.ops.voigt import voigt_absorption
    from gp_dla_detection_tpu.params import NullModelParams
    from gp_dla_detection_tpu.samples import generate_dla_samples
    from gp_dla_detection_tpu.spectra import RaggedSpectra

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

    lya = 1215.6701
    noise_sd = 0.1
    z_qso = rng.uniform(2.4, 3.4, n_spectra)
    t0 = time.time()
    # Generate on a FIXED full-width grid and truncate per sightline at
    # the end: per-spectrum ragged lengths would recompile the jitted
    # Voigt kernel once per distinct length (minutes at 16k); one fixed
    # shape compiles once.
    P = params.pixel_pad
    n_px_arr = rng.integers(1000, P + 1, n_spectra)
    lam_full = (911.9 * (1 + z_qso))[:, None] * (
        10 ** (1e-4 * np.arange(P))
    )[None, :]
    flux_full = np.empty((n_spectra, P))
    for i in range(n_spectra):  # numpy-only: fast
        rest = lam_full[i] / (1 + z_qso[i])
        flux_full[i] = (
            np.interp(rest, grid, model.mu)
            + np.interp(rest, grid, model.M @ rng.normal(size=20))
            + rng.normal(0, noise_sd, P)
        )

    # ~30% of sightlines host one DLA inside their searchable range, and
    # ~20% of THOSE host a second, well-separated absorber.  The second
    # population is load-bearing for the pair-stage validation: with a
    # single-DLA-only concordance catalog the two-DLA counting prior is
    # exactly zero (multi_dla_rate_priors n2=0 -> log_p_two=-inf), so
    # "the pair stage never over-splits" would be vacuously true no
    # matter how broken the pair kernel is.
    from gp_dla_detection_tpu.params import kms_to_z

    min_sep_log = float(np.log1p(kms_to_z(3000.0)))
    dla_flag = np.zeros(n_spectra, bool)
    z_rows: list[np.ndarray] = [np.empty(0)] * n_spectra
    n_rows: list[np.ndarray] = [np.empty(0)] * n_spectra
    inj: list[tuple[int, float, float]] = []
    for i in range(n_spectra):
        if rng.uniform() >= 0.3:
            continue
        last = lam_full[i, n_px_arr[i] - 1]
        zmin = max(
            lam_full[i, 0] / lya - 1,
            911.7633 * (1 + z_qso[i]) / lya - 1 + params.min_z_cut,
        )
        zmax = (
            min(last, params.null_model.max_lambda * (1 + z_qso[i]))
            / lya - 1 - params.max_z_cut
        )
        if zmax > zmin:
            z_dla = rng.uniform(zmin, zmax)
            entries = [(z_dla, rng.uniform(20.3, 21.8))]
            if rng.uniform() < 0.2:
                # second absorber at >= 3x the pair-selection separation
                # cut, so the truth is unambiguously two
                for _ in range(12):
                    z2 = rng.uniform(zmin, zmax)
                    if abs(np.log1p(z2) - np.log1p(z_dla)) > 3 * min_sep_log:
                        entries.append((z2, rng.uniform(20.3, 21.5)))
                        break
            inj.extend((i, z, ln) for z, ln in entries)
            dla_flag[i] = True
            z_rows[i] = np.array([z for z, _ in entries])
            n_rows[i] = np.array([ln for _, ln in entries])

    # batched absorption: numpy log-continuation padding + one vmapped
    # Voigt compile per chunk shape
    import jax

    w = params.instrument.width
    dex = 10 ** (params.instrument.pixel_spacing * np.arange(1, w + 1))
    vvoigt = jax.jit(
        jax.vmap(
            lambda e, z, n: voigt_absorption(e, z, n, num_lines=3)
        )
    )
    CH = 256
    for c0 in range(0, len(inj), CH):
        chunk = inj[c0 : c0 + CH]
        pad = CH - len(chunk)
        chunk = chunk + [chunk[-1]] * pad
        idx = np.array([i for i, _, _ in chunk])
        lam_c = lam_full[idx]
        ext = np.concatenate(
            [lam_c[:, :1] / dex[::-1], lam_c, lam_c[:, -1:] * dex], axis=1
        )
        absorb = np.asarray(
            vvoigt(
                ext,
                np.array([z for _, z, _ in chunk]),
                np.array([10.0**ln for _, _, ln in chunk]),
            )
        )
        keep = len(chunk) - pad
        # unbuffered: a sightline hosting TWO absorbers appears twice in
        # idx, and plain fancy-index *= would apply only one of them
        np.multiply.at(flux_full, idx[:keep], absorb[:keep])

    waves, fluxes, noises, masks = [], [], [], []
    for i in range(n_spectra):
        n_px = int(n_px_arr[i])
        pm = np.zeros(n_px, bool)
        pm[rng.choice(n_px, size=8, replace=False)] = True
        waves.append(lam_full[i, :n_px])
        fluxes.append(flux_full[i, :n_px])
        noises.append(np.full(n_px, noise_sd**2))
        masks.append(pm)
    print(f"built {n_spectra} sightlines in {time.time() - t0:.1f}s", flush=True)

    spectra = RaggedSpectra.from_lists(
        waves, fluxes, noises, masks, np.ones(n_spectra)
    )
    catalog = Catalog(
        sdss_names=np.array([f"J{i:017d}" for i in range(n_spectra)]),
        ras=rng.uniform(0, 360, n_spectra),
        decs=rng.uniform(-10, 70, n_spectra),
        thing_ids=np.arange(n_spectra, dtype=np.int64),
        plates=np.full(n_spectra, 4055, np.int64),
        mjds=np.full(n_spectra, 55359, np.int64),
        fiber_ids=np.arange(1, n_spectra + 1, dtype=np.int64),
        z_qsos=z_qso,
        snrs=rng.uniform(1, 20, n_spectra),
        bal_visual_flags=np.zeros(n_spectra, bool),
        in_dr9=np.ones(n_spectra, bool),
        in_dr10=np.ones(n_spectra, bool),
        filter_flags=np.zeros(n_spectra, np.uint8),
        dla_catalogs={
            "dr9q_concordance": DLACatalog(
                los_ind=np.ones(n_spectra, bool),
                dla_ind=dla_flag,
                z_dlas=z_rows,
                log_nhis=n_rows,
            )
        },
    )
    samples = generate_dla_samples(
        rng.normal(20.7, 0.4, 400).clip(20.05, 22.4), params
    )

    art = _artifacts(workdir)
    art.mkdir(parents=True, exist_ok=True)
    catalog.save(art / "catalog.npz")
    spectra.save(art / "preloaded_qsos.npz")
    model.save(art / "model.npz")
    samples.save(art / "samples.npz")
    print("artifacts saved", flush=True)


def run(workdir: Path, run_name: str, batch: int = PER_DEVICE_BATCH,
        stage: str = "both") -> None:
    """One worker pass: run_inference (and, with stage="both",
    run_multi) under workdir/<run_name>, resuming from whatever
    checkpoints exist.  stage="inference" is the reference's actual
    headline workload (process_qsos.m is single-DLA {0,1} selection;
    the pair stage is a later-pipeline extension) — used by
    survey_run.py at full DR12Q scale."""
    _maybe_force_cpu()
    from gp_dla_detection_tpu import Parameters
    from gp_dla_detection_tpu.catalog import Catalog
    from gp_dla_detection_tpu.models.qso_model import GPModel
    from gp_dla_detection_tpu.params import NullModelParams
    from gp_dla_detection_tpu.pipeline import Pipeline, PipelineConfig
    from gp_dla_detection_tpu.samples import DLASamples
    from gp_dla_detection_tpu.spectra import RaggedSpectra

    art = _artifacts(workdir)
    catalog = Catalog.load(art / "catalog.npz")
    spectra = RaggedSpectra.load(art / "preloaded_qsos.npz")
    model = GPModel.load(art / "model.npz")
    samples = DLASamples.load(art / "samples.npz")

    params = Parameters(null_model=NullModelParams(k=20))
    pipe = Pipeline(
        params,
        PipelineConfig(
            workdir=str(workdir / run_name),
            per_device_batch=batch,
            backend="pallas",
            dtype="float32",
        ),
    )
    timings = {}
    t0 = time.time()
    results = pipe.run_inference(catalog, spectra, model, samples)
    timings["inference_s"] = round(time.time() - t0, 2)
    if stage == "both":
        test_mask = Pipeline.default_test_mask(catalog, spectra)
        t0 = time.time()
        pipe.run_multi(catalog, spectra, model, samples, results, test_mask)
        timings["multi_s"] = round(time.time() - t0, 2)
    (workdir / run_name / "timings.json").write_text(json.dumps(timings))
    print(f"RUN COMPLETE {json.dumps(timings)}", flush=True)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def _manifest_count(path: Path) -> int:
    try:
        return len(json.loads(path.read_text())["completed_batches"])
    except (FileNotFoundError, json.JSONDecodeError, KeyError):
        return 0


_LAUNCH_COUNTER = [0]


def _launch(workdir: Path, run_name: str,
            batch: int = PER_DEVICE_BATCH) -> subprocess.Popen:
    _LAUNCH_COUNTER[0] += 1
    log = workdir / f"worker_{_LAUNCH_COUNTER[0]:02d}_{run_name}.log"
    with open(log, "w") as fh:  # the child keeps its own descriptor
        proc = subprocess.Popen(
            [sys.executable, str(HERE / "scale_rehearsal.py"), "run",
             "--workdir", str(workdir), "--run-name", run_name,
             "--batch", str(batch)],
            stdout=fh, stderr=subprocess.STDOUT, text=True,
        )
    proc._log_path = log  # type: ignore[attr-defined]
    return proc


def _kill_when(proc: subprocess.Popen, manifest: Path, at_least: int,
               timeout: float = 3600.0) -> int:
    """SIGKILL the worker once ``manifest`` shows >= at_least completed
    batches.  Returns the completed-batch count at kill time.

    The manifest is checked BEFORE the process: a worker that crosses
    the kill point and exits within one poll interval must count as
    reaching it (killing an already-dead process is a no-op), not raise
    a spurious 'exited before the kill point'.
    """
    t0 = time.time()
    while time.time() - t0 < timeout:
        n = _manifest_count(manifest)
        if n >= at_least:
            proc.kill()
            proc.wait()
            return n
        if proc.poll() is not None:
            state = (
                "completed the whole run before the kill point — "
                "n_spectra/batch too small to exercise kill/resume "
                f"(need at_least={at_least} < total batches)"
                if proc.returncode == 0
                else f"crashed (rc={proc.returncode})"
            )
            raise RuntimeError(
                f"worker {state}; see {getattr(proc, '_log_path', '?')}"
            )
        time.sleep(1.0)
    proc.kill()
    proc.wait()
    raise TimeoutError(f"kill point not reached within {timeout}s")


def _wait_ok(proc: subprocess.Popen, what: str) -> float:
    t0 = time.time()
    proc.wait()
    if proc.returncode != 0:
        log = getattr(proc, "_log_path", None)
        tail = log.read_text()[-3000:] if log else ""
        raise RuntimeError(f"{what} failed (rc={proc.returncode}):\n{tail}")
    return time.time() - t0


def orchestrate(workdir: Path, n_spectra: int = DEFAULT_N,
                batch: int = PER_DEVICE_BATCH) -> None:
    workdir.mkdir(parents=True, exist_ok=True)
    if not (_artifacts(workdir) / "samples.npz").exists():
        build(workdir, n_spectra)

    report: list[str] = [
        f"# Survey-scale rehearsal: kill/resume at {n_spectra} sightlines",
        "",
        f"- {n_spectra} synthetic sightlines x 10,000 QMC samples, "
        f"two-stage {{0,1,2}}-DLA model selection",
        f"- sharded pallas drivers, super-batch {batch}, f16 "
        "result streaming, per-batch checkpoints (atomic writes), "
        "double-buffered dispatch",
        "",
    ]
    inf_manifest = workdir / "runA" / "inference_ckpt" / "manifest.json"
    pair_manifest = workdir / "runA" / "multi_ckpt" / "pair" / "manifest.json"
    n_batches = -(-n_spectra // batch)

    # leg 1: kill during the single-DLA stage
    t0 = time.time()
    killed_at_1 = _kill_when(_launch(workdir, "runA", batch), inf_manifest,
                             max(2, n_batches // 4))
    leg1 = time.time() - t0
    report.append(
        f"- leg 1: SIGKILL during single-DLA stage at "
        f"{killed_at_1}/{n_batches} checkpointed batches ({leg1:.1f} s in)"
    )
    print(report[-1], flush=True)

    # leg 2: resume; kill during the pair stage
    t0 = time.time()
    killed_at_2 = _kill_when(_launch(workdir, "runA", batch), pair_manifest,
                             max(2, n_batches // 4))
    leg2 = time.time() - t0
    report.append(
        f"- leg 2: resumed ({_manifest_count(inf_manifest)}/{n_batches} "
        f"single-DLA batches on disk); SIGKILL during pair stage at "
        f"{killed_at_2}/{n_batches} batches ({leg2:.1f} s in)"
    )
    print(report[-1], flush=True)

    # leg 3: resume to completion
    leg3 = _wait_ok(_launch(workdir, "runA", batch), "resumed run")
    report.append(f"- leg 3: resumed to completion in {leg3:.1f} s")
    print(report[-1], flush=True)

    # leg B: uninterrupted reference run
    legB = _wait_ok(_launch(workdir, "runB", batch), "uninterrupted run")
    timings = json.loads((workdir / "runB" / "timings.json").read_text())
    rate_inf = n_spectra / timings["inference_s"]
    rate_pair = n_spectra / timings["multi_s"]
    rate_total = n_spectra / (timings["inference_s"] + timings["multi_s"])
    report += [
        f"- uninterrupted run: {legB:.1f} s wall "
        f"(single-DLA {timings['inference_s']} s = {rate_inf:.0f} spectra/s, "
        f"pair {timings['multi_s']} s = {rate_pair:.0f} spectra/s; "
        f"two-stage sustained {rate_total:.0f} spectra/s)",
    ]
    print(report[-1], flush=True)

    # bit-identity
    mismatches = []
    for fname in (
        "processed_qsos_dr12q.npz",
        "processed_qsos_multi_dr12q.npz",
    ):
        with np.load(workdir / "runA" / fname) as fa, np.load(
            workdir / "runB" / fname
        ) as fb:
            assert set(fa.files) == set(fb.files), fname
            for key in fa.files:
                a, b = fa[key], fb[key]
                same = (
                    a.shape == b.shape
                    and (
                        np.array_equal(a, b, equal_nan=True)
                        if np.issubdtype(a.dtype, np.floating)
                        else np.array_equal(a, b)
                    )
                )
                if not same:
                    mismatches.append(f"{fname}:{key}")
    if mismatches:
        report.append(f"- BIT-IDENTITY FAILED: {mismatches}")
    else:
        report.append(
            "- kill/resume run is BIT-IDENTICAL to the uninterrupted run "
            "(every array in both result files, NaN-aware equality)"
        )
    ckpt_bytes = sum(
        f.stat().st_size
        for f in (workdir / "runB").rglob("batch_*.npz")
    )
    report.append(
        f"- checkpoint volume (uninterrupted run): {ckpt_bytes / 1e6:.0f} MB "
        "across per-batch files, written on a background thread "
        "(off the dispatch/fetch critical path)"
    )
    out = HERE / "RESULTS_SCALE.md"
    out.write_text("\n".join(report) + "\n")
    print("\n".join(report))
    if mismatches:
        raise SystemExit("bit-identity check failed")
    print("SCALE REHEARSAL OK")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("cmd", nargs="?", default="orchestrate",
                   choices=["orchestrate", "build", "run"])
    p.add_argument("--workdir", default="/tmp/gpdla_scale_rehearsal")
    p.add_argument("--run-name", default="runA")
    p.add_argument("--n-spectra", type=int, default=DEFAULT_N)
    p.add_argument("--batch", type=int, default=PER_DEVICE_BATCH)
    p.add_argument("--stage", default="both", choices=["both", "inference"])
    p.add_argument("--seed", type=int, default=40)
    a = p.parse_args()
    wd = Path(a.workdir)
    if a.cmd == "build":
        build(wd, a.n_spectra, seed=a.seed)
    elif a.cmd == "run":
        run(wd, a.run_name, a.batch, a.stage)
    else:
        orchestrate(wd, a.n_spectra, a.batch)
