"""Full-convergence GP training at survey training scale.

Two claims proven here (VERDICT r2 #6):

Part A — survey scale, device optimizer, kill/resume:
  learn_gp_model(optimizer='device') from scratch at N=25,000 x 1,217
  (k=20, 25,560 parameters) with the reference's full budget
  (MaxIter 2000 / MaxFunEvals 4000, set_parameters.m:43-45), optimizer
  checkpointing exercised by a SIGKILL + resume mid-run, wall time and
  final NLL recorded.  Run on the TPU (the device loop exists precisely
  because the tunneled host loop pays ~12 s per evaluation there).

Part B — host-vs-device convergence equivalence at a scale where both
  are feasible: the same data + init through the host strong-Wolfe
  L-BFGS (minFunc-parity reference) and the device lax.while_loop
  L-BFGS; final NLLs must agree to a loose optimization tolerance
  (different line-search arithmetic takes different paths; the model
  they converge to is what matters — SURVEY.md hard-parts note).

Usage:
  python validation/training_convergence.py            # part A (TPU)
  python validation/training_convergence.py compare    # part B (any backend)
  python validation/training_convergence.py run-device --workdir W ...  # worker

Writes validation/RESULTS_TRAINING.md (section per part).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
REPORT = HERE / "RESULTS_TRAINING.md"


def make_training_data(n_quasars: int, seed: int = 5):
    """Synthetic training matrices from a known generating model, with
    per-quasar rest-coverage windows and noisy-pixel holes."""
    from gp_dla_detection_tpu import Parameters
    from gp_dla_detection_tpu.models.training import TrainingData
    from gp_dla_detection_tpu.params import LYA_WAVELENGTH, NullModelParams

    rng = np.random.default_rng(seed)
    params = Parameters(null_model=NullModelParams(k=20))
    grid = params.null_model.rest_wavelengths()
    R, k = grid.size, 20

    mu_true = 1.0 + 0.3 * np.exp(-0.5 * ((grid - 1215.67) / 25.0) ** 2)
    M_true = rng.normal(size=(R, k)) * 0.04
    omega_true = 0.1 + 0.05 * np.exp(-((grid - 1100) / 150.0) ** 2)

    z_qso = rng.uniform(2.2, 4.0, n_quasars)
    # observed-frame noise level varies per quasar
    sigma = rng.uniform(0.08, 0.25, n_quasars)

    flux = (
        mu_true[None, :]
        + rng.normal(size=(n_quasars, k)) @ M_true.T
        + rng.normal(size=(n_quasars, R)) * omega_true[None, :]
        + rng.normal(size=(n_quasars, R)) * sigma[:, None]
    )
    noise = np.broadcast_to(sigma[:, None] ** 2, (n_quasars, R)).copy()
    lya_1pzs = (1.0 + z_qso)[:, None] * grid[None, :] / LYA_WAVELENGTH

    # coverage: blue end observable only for high-z quasars (rough BOSS
    # 3650 Å blue limit), plus random masked holes
    obs_blue = 3650.0
    mask = grid[None, :] * (1.0 + z_qso)[:, None] >= obs_blue
    mask &= rng.uniform(size=(n_quasars, R)) > 0.01

    with np.errstate(invalid="ignore"):
        masked_flux = np.where(mask, flux, np.nan)
        mu_emp = np.nanmean(masked_flux, axis=0)
    centered = np.where(mask, flux - mu_emp[None, :], 0.0)
    return params, TrainingData(
        centered_flux=centered,
        lya_1pzs=np.where(mask, lya_1pzs, 1.0),
        noise_variance=np.where(mask, noise, 0.0),
        mask=mask,
        mu=mu_emp,
    )


def run_device(workdir: Path, n_quasars: int, dtype: str, seed: int) -> None:
    """Worker: from-scratch (or checkpoint-resumed) device L-BFGS fit."""
    import jax

    from gp_dla_detection_tpu.models.training import learn_gp_model
    from gp_dla_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    params, data = make_training_data(n_quasars, seed)
    workdir.mkdir(parents=True, exist_ok=True)
    ckpt = workdir / "lbfgs_ckpt.npz"
    t0 = time.time()
    model, result = learn_gp_model(
        data,
        params=params,
        dtype=np.dtype(dtype).type,
        optimizer="device",
        checkpoint_path=str(ckpt),
    )
    wall = time.time() - t0
    out = {
        "wall_s": round(wall, 1),
        "final_nll": float(result.f),
        "iterations": int(result.iterations),
        "fun_evals": int(result.fun_evals),
        "termination": result.message,
        "grad_inf_norm": float(np.max(np.abs(result.g))),
    }
    (workdir / "result.json").write_text(json.dumps(out))
    model.save(workdir / "model.npz")
    print(f"TRAINING COMPLETE {json.dumps(out)}", flush=True)


def part_a(workdir: Path, n_quasars: int = 25000, dtype: str = "float32",
           kill_after_s: float = 3600.0) -> list[str]:
    """Survey-scale device fit with a SIGKILL once the first optimizer
    checkpoint exists (waiting out remote-compile time — killing before
    any checkpoint would just restart from scratch and prove nothing
    about optimizer-state resume), then resume to completion."""
    workdir.mkdir(parents=True, exist_ok=True)
    ckpt = workdir / "lbfgs_ckpt.npz"

    def launch(tag):
        log = workdir / f"worker_{tag}.log"
        with open(log, "w") as fh:  # the child keeps its own descriptor
            return subprocess.Popen(
                [sys.executable, str(HERE / "training_convergence.py"),
                 "run-device", "--workdir", str(workdir),
                 "--n-quasars", str(n_quasars), "--dtype", dtype],
                stdout=fh, stderr=subprocess.STDOUT,
            )

    t_all = time.time()
    proc = launch("leg1")
    t0 = time.time()
    killed = False
    while time.time() - t0 < kill_after_s:
        if ckpt.exists():
            time.sleep(5.0)  # let a second checkpoint land mid-descent
            proc.kill()
            proc.wait()
            killed = True
            break
        if proc.poll() is not None:
            if proc.returncode != 0:
                # a crashed leg 1 must not masquerade as fast
                # convergence: the kill/resume property would then be
                # silently un-exercised and leg 2 would redo everything
                raise RuntimeError(
                    f"leg 1 crashed (rc={proc.returncode}): "
                    f"{(workdir / 'worker_leg1.log').read_text()[-2000:]}"
                )
            break  # finished cleanly before the kill point
        time.sleep(2.0)
    else:
        proc.kill()  # don't orphan a worker that still holds the chip
        proc.wait()
        raise TimeoutError(
            f"no optimizer checkpoint appeared within {kill_after_s}s — "
            "cannot exercise kill/resume"
        )
    iters_at_kill = None
    if ckpt.exists():
        with np.load(ckpt) as f:
            iters_at_kill = int(f["it"]) if "it" in f else None

    proc = launch("leg2")
    rc = proc.wait()
    if rc != 0:
        raise RuntimeError(
            f"resumed training failed: {(workdir / 'worker_leg2.log').read_text()[-2000:]}"
        )
    wall_total = time.time() - t_all
    res = json.loads((workdir / "result.json").read_text())
    lines = [
        "## Part A — survey-scale device L-BFGS with kill/resume",
        "",
        f"- N = {n_quasars} x 1217 rest pixels, k = 20 "
        f"(25,560 parameters), dtype {dtype}, full reference budget "
        "(MaxIter 2000 / MaxFunEvals 4000)",
        f"- SIGKILL {'delivered' if killed else 'NOT needed (converged first)'}"
        + (
            f" after the optimizer checkpoint at iteration {iters_at_kill}"
            if iters_at_kill is not None
            else ""
        ),
        f"- resumed from the checkpoint and ran to termination "
        f"'{res['termination']}' at iteration {res['iterations']} "
        f"({res['fun_evals']} evaluations)",
        f"- final NLL {res['final_nll']:.6e}, grad inf-norm "
        f"{res['grad_inf_norm']:.3e}",
        f"- wall time: {res['wall_s']:.0f} s for the resumed leg; "
        f"{wall_total:.0f} s total including the killed leg",
        "",
    ]
    print("\n".join(lines), flush=True)
    return lines


def part_b(n_quasars: int = 4096, budget: int = 400, dtype: str = "float64",
           seed: int = 9) -> list[str]:
    """Host-vs-device convergence equivalence from one init."""
    import dataclasses

    import jax

    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    from gp_dla_detection_tpu.models.training import learn_gp_model
    from gp_dla_detection_tpu.params import OptimizationParams

    params, data = make_training_data(n_quasars, seed)
    params = dataclasses.replace(
        params,
        optimization=OptimizationParams(
            max_iterations=budget, max_fun_evals=2 * budget
        ),
    )
    runs = {}
    for opt in ("device", "host"):
        t0 = time.time()
        _, result = learn_gp_model(
            data, params=params, dtype=np.dtype(dtype).type, optimizer=opt
        )
        runs[opt] = (result, time.time() - t0)
        print(
            f"{opt}: NLL {result.f:.8e} after {result.iterations} iters "
            f"({result.message}) in {runs[opt][1]:.0f} s",
            flush=True,
        )
    fd, fh = runs["device"][0].f, runs["host"][0].f
    rel = abs(fd - fh) / abs(fh)
    both_converged = (
        runs["device"][0].converged and runs["host"][0].converged
    )
    lines = [
        "## Part B — host-vs-device optimizer equivalence "
        f"(N = {n_quasars}, budget {budget}, {dtype})",
        "",
        f"- host (strong-Wolfe minFunc-parity): NLL {fh:.8e}, "
        f"{runs['host'][0].iterations} iters, {runs['host'][1]:.0f} s "
        f"({runs['host'][0].message})",
        f"- device (lax.while_loop): NLL {fd:.8e}, "
        f"{runs['device'][0].iterations} iters, {runs['device'][1]:.0f} s "
        f"({runs['device'][0].message})",
        f"- relative NLL difference: {rel:.3e} "
        + ("(both converged)" if both_converged else "(budget-limited: "
           "trajectories compared mid-descent, not at the optimum)"),
        "",
    ]
    # the equivalence claim is about the CONVERGED optimum: different
    # line-search arithmetic legitimately takes different paths, so
    # mid-trajectory NLLs at a MaxIter cut are not comparable at 1e-5
    if both_converged:
        assert rel < 1e-5, (
            f"host and device converged to different NLLs: {rel:.3e}"
        )
    else:
        assert rel < 5e-3, (
            f"host and device trajectories implausibly far apart: {rel:.3e}"
        )
    print("\n".join(lines), flush=True)
    return lines


def _update_report(section_lines: list[str], marker: str) -> None:
    header = "# Full-convergence GP training validation\n\n"
    existing = REPORT.read_text() if REPORT.exists() else header
    if not existing.startswith("#"):
        existing = header + existing
    # replace any previous instance of this section
    parts = existing.split("\n## ")
    kept = [parts[0]] + [
        "## " + p for p in parts[1:] if not ("## " + p).startswith(marker)
    ]
    REPORT.write_text(
        "".join(
            k if i == 0 else ("\n" + k) for i, k in enumerate(kept)
        ).rstrip("\n")
        + "\n\n"
        + "\n".join(section_lines).rstrip("\n")
        + "\n"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("cmd", nargs="?", default="part-a",
                   choices=["part-a", "compare", "run-device"])
    p.add_argument("--workdir", default="/tmp/gpdla_training_conv")
    p.add_argument("--n-quasars", type=int, default=None)
    p.add_argument("--dtype", default=None)
    p.add_argument("--budget", type=int, default=400)
    a = p.parse_args()
    if a.cmd == "run-device":
        run_device(Path(a.workdir), a.n_quasars or 25000,
                   a.dtype or "float32", seed=5)
    elif a.cmd == "compare":
        if os.environ.get("GPDLA_TRAINING_CPU"):
            import jax

            jax.config.update("jax_platforms", "cpu")
        lines = part_b(a.n_quasars or 4096, a.budget, a.dtype or "float64")
        _update_report(lines, "## Part B")
    else:
        lines = part_a(Path(a.workdir), a.n_quasars or 25000,
                       a.dtype or "float32")
        _update_report(lines, "## Part A")
