"""Smoke tests for the driver-facing entry points: bench.py (the
recorded benchmark — a breakage here silences the project's headline
signal) and scripts/scale_demo.py, at toy sizes on the test backend."""

import json
import runpy
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def test_bench_smoke(capsys, monkeypatch):
    monkeypatch.syspath_prepend(str(ROOT))
    import bench

    bench.main(
        batch_size=4, num_samples=64, pixels=250, k=4,
        sample_chunk=32, iters=1, backend="xla",
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["unit"] == "spectra/s"
    assert out["value"] > 0
    assert out["vs_baseline"] > 0


def test_bench_driver_smoke(capsys, monkeypatch):
    """The sustained end-to-end driver benchmark mode (bench.py
    --driver): full sharded driver with checkpointing + f16 streaming
    at toy sizes."""
    monkeypatch.syspath_prepend(str(ROOT))
    import bench

    bench.main_driver(
        n_spectra=12, per_device_batch=4, num_samples=64, pixels=250,
        k=4, backend="xla",
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert "end-to-end driver" in out["metric"]
    assert out["unit"] == "spectra/s"
    assert out["value"] > 0


def test_dryrun_multichip_self_verifying(monkeypatch):
    """The driver-facing multi-chip dry run on the 8-virtual-device CPU
    mesh, including its internal sharded-vs-replicated equality and
    pair-validity-geometry assertions."""
    monkeypatch.syspath_prepend(str(ROOT))
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_scale_demo_smoke(capsys, monkeypatch):
    monkeypatch.syspath_prepend(str(ROOT / "scripts"))
    demo = runpy.run_path(str(ROOT / "scripts" / "scale_demo.py"))
    demo["main"](n_spectra=6, backend="xla", seed=3, num_samples=120)
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    final = lines[-1]
    assert final["stage"] == "two_stage_model_selection"
    assert final["n_spectra"] == 6
    assert np.isfinite(final["seconds"])
