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
