"""Tunnel-epoch calibration probe for RESULTS records.

Remote-TPU epochs vary ~2.5x in tunnel throughput (measured r3:
270 vs 101 spectra/s for the same driver config on different days),
which contaminates every cross-process / cross-round rate comparison.
Convention (VERDICT r3 #7): every TPU RESULTS_*.md carries the
upload-stream probe measured ADJACENT to the run, so readers can
normalize records against each other.

The probe is the decompose harness's upload-only phase (one driver
batch of per-spectrum arrays, ~17 MB f32 at B=1024, device_put then a
tiny device-sum fetch) repeated after a warmup that absorbs the
per-process first-transfer cold start.

Run standalone (prints one JSON line) or via run_epoch_probe(), which
launches a SUBPROCESS so the orchestrator process never initializes
the TPU backend itself:

    python validation/epoch_probe.py [B] [iters]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent


def measure(B: int = 1024, iters: int = 4) -> dict:
    import jax
    import jax.numpy as jnp

    from gp_dla_detection_tpu.utils.synthetic import synthetic_workload

    prob = synthetic_workload(B, 16, 1274, 4, seed=0)
    host = (
        np.asarray(prob["wavelengths"], np.float32),
        np.asarray(prob["flux"], np.float32),
        np.asarray(prob["noise_variance"], np.float32),
        np.asarray(prob["mask"]),
        np.asarray(prob["z_qso"], np.float32),
    )
    mb = sum(a.nbytes for a in host) / 1e6

    @jax.jit
    def touch(*a):
        return jnp.stack([x.astype(jnp.float32).sum() for x in a])

    def upload_once():
        a = tuple(jax.device_put(x) for x in host)
        return touch(*a)

    # warmup: compile + absorb the per-process first-transfer cold start
    np.asarray(upload_once())
    np.asarray(upload_once())

    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = upload_once()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return {
        "upload_ms_per_batch": round(1e3 * dt, 1),
        "batch_mb": round(mb, 1),
        "B": B,
        "upload_mb_s": round(mb / dt, 1),
    }


def run_epoch_probe(timeout: float = 900.0) -> dict | None:
    """Measure the current tunnel epoch in a subprocess; None on any
    failure (the probe must never sink a RESULTS record)."""
    try:
        res = subprocess.run(
            [sys.executable, str(HERE / "epoch_probe.py")],
            capture_output=True, text=True, timeout=timeout,
        )
        for line in reversed(res.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def epoch_line(probe: dict | None) -> str:
    """The one-line record convention for RESULTS_*.md files."""
    if probe is None:
        return ("- epoch calibration: probe unavailable "
                "(tunnel down at record time)")
    return (
        f"- epoch calibration (adjacent upload-stream probe): "
        f"{probe['upload_ms_per_batch']:.0f} ms per {probe['B']}-batch "
        f"({probe['batch_mb']:.1f} MB = {probe['upload_mb_s']:.0f} MB/s); "
        f"good epochs measure ~320 ms, slow ones ~900 ms — normalize "
        f"cross-record rate comparisons by this"
    )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    print(json.dumps(measure(*args)))
