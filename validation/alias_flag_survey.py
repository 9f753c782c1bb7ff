"""Survey-scale measurement of the Lyβ-alias suspect flag.

The r4 forensics (oversplit_forensics.py, RESULTS_SURVEY.md) diagnosed
the over-split population's deterministic signature; alias_flag.py
productized it.  This harness measures the flag where it matters, on
the full 162k survey catalogs:

  - capture rate on the over-split singles (truth=1 called 2) —
    forensics predict ~half (the Lyβ-alias fraction at 500 km/s),
  - false-flag rate on the TRUE doubles (truth=2 called 2) — expected
    ~0 (injected second columns sit well above the prior floor),

for BOTH the classic full-matrix catalog (MAP via host argmax) and the
lean R=4 catalog (device-reduced MAP indices).  Appends the numbers to
RESULTS_SURVEY.md.

Usage: python validation/alias_flag_survey.py [--workdir /tmp/gpdla_survey]
(after survey_run.py [+ --pair] and survey_lean_run.py have populated
the workdir).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))

from scale_rehearsal import _artifacts  # noqa: E402


def _load_multi(path: Path):
    """Minimal MultiDLAResults view for alias_flag (lazy npz access)."""
    f = np.load(path)
    single = SimpleNamespace(
        min_z_dlas=f["min_z_dlas"], max_z_dlas=f["max_z_dlas"]
    )
    lean = "map_sample_inds2" in f.files
    return SimpleNamespace(
        single=single,
        map_sample_inds2=f["map_sample_inds2"] if lean else None,
        map_base_sample_inds=(
            f["map_base_sample_inds"] if lean else None
        ),
        sample_log_likelihoods_dla2=(
            None if lean else f["sample_log_likelihoods_dla2"]
        ),
        base_sample_inds=None if lean else f["base_sample_inds"],
        model_posteriors=f["multi_model_posteriors"],
    )


def measure(multi, offsets, lnhis, truth_mult, label: str) -> list[str]:
    from gp_dla_detection_tpu.alias_flag import lyb_alias_suspect

    mult = np.argmax(multi.model_posteriors, axis=1)
    flag = lyb_alias_suspect(multi, offsets, lnhis)
    oversplit = (truth_mult == 1) & (mult == 2)
    true_double = (truth_mult == 2) & (mult == 2)
    cap = float(flag[oversplit].mean()) if oversplit.any() else float("nan")
    ff = float(flag[true_double].mean()) if true_double.any() else float("nan")
    return [
        f"- {label}: capture {int(flag[oversplit].sum())}/"
        f"{int(oversplit.sum())} over-split singles = {cap:.1%}; "
        f"false-flag {int(flag[true_double].sum())}/"
        f"{int(true_double.sum())} true doubles = {ff:.2%}",
    ]


def main(workdir: Path) -> None:
    from gp_dla_detection_tpu.catalog import Catalog
    from gp_dla_detection_tpu.samples import DLASamples

    art = _artifacts(workdir)
    catalog = Catalog.load(art / "catalog.npz")
    samples = DLASamples.load(art / "samples.npz")
    dc = catalog.dla_catalogs["dr9q_concordance"]
    truth_mult = np.array([min(len(z), 2) for z in dc.z_dlas])

    lines = [
        "",
        "## Lyβ-alias suspect flag (r5: alias_flag.py, forensics-tuned "
        "defaults 500 km/s + log N_HI <= 20.3)",
        "",
    ]
    found = False
    for label, path in (
        (
            "classic catalog (host argmax MAP)",
            workdir / "survey" / "processed_qsos_multi_dr12q.npz",
        ),
        (
            "lean R=1 catalog (device MAP)",
            workdir / "lean" / "processed_qsos_multi_dr12q.npz",
        ),
        (
            "lean R=4 catalog (device MAP)",
            workdir / "lean_r4" / "processed_qsos_multi_dr12q.npz",
        ),
    ):
        if not path.exists():
            lines.append(f"- {label}: catalog not present, skipped")
            continue
        found = True
        multi = _load_multi(path)
        lines += measure(
            multi, samples.offset_samples, samples.log_nhi_samples,
            truth_mult, label,
        )
    if not found:
        raise SystemExit("no catalogs in the workdir — run the survey first")
    lines.append(
        "- flagged calls stay in the catalog (suspicion, not exclusion); "
        "the flag rides <set>_multi_results.dat and the multi .mat export"
    )
    out = HERE / "RESULTS_SURVEY.md"
    out.write_text(out.read_text() + "\n".join(lines) + "\n")
    print("\n".join(lines))
    print("ALIAS FLAG SURVEY OK")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/gpdla_survey")
    a = p.parse_args()
    main(Path(a.workdir))
