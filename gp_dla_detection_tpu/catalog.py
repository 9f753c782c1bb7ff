"""QSO/DLA catalog construction (L2: build_catalogs.m).

Reads the DR9Q/DR10Q/DR12Q quasar catalogs (FITS binary tables) and the
three processed DLA catalogs (text files produced by the download
scripts, data/scripts/download_catalogs.sh:41-80), applies the initial
filters, and produces the typed :class:`Catalog` artifact — the
replacement for catalog.mat and for the reference's eval'd string
predicates: selections are expressed as boolean-mask helper methods.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .params import Parameters

__all__ = ["Catalog", "DLACatalog", "build_catalog", "V_5_7_2_PLATES"]

# plates processed with the 5.7.2 pipeline in SDSS DR12
# (build_catalogs.m:95-99)
V_5_7_2_PLATES = np.array(
    [7339, 7340, 7386, 7388, 7389, 7391, 7396, 7398, 7401, 7402, 7404,
     7406, 7407, 7408, 7409, 7411, 7413, 7416, 7419, 7422, 7425, 7426,
     7428, 7455, 7512, 7513, 7515, 7516, 7517, 7562, 7563, 7564, 7565]
)

DLA_CATALOG_NAMES = ("dr9q_concordance", "dr12q_noterdaeme", "dr12q_visual")


@dataclass
class DLACatalog:
    """One external DLA catalog cross-matched onto the quasar list.

    los_ind[i]: sightline i was searched by this catalog.
    dla_ind[i]: sightline i hosts >= 1 DLA in this catalog.
    z_dlas[i] / log_nhis[i]: per-sightline absorber parameter arrays
    (empty when none) — the reference's containers.Map cell arrays
    (build_catalogs.m:50-82).
    """

    los_ind: np.ndarray                  # (N,) bool
    dla_ind: np.ndarray                  # (N,) bool
    z_dlas: list[np.ndarray]             # N ragged rows
    log_nhis: list[np.ndarray]           # N ragged rows

    def all_log_nhis(self) -> np.ndarray:
        present = [x for x in self.log_nhis if len(x)]
        return np.concatenate(present) if present else np.empty(0)


@dataclass
class Catalog:
    """The catalog.mat equivalent (build_catalogs.m:84-91)."""

    sdss_names: np.ndarray      # (N,) str
    ras: np.ndarray             # (N,)
    decs: np.ndarray            # (N,)
    thing_ids: np.ndarray       # (N,) int64
    plates: np.ndarray          # (N,) int64
    mjds: np.ndarray            # (N,) int64
    fiber_ids: np.ndarray       # (N,) int64
    z_qsos: np.ndarray          # (N,)
    snrs: np.ndarray            # (N,)
    bal_visual_flags: np.ndarray  # (N,) bool
    in_dr9: np.ndarray          # (N,) bool
    in_dr10: np.ndarray         # (N,) bool
    filter_flags: np.ndarray    # (N,) uint8 (bits 0-3, see spectra.py)
    dla_catalogs: dict[str, DLACatalog] = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.z_qsos)

    # --- selection helpers (replacing eval'd train_ind/prior_ind/test_ind
    # strings, learn_qso_model.m:16-18, process_qsos.m:7-9, :52-54) ---

    def unfiltered(self) -> np.ndarray:
        return self.filter_flags == 0

    def los(self, name: str) -> np.ndarray:
        return self.dla_catalogs[name].los_ind

    def dla(self, name: str) -> np.ndarray:
        return self.dla_catalogs[name].dla_ind

    def train_dr9_no_concordance_dlas(self) -> np.ndarray:
        """The paper's training selection (README.md:135-141): DR9
        quasars searched by the concordance catalog, minus its DLAs."""
        return (
            self.in_dr9
            & self.los("dr9q_concordance")
            & ~self.dla("dr9q_concordance")
            & self.unfiltered()
        )

    def prior_dr9_concordance(self) -> np.ndarray:
        """The paper's prior selection (README.md:240-245):
        in_dr9 & los_inds & filter_flags == 0."""
        return (
            self.in_dr9 & self.los("dr9q_concordance") & self.unfiltered()
        )

    # --- spectra file list (build_catalogs.m:101-119) ---

    def file_list(self) -> list[str]:
        """Relative rsync paths of every unfiltered spectrum, with the
        greedy duplicate v5_7_2 entries for the 33 special plates."""
        v572 = np.isin(self.plates, V_5_7_2_PLATES)
        out = []
        for i in range(len(self)):
            if self.filter_flags[i] > 0:
                continue
            rel = (
                f"{self.plates[i]}/spec-{self.plates[i]}-{self.mjds[i]}"
                f"-{self.fiber_ids[i]:04d}.fits"
            )
            if v572[i]:
                out.append(f"v5_7_2/spectra/lite/./{rel}")
            out.append(f"v5_7_0/spectra/lite/./{rel}")
        return out

    # --- artifact I/O (ragged rows stored as values + offsets) ---

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload: dict = {}
        for f_ in dataclasses.fields(self):
            if f_.name == "dla_catalogs":
                continue
            payload[f_.name] = getattr(self, f_.name)
        payload["sdss_names"] = np.asarray(self.sdss_names, dtype="U24")
        payload["dla_catalog_names"] = np.asarray(
            list(self.dla_catalogs), dtype="U32"
        )
        for name, dc in self.dla_catalogs.items():
            lengths = np.array([len(z) for z in dc.z_dlas], np.int64)
            offsets = np.concatenate([[0], np.cumsum(lengths)])
            payload[f"dla__{name}__los_ind"] = dc.los_ind
            payload[f"dla__{name}__dla_ind"] = dc.dla_ind
            payload[f"dla__{name}__offsets"] = offsets
            payload[f"dla__{name}__z_dlas"] = (
                np.concatenate(dc.z_dlas) if offsets[-1] else np.empty(0)
            )
            payload[f"dla__{name}__log_nhis"] = (
                np.concatenate(dc.log_nhis) if offsets[-1] else np.empty(0)
            )
        np.savez_compressed(path, **payload)

    @classmethod
    def load(cls, path: str | Path) -> "Catalog":
        with np.load(Path(path)) as f:
            names = [str(n) for n in f["dla_catalog_names"]]
            dla_catalogs = {}
            for name in names:
                offsets = f[f"dla__{name}__offsets"]
                zs = f[f"dla__{name}__z_dlas"]
                ls = f[f"dla__{name}__log_nhis"]
                z_rows = [zs[offsets[i]:offsets[i + 1]] for i in range(len(offsets) - 1)]
                l_rows = [ls[offsets[i]:offsets[i + 1]] for i in range(len(offsets) - 1)]
                dla_catalogs[name] = DLACatalog(
                    los_ind=f[f"dla__{name}__los_ind"],
                    dla_ind=f[f"dla__{name}__dla_ind"],
                    z_dlas=z_rows,
                    log_nhis=l_rows,
                )
            kwargs = {
                f_.name: f[f_.name]
                for f_ in dataclasses.fields(cls)
                if f_.name != "dla_catalogs"
            }
            return cls(**kwargs, dla_catalogs=dla_catalogs)


def _load_dla_text_catalog(directory: Path, thing_ids: np.ndarray) -> DLACatalog:
    """Cross-match one processed DLA catalog onto the quasar list
    (build_catalogs.m:56-82).

    los_catalog: one thing_id per line.  dla_catalog: rows of
    (thing_id, z_dla, log_nhi).
    """
    los = np.loadtxt(directory / "los_catalog", ndmin=1)
    dla = np.loadtxt(directory / "dla_catalog", ndmin=2)
    if dla.size == 0:
        dla = dla.reshape(0, 3)

    los_ind = np.isin(thing_ids, los.astype(np.int64))
    dla_things = dla[:, 0].astype(np.int64)
    dla_ind = np.isin(thing_ids, dla_things)

    order = {}
    for row in range(dla.shape[0]):
        order.setdefault(int(dla_things[row]), []).append(row)
    z_dlas, log_nhis = [], []
    for tid in thing_ids:
        rows = order.get(int(tid), [])
        z_dlas.append(np.asarray(dla[rows, 1]) if rows else np.empty(0))
        log_nhis.append(np.asarray(dla[rows, 2]) if rows else np.empty(0))
    return DLACatalog(los_ind, dla_ind, z_dlas, log_nhis)


def build_catalog(
    params: Parameters | None = None,
    dr9q_path: str | Path | None = None,
    dr10q_path: str | Path | None = None,
    dr12q_path: str | Path | None = None,
    dla_catalog_names=DLA_CATALOG_NAMES,
) -> Catalog:
    """Build the catalog from FITS + DLA text files (build_catalogs.m).

    Columns are taken by position from the DR12Q binary table exactly as
    the reference does (build_catalogs.m:21-30): 1 SDSS_NAME, 2 RA,
    3 DEC, 4 THING_ID, 5 PLATE, 6 MJD, 7 FIBERID, 8 Z_VI, 33 SNR,
    56 BAL_FLAG_VI.
    """
    from .io.fits import read_bintable

    if params is None:
        params = Parameters()
    if dr9q_path is None:
        dr9q_path = params.distfiles_directory("dr9q") / "DR9Q.fits"
    if dr10q_path is None:
        dr10q_path = params.distfiles_directory("dr10q") / "DR10Q_v2.fits"
    if dr12q_path is None:
        dr12q_path = params.distfiles_directory("dr12q") / "DR12Q.fits"

    dr9 = read_bintable(dr9q_path)
    dr10 = read_bintable(dr10q_path)
    dr12 = read_bintable(dr12q_path)

    sdss_names = np.array(
        [s.decode() if isinstance(s, bytes) else str(s) for s in dr12[0]]
    )
    ras = np.asarray(dr12[1], np.float64)
    decs = np.asarray(dr12[2], np.float64)
    thing_ids = np.asarray(dr12[3], np.int64)
    plates = np.asarray(dr12[4], np.int64)
    mjds = np.asarray(dr12[5], np.int64)
    fiber_ids = np.asarray(dr12[6], np.int64)
    z_qsos = np.asarray(dr12[7], np.float64)
    snrs = np.asarray(dr12[32], np.float64)
    bal_visual_flags = np.asarray(dr12[55]) > 0

    num_quasars = len(z_qsos)
    in_dr9 = np.isin(thing_ids, np.asarray(dr9[3], np.int64))
    in_dr10 = np.isin(thing_ids, np.asarray(dr10[3], np.int64))

    filter_flags = np.zeros(num_quasars, np.uint8)
    filter_flags[z_qsos < params.z_qso_cut] |= 1 << 0   # bit 0: z cut
    filter_flags[bal_visual_flags] |= 1 << 1            # bit 1: BAL

    dla_catalogs = {
        name: _load_dla_text_catalog(
            params.dla_catalog_directory(name), thing_ids
        )
        for name in dla_catalog_names
    }

    return Catalog(
        sdss_names=sdss_names,
        ras=ras,
        decs=decs,
        thing_ids=thing_ids,
        plates=plates,
        mjds=mjds,
        fiber_ids=fiber_ids,
        z_qsos=z_qsos,
        snrs=snrs,
        bal_visual_flags=bal_visual_flags,
        in_dr9=in_dr9,
        in_dr10=in_dr10,
        filter_flags=filter_flags,
        dla_catalogs=dla_catalogs,
    )
