"""Figure + table-data drivers (CDDF_analysis/make_plots.py rebuild).

Produces the paper figures and the plain-text tables (cddf_*.txt,
dndx_all.txt, omega_dla_all.txt) that analysis/tables.py turns into
LaTeX, plus the robustness-check sweeps (p-threshold, SNR cuts, low-z
proximity cut, z_QSO and path-length splits, bootstrap resampling).

The reference imports two external modules that are not part of its
repository (``dla_data`` with literature measurements and
``save_figure``; make_plots.py:9-10).  Overlay data here is injected via
the ``literature`` argument: a dict mapping label -> (x, y[, yerr])
arrays, plotted alongside each statistic.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = [
    "plot_cddf",
    "plot_line_density",
    "plot_omega_dla",
    "do_data_plots",
    "do_check_p_thresh",
    "do_snr_check",
    "do_pixel_noise_check",
    "do_lowzcut_check",
    "do_qso_split",
    "do_length_split",
    "do_sample_error_check",
    "do_2dla_plots",
    "do_compare_plots",
]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _restoring(cat, *attrs):
    """Context manager: save the named catalogue attributes and restore
    them on exit (success OR failure) — the sweeps must not leak their
    temporary thresholds/toggles into the caller's catalogue."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        saved = [(a, getattr(cat, a)) for a in attrs]
        try:
            yield
        finally:
            for a, v in saved:
                setattr(cat, a, v)

    return ctx()


def _errorbar(plt, *args, **kwargs):
    """plt.errorbar, minus a matplotlib quirk: its error-upcast probe
    calls math.isfinite on the first element of tuple errors, which for
    single-bin (size-1) rows trips numpy's array-to-scalar
    DeprecationWarning (matplotlib/cbook.py _safe_first_finite; fixed
    upstream in later releases).  Harmless — silence just that."""
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore",
            message="Conversion of an array with ndim > 0",
            category=DeprecationWarning,
        )
        return plt.errorbar(*args, **kwargs)


def _overlay(plt, literature):
    for label, data in (literature or {}).items():
        if len(data) == 3:
            _errorbar(plt, data[0], data[1], yerr=data[2], fmt="s", label=label)
        else:
            plt.plot(data[0], data[1], "--", label=label)


def plot_cddf(cat, zmin=1.0, zmax=6.0, label="GP", color=None, moment=False,
              twosigma=True, literature=None):
    """Plot f(N) with 68/95% bands (make_plots.py:14-21, calc_cddf.py:466-488)."""
    plt = _plt()
    l_N, cddf, cddf68, cddf95, xerrs = cat.column_density_function(
        z_min=zmin, z_max=zmax
    )
    scale = 10.0**l_N if moment else np.ones_like(l_N)
    # a z-slice can contain no DLA path at all (e.g. the 4<z<5 bin of a
    # low-z catalogue): every band is zero then, and zero data on the
    # log axes below would only emit matplotlib warnings — skip it
    if twosigma and np.any(cddf95[:, 1] > 0):
        plt.fill_between(
            10.0**l_N, scale * cddf95[:, 0], scale * cddf95[:, 1],
            color="grey", alpha=0.5,
        )
    yerr = (scale * (cddf - cddf68[:, 0]), scale * (cddf68[:, 1] - cddf))
    ii = cddf68[:, 0] > 0
    if ii.any():
        _errorbar(
            plt, 10.0 ** l_N[ii], (scale * cddf)[ii],
            yerr=(yerr[0][ii], yerr[1][ii]),
            xerr=(xerrs[0][ii], xerrs[1][ii]),
            fmt="o", label=label, color=color,
        )
    i2 = (cddf68[:, 0] == 0) & ((scale * cddf) + yerr[1] > 0)
    if i2.any():
        _errorbar(
            plt, 10.0 ** l_N[i2], (scale * cddf)[i2] + yerr[1][i2],
            yerr=yerr[1][i2] / 2.0, xerr=(xerrs[0][i2], xerrs[1][i2]),
            fmt="o", uplims=True, color=color, lw=2,
        )
    _overlay(plt, literature)
    plt.xscale("log")
    if np.any(cddf95[:, 1] > 0) or literature:
        plt.yscale("log")
    plt.xlabel(r"$N_\mathrm{HI}$ (cm$^{-2}$)")
    plt.ylabel(r"$f(N_\mathrm{HI})$")
    return l_N, cddf, cddf68, cddf95


def plot_line_density(cat, zmin=2.0, zmax=4.0, label="GP", literature=None):
    """Plot dN/dX(z) (make_plots.py:46-52, calc_cddf.py:509-519)."""
    plt = _plt()
    z_cent, dNdX, dndx68, dndx95, xerrs = cat.line_density(z_min=zmin, z_max=zmax)
    fill_x = z_cent.copy()
    if fill_x.size:
        fill_x[0] -= xerrs[0][0]
        fill_x[-1] += xerrs[1][-1]
        plt.fill_between(fill_x, dndx95[:, 0], dndx95[:, 1], color="grey", alpha=0.5)
    _errorbar(
        plt,
        z_cent, dNdX,
        yerr=(dNdX - dndx68[:, 0], dndx68[:, 1] - dNdX),
        xerr=xerrs, fmt="o", label=label,
    )
    _overlay(plt, literature)
    plt.xlabel("z")
    plt.ylabel("dN/dX")
    plt.xlim(zmin, zmax)
    return z_cent, dNdX, dndx68, dndx95


def plot_omega_dla(cat, zmin=2.0, zmax=4.0, label="GP", twosigma=True,
                   literature=None):
    """Plot 10^3 Omega_DLA(z) (make_plots.py:55-67, calc_cddf.py:664-681)."""
    plt = _plt()
    z_cent, omega, om68, om95, xerrs = cat.omega_dla_cddf(z_min=zmin, z_max=zmax)
    fill_x = z_cent.copy()
    if fill_x.size and twosigma:
        fill_x[0] -= xerrs[0][0]
        fill_x[-1] += xerrs[1][-1]
        plt.fill_between(
            fill_x, 1000 * om95[:, 0], 1000 * om95[:, 1], color="grey", alpha=0.5
        )
    _errorbar(
        plt,
        z_cent, 1000 * omega,
        yerr=(1000 * (omega - om68[:, 0]), 1000 * (om68[:, 1] - omega)),
        xerr=xerrs, fmt="s", label=label,
    )
    _overlay(plt, literature)
    plt.xlabel("z")
    plt.ylabel(r"$10^3 \times \Omega_\mathrm{DLA}$")
    plt.xlim(zmin, zmax)
    return z_cent, 1000 * omega, om68, om95


def do_data_plots(cat, subdir, literature=None) -> None:
    """The main figure/table set (make_plots.py:12-67): all-z CDDF, CDDF
    moment, per-z-bin CDDF, dN/dX, Omega_DLA; writes the .txt tables."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)

    l_N, cddf, cddf68, cddf95 = plot_cddf(cat, zmax=5, literature=literature)
    np.savetxt(
        subdir / "cddf_all.txt",
        (l_N, cddf, cddf68[:, 0], cddf68[:, 1], cddf95[:, 0], cddf95[:, 1]),
    )
    plt.xlim(1e20, 1e23)
    plt.legend(loc=0)
    plt.savefig(subdir / "cddf_gp.pdf")
    plt.clf()

    plot_cddf(cat, zmax=5, moment=True)
    plt.xlim(1e20, 1e23)
    plt.savefig(subdir / "cddf_moment_gp.pdf")
    plt.clf()

    for (zlo, zhi, tag) in [(4, 5, "z45"), (3, 4, "z34"),
                            (2.5, 3, "z253"), (2, 2.5, "z225")]:
        l_N, cddf, cddf68, cddf95 = plot_cddf(
            cat, zlo, zhi, label=f"{zlo}-{zhi}"
        )
        np.savetxt(
            subdir / f"cddf_{tag}.txt",
            (l_N, cddf, cddf68[:, 0], cddf68[:, 1], cddf95[:, 0], cddf95[:, 1]),
        )
    plt.xlim(1e20, 1e23)
    plt.legend(loc=0)
    plt.savefig(subdir / "cddf_zz_gp.pdf")
    plt.clf()

    z_cent, dNdX, dndx68, dndx95 = plot_line_density(
        cat, zmax=5, literature=literature
    )
    np.savetxt(
        subdir / "dndx_all.txt",
        (z_cent, dNdX, dndx68[:, 0], dndx68[:, 1], dndx95[:, 0], dndx95[:, 1]),
    )
    plt.legend(loc=0)
    plt.savefig(subdir / "dndx_gp.pdf")
    plt.clf()

    z_cent, omega_k, om68, om95 = plot_omega_dla(
        cat, zmax=5, literature=literature
    )
    # reference format (make_plots.py:62): column 1 is 10^3 x Omega,
    # the limit columns stay raw (load_table(omega=True) scales them)
    np.savetxt(
        subdir / "omega_dla_all.txt",
        (z_cent, omega_k, om68[:, 0], om68[:, 1], om95[:, 0], om95[:, 1]),
    )
    plt.legend(loc=0)
    plt.savefig(subdir / "omega_gp.pdf")
    plt.clf()


# --- robustness sweeps (make_plots.py:83-168) --------------------------


def do_check_p_thresh(cat, subdir) -> None:
    """Sweep the per-SAMPLE and per-spectrum probability thresholds
    (make_plots.py:83-94 sweeps p_thresh_sample first)."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    with _restoring(cat, "p_thresh_sample", "p_thresh_spec"):
        first = cat.p_thresh_sample
        for thresh in (first, 1e-2):
            cat.p_thresh_sample = thresh
            plot_line_density(cat, zmax=5, label=f"p_sample > {thresh}")
        cat.p_thresh_sample = first
        for thresh in (0.1,):
            cat.p_thresh_spec = thresh
            plot_line_density(cat, zmax=5, label=f"p_spec > {thresh}")
    plt.legend(loc=0)
    plt.savefig(subdir / "dndx_gp_pthresh.pdf")
    plt.clf()


def do_snr_check(cat, subdir) -> None:
    """Sweep SNR cuts (make_plots.py:121-147)."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    with _restoring(cat, "snr_thresh"):
        for snr in (-2, 2, 4):
            cat.snr_thresh = snr
            plot_omega_dla(
                cat, zmax=5, label=f"SNR > {snr}", twosigma=(snr == -2)
            )
        plt.legend(loc=0)
        plt.savefig(subdir / "omega_gp_snr.pdf")
        plt.clf()
        for snr in (-2, 2, 4):
            cat.snr_thresh = snr
            plot_line_density(cat, zmax=5, label=f"SNR > {snr}")
        plt.legend(loc=0)
        plt.savefig(subdir / "dndx_gp_snr.pdf")
        plt.clf()


def do_pixel_noise_check(cat, subdir) -> None:
    """Sweep the noisy-pixel excision threshold (make_plots.py:96-119).

    Requires ``cat.pixel_noise``.  Temporarily sets snr_thresh=1 and
    filter_noisy_pixels=True like the reference; each threshold is set
    BEFORE its plot (the reference's dN/dX block reuses the previous
    loop's stale 0.25^2 threshold for the curve it labels "N < 0.5",
    make_plots.py:110 — a label/threshold mismatch not replicated)."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    with _restoring(cat, "snr_thresh", "noise_thresh", "filter_noisy_pixels"):
        cat.snr_thresh = 1
        cat.filter_noisy_pixels = True
        sweeps = [(0.5**2, "N < 0.5"), (1.0, "N < 1"), (0.25**2, "N < 0.25")]
        for thresh, label in sweeps:
            cat.noise_thresh = thresh
            plot_omega_dla(
                cat, zmax=5, label=label, twosigma=(thresh == 0.5**2)
            )
        plt.legend(loc=0)
        plt.savefig(subdir / "omega_gp_pix_noise.pdf")
        plt.clf()
        for thresh, label in sweeps:
            cat.noise_thresh = thresh
            plot_line_density(cat, zmax=5, label=label)
        plt.legend(loc=0)
        plt.savefig(subdir / "dndx_gp_pix_noise.pdf")
        plt.clf()


def do_lowzcut_check(cat, subdir) -> None:
    """Proximity-zone cut on/off (make_plots.py:149-168)."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    with _restoring(cat, "lowzcut"):
        for cut in (True, False):
            cat.lowzcut = cut
            plot_omega_dla(
                cat, zmax=5, label=f"lowzcut={cut}", twosigma=not cut
            )
    plt.legend(loc=0)
    plt.savefig(subdir / "omega_gp_lowz.pdf")
    plt.clf()


def do_qso_split(cat, subdir, splits=(2.0, 3.0, 3.5, 6.0)) -> None:
    """Split by quasar redshift via the condition mask
    (make_plots.py:199-220)."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    old = cat.condition.copy()
    with _restoring(cat, "condition"):
        for lo, hi in zip(splits[:-1], splits[1:]):
            cat.condition = old & (cat._z_max > lo) & (cat._z_max < hi)
            plot_line_density(cat, zmax=5, label=f"{lo} < z_qso < {hi}")
    plt.legend(loc=0)
    plt.savefig(subdir / "dndx_gp_zqso.pdf")
    plt.clf()


def do_length_split(cat, subdir, splits=(0.0, 0.5, 1.0, 5.0)) -> None:
    """Split by searched path length (make_plots.py:223-245)."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    old = cat.condition.copy()
    z_diff = cat._z_max - cat._z_min
    with _restoring(cat, "condition"):
        for lo, hi in zip(splits[:-1], splits[1:]):
            cat.condition = old & (z_diff > lo) & (z_diff < hi)
            plot_line_density(cat, zmax=5, label=f"{lo} < dz < {hi}")
    plt.legend(loc=0)
    plt.savefig(subdir / "dndx_gp_length.pdf")
    plt.clf()


def do_sample_error_check(cat, subdir, nsample: int = 13) -> None:
    """Bootstrap-resampling overlay plots (make_plots.py:69-81,
    calc_cddf.py:186-218)."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    out = cat.get_sample_errors(z_min=2.0, z_max=5.0, nsample=nsample)

    plot_line_density(cat, zmin=2, zmax=5, label="Total")
    _errorbar(
        plt,
        out["z_cent"], out["dndx_median"],
        yerr=(out["dndx_median"] - out["dndx_68"][0],
              out["dndx_68"][1] - out["dndx_median"]),
        fmt="o", label="Resampled",
    )
    plt.legend(loc=0)
    plt.savefig(subdir / "dndx_gp_resample.pdf")
    plt.clf()

    plot_omega_dla(cat, zmin=2, zmax=5, label="Total")
    _errorbar(
        plt,
        out["z_cent"], out["omega_median"],
        yerr=(out["omega_median"] - out["omega_68"][0],
              out["omega_68"][1] - out["omega_median"]),
        fmt="o", label="Resampled",
    )
    plt.legend(loc=0)
    plt.savefig(subdir / "omega_gp_resample.pdf")
    plt.clf()


def do_2dla_plots(cat, subdir) -> None:
    """First-DLA-only vs first+second overlay (make_plots.py:170-197).
    Requires a catalogue constructed with the second-DLA posterior."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    assert cat.second_dla, "catalogue has no second-DLA posterior"
    with _restoring(cat, "second_dla"):
        plot_cddf(cat, zmax=5, label="2 DLA")
        cat.second_dla = False
        plot_cddf(cat, zmax=5, label="1 DLA")
        plt.xlim(1e20, 1e23)
        plt.legend(loc=0)
        plt.savefig(subdir / "cddf_gp_2dla.pdf")
        plt.clf()
        cat.second_dla = True
        plot_line_density(cat, zmax=5, label="2 DLA")
        cat.second_dla = False
        plot_line_density(cat, zmax=5, label="1 DLA")
        plt.legend(loc=0)
        plt.savefig(subdir / "dndx_gp_2dla.pdf")
        plt.clf()


def do_compare_plots(cat_a, cat_b, subdir, labels=("A", "B")) -> None:
    """Overlay two catalogues' statistics (make_plots.py:246-270)."""
    plt = _plt()
    subdir = Path(subdir)
    subdir.mkdir(parents=True, exist_ok=True)
    plot_cddf(cat_a, zmax=5, label=labels[0])
    plot_cddf(cat_b, zmax=5, label=labels[1], twosigma=False)
    plt.xlim(1e20, 1e23)
    plt.legend(loc=0)
    plt.savefig(subdir / "cddf_compare.pdf")
    plt.clf()
    plot_line_density(cat_a, zmax=5, label=labels[0])
    plot_line_density(cat_b, zmax=5, label=labels[1])
    plt.legend(loc=0)
    plt.savefig(subdir / "dndx_compare.pdf")
    plt.clf()
    plot_omega_dla(cat_a, zmax=5, label=labels[0])
    plot_omega_dla(cat_b, zmax=5, label=labels[1], twosigma=False)
    plt.legend(loc=0)
    plt.savefig(subdir / "omega_compare.pdf")
    plt.clf()
