"""Fused Pallas evidence kernel vs the XLA reference path (interpret
mode on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp

from gp_dla_detection_tpu.inference import PaddedSpectra, batch_log_likelihoods
from gp_dla_detection_tpu.models.qso_model import GPModel
from gp_dla_detection_tpu.params import NullModelParams, Parameters


def make_problem(B=2, P=384, S=160, k=5, seed=0):
    rng = np.random.default_rng(seed)
    params = Parameters(null_model=NullModelParams(k=k))
    grid = params.null_model.rest_wavelengths()
    model = GPModel(
        rest_wavelengths=grid,
        mu=1.0 + 0.1 * np.sin(grid / 40),
        M=rng.normal(size=(grid.size, k)) * 0.08,
        log_omega=np.log(0.2 + 0 * grid),
        log_c_0=np.log(0.1),
        log_tau_0=np.log(0.0023),
        log_beta=np.log(3.65),
    )
    z = rng.uniform(2.6, 3.2, B)
    lam = np.stack(
        [10 ** (np.log10(911.9 * (1 + zz)) + 1e-4 * np.arange(P)) for zz in z]
    )
    mask = rng.uniform(size=(B, P)) > 0.05
    spectra = PaddedSpectra(
        lam,
        rng.normal(1, 0.3, (B, P)),
        rng.uniform(0.05, 0.2, (B, P)),
        mask,
        z,
    )
    offsets = rng.uniform(size=S)
    nhis = 10 ** rng.uniform(20, 22, S)
    return params, model, spectra, offsets, nhis


def run(backend, params, model, spectra, offsets, nhis, dtype=np.float32):
    args = (
        jnp.asarray(spectra.wavelengths, dtype),
        jnp.asarray(spectra.flux, dtype),
        jnp.asarray(spectra.noise_variance, dtype),
        jnp.asarray(spectra.mask),
        jnp.asarray(spectra.z_qso, dtype),
        jnp.asarray(model.rest_wavelengths, dtype),
        jnp.asarray(model.mu, dtype),
        jnp.asarray(model.M, dtype),
        jnp.asarray(model.log_omega, dtype),
        model.log_c_0,
        model.log_tau_0,
        model.log_beta,
        jnp.asarray(offsets, dtype),
        jnp.asarray(nhis, dtype),
    )
    return batch_log_likelihoods(
        *args, params=params, sample_chunk=32, backend=backend
    )


def test_pallas_matches_xla_f32():
    prob = make_problem()
    out_xla = run("xla", *prob)
    out_pl = run("pallas_interpret", *prob)

    a = np.asarray(out_xla["sample_log_likelihoods_dla"], np.float64)
    b = np.asarray(out_pl["sample_log_likelihoods_dla"], np.float64)
    assert a.shape == b.shape
    # both are float32 paths; differences are fp32 accumulation order
    scale = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / scale) < 5e-5

    np.testing.assert_allclose(
        np.asarray(out_pl["log_likelihood_no_dla"]),
        np.asarray(out_xla["log_likelihood_no_dla"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_pl["min_z_dla"]), np.asarray(out_xla["min_z_dla"])
    )


def test_miscompiled_batch_split_is_transparent(monkeypatch):
    """The B=512 miscompile workaround splits the kernel batch in two;
    the split must be value-identical to the unsplit call (exercised at
    an interpret-friendly size by moving the trigger)."""
    from gp_dla_detection_tpu.ops import evidence_pallas

    prob = make_problem(B=4)
    out_whole = run("pallas_interpret", *prob)
    out_whole = {k: np.asarray(v) for k, v in out_whole.items()}
    monkeypatch.setattr(evidence_pallas, "MISCOMPILED_BATCH", 4)
    # the engine wrapper is jitted on shapes/statics, which don't see
    # the module global — force a retrace so the split path actually
    # traces
    batch_log_likelihoods.clear_cache()
    out_split = run("pallas_interpret", *prob)
    np.testing.assert_array_equal(
        np.asarray(out_split["sample_log_likelihoods_dla"]),
        np.asarray(out_whole["sample_log_likelihoods_dla"]),
    )


def test_pallas_nondivisible_sample_count():
    # S=130 is not a multiple of the 128-lane tile: padding must not
    # corrupt results (compare against the XLA oracle)
    prob = make_problem(S=130)
    out_xla = run("xla", *prob)
    out_pl = run("pallas_interpret", *prob)
    a = np.asarray(out_xla["sample_log_likelihoods_dla"], np.float64)
    b = np.asarray(out_pl["sample_log_likelihoods_dla"], np.float64)
    assert b.shape == (2, 130)
    scale = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / scale) < 5e-5


def test_pallas_full_lyman_series_matches_xla():
    # the reference kernel defaults to all 31 lines (voigt.c:266); the
    # fused kernel's per-line windows must track every line center
    import dataclasses

    from gp_dla_detection_tpu.inference import compute_sample_window

    # geometry where a REAL window exists at the 128-sample tile (on
    # tiny grids compute_sample_window returns None and the windowed
    # path would silently go untested): spread ~ (128/384)*774 + margins
    params, model, spectra, offsets, nhis = make_problem(
        P=768, S=384, k=4
    )
    params = dataclasses.replace(params, num_lines=31)
    prob = (params, model, spectra, offsets, nhis)
    out_xla = run("xla", *prob)
    a = np.asarray(out_xla["sample_log_likelihoods_dla"], np.float64)

    window = compute_sample_window(
        offsets, 128, spectra.wavelengths.shape[1] + 6
    )
    assert window is not None and window < spectra.wavelengths.shape[1]
    for window in (None, window):
        args = (
            jnp.asarray(spectra.wavelengths, np.float32),
            jnp.asarray(spectra.flux, np.float32),
            jnp.asarray(spectra.noise_variance, np.float32),
            jnp.asarray(spectra.mask),
            jnp.asarray(spectra.z_qso, np.float32),
            jnp.asarray(model.rest_wavelengths, np.float32),
            jnp.asarray(model.mu, np.float32),
            jnp.asarray(model.M, np.float32),
            jnp.asarray(model.log_omega, np.float32),
            model.log_c_0,
            model.log_tau_0,
            model.log_beta,
            jnp.asarray(offsets, np.float32),
            jnp.asarray(nhis, np.float32),
        )
        out_pl = batch_log_likelihoods(
            *args, params=params, sample_chunk=32,
            backend="pallas_interpret", sample_window=window, tile=128,
        )
        b = np.asarray(out_pl["sample_log_likelihoods_dla"], np.float64)
        scale = np.maximum(np.abs(a), 1.0)
        assert np.max(np.abs(a - b) / scale) < 2e-4, f"window={window}"


def test_pallas_windowed_matches_xla():
    from gp_dla_detection_tpu.inference import compute_sample_window

    # geometry where a REAL window exists at the 128-sample tile
    prob = make_problem(B=2, P=1200, S=512, k=4)
    params, model, spectra, offsets, nhis = prob
    out_xla = run("xla", *prob)

    # chunk size must match the kernel tile (the window bounds one
    # TILE's line-center spread)
    window = compute_sample_window(
        offsets, 128, spectra.wavelengths.shape[1] + 6
    )
    assert window is not None and window < spectra.wavelengths.shape[1]
    import jax.numpy as jnp

    dtype = np.float32
    args = (
        jnp.asarray(spectra.wavelengths, dtype),
        jnp.asarray(spectra.flux, dtype),
        jnp.asarray(spectra.noise_variance, dtype),
        jnp.asarray(spectra.mask),
        jnp.asarray(spectra.z_qso, dtype),
        jnp.asarray(model.rest_wavelengths, dtype),
        jnp.asarray(model.mu, dtype),
        jnp.asarray(model.M, dtype),
        jnp.asarray(model.log_omega, dtype),
        model.log_c_0,
        model.log_tau_0,
        model.log_beta,
        jnp.asarray(offsets, dtype),
        jnp.asarray(nhis, dtype),
    )
    out_pl = batch_log_likelihoods(
        *args, params=params, sample_chunk=32,
        backend="pallas_interpret", sample_window=window, tile=128,
    )
    a = np.asarray(out_xla["sample_log_likelihoods_dla"], np.float64)
    b = np.asarray(out_pl["sample_log_likelihoods_dla"], np.float64)
    scale = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / scale) < 5e-5


def test_windowed_unaligned_grid_red_edge():
    """Regression: an extended grid whose length is NOT a multiple of
    the 128-lane alignment used to leave its last (P6 - W) % 128 pixels
    unreachable by the windowed core correction — highest-z samples'
    cores went uncorrected and overflowed exp to inf.  The kernel now
    pads the pixel axis to alignment (masked), so every sample is
    finite and matches the full-grid kernel."""
    from gp_dla_detection_tpu.inference import compute_sample_window

    # P = 1200 -> P6 = 1206, remainder 1206 % 128 = 54 > the ~43 px
    # margin slack (the confirmed-failing configuration)
    prob = make_problem(B=2, P=1200, S=256, k=4, seed=3)
    params, model, spectra, offsets, nhis = prob
    window = compute_sample_window(offsets, 128, 1206)

    args = (
        jnp.asarray(spectra.wavelengths, np.float32),
        jnp.asarray(spectra.flux, np.float32),
        jnp.asarray(spectra.noise_variance, np.float32),
        jnp.asarray(spectra.mask),
        jnp.asarray(spectra.z_qso, np.float32),
        jnp.asarray(model.rest_wavelengths, np.float32),
        jnp.asarray(model.mu, np.float32),
        jnp.asarray(model.M, np.float32),
        jnp.asarray(model.log_omega, np.float32),
        model.log_c_0,
        model.log_tau_0,
        model.log_beta,
        jnp.asarray(offsets, np.float32),
        jnp.asarray(nhis, np.float32),
    )
    out_win = batch_log_likelihoods(
        *args, params=params, sample_chunk=32,
        backend="pallas_interpret", sample_window=window, tile=128,
    )
    out_full = batch_log_likelihoods(
        *args, params=params, sample_chunk=32,
        backend="pallas_interpret", sample_window=None, tile=128,
    )
    a = np.asarray(out_full["sample_log_likelihoods_dla"], np.float64)
    b = np.asarray(out_win["sample_log_likelihoods_dla"], np.float64)
    assert np.isfinite(b).all()
    scale = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / scale) < 5e-4


def test_masked_nonfinite_omega2_neutralized():
    """Regression: a non-finite omega2 at a MASKED pixel (f32 exp
    overflow of the extrapolated log_omega on a short spectrum's padded
    tail) used to poison logdet_d (0 * log(inf) = NaN) for every sample
    of that spectrum in the Pallas kernel; the XLA path's where() guards
    were already immune."""
    from gp_dla_detection_tpu.ops.evidence_pallas import (
        pallas_sample_log_likelihoods,
    )
    from gp_dla_detection_tpu.ops.low_rank_mvn import (
        batched_dla_log_likelihoods,
    )
    from gp_dla_detection_tpu.ops.voigt import voigt_absorption

    rng = np.random.default_rng(5)
    B, P, S, k = 1, 384, 128, 4
    params = Parameters(null_model=NullModelParams(k=k))
    z = np.array([2.8])
    lam = 10 ** (np.log10(911.9 * (1 + z[0])) + 1e-4 * np.arange(P))[None, :]
    ext = np.concatenate(
        [
            lam[:, :1] * 10 ** (-1e-4 * np.arange(3, 0, -1))[None, :],
            lam,
            lam[:, -1:] * 10 ** (1e-4 * np.arange(1, 4))[None, :],
        ],
        axis=1,
    )
    flux = rng.normal(1, 0.3, (B, P))
    noise = rng.uniform(0.05, 0.2, (B, P))
    mask = np.ones((B, P), bool)
    mask[0, -8:] = False
    mu = 1.0 + 0.1 * np.sin(np.arange(P) / 40)[None, :]
    M = rng.normal(size=(B, P, k)) * 0.08
    omega2 = np.full((B, P), 0.04)
    omega2[0, -4:] = np.inf          # masked tail, overflowed model
    z_dlas = np.sort(rng.uniform(2.2, 2.75, (B, S)), axis=1)
    nhis = 10 ** rng.uniform(20, 21.5, (B, S))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    out = np.asarray(
        pallas_sample_log_likelihoods(
            f32(ext), f32(flux), f32(mu), f32(M), f32(omega2), f32(noise),
            jnp.asarray(mask), f32(z_dlas), f32(nhis),
            num_lines=params.num_lines, instrument=params.instrument,
            tile=128, interpret=True,
        )
    )
    assert np.isfinite(out).all()

    # oracle: the where()-guarded XLA path on identical inputs
    absorption = voigt_absorption(
        f32(ext[0]), f32(z_dlas[0]), f32(nhis[0]),
        num_lines=params.num_lines, instrument=params.instrument,
    )
    ref = np.asarray(
        batched_dla_log_likelihoods(
            f32(flux[0]), f32(mu[0]), f32(M[0]),
            f32(np.where(mask[0], omega2[0], 0.0)), f32(noise[0]),
            jnp.asarray(mask[0]), absorption,
        )
    )
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(out[0] - ref) / scale) < 2e-4


def test_kernel_lowers_for_tpu_under_x64():
    """The kernel must be 64-bit-free with jax_enable_x64 on (the
    suite default): weak Python literals inside the kernel otherwise
    become 64-bit consts, which either send Mosaic's convert lowering
    into unbounded recursion (client side) or fail backend legalization
    ("failed to legalize operation 'func.return'" on i64 scalars) —
    both hit by validation/f32_decision_study.py on real TPU.  Two
    checks: jax.export runs the client-side Mosaic pass, and a jaxpr
    walk asserts no 64-bit aval anywhere inside the kernel (the export
    alone misses backend-stage legalization failures)."""
    import jax
    from jax._src import core as jax_core

    from gp_dla_detection_tpu.ops.evidence_pallas import (
        pallas_sample_log_likelihoods,
    )
    from gp_dla_detection_tpu.params import InstrumentParams

    def subjaxprs_of(val):
        if isinstance(val, jax_core.ClosedJaxpr):
            yield val.jaxpr
        elif isinstance(val, jax_core.Jaxpr):
            yield val
        elif isinstance(val, (list, tuple)):
            for item in val:
                yield from subjaxprs_of(item)

    def assert_32bit(jaxpr, found):
        for eqn in jaxpr.eqns:
            for v in (*eqn.invars, *eqn.outvars):
                dt = getattr(v.aval, "dtype", None)
                if dt is not None and np.dtype(dt).itemsize == 8:
                    found.append((eqn.primitive.name, v.aval))
            for val in eqn.params.values():
                for sub in subjaxprs_of(val):
                    assert_32bit(sub, found)

    def check_kernel_jaxprs(jaxpr):
        hits = []
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                found = []
                for sub in subjaxprs_of(eqn.params["jaxpr"]):
                    assert_32bit(sub, found)
                assert not found, f"64-bit inside kernel: {found[:5]}"
                hits.append(eqn)
            else:
                for val in eqn.params.values():
                    for sub in subjaxprs_of(val):
                        hits += check_kernel_jaxprs(sub)
        return hits

    B, P, k, S = 1, 256, 4, 128
    inst = InstrumentParams()
    P6 = P + 2 * inst.width
    f32 = np.float32
    lam = (3600.0 * 10 ** (1e-4 * np.arange(P6))).astype(f32)
    lam = np.repeat(lam[None, :], B, axis=0)
    zs = np.repeat(
        np.linspace(2.0, 2.01, S, dtype=f32)[None, :], B, axis=0
    )
    args = (
        lam, np.ones((B, P), f32), np.ones((B, P), f32),
        np.full((B, P, k), 0.01, f32), np.full((B, P), 0.01, f32),
        np.full((B, P), 0.01, f32), np.ones((B, P), bool),
        zs, np.full((B, S), 1e20, f32),
    )

    for two_dla in (False, True):
        kwargs = {}
        if two_dla:
            kwargs = {"z_dlas2": zs, "nhi2": np.full((B, S), 1e20, f32)}

        def f(*arrays):
            return pallas_sample_log_likelihoods(
                *arrays, num_lines=3, instrument=inst, window=128,
                tile=128, **kwargs,
            )

        exp = jax.export.export(jax.jit(f), platforms=["tpu"])(*args)
        (out,) = exp.out_avals
        assert out.shape == (B, S) and out.dtype == np.float32

        closed = jax.make_jaxpr(f)(*args)
        assert check_kernel_jaxprs(closed.jaxpr), "pallas_call not traced"


def test_line_loop_matches_unrolled():
    """The fori_loop line pass (used above UNROLL_LINES, e.g. the
    31-line windowed kernel that the unrolled form cannot compile on
    TPU) is bit-identical to the Python unroll on the full grid and
    within FMA-reassociation noise in windowed mode (XLA contracts
    mul+add differently inside a loop body; diffs are ~1e-7 relative)."""
    from gp_dla_detection_tpu.ops.evidence_pallas import (
        UNROLL_LINES,
        pallas_sample_log_likelihoods,
    )
    from gp_dla_detection_tpu.params import InstrumentParams

    rng = np.random.default_rng(0)
    B, P, k, S = 2, 384, 4, 64
    w = InstrumentParams().width
    P6 = P + 2 * w
    f32 = np.float32
    lam = np.stack(
        [10 ** (np.log10(3600.0) + 1e-4 * np.arange(P6))] * B
    ).astype(f32)
    flux = rng.normal(1, 0.3, (B, P)).astype(f32)
    mu = np.ones((B, P), f32)
    M = (rng.normal(size=(B, P, k)) * 0.1).astype(f32)
    om = rng.uniform(0.01, 0.05, (B, P)).astype(f32)
    nv = rng.uniform(0.05, 0.2, (B, P)).astype(f32)
    mask = rng.uniform(size=(B, P)) > 0.05
    def sample_z(anchor_lambda):
        zc = lam[:, w + P // 2] / anchor_lambda - 1
        return np.sort(
            rng.uniform(zc[:, None] - 0.02, zc[:, None] + 0.02, (B, S)),
            axis=1,
        ).astype(f32)

    nhi = (10 ** rng.uniform(20, 22, (B, S))).astype(f32)
    nhi2 = (10 ** rng.uniform(20, 21.5, (B, S))).astype(f32)

    assert 3 <= UNROLL_LINES < 31  # default pipeline unrolls, 31 loops
    # nl=9 = one line past a full unroll block, so the grouped loop's
    # LAST block is 7 table-pad columns; anchoring z at line 9's core
    # (920.96 Å mid-grid) makes that line's contribution dominant, so
    # any pad-wiring error — e.g. the r4 OOB table read, which clamps
    # to the last real line and double-counts it — breaks bit-equality
    # loudly instead of vanishing below f32 epsilon like a wing would
    for nl, anchor in ((3, 1215.6701), (9, 920.9631), (31, 1215.6701)):
        z = sample_z(anchor)
        z2 = rng.permutation(z, axis=1)
        for kwargs in (
            {"window": None},
            {"window": 256},
            {"window": 256, "z_dlas2": z2, "nhi2": nhi2},
        ):
            outs = [
                np.asarray(
                    pallas_sample_log_likelihoods(
                        lam, flux, mu, M, om, nv, mask, z, nhi,
                        num_lines=nl, interpret=True, tile=64,
                        line_loop=loop, **kwargs,
                    ),
                    np.float64,
                )
                for loop in (False, True)
            ]
            a, b = outs
            if kwargs.get("window") is None:
                assert np.array_equal(a, b), f"nl={nl} full-grid"
            else:
                scale = np.maximum(np.abs(a), 1.0)
                assert np.max(np.abs(a - b) / scale) < 1e-5, (
                    f"nl={nl} kwargs={sorted(kwargs)}"
                )
