"""End-to-end single-spectrum inference vs an independent numpy oracle.

The oracle transcribes the reference's per-quasar math
(process_qsos.m:102-217) with explicit slicing, scipy dense MVN logpdfs,
and the scipy-wofz Voigt oracle — entirely independent of the JAX code
paths under test.
"""

import numpy as np
import pytest
from scipy.stats import multivariate_normal

from gp_dla_detection_tpu.inference import (
    PaddedSpectra,
    correct_prior_dla_flags,
    dla_rate_priors,
    finalize_posteriors,
    process_spectra,
)
from gp_dla_detection_tpu.models.qso_model import GPModel
from gp_dla_detection_tpu.params import (
    LYA_WAVELENGTH,
    LYMAN_LIMIT,
    Parameters,
)

from test_voigt import oracle_voigt


def make_model(rng, k=5):
    params = Parameters()
    grid = params.null_model.rest_wavelengths()
    R = grid.size
    mu = 1.0 + 0.1 * np.sin(grid / 50.0)
    M = rng.normal(size=(R, k)) * 0.05
    log_omega = np.log(0.2 + 0.05 * rng.uniform(size=R))
    return GPModel(
        rest_wavelengths=grid,
        mu=mu,
        M=M,
        log_omega=log_omega,
        log_c_0=np.log(0.1),
        log_tau_0=np.log(0.0023),
        log_beta=np.log(3.65),
    )


def make_spectrum(rng, z_qso=2.8, P=640, n_real=600):
    """Padded spectrum on an exactly uniform log10 grid with masked holes."""
    params = Parameters()
    lam0 = 911.9 * (1 + z_qso)  # rest ~911.9 Å at blue end
    log_lam = np.log10(lam0) + 1e-4 * np.arange(P)
    wavelengths = 10**log_lam
    flux = rng.normal(1.0, 0.3, size=P)
    noise = rng.uniform(0.05, 0.3, size=P)
    mask = np.zeros(P, bool)
    mask[:n_real] = True
    # punch some masked holes inside the modelling range
    holes = rng.choice(np.arange(50, n_real - 50), size=25, replace=False)
    mask[holes] = False
    return PaddedSpectra(
        wavelengths=wavelengths[None],
        flux=flux[None],
        noise_variance=noise[None],
        mask=mask[None],
        z_qso=np.array([z_qso]),
    )


def oracle_spectrum(model, spec, offsets, nhis, params, misaligned=False):
    """Reference-semantics per-spectrum computation in numpy/scipy.

    ``misaligned=True`` applies the reference's actual (buggy)
    absorption selection — the FIRST nnz values of the in-range profile
    (process_qsos.m:180) — instead of the intended aligned selection.
    """
    lam = spec.wavelengths[0]
    flux = spec.flux[0]
    noise = spec.noise_variance[0]
    mask = spec.mask[0]
    z_qso = spec.z_qso[0]

    rest = lam / (1 + z_qso)
    in_range = (rest >= params.null_model.min_lambda) & (
        rest <= params.null_model.max_lambda
    )
    unmasked_lam = lam[in_range]  # all in-range pixels (process_qsos.m:107-109)
    keep = in_range & mask
    lam_k, rest_k, flux_k, noise_k = lam[keep], rest[keep], flux[keep], noise[keep]

    # model interpolation
    mu = np.interp(rest_k, model.rest_wavelengths, model.mu)
    M = np.stack(
        [
            np.interp(rest_k, model.rest_wavelengths, model.M[:, j])
            for j in range(model.k)
        ],
        axis=1,
    )
    log_omega = np.interp(rest_k, model.rest_wavelengths, model.log_omega)
    lya_zs = (lam_k - LYA_WAVELENGTH) / LYA_WAVELENGTH
    scaling = 1 - np.exp(-model.tau_0 * (1 + lya_zs) ** model.beta) + model.c_0
    omega2 = np.exp(2 * log_omega) * scaling**2

    def dense_ll(y, mean, Mm, d):
        return multivariate_normal.logpdf(y, mean=mean, cov=Mm @ Mm.T + np.diag(d))

    null_ll = dense_ll(flux_k, mu, M, omega2 + noise_k)

    max_z = lam_k.max() / LYA_WAVELENGTH - 1 - params.max_z_cut
    min_z = max(
        lam_k.min() / LYA_WAVELENGTH - 1,
        LYMAN_LIMIT * (1 + z_qso) / LYA_WAVELENGTH - 1 + params.min_z_cut,
    )
    z_dlas = min_z + (max_z - min_z) * offsets

    # conv padding built by log-continuation of the in-range grid
    # (process_qsos.m:169-177)
    w = params.instrument.width
    dex = params.instrument.pixel_spacing
    left = 10 ** (np.log10(unmasked_lam.min()) - dex * np.arange(w, 0, -1))
    right = 10 ** (np.log10(unmasked_lam.max()) + dex * np.arange(1, w + 1))
    padded = np.concatenate([left, unmasked_lam, right])

    rel_mask = mask[in_range]  # intended alignment (see inference.py quirk note)
    sample_lls = np.empty(len(offsets))
    for s in range(len(offsets)):
        absorption = oracle_voigt(padded, z_dlas[s], nhis[s], params.num_lines)
        # aligned (intended) vs first-nnz (reference quirk) selection
        a = absorption[: rel_mask.sum()] if misaligned else absorption[rel_mask]
        sample_lls[s] = dense_ll(
            flux_k, mu * a, M * a[:, None], omega2 * a**2 + noise_k
        )
    return null_ll, sample_lls, min_z, max_z


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    params = Parameters()
    model = make_model(rng)
    spec = make_spectrum(rng)
    samples = rng.uniform(size=40)
    nhis = 10 ** rng.uniform(20.0, 22.0, size=40)
    return params, model, spec, samples, nhis


def test_single_spectrum_matches_oracle(setup):
    params, model, spec, offsets, nhis = setup
    null_ll, sample_lls, min_z, max_z = oracle_spectrum(
        model, spec, offsets, nhis, params
    )

    results = process_spectra(
        model,
        offsets,
        nhis,
        spec,
        prior_z_qsos=np.array([2.0, 2.5, 3.0, 3.5]),
        prior_dla_flags=np.array([True, False, True, False]),
        params=params,
        batch_size=1,
        sample_chunk=8,
    )

    assert abs(results.log_likelihoods_no_dla[0] - null_ll) < 1e-6 * abs(null_ll)
    np.testing.assert_allclose(
        results.sample_log_likelihoods_dla[0], sample_lls, rtol=1e-6
    )
    assert abs(results.min_z_dlas[0] - min_z) < 1e-10
    assert abs(results.max_z_dlas[0] - max_z) < 1e-10

    # posteriors follow the safe aggregation (process_qsos.m:200-232)
    max_ll = sample_lls.max()
    exp_dla_ll = max_ll + np.log(np.mean(np.exp(sample_lls - max_ll)))
    assert abs(results.log_likelihoods_dla[0] - exp_dla_ll) < 1e-8 * abs(exp_dla_ll)
    assert np.isclose(results.p_dlas[0] + results.p_no_dlas[0], 1.0)


def test_reference_misaligned_absorption_quirk(setup):
    """Opt-in reproduction of process_qsos.m:180 (the all-true ``ind``
    that selects the first nnz absorption pixels): must match the
    first-nnz oracle on a spectrum with masked in-range pixels, differ
    from the aligned default there, and be a no-op on a hole-free
    spectrum."""
    params, model, spec, offsets, nhis = setup
    prior_z = np.array([2.0, 2.5, 3.0, 3.5])
    prior_flags = np.array([True, False, True, False])
    run = lambda sp, quirk: process_spectra(
        model, offsets, nhis, sp, prior_z, prior_flags,
        params=params, batch_size=1, sample_chunk=8,
        reference_misaligned_absorption=quirk,
    )

    # spec has 25 masked holes inside the modelling range (make_spectrum)
    _, lls_misaligned, _, _ = oracle_spectrum(
        model, spec, offsets, nhis, params, misaligned=True
    )
    res_quirk = run(spec, True)
    np.testing.assert_allclose(
        res_quirk.sample_log_likelihoods_dla[0], lls_misaligned, rtol=1e-6
    )
    res_default = run(spec, False)
    assert not np.allclose(
        res_quirk.sample_log_likelihoods_dla[0],
        res_default.sample_log_likelihoods_dla[0],
        rtol=1e-6,
    )
    # null model is untouched by the quirk
    np.testing.assert_allclose(
        res_quirk.log_likelihoods_no_dla, res_default.log_likelihoods_no_dla
    )

    # no masked pixels in range -> the quirk selects the aligned pixels
    rng = np.random.default_rng(11)
    clean = make_spectrum(rng)
    clean.mask[:, :600] = True  # heal the holes (pad tail stays masked)
    np.testing.assert_allclose(
        run(clean, True).sample_log_likelihoods_dla,
        run(clean, False).sample_log_likelihoods_dla,
        rtol=1e-12,
    )

    # the pallas backend refuses the parity mode loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="xla"):
        process_spectra(
            model, offsets, nhis, spec, prior_z, prior_flags,
            params=params, dtype=np.float32, backend="pallas",
            reference_misaligned_absorption=True,
        )


def test_dla_rate_priors_counting():
    params = Parameters()
    prior_z = np.array([2.0, 2.1, 2.2, 3.0, 3.1])
    flags = np.array([True, False, True, False, True])
    lp_dla, lp_no = dla_rate_priors(np.array([2.25]), prior_z, flags, params)
    # z < 2.25 + dz(30000 km/s ~ 0.1) = 2.35: prior quasars {2.0,2.1,2.2}, 2 DLAs
    assert np.isclose(lp_dla[0], np.log(2) - np.log(3))
    assert np.isclose(lp_no[0], np.log(1) - np.log(3))


def test_dla_rate_priors_degenerate_edges():
    """counts == 0 and num_dlas == 0 edges: documented limits, no NaN,
    no RuntimeWarnings (the reference NaNs here, process_qsos.m:122-132)."""
    import warnings

    params = Parameters()
    prior_z = np.array([3.0, 3.1, 3.2])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # test z below every prior quasar -> counts == 0
        lp_dla, lp_no = dla_rate_priors(
            np.array([2.0]), prior_z, np.array([True, False, True]), params
        )
        assert lp_dla[0] == -np.inf and lp_no[0] == 0.0
        # counts > 0 but zero DLAs among them
        lp_dla, lp_no = dla_rate_priors(
            np.array([3.5]), prior_z, np.array([False, False, False]), params
        )
        assert lp_dla[0] == -np.inf and np.isclose(lp_no[0], 0.0)
        # all prior quasars host DLAs
        lp_dla, lp_no = dla_rate_priors(
            np.array([3.5]), prior_z, np.array([True, True, True]), params
        )
        assert np.isclose(lp_dla[0], 0.0) and lp_no[0] == -np.inf
    # degenerate prior still yields finite, normalized posteriors
    from gp_dla_detection_tpu.inference import finalize_posteriors

    post = finalize_posteriors(
        np.array([0.0]), np.array([-np.inf]), np.array([-10.0]),
        np.array([[-9.0, -11.0]]),
    )
    assert np.allclose(post["model_posteriors"], [[1.0, 0.0]])


def test_correct_prior_dla_flags():
    # DLA with Lyα below the QSO Lyman limit must be dropped
    z_qsos = np.array([4.0, 4.0])
    flags = np.array([True, True])
    z_dlas = [np.array([2.0]), np.array([3.5])]
    # (1+2.0)*1215.67 = 3647 < (1+4)*911.76 = 4558.8 -> dropped
    # (1+3.5)*1215.67 = 5470 > 4558.8 -> kept
    out = correct_prior_dla_flags(z_qsos, flags, z_dlas)
    assert list(out) == [False, True]

    # the documented "no DLA" markers (None / empty) must not crash and
    # must leave the flag untouched (matching the reference's behaviour
    # for an empty vectorized `if`)
    out = correct_prior_dla_flags(
        np.array([4.0, 4.0, 4.0]),
        np.array([True, True, True]),
        [None, np.array([]), np.array([2.0])],
    )
    assert list(out) == [True, True, False]


def test_batching_invariance(setup):
    """Batched/padded execution must match per-spectrum execution."""
    params, model, spec, offsets, nhis = setup
    rng = np.random.default_rng(11)
    specs = [make_spectrum(rng, z_qso=z) for z in (2.6, 2.9, 3.3)]
    batch = PaddedSpectra(
        *(
            np.concatenate([getattr(s, f) for s in specs])
            for f in ("wavelengths", "flux", "noise_variance", "mask", "z_qso")
        )
    )
    prior_z = np.array([2.0, 2.5, 3.0, 3.5])
    prior_f = np.array([True, False, True, False])

    r_batch = process_spectra(
        model, offsets, nhis, batch, prior_z, prior_f,
        params=params, batch_size=2, sample_chunk=40,
    )
    for i, s in enumerate(specs):
        r_one = process_spectra(
            model, offsets, nhis, s, prior_z, prior_f,
            params=params, batch_size=1, sample_chunk=40,
        )
        np.testing.assert_allclose(
            r_batch.sample_log_likelihoods_dla[i],
            r_one.sample_log_likelihoods_dla[0],
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            r_batch.log_likelihoods_no_dla[i],
            r_one.log_likelihoods_no_dla[0],
            rtol=1e-12,
        )


def test_windowed_fast_path_matches(setup):
    """The z-sorted windowed Voigt fast path must agree with the plain
    f32 path to fp32 accumulation accuracy."""
    import jax.numpy as jnp
    from gp_dla_detection_tpu.inference import (
        batch_log_likelihoods,
        compute_sample_window,
    )

    params, model, spec, offsets, nhis = setup
    dtype = np.float32
    args = (
        jnp.asarray(spec.wavelengths, dtype),
        jnp.asarray(spec.flux, dtype),
        jnp.asarray(spec.noise_variance, dtype),
        jnp.asarray(spec.mask),
        jnp.asarray(spec.z_qso, dtype),
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
    plain = batch_log_likelihoods(
        *args, params=params, sample_chunk=8, sample_window=None
    )
    window = compute_sample_window(offsets, 8, spec.wavelengths.shape[1] + 6)
    assert window is not None
    windowed = batch_log_likelihoods(
        *args, params=params, sample_chunk=8, sample_window=window
    )
    a = np.asarray(plain["sample_log_likelihoods_dla"], np.float64)
    b = np.asarray(windowed["sample_log_likelihoods_dla"], np.float64)
    scale = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / scale) < 5e-5


def test_window_bound_covers_exact_chunk_spread():
    """Regression (code review): the linear bound spread*num_pixels
    understates a low-z chunk's pixel spread on the log-uniform grid —
    the exact spread is log10((1+z_hi)/(1+z_lo))/pixel_spacing, whose
    worst case over the z_DLA search range is log10(1+spread*R)/spacing
    with R = LYA/LY_LIMIT - 1.  The sized window minus both margins
    must cover that for every chunking."""
    from gp_dla_detection_tpu.inference import compute_sample_window
    from gp_dla_detection_tpu.ops.voigt import WINDOW_MARGIN
    from gp_dla_detection_tpu.params import LYA_WAVELENGTH, LYMAN_LIMIT

    spacing = 1e-4
    ratio = LYA_WAVELENGTH / LYMAN_LIMIT - 1.0
    offsets = np.linspace(0.0, 1.0, 10_000)
    for chunk in (128, 256, 1000, 2500, 3300, 5000):
        window = compute_sample_window(
            offsets, chunk, 1280, pixel_spacing=spacing
        )
        if window is None:
            continue
        spread = offsets[chunk - 1] - offsets[0]
        exact_px = np.log10(1.0 + spread * ratio) / spacing
        assert window - 2 * WINDOW_MARGIN >= exact_px, (
            chunk, window, exact_px
        )


def test_ladder_pallas_f64_is_a_config_error():
    """backend='pallas' with a non-f32 dtype used to build a single
    ladder rung that could never start (Mosaic has no f64) and
    hard-failed mid-run with an opaque kernel error; it must be a clear
    config-time ValueError."""
    from gp_dla_detection_tpu.inference import ladder_configs

    with pytest.raises(ValueError, match="float32-only"):
        ladder_configs("pallas", 1286, np.float64)
    with pytest.raises(ValueError, match="float32-only"):
        ladder_configs("pallas_interpret", 1286, np.float64)
    # f32 pallas and any-dtype xla remain valid
    assert ladder_configs("pallas", 1286, np.float32)[0][0] == "pallas"
    assert ladder_configs("xla", 1286, np.float64) == [("xla", None, False)]


def test_samples_sorted_skips_identity_unsort(setup):
    """samples_sorted=True on pre-sorted samples must reproduce the
    default path's likelihoods exactly (modulo the caller-side column
    permutation) on BOTH backends."""
    import jax.numpy as jnp
    from gp_dla_detection_tpu.inference import (
        batch_log_likelihoods,
        compute_sample_window,
    )

    params, model, spec, offsets, nhis = setup
    dtype = np.float32
    order = np.argsort(offsets, kind="stable")

    def run(off, nh, backend, **kw):
        return np.asarray(
            batch_log_likelihoods(
                jnp.asarray(spec.wavelengths, dtype),
                jnp.asarray(spec.flux, dtype),
                jnp.asarray(spec.noise_variance, dtype),
                jnp.asarray(spec.mask),
                jnp.asarray(spec.z_qso, dtype),
                jnp.asarray(model.rest_wavelengths, dtype),
                jnp.asarray(model.mu, dtype),
                jnp.asarray(model.M, dtype),
                jnp.asarray(model.log_omega, dtype),
                model.log_c_0,
                model.log_tau_0,
                model.log_beta,
                jnp.asarray(off, dtype),
                jnp.asarray(nh, dtype),
                params=params, sample_chunk=8, backend=backend, **kw,
            )["sample_log_likelihoods_dla"]
        )

    window = compute_sample_window(offsets, 8, spec.wavelengths.shape[1] + 6)
    assert window is not None
    for backend in ("xla", "pallas_interpret"):
        kw = {"sample_window": window}
        if backend == "pallas_interpret":
            kw["tile"] = 8
        default = run(offsets, nhis, backend, **kw)
        sorted_out = run(
            offsets[order], nhis[order], backend,
            samples_sorted=True, **kw,
        )
        np.testing.assert_array_equal(sorted_out[:, np.argsort(order)], default)


def test_windowed_large_window_coverage():
    """Regression (code review): with the old window//4 offset, windows
    above ~270 px failed to cover the highest-z samples of each chunk,
    silently corrupting their likelihoods.  Exercise a large window
    (big chunk -> wide spread) and demand agreement with the plain path."""
    import jax.numpy as jnp
    from gp_dla_detection_tpu.inference import (
        batch_log_likelihoods,
        compute_sample_window,
    )

    rng = np.random.default_rng(21)
    params = Parameters()
    model = make_model(rng, k=4)
    spec = make_spectrum(rng, z_qso=3.0, P=1280, n_real=1270)
    S = 800
    offsets = rng.uniform(size=S)
    nhis = 10 ** rng.uniform(20.0, 21.5, S)

    dtype = np.float32
    args = (
        jnp.asarray(spec.wavelengths, dtype),
        jnp.asarray(spec.flux, dtype),
        jnp.asarray(spec.noise_variance, dtype),
        jnp.asarray(spec.mask),
        jnp.asarray(spec.z_qso, dtype),
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
    chunk = 400  # half the samples per chunk -> window ~ 0.5*1286 + 80
    window = compute_sample_window(offsets, chunk, 1286)
    assert window is not None and window > 300, window

    plain = batch_log_likelihoods(
        *args, params=params, sample_chunk=chunk, sample_window=None
    )
    windowed = batch_log_likelihoods(
        *args, params=params, sample_chunk=chunk, sample_window=window
    )
    a = np.asarray(plain["sample_log_likelihoods_dla"], np.float64)
    b = np.asarray(windowed["sample_log_likelihoods_dla"], np.float64)
    scale = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / scale) < 5e-5


def test_gpmodel_interpolate_matches_engine_prep(setup):
    """The convenience GPModel.interpolate must agree with the engine's
    internal interpolation (same interp1/interp_columns kernels)."""
    params, model, spec, _, _ = setup
    rest = spec.wavelengths[0] / (1 + spec.z_qso[0])
    mu, M, log_omega = model.interpolate(rest)
    np.testing.assert_allclose(
        np.asarray(mu), np.interp(rest, model.rest_wavelengths, model.mu),
        rtol=1e-12,
    )
    for j in (0, model.k - 1):
        np.testing.assert_allclose(
            np.asarray(M)[:, j],
            np.interp(rest, model.rest_wavelengths, model.M[:, j]),
            rtol=1e-12,
        )


def test_gp_model_grid_validation_tolerates_f32_storage():
    """The uniform-spacing gate scales with the stored dtype's ulp: an
    arange-built grid round-tripped through float32 (spacing jitter
    ~2 ulp at 1216 Å) must be accepted; a genuinely non-uniform grid
    must still be rejected (ADVICE r2)."""
    import pytest as _pytest

    grid64 = np.arange(911.75, 1215.76, 0.25)
    n, k = grid64.size, 2

    def make(grid):
        return GPModel(
            rest_wavelengths=grid,
            mu=np.ones(n),
            M=np.zeros((n, k)),
            log_omega=np.zeros(n),
            log_c_0=0.0,
            log_tau_0=0.0,
            log_beta=0.0,
        )

    make(grid64)
    make(grid64.astype(np.float32))  # f32 rounding jitter is fine
    bad = grid64.copy()
    bad[100] += 0.1  # 40% of dx: a real non-uniformity
    with _pytest.raises(ValueError, match="uniformly spaced"):
        make(bad)


def test_search_range_policy_methods():
    """Parameters' z_DLA range policy (set_parameters.m:65-73) is the
    single definition used by the engine."""
    params = Parameters()
    lam = np.linspace(4000.0, 5000.0, 100)
    assert np.isclose(
        params.max_z_dla(lam, 3.0),
        5000.0 / LYA_WAVELENGTH - 1 - params.max_z_cut,
    )
    # Lyman-limit bound dominates for high z_qso
    z_qso = 4.5
    expected = (
        LYMAN_LIMIT * (1 + z_qso) / LYA_WAVELENGTH - 1 + params.min_z_cut
    )
    assert np.isclose(params.min_z_dla(lam, z_qso), expected)


def test_pallas_tile_plan_and_ladder():
    """VMEM degradation plan: measured ceiling ~3200px x 256 samples
    (halved for pairs), tiles halve down to one lane group, XLA last."""
    from gp_dla_detection_tpu.inference import (
        pallas_config_ladder,
        pallas_tile_plan,
    )

    assert pallas_tile_plan(1286) == 256
    assert pallas_tile_plan(3300) == 128
    assert pallas_tile_plan(7000) is None
    assert pallas_tile_plan(1286, two_dla=True) == 256
    assert pallas_tile_plan(3300, two_dla=True) is None

    assert pallas_config_ladder("xla", 1286) == [("xla", None, False)]
    # per tile: windowed first, then full-grid (the 31-line windowed
    # kernel crashes the TPU compiler while full-grid compiles — the
    # full-grid rung keeps such runs on the fused kernel)
    assert pallas_config_ladder("pallas", 1286) == [
        ("pallas", 256, True), ("pallas", 256, False),
        ("pallas", 128, True), ("pallas", 128, False),
        ("xla", None, False),
    ]
    assert pallas_config_ladder("pallas", 1286, windowed=False) == [
        ("pallas", 256, False), ("pallas", 128, False), ("xla", None, False),
    ]
    assert pallas_config_ladder("pallas", 7000) == [("xla", None, False)]


def test_process_spectra_long_spectrum_completes_via_fallback():
    """backend='pallas' on a config the kernel can't run (here: CPU, and
    P=4096 also trips the tile planner) must degrade gracefully to XLA
    with a warning and produce the XLA numbers, not hard-fail."""
    from gp_dla_detection_tpu.params import NullModelParams

    rng = np.random.default_rng(5)
    params = Parameters(null_model=NullModelParams(k=3))
    grid = params.null_model.rest_wavelengths()
    model = GPModel(
        rest_wavelengths=grid,
        mu=1.0 + 0.1 * np.sin(grid / 40),
        M=rng.normal(size=(grid.size, 3)) * 0.05,
        log_omega=np.log(0.15 + 0 * grid),
        log_c_0=np.log(0.1),
        log_tau_0=np.log(0.0023),
        log_beta=np.log(3.65),
    )
    B, P = 2, 4096
    z = rng.uniform(2.8, 3.1, B)
    lam = np.stack(
        [10 ** (np.log10(911.9 * (1 + zz)) + 1e-4 * np.arange(P)) for zz in z]
    )
    spectra = PaddedSpectra(
        lam,
        rng.normal(1, 0.3, (B, P)),
        rng.uniform(0.05, 0.2, (B, P)),
        rng.uniform(size=(B, P)) > 0.05,
        z,
    )
    offsets = rng.uniform(size=24)
    nhis = 10 ** rng.uniform(20, 22, 24)
    prior_z = rng.uniform(2.0, 3.5, 100)
    flags = rng.uniform(size=100) < 0.3

    with pytest.warns(UserWarning, match="falling back"):
        res_p = process_spectra(
            model, offsets, nhis, spectra, prior_z, flags,
            params=params, batch_size=B, sample_chunk=24,
            dtype=np.float32, backend="pallas",
        )
    res_x = process_spectra(
        model, offsets, nhis, spectra, prior_z, flags,
        params=params, batch_size=B, sample_chunk=24,
        dtype=np.float32, backend="xla",
    )
    np.testing.assert_allclose(
        res_p.sample_log_likelihoods_dla, res_x.sample_log_likelihoods_dla
    )
    np.testing.assert_allclose(res_p.p_dlas, res_x.p_dlas)


def test_pallas_tile_plan_lane_aligned():
    """Tile plans must be multiples of the 128-lane Mosaic minimum: a
    request like tile=192 plans 128 (halving to the sub-minimum 96
    would fail to lower), and never returns below the minimum."""
    from gp_dla_detection_tpu.inference import pallas_tile_plan

    assert pallas_tile_plan(4000, tile=192) == 128
    for num_px in (1286, 3200, 4000, 8000):
        for tile in (129, 192, 200, 256, 300, None):
            plan = pallas_tile_plan(num_px, tile=tile)
            assert plan is None or (plan % 128 == 0 and 128 <= plan <= 256)


def test_ladder_runner_walks_rungs_and_persists():
    """LadderRunner retries the next rung on failure with a warning,
    and LATER calls start from the reached rung (failed rungs are not
    retried per batch)."""
    import warnings

    from gp_dla_detection_tpu.inference import LadderRunner

    configs = [
        ("pallas", 256, True),
        ("pallas", 256, False),
        ("xla", None, False),
    ]
    calls = []

    def build(backend, tile, windowed):
        def fn(x):
            calls.append((backend, tile, windowed))
            if windowed:
                raise RuntimeError("windowed lowering failed")
            return x + 1

        return fn

    runner = LadderRunner(configs, build)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert runner(1) == 2
    assert runner.config == ("pallas", 256, False)
    # the warning names both rungs AND carries the original error text
    # so misclassified failures stay visible (ADVICE r2)
    assert len(caught) == 1
    msg = str(caught[0].message)
    assert msg.startswith(
        "evidence backend 'pallas' (tile=256, windowed) failed to "
        "compile/fit; falling back to 'pallas' (tile=256)"
    )
    assert "RuntimeError: windowed lowering failed" in msg
    # second call goes straight to the reached rung
    n = len(calls)
    assert runner(5) == 6
    assert calls[n:] == [("pallas", 256, False)]

    # exhausting the ladder re-raises the original failure
    def fail_oom(*c):
        def fn(x):
            raise RuntimeError("RESOURCE_EXHAUSTED: scoped vmem")

        return fn

    always_fail = LadderRunner([("pallas", 128, True)], fail_oom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        always_fail(0)


def test_ladder_runner_reraises_non_resource_errors():
    """A data/shape error on the fastest rung must propagate, not walk
    the ladder: degrading would mask the real bug (VERDICT r2 #7)."""
    import pytest as _pytest

    from gp_dla_detection_tpu.inference import LadderRunner, ladder_recoverable

    configs = [("pallas", 256, True), ("xla", None, False)]
    calls = []

    def build(backend, tile, windowed):
        def fn(x):
            calls.append(backend)
            raise ValueError("operands have incompatible shapes (2, 3) vs (4,)")

        return fn

    runner = LadderRunner(configs, build)
    with _pytest.raises(ValueError, match="incompatible shapes"):
        runner(1)
    assert calls == ["pallas"]  # never reached the XLA rung

    # classification: resource/compile-class errors recover, data errors
    # re-raise, jax runtime errors always recover
    assert ladder_recoverable(RuntimeError("RESOURCE_EXHAUSTED: vmem"))
    assert ladder_recoverable(RuntimeError("Mosaic failed to compile kernel"))
    assert ladder_recoverable(NotImplementedError("unsupported in pallas"))
    assert not ladder_recoverable(ValueError("bad shapes"))
    assert not ladder_recoverable(AssertionError("nan in result"))
    assert not ladder_recoverable(ZeroDivisionError("division by zero"))
    from jax.errors import JaxRuntimeError

    assert ladder_recoverable(JaxRuntimeError("INTERNAL: device error"))


def test_fetch_with_ladder_recovers_async_failures():
    """A failure surfacing at the result fetch (dispatch being async
    past a rung's first batch) walks the ladder and re-runs the batch;
    non-recoverable fetch errors re-raise."""
    import pytest as _pytest

    from gp_dla_detection_tpu.inference import LadderRunner, fetch_with_ladder

    configs = [("pallas", 256, True), ("xla", None, False)]
    runner = LadderRunner(configs, lambda b, t, w: (lambda x: (b, x + 1)))

    def fetch(out):
        backend, val = out
        if backend == "pallas":
            raise RuntimeError("RESOURCE_EXHAUSTED: ran out of vmem")
        return val

    with _pytest.warns(UserWarning, match="falling back"):
        assert fetch_with_ladder(runner, runner(7), (7,), fetch) == 8
    assert runner.config == ("xla", None, False)

    def bad_fetch(out):
        raise ValueError("corrupt result")

    with _pytest.raises(ValueError, match="corrupt result"):
        fetch_with_ladder(runner, runner(7), (7,), bad_fetch)

    # classifier must NOT treat generic words in ordinary data errors as
    # recoverable (they would silently retry the real bug on every rung)
    from gp_dla_detection_tpu.inference import ladder_recoverable

    assert not ladder_recoverable(ValueError("min_z must be lower than max_z"))
    assert not ladder_recoverable(ValueError("unknown backend 'pallas2'"))
    assert not ladder_recoverable(TypeError("XLA-incompatible object passed"))


def test_fetch_with_ladder_stale_rung_failures_advance_once():
    """With pipelined dispatch (depth >= 2) several batches are in
    flight on the same rung; when it fails, each surfaces the SAME
    stale error at its fetch.  Only the first may advance the ladder —
    the rest must retry on the already-advanced rung, not burn a
    further rung each (which would exhaust the ladder outright)."""
    import pytest as _pytest

    from gp_dla_detection_tpu.inference import LadderRunner, fetch_with_ladder

    configs = [("pallas", 256, True), ("xla", None, False)]
    runner = LadderRunner(configs, lambda b, t, w: (lambda x: (b, x + 1)))

    def fetch(out):
        backend, val = out
        if backend == "pallas":
            raise RuntimeError("RESOURCE_EXHAUSTED: ran out of vmem")
        return val

    # both batches dispatched on rung 0 before either fetch runs
    out_a, idx_a = runner(7), runner.idx
    out_b, idx_b = runner(9), runner.idx
    with _pytest.warns(UserWarning, match="falling back"):
        assert fetch_with_ladder(
            runner, out_a, (7,), fetch, dispatch_idx=idx_a
        ) == 8
    assert runner.config == ("xla", None, False)
    # batch b's stale rung-0 failure must NOT advance past the ladder's
    # last rung (pre-fix this re-raised with the ladder "exhausted")
    assert fetch_with_ladder(
        runner, out_b, (9,), fetch, dispatch_idx=idx_b
    ) == 10
    assert runner.config == ("xla", None, False)
