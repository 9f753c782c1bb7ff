"""Multi-chip sharded {0, 1, 2}-DLA model selection.

The sharded analogue of multi_dla.process_spectra_multi, mirroring
sharded_inference.process_spectra_sharded: spectra across the mesh
'data' axis, fixed-size super-batches jitted once, per-batch
checkpoints with shape-validated manifests.  The single-DLA stage runs
through process_spectra_sharded (checkpointed under <ckpt>/single),
the pair stage under <ckpt>/pair; both resume independently.

The fused two-DLA Pallas kernel (config.backend="pallas") runs as a
per-shard program via shard_map on multi-device meshes (XLA's SPMD
partitioner does not split a TPU custom call); QMC samples are
replicated on every shard, so use data-axis-only meshes with it.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..inference import compute_sample_window, resolve_dtype
from ..models.qso_model import GPModel
from ..multi_dla import (
    MultiDLAResults,
    finalize_multi,
    make_base_sample_inds,
    make_batch_dla2_fn,
    packed_base_tables,
)
from ..params import Parameters, kms_to_z
from .mesh import (
    DATA_AXIS,
    SAMPLE_AXIS,
    data_sharding,
    fetch_global,
    is_coordinator,
    make_mesh,
    replicated,
    sample_sharding,
    shard_map_compat,
)
from .sharded_inference import (
    ShardedRunConfig,
    process_spectra_sharded,
    run_fingerprint,
)
from .streaming import checkpoint_payload, rows_from_checkpoint

__all__ = ["process_spectra_multi_sharded", "FUSED_LEAN_BASE_REPLICATES"]

# Resolved value of ShardedRunConfig.base_replicates=None (auto) when
# the fused pair kernel's replicated-lane fast path engages: R=4 is the
# measured knee of the pixel-fold (pair evaluator 817->1081/s, driver
# 1.34x; validation/base_replicates_ab.py) and is survey-validated
# (162k sightlines: zero clean/double catalog changes, 0.9999 R=1
# agreement; validation/RESULTS_SURVEY_LEAN_R4.md).
FUSED_LEAN_BASE_REPLICATES = 4


class _FusedChainRunner:
    """Single-dispatch fused two-stage chain over a PAIR of degradation
    ladders: both kernels plus every mid-chain reduction (lean packs,
    base resample, value gather) compile into ONE jitted program per
    (single rung, pair rung) combination.

    One program per batch instead of five cuts the remote dispatch
    overhead to a fifth and lets XLA CSE the posterior-CDF prologue
    shared by the lean evidence pack and the base resampler.  Ladder
    semantics: a recoverable DISPATCH-time failure is attributed by
    probing the single kernel alone (its own ladder advances if it is
    the failing stage, exactly as in the split-dispatch flow;
    otherwise the pair ladder advances — it holds ~2x the single
    kernel's VMEM and is the likelier culprit); a FETCH-time failure
    cannot be attributed without a re-run, so it degrades the pair
    ladder first, then the single (matching the split flow's fetch
    recovery).  The fused program is rebuilt from the runners' current
    rungs.  Only the first call of each rung pair forces completion
    (surfacing compile/VMEM failures at dispatch); later calls enqueue
    asynchronously.
    """

    def __init__(self, runner1, runner2, glue, probe_args=None):
        self.r1, self.r2 = runner1, runner2
        self.glue = glue  # (fn1, fn2) -> un-jitted fused callable
        # maps the fused program's argument tuple to runner1's own
        # argument list (the fused chain may carry extra inputs — e.g.
        # CDDF-reduction priors — that the single-stage probe must not see)
        self.probe_args = probe_args if probe_args is not None else (
            lambda args: args
        )
        self._fns: dict = {}
        self._verified: set = set()

    def _current(self):
        key = (self.r1.idx, self.r2.idx)
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(self.glue(self.r1.fn, self.r2.fn))
            self._fns[key] = fn
        return fn, key

    def call(self, *args):
        """Dispatch the fused chain; returns (out, rung_pair)."""
        from ..inference import force_completion, ladder_recoverable

        with self.r1.lock, self.r2.lock:
            while True:
                fn, key = self._current()
                try:
                    out = fn(*args)
                    if key not in self._verified:
                        force_completion(out)
                        self._verified.add(key)
                    return out, key
                except Exception as exc:
                    if not ladder_recoverable(exc):
                        raise
                    # attribute the failure: run the single kernel
                    # alone (one probe execution, failure paths only).
                    # LadderRunner.__call__ walks runner1's OWN ladder
                    # if the probe fails — the pair ladder is not
                    # burned for a single-kernel failure, unlike a
                    # blind pair-first walk which would also pin the
                    # pair stage on its slowest rung afterwards
                    idx1 = self.r1.idx
                    # raises only if r1's ladder exhausts
                    self.r1(*self.probe_args(args))
                    if self.r1.idx == idx1:
                        # single stage healthy at this rung: the pair
                        # stage (or the fused program itself) failed.
                        # With the pair ladder exhausted, keep walking
                        # the SINGLE ladder — the fused program
                        # co-resides both kernels' buffers, so a
                        # cheaper single rung can still make the pair's
                        # last rung fit (the probe above only proved r1
                        # healthy in isolation); every accepted config
                        # must complete before we abort
                        if not self.r2.try_advance(exc):
                            self.r1.recover(exc)

    def degrade(self, exc):
        """Un-attributed walk for FETCH-time failures: the pair ladder
        first, then the single; re-raises when ``exc`` is not
        ladder-recoverable or both ladders are exhausted."""
        if not self.r2.try_advance(exc):
            self.r1.recover(exc)

    def recover_at_fetch(self, exc, key):
        """Fetch-failure recovery: a failure from a rung pair some
        other in-flight batch already abandoned retries on the current
        pair without advancing further (see fetch_with_ladder's
        stale-failure handling); a fresh failure degrades."""
        from ..inference import ladder_recoverable

        with self.r1.lock, self.r2.lock:
            if (self.r1.idx, self.r2.idx) != key:
                if not ladder_recoverable(exc):
                    raise exc
            else:
                self.degrade(exc)


def process_spectra_multi_sharded(
    model: GPModel,
    offset_samples,
    nhi_samples,
    spectra,
    prior_z_qsos,
    prior_num_dlas,
    params: Parameters | None = None,
    mesh=None,
    config: ShardedRunConfig | None = None,
    progress: bool = False,
    min_separation_kms: float = 3000.0,
    base_seed: int = 0,
    single=None,
) -> MultiDLAResults:
    """Sharded two-DLA model selection.

    ``single``: precomputed InferenceResults to reuse; otherwise the
    single-DLA stage runs sharded (checkpointed under
    config.checkpoint_dir/single when set).
    """
    if params is None:
        params = Parameters()
    if config is None:
        config = ShardedRunConfig()
    if mesh is None:
        mesh = make_mesh()
    dtype = np.dtype(resolve_dtype(config.dtype, "process_spectra_multi_sharded"))
    use_pallas = config.backend in ("pallas", "pallas_interpret")
    if use_pallas and dtype != np.float32:
        raise ValueError(
            "backend='pallas' is float32-only; use backend='xla' for "
            f"float64 parity mode (got dtype={dtype})"
        )

    if not config.store_sample_likelihoods:
        # lean (catalog-only) two-stage: the FUSED driver evaluates both
        # stages per super-batch and resamples the base absorber on
        # device, so the (B, S) matrices never cross the wire
        if single is not None:
            raise ValueError(
                "the fused lean two-stage driver recomputes the single "
                "stage on device per batch (the base resampler needs the "
                "sample matrix, which lean results never store) — drop "
                "`single`, or use store_sample_likelihoods=True to reuse "
                "a precomputed full single-stage result"
            )
        return _process_multi_lean_fused(
            model, offset_samples, nhi_samples, spectra,
            prior_z_qsos, prior_num_dlas, params, mesh, config,
            progress, min_separation_kms, base_seed,
        )
    if config.base_replicates not in (None, 1):
        raise ValueError(
            "base_replicates > 1 is a fused-lean-driver feature "
            "(store_sample_likelihoods=False): the classic pair stage "
            "resamples on the host and stores the full (N, S) base "
            "index matrix, where draw replication has no kernel payoff"
        )
    if config.store_cddf_inputs:
        raise ValueError(
            "store_cddf_inputs is a lean-mode feature: classic "
            "(store_sample_likelihoods=True) runs already carry the "
            "full matrices the CDDF statistics marginalize"
        )
    # fail at config time, not after an hours-long single stage: the
    # CLASSIC pair stage resamples base absorbers from the single-stage
    # sample matrix on the host, which a lean precomputed result never
    # stores (same guard as the single-host process_spectra_multi)
    if single is not None and single.sample_log_likelihoods_dla is None:
        raise ValueError(
            "two-stage {0,1,2}-DLA selection resamples the base absorber "
            "from the single-stage sample likelihoods, which a lean "
            "(catalog-only) run never stores — pass a non-lean "
            "precomputed `single`, or drop both `single` and "
            "store_sample_likelihoods to run the fused lean driver"
        )

    offsets = np.asarray(offset_samples)
    nhis = np.asarray(nhi_samples)
    S = len(offsets)
    n = len(spectra)
    ckpt_root = Path(config.checkpoint_dir) if config.checkpoint_dir else None

    if single is None:
        import dataclasses

        single = process_spectra_sharded(
            model, offsets, nhis, spectra,
            prior_z_qsos, np.asarray(prior_num_dlas) >= 1,
            params=params, mesh=mesh,
            config=dataclasses.replace(
                config,
                checkpoint_dir=str(ckpt_root / "single") if ckpt_root else None,
            ),
            progress=progress,
        )
    elif len(single.p_dlas) != n or single.sample_log_likelihoods_dla.shape[1] != S:
        raise ValueError(
            "precomputed single-DLA results do not match these spectra/"
            f"samples: {single.sample_log_likelihoods_dla.shape} vs ({n}, {S})"
        )

    base = make_base_sample_inds(single.sample_log_likelihoods_dla, seed=base_seed)
    min_sep_z = kms_to_z(min_separation_kms)

    window = None
    order = unsort = None
    if use_pallas:
        from ..ops.evidence_pallas import SAMPLE_TILE

        order = np.argsort(offsets)
        unsort = np.argsort(order)
        window = compute_sample_window(
            offsets, SAMPLE_TILE,
            spectra.wavelengths.shape[1] + 2 * params.instrument.width,
            num_lines=params.num_lines,
            pixel_spacing=params.instrument.pixel_spacing,
        )
    # fused pair kernel + sample-axis mesh: fresh samples are already
    # z-sorted for the windowed kernel, so each shard can take a
    # contiguous sorted block of the fresh axis (and the matching base
    # columns) — see sharded_inference for the single-DLA analogue
    n_sample = (
        mesh.shape[SAMPLE_AXIS] if SAMPLE_AXIS in mesh.axis_names else 1
    )
    pallas_sample_sharded = (
        use_pallas and n_sample > 1 and S % n_sample == 0
    )

    def make_fn(run_backend, tile, windowed=True):
        # per-shard sample count when the fresh axis is sharded; the
        # XLA ladder rung runs WITHOUT shard_map (sharding propagation
        # handles it), so it sees the global S
        s_local = (
            S // n_sample
            if pallas_sample_sharded
            and run_backend in ("pallas", "pallas_interpret")
            else S
        )
        fn = make_batch_dla2_fn(
            model, params, s_local, config.sample_chunk, min_sep_z,
            run_backend, window if windowed else None, tile=tile,
        )
        if run_backend in ("pallas", "pallas_interpret") and mesh.size > 1:
            # per-shard Pallas program (see sharded_inference): shard_map
            # over the data axis; fresh-sample axis sharded when possible
            from jax.sharding import PartitionSpec as P

            d2, d1, r = P(DATA_AXIS, None), P(DATA_AXIS), P()
            s1 = P(SAMPLE_AXIS) if pallas_sample_sharded else r
            ds = P(DATA_AXIS, SAMPLE_AXIS) if pallas_sample_sharded else d2
            fn = shard_map_compat(
                fn, mesh,
                in_specs=(d2, d2, d2, d2, d1, r, r, r, r, s1, s1, ds, ds),
                out_specs=ds,
            )
        return fn

    # VMEM/lowering degradation ladder; a fallback keeps the pallas
    # data layout (sorted fresh axis, unsort at the end) — the XLA pair
    # evaluator is order-agnostic, so results are unchanged
    from ..inference import LadderRunner, ladder_configs

    runner = LadderRunner(
        ladder_configs(
            config.backend,
            spectra.wavelengths.shape[1] + 2 * params.instrument.width,
            dtype,
            two_dla=True,
            windowed=window is not None,
        ),
        make_fn,
        what="two-DLA",
    )

    n_data = mesh.shape[DATA_AXIS]
    super_batch = config.per_device_batch * n_data
    repl = replicated(mesh)
    data_spec = data_sharding(mesh)
    data_spec2 = data_sharding(mesh, 1)
    # the fresh sample axis rides the 'sample' mesh axis on the XLA
    # path and (via manual z-sorted blocks) on the pallas path when S
    # divides evenly; otherwise the pallas kernel replicates samples
    samp = (
        replicated(mesh)
        if use_pallas and not pallas_sample_sharded
        else sample_sharding(mesh)
    )

    off_host = offsets[order] if use_pallas else offsets
    nh_host = nhis[order] if use_pallas else nhis

    # per-batch base indices, in pair-column order (the host draw is the
    # bit-matched f64 resample; only the INDICES cross the wire — two
    # (B, S) f32 value arrays are ~80 MB/1024-batch through the tunnel
    # vs ~20 MB of uint16 indices, and the values come from one packed
    # (S, 2)-row device gather, bit-identical to host-gathered values)
    base_index_dtype = np.uint16 if S <= np.iinfo(np.uint16).max + 1 else np.int32

    def base_slice(start, stop):
        cols = base[start:stop]
        return (cols[:, order] if use_pallas else cols).astype(base_index_dtype)

    model_args = (
        jax.device_put(np.asarray(model.rest_wavelengths, dtype), repl),
        jax.device_put(np.asarray(model.mu, dtype), repl),
        jax.device_put(np.asarray(model.M, dtype), repl),
        jax.device_put(np.asarray(model.log_omega, dtype), repl),
    )
    off_j = jax.device_put(np.asarray(off_host, dtype), samp)
    nh_j = jax.device_put(np.asarray(nh_host, dtype), samp)
    base_tables = jax.device_put(packed_base_tables(offsets, nhis, dtype), repl)

    @jax.jit
    def base_values(cols):
        """Base (z, N_HI) values from uploaded indices via the shared
        packed-row gather (multi_dla.packed_base_tables)."""
        vals = base_tables[cols.astype(jnp.int32)]
        return vals[..., 0], vals[..., 1]

    ckpt_dir = ckpt_root / "pair" if ckpt_root else None
    manifest_path = ckpt_dir / "manifest.json" if ckpt_dir else None
    # shape + numerics fingerprint (see run_fingerprint): the pair stage
    # additionally depends on the separation cut and on the resampled
    # base indices (which encode base_seed AND the single-stage
    # likelihoods they were drawn from)
    fingerprint = run_fingerprint(
        dtype, config, params, model, offsets, nhis,
        extra=([min_sep_z], base, spectra.z_qso),
    )
    done: set = set()
    if manifest_path and manifest_path.exists():
        manifest = json.loads(manifest_path.read_text())
        if (
            manifest.get("num_spectra") == n
            and manifest.get("super_batch") == super_batch
            and manifest.get("num_samples") == S
            and manifest.get("base_seed") == base_seed
            and manifest.get("fingerprint") == fingerprint
        ):
            done = set(manifest["completed_batches"])
        else:
            import warnings

            warnings.warn(
                f"ignoring incompatible two-DLA checkpoints in {ckpt_dir} "
                "(run shape or numerics config changed)",
                stacklevel=2,
            )
    if ckpt_dir:
        ckpt_dir.mkdir(parents=True, exist_ok=True)

    from ..utils import ProgressMeter

    out2 = np.empty((n, S), dtype)
    meter = ProgressMeter(n, unit="spectra") if progress else None
    todo: list[tuple[int, int, int, Path | None]] = []
    for bi, start in enumerate(range(0, n, super_batch)):
        stop = min(start + super_batch, n)
        ckpt_file = ckpt_dir / f"batch_{bi:06d}.npz" if ckpt_dir else None
        if bi in done and ckpt_file and ckpt_file.exists():
            with np.load(ckpt_file) as f:
                out2[start:stop] = rows_from_checkpoint(
                    f, "dla2_resid", "dla2_row_max",
                    "sample_log_likelihoods_dla2",
                )
            if meter is not None:
                meter.update(stop - start)
            continue
        todo.append((bi, start, stop, ckpt_file))

    # compute/transfer overlap + background checkpoint writes, exactly
    # as in process_spectra_sharded (see parallel/overlap.py)
    from ..inference import fetch_with_ladder
    from .overlap import (
        BackgroundWriter,
        atomic_savez,
        atomic_write_json,
        run_pipelined_split,
    )
    from .streaming import fetch_packed_host, pack_rows, reconstruct_rows

    def upload(item):
        # host slice/pad + device_put only (no collectives; overlap.py)
        bi, start, stop, ckpt_file = item
        batch = spectra.slice(slice(start, stop)).pad_to(super_batch)
        pad_rows = super_batch - (stop - start)
        cols = base_slice(start, stop)
        if pad_rows:
            cols = np.concatenate(
                [cols, np.repeat(cols[-1:], pad_rows, axis=0)]
            )
        cols_dev = jax.device_put(np.ascontiguousarray(cols), data_spec2)
        return cols_dev, (
            jax.device_put(np.asarray(batch.wavelengths, dtype), data_spec2),
            jax.device_put(np.asarray(batch.flux, dtype), data_spec2),
            jax.device_put(np.asarray(batch.noise_variance, dtype), data_spec2),
            jax.device_put(np.asarray(batch.mask), data_spec2),
            jax.device_put(np.asarray(batch.z_qso, dtype), data_spec),
        )

    def issue(item, uploaded):
        # base_values is a jit call over the mesh — main thread only
        cols_dev, batch_args = uploaded
        ob, nb = base_values(cols_dev)
        args = (*batch_args, *model_args, off_j, nh_j, ob, nb)
        # pack the f16 wire format at dispatch time (device queue order;
        # see sharded_inference.dispatch); record the dispatch rung for
        # stale-failure recovery under pipelined dispatch
        raw, rung = runner.call_with_rung(*args)
        return args, pack_rows(raw, config.stream_dtype), rung

    def write_checkpoint(ckpt_file, bi, rows_host):
        # f16 wire format when streamed; no zlib (see sharded_inference)
        payload = checkpoint_payload(
            rows_host, "dla2_resid", "dla2_row_max",
            "sample_log_likelihoods_dla2",
        )
        atomic_savez(ckpt_file, compress=False, **payload)
        done.add(bi)
        atomic_write_json(
            manifest_path,
            {
                "num_spectra": n,
                "super_batch": super_batch,
                "num_samples": S,
                "base_seed": base_seed,
                "fingerprint": fingerprint,
                "completed_batches": sorted(done),
            },
        )

    with BackgroundWriter() as writer:

        def finish_batch(bi, start, stop, ckpt_file, rows_host):
            """Writer-thread work (see sharded_inference.finish_batch):
            unsort in the wire representation, trim batch padding,
            reconstruct into the disjoint result rows, checkpoint."""
            keep = stop - start

            def fix(a, is_cols):
                a = a[:, unsort] if (is_cols and use_pallas) else a
                return a[:keep]

            if rows_host[0] == "plain":
                rows_host = ("plain", fix(rows_host[1], True))
            else:
                rows_host = (
                    "packed",
                    fix(rows_host[1], True),
                    fix(rows_host[2], False),
                )
            out2[start:stop] = reconstruct_rows(rows_host)
            if ckpt_file and is_coordinator():
                write_checkpoint(ckpt_file, bi, rows_host)

        def complete(item, state):
            bi, start, stop, ckpt_file = item
            args, packed, rung = state
            rows_host = fetch_with_ladder(
                runner, packed, args, fetch_packed_host,
                repack=lambda o: pack_rows(o, config.stream_dtype),
                dispatch_idx=rung,
            )
            writer.submit(finish_batch, bi, start, stop, ckpt_file, rows_host)
            if meter is not None:
                meter.update(stop - start)

        # uploads on a side thread; collective issuance (base_values,
        # runner call, fetch_global) stays in serial program order on
        # the main thread — multi-controller-safe (overlap.py)
        run_pipelined_split(
            todo, upload, issue, complete, depth=config.pipeline_depth,
            threaded=config.dispatch_thread,
        )

    return finalize_multi(
        single, out2, base, spectra.z_qso, prior_z_qsos, prior_num_dlas,
        params,
    )


def _process_multi_lean_fused(
    model: GPModel,
    offset_samples,
    nhi_samples,
    spectra,
    prior_z_qsos,
    prior_num_dlas,
    params: Parameters,
    mesh,
    config: ShardedRunConfig,
    progress: bool,
    min_separation_kms: float,
    base_seed: int,
) -> MultiDLAResults:
    """Fused lean two-stage {0,1,2}-DLA selection: ONE pass per
    super-batch.

    Per batch, entirely on device: single-DLA sample likelihoods ->
    (evidence, MAP) reductions AND inverse-CDF base-absorber resampling
    (multi_dla.device_base_sample_inds) -> base (z, N_HI) gather ->
    two-DLA pair likelihoods -> (pair evidence, MAP pair, MAP base)
    reductions.  Only eight per-spectrum vectors ever cross the wire
    (one stacked fetch), replacing the classic two-pass flow's
    per-batch (B, S) f16 matrix fetches AND its two (B, S) f32
    base-value uploads — the pair stage's dominant tunnel terms.

    Trade-offs vs the classic path (store_sample_likelihoods=True):
      - no (N, S) matrices: CDDF analysis and .mat export raise
        (catalog consumers — evidences, posteriors, MAPs — all work);
      - the base draw runs at the compute dtype with XLA's cumsum
        association (see device_base_sample_inds) — identically
        distributed but not bit-matched to the host resampler;
      - one checkpoint stream (a few KB/batch) covers both stages.

    Replaces process_qsos.m:88-220's per-quasar loop for the
    multiplicity-catalog use case; format per calc_cddf.py:102-116.
    """
    from ..inference import (
        InferenceResults,
        dla_rate_priors,
        ladder_configs,
        LadderRunner,
        posteriors_from_evidence,
    )
    from ..multi_dla import (
        base_sample_perm,
        device_inverse_cdf_grid,
        finalize_multi_from_evidence,
        pack_lean_pair,
        replicate_draw_pattern,
    )
    from ..utils import ProgressMeter
    from .overlap import (
        BackgroundWriter,
        atomic_savez,
        atomic_write_json,
        run_pipelined_split,
    )
    from .sharded_inference import build_single_ladder
    from .streaming import pack_lean

    dtype = np.dtype(resolve_dtype(config.dtype, "process_spectra_multi_sharded"))
    use_pallas = config.backend in ("pallas", "pallas_interpret")
    if (
        use_pallas
        and SAMPLE_AXIS in mesh.axis_names
        and mesh.shape[SAMPLE_AXIS] > 1
    ):
        # XLA's partitioner handles the whole chain on (data x sample)
        # meshes (verified bit-identical to the data-only mesh,
        # tests/test_lean_multi.py) — but the pallas kernels run via
        # shard_map over the DATA axis only here, so a sample axis
        # would silently replicate both kernels' work across its shards
        # and waste those chips.  Refuse rather than quietly burn half
        # the mesh; the classic (store_sample_likelihoods=True) pair
        # driver supports pallas sample sharding.
        raise ValueError(
            "the fused lean two-stage driver runs its pallas kernels "
            "data-parallel only (a sample axis would silently replicate "
            f"the kernel work across {mesh.shape[SAMPLE_AXIS]} shards); "
            "use a data-only mesh with backend='pallas', or backend="
            "'xla' which shards the full chain on any mesh"
        )

    offsets = np.asarray(offset_samples)
    nhis = np.asarray(nhi_samples)
    S = len(offsets)
    if S >= 1 << 24:
        raise ValueError(
            f"lean mode supports < 2**24 samples (got {S}): MAP indices "
            "ride the stacked small-vector fetch as float32"
        )
    n = len(spectra)
    n_data = mesh.shape[DATA_AXIS]
    super_batch = config.per_device_batch * n_data
    min_sep_z = kms_to_z(min_separation_kms)
    num_pixels_ext = spectra.wavelengths.shape[1] + 2 * params.instrument.width

    # priors are host-side and cheap: both the 1-DLA counting prior and
    # the extended multiplicity prior come from the same prior catalog
    prior_num = np.asarray(prior_num_dlas)
    log_p_dla, log_p_no_dla = dla_rate_priors(
        spectra.z_qso, prior_z_qsos, prior_num >= 1, params
    )

    repl = replicated(mesh)
    data_spec = data_sharding(mesh)
    data_spec2 = data_sharding(mesh, 1)

    # ---- stage runners (each with its own degradation ladder) ----
    runner1 = build_single_ladder(
        model, params, config, mesh, dtype, offsets, num_pixels_ext,
        pallas_sample_sharded=False,
    )

    from ..ops.evidence_pallas import SAMPLE_TILE as PATTERN_TILE

    window = None
    order = None
    if use_pallas:
        # the fused pair kernel needs a z-ascending fresh axis; the
        # single-stage output stays in ORIGINAL sample order (its kernel
        # sorts/unsorts in-graph), so only the pair-stage inputs are
        # permuted — by `order` on device — and only index TRANSLATION
        # happens on the host (for the fetched MAP pair index)
        order = np.argsort(offsets)
        window = compute_sample_window(
            offsets, PATTERN_TILE, num_pixels_ext,
            num_lines=params.num_lines,
            pixel_spacing=params.instrument.pixel_spacing,
        )

    R = config.base_replicates
    if R is None:
        # AUTO (the production default): R=4 — the measured knee of the
        # pair-kernel fold, survey-validated (RESULTS_SURVEY_LEAN_R4.md)
        # — but only when the first ladder rung can actually engage the
        # replicated-lane fast path; otherwise (XLA backend, degraded
        # tile, f64 parity runs) R=1, preserving the classic
        # one-draw-per-column resample and its bit-parity with the
        # two-pass flow at no lost speedup.
        fb, ft, _ = ladder_configs(
            config.backend, num_pixels_ext, dtype,
            two_dla=True, windowed=window is not None,
        )[0]
        R = (
            FUSED_LEAN_BASE_REPLICATES
            if use_pallas
            and fb in ("pallas", "pallas_interpret")
            and ft == PATTERN_TILE
            else 1
        )
    elif R not in (1, 2, 4, 8):
        raise ValueError(
            f"base_replicates must be 1, 2, 4, or 8 (got {R}): each base "
            "draw is shared by R of a kernel tile's lane blocks "
            "(multi_dla.replicate_draw_pattern); survey-scale catalog "
            "validation exists for R <= 4 (validation/RESULTS_SURVEY_"
            "LEAN_R*.md)"
        )

    def make_fn2(run_backend, tile, windowed=True):
        # the replicate pattern is laid out for SAMPLE_TILE; a degraded
        # rung at another tile size must not exploit it (the values are
        # still plain values — only the kernel shortcut needs the
        # layout), and the XLA rung never does
        pattern_ok = (
            R > 1
            and run_backend in ("pallas", "pallas_interpret")
            and use_pallas
            and tile == PATTERN_TILE
        )
        fn = make_batch_dla2_fn(
            model, params, S, config.sample_chunk, min_sep_z,
            run_backend, window if windowed else None, tile=tile,
            base_replicates=R if pattern_ok else 1,
        )
        if run_backend in ("pallas", "pallas_interpret") and mesh.size > 1:
            from jax.sharding import PartitionSpec as P

            d2, d1, r = P(DATA_AXIS, None), P(DATA_AXIS), P()
            fn = shard_map_compat(
                fn, mesh,
                in_specs=(d2, d2, d2, d2, d1, r, r, r, r, r, r, d2, d2),
                out_specs=d2,
            )
        return fn

    runner2 = LadderRunner(
        ladder_configs(
            config.backend, num_pixels_ext, dtype,
            two_dla=True, windowed=window is not None,
        ),
        make_fn2,
        what="two-DLA",
    )
    first_backend, first_tile, _ = runner2.configs[0]
    if R > 1 and not (
        first_backend in ("pallas", "pallas_interpret")
        and first_tile == PATTERN_TILE
    ):
        import warnings

        warnings.warn(
            f"base_replicates={R} cannot engage the pair kernel's "
            f"replicated-lane fast path on this configuration (first "
            f"ladder rung: backend={first_backend!r}, tile={first_tile} "
            f"!= {PATTERN_TILE}) — the run still pays the {R}x-coarser "
            "base-draw stratification and the R-specific checkpoint "
            "fingerprint for no kernel speedup; use base_replicates=1 "
            "here",
            stacklevel=3,
        )

    # ---- device-resident sample tables ----
    model_args = (
        jax.device_put(np.asarray(model.rest_wavelengths, dtype), repl),
        jax.device_put(np.asarray(model.mu, dtype), repl),
        jax.device_put(np.asarray(model.M, dtype), repl),
        jax.device_put(np.asarray(model.log_omega, dtype), repl),
    )
    off_orig = jax.device_put(np.asarray(offsets, dtype), repl)
    nh_orig = jax.device_put(np.asarray(nhis, dtype), repl)
    if use_pallas:
        off_j = jax.device_put(np.asarray(offsets[order], dtype), repl)
        nh_j = jax.device_put(np.asarray(nhis[order], dtype), repl)
    else:
        off_j, nh_j = off_orig, nh_orig
    # the base resample reads the search-free grid inverse-CDF at the
    # COMPOSED static permutation (grid shuffle o pair-column order), so
    # the sorted-fresh-axis reorder costs nothing extra; index VALUES
    # stay in original sample numbering
    if R == 1:
        perm = base_sample_perm(S, base_seed)
        base_cols_perm = perm[order] if use_pallas else perm
        grid_size = S
    else:
        # base-replicated draws: pair column p (in the kernel's tiling
        # order — the SORTED axis under pallas) takes draw slot
        # draw_idx[p], each slot a distinct grid quantile of the
        # n_draws-point shuffled grid.  NOTE the pattern binds draws to
        # TILE LANES, so unlike R=1 the pairing is not invariant to the
        # backend's column order (a pallas and an xla run pair fresh
        # samples with different — equally valid — posterior draws)
        draw_idx, grid_size = replicate_draw_pattern(S, PATTERN_TILE, R)
        base_cols_perm = base_sample_perm(grid_size, base_seed)[draw_idx]
    cols_dev = jax.device_put(np.asarray(base_cols_perm, np.int32), repl)
    # base (z, N_HI) values come from the shared packed-row gather
    # (multi_dla.packed_base_tables: one (S, 2) gather, not two)
    base_tables = jax.device_put(packed_base_tables(offsets, nhis, dtype), repl)

    # ---- optional on-device CDDF-input reduction (cddf_inputs.py):
    # everything the L7 statistics marginalize from the (B, S) matrices,
    # reduced inside the same fused program ----
    store_cddf = config.store_cddf_inputs
    cddf_spec = cddf_reduce = cddf_consts = None
    n_fn1_args = 11  # (5 batch + 4 model + off + nh) = runner1's args
    if store_cddf:
        from ..cddf_inputs import CDDFReductionSpec, make_cddf_reducer
        from ..multi_dla import multi_dla_rate_priors

        cddf_spec = CDDFReductionSpec()
        # the reduction's lnhi tables come from log10 of the linear
        # N_HI samples — within 1 ulp of the stored log_nhi_samples the
        # host statistics rebind against (knife-edge-only difference)
        cddf_reduce, cddf_consts = make_cddf_reducer(
            cddf_spec, offsets, np.log10(nhis), dtype,
            order=order, replicated_sharding=repl,
        )
        log_p0m, log_p1m, log_p2m = multi_dla_rate_priors(
            spectra.z_qso, prior_z_qsos, prior_num, params
        )

    def glue(fn1, fn2):
        """Fused per-batch device chain (compiled as ONE program per
        ladder rung pair; see :class:`_FusedChainRunner`): single-DLA
        likelihoods -> lean reductions AND base resample + packed value
        gather (in the pair kernel's column order; index VALUES stay in
        original sample numbering) -> pair kernel -> pair reductions ->
        one stacked (8, B) small-vector array.  Index rows ride at the
        stacked dtype — exact for any S < 2**24 (guarded above).
        With store_cddf_inputs, the same program also reduces the CDDF
        inputs and returns (stacked, hist, ex); the per-batch prior
        vectors and the reduction's constant tables ride as extra
        ARGUMENTS (not closures — large closed-over arrays would be
        baked into the HLO payload, see models/training.py)."""

        def fused(*args):
            args1 = args[:n_fn1_args]
            out1 = fn1(*args1)
            sll = out1["sample_log_likelihoods_dla"]
            ev1, map1 = pack_lean(sll)
            base_cols = device_inverse_cdf_grid(
                sll, cols_dev, grid_size=grid_size
            )
            vals = base_tables[base_cols]
            lls2 = fn2(*args1[:9], off_j, nh_j, vals[..., 0], vals[..., 1])
            ev2, map2, map_base = pack_lean_pair(lls2, base_cols)
            small = [
                out1["log_likelihood_no_dla"], out1["min_z_dla"],
                out1["max_z_dla"], ev1, map1, ev2, map2, map_base,
            ]
            wide = jnp.result_type(*(a.dtype for a in small))
            stacked = jnp.stack([a.astype(wide) for a in small])
            if not store_cddf:
                return stacked
            lpno, lpdla, lp0m, lp1m, lp2m, consts = args[n_fn1_args:]
            hist, ex = cddf_reduce(
                consts, sll, ev1, out1["log_likelihood_no_dla"],
                out1["min_z_dla"], out1["max_z_dla"],
                lpno, lpdla, lp0m, lp1m, lp2m, lls2, ev2, base_cols,
            )
            return stacked, hist, ex

        return fused

    fused_chain = _FusedChainRunner(
        runner1, runner2, glue, probe_args=lambda a: a[:n_fn1_args]
    )

    # ---- checkpoint manifest (one stream for the fused pass) ----
    ckpt_dir = (
        Path(config.checkpoint_dir) / "fused" if config.checkpoint_dir else None
    )
    manifest_path = ckpt_dir / "manifest.json" if ckpt_dir else None
    # the trailing token is the fused-chain numerics version: v2 was
    # the grid inverse-CDF base resampler (single-rounded boundaries
    # vs v1's double-rounded stored-u searchsorted); v3 compiles the
    # whole chain into one XLA program, whose cross-stage fusion may
    # reassociate f32 knife-edge draws — checkpoints from different
    # versions must not mix within one run
    fingerprint = run_fingerprint(
        dtype, config, params, model, offsets, nhis,
        # base-replicated runs (R > 1) draw on a different grid — a
        # distinct numerics config that must not mix with R=1
        # checkpoints; R=1 keeps the historical fingerprint.  CDDF-
        # reduction runs additionally fingerprint the reduction spec
        # (its grids determine the stored hist values; non-CDDF
        # checkpoints also lack the hist payload entirely)
        extra=(
            [min_sep_z, float(base_seed), 3.0]
            + ([float(R)] if R != 1 else []),
            spectra.z_qso,
        )
        + (
            (np.frombuffer(cddf_spec.token().encode(), np.uint8),)
            if store_cddf
            else ()
        ),
    )
    done: set = set()
    if manifest_path and manifest_path.exists():
        manifest = json.loads(manifest_path.read_text())
        if (
            manifest.get("num_spectra") == n
            and manifest.get("super_batch") == super_batch
            and manifest.get("num_samples") == S
            and manifest.get("fingerprint") == fingerprint
        ):
            done = set(manifest["completed_batches"])
        else:
            import warnings

            warnings.warn(
                f"ignoring incompatible fused two-stage checkpoints in "
                f"{ckpt_dir} (run shape or numerics config changed)",
                stacklevel=2,
            )
    if ckpt_dir:
        ckpt_dir.mkdir(parents=True, exist_ok=True)

    VEC_KEYS = (
        "log_likelihood_no_dla", "min_z_dla", "max_z_dla",
        "log_likelihood_dla", "map_sample_ind",
        "log_likelihood_dla2", "map_sample_ind2", "map_base_sample_ind",
    )
    host_vecs = {k: np.empty(n) for k in VEC_KEYS}
    host_hist = host_ex = None
    if store_cddf:
        from ..cddf_inputs import N_CHANNELS

        host_hist = np.empty(
            (n, N_CHANNELS, cddf_spec.n_z_window, cddf_spec.n_lnhi + 1),
            dtype,
        )
        host_ex = np.empty((n, 5 * cddf_spec.top_k + 4), dtype)

    meter = ProgressMeter(n, unit="spectra") if progress else None
    todo: list[tuple[int, int, int, Path | None]] = []
    for bi, start in enumerate(range(0, n, super_batch)):
        stop = min(start + super_batch, n)
        ckpt_file = ckpt_dir / f"batch_{bi:06d}.npz" if ckpt_dir else None
        if bi in done and ckpt_file and ckpt_file.exists():
            with np.load(ckpt_file) as f:
                for k in VEC_KEYS:
                    host_vecs[k][start:stop] = f[k]
                if store_cddf:
                    host_hist[start:stop] = f["cddf_hist"]
                    host_ex[start:stop] = f["cddf_ex"]
            if meter is not None:
                meter.update(stop - start)
            continue
        todo.append((bi, start, stop, ckpt_file))

    import time as _time

    from ..utils import env_flag

    timing = env_flag("GPDLA_DRIVER_TIMING")

    def upload(item):
        # host slice/pad + device_put only (no collectives; overlap.py)
        bi, start, stop, ckpt_file = item
        t0 = _time.perf_counter()
        batch = spectra.slice(slice(start, stop)).pad_to(super_batch)
        t1 = _time.perf_counter()
        # args1 = 5 batch arrays + 4 model arrays + (off, nh) original;
        # the fused program derives the pair evaluator's inputs on
        # device (see glue above) — ONE dispatch covers both stages
        args1 = (
            jax.device_put(np.asarray(batch.wavelengths, dtype), data_spec2),
            jax.device_put(np.asarray(batch.flux, dtype), data_spec2),
            jax.device_put(np.asarray(batch.noise_variance, dtype), data_spec2),
            jax.device_put(np.asarray(batch.mask), data_spec2),
            jax.device_put(np.asarray(batch.z_qso, dtype), data_spec),
            *model_args,
            off_orig,
            nh_orig,
        )
        if store_cddf:
            pad_rows = super_batch - (stop - start)

            def pad_vec(a):
                v = np.asarray(a[start:stop], dtype)
                if pad_rows:
                    v = np.concatenate([v, np.repeat(v[-1:], pad_rows)])
                return jax.device_put(v, data_spec)

            args1 = args1 + (
                pad_vec(log_p_no_dla), pad_vec(log_p_dla),
                pad_vec(log_p0m), pad_vec(log_p1m), pad_vec(log_p2m),
                cddf_consts,
            )
        if timing:
            print(
                f"[fused] batch {bi}: slice {t1 - t0:.3f}s "
                f"device_put {_time.perf_counter() - t1:.3f}s",
                flush=True,
            )
        return args1

    def issue(item, args1):
        bi = item[0]
        t0 = _time.perf_counter()
        out = args1, fused_chain.call(*args1)
        if timing:
            print(
                f"[fused] batch {bi}: dispatch "
                f"{_time.perf_counter() - t0:.3f}s",
                flush=True,
            )
        return out

    def write_checkpoint(ckpt_file, bi, vecs, cddf=None):
        extra = (
            {} if cddf is None else {"cddf_hist": cddf[0], "cddf_ex": cddf[1]}
        )
        atomic_savez(
            ckpt_file, compress=False,
            **{k: v for k, v in zip(VEC_KEYS, vecs)},
            **extra,
        )
        done.add(bi)
        atomic_write_json(
            manifest_path,
            {
                "num_spectra": n,
                "super_batch": super_batch,
                "num_samples": S,
                "base_seed": base_seed,
                "fingerprint": fingerprint,
                "completed_batches": sorted(done),
            },
        )

    with BackgroundWriter() as writer:

        def finish_batch(bi, start, stop, ckpt_file, vecs, cddf=None):
            keep = stop - start
            vecs = [np.asarray(v[:keep], np.float64) for v in vecs]
            # index translations (host side): -1 = no finite sample /
            # no valid pair.  The single-stage MAP follows the lean
            # single driver's catalog fallback (original index 0); the
            # pair MAPs keep -1 as the documented no-valid-pair flag.
            map1 = vecs[4].astype(np.int64)
            map1[map1 < 0] = 0
            vecs[4] = map1
            map2 = vecs[6].astype(np.int64)
            if use_pallas:
                # pair columns ride the z-sorted fresh axis — translate
                # the argmax back to original sample numbering
                map2 = np.where(map2 >= 0, order[np.maximum(map2, 0)], -1)
            vecs[6] = map2
            vecs[7] = vecs[7].astype(np.int64)  # already original-order
            for k, v in zip(VEC_KEYS, vecs):
                host_vecs[k][start:stop] = v
            if cddf is not None:
                hist_h, ex_h = cddf[0][:keep], np.array(cddf[1][:keep])
                if use_pallas:
                    # the exact second-DLA PAIR indices ride the
                    # z-sorted fresh axis — translate like map2 (base
                    # indices and first-DLA indices are already
                    # original-order)
                    K = cddf_spec.top_k
                    blk = slice(3 * K, 4 * K)
                    pidx = ex_h[:, blk].astype(np.int64)
                    ex_h[:, blk] = np.where(
                        pidx >= 0, order[np.maximum(pidx, 0)], -1
                    ).astype(ex_h.dtype)
                host_hist[start:stop] = hist_h
                host_ex[start:stop] = ex_h
                cddf = (hist_h, ex_h)
            if ckpt_file and is_coordinator():
                write_checkpoint(ckpt_file, bi, vecs, cddf)

        def complete(item, state):
            bi, start, stop, ckpt_file = item
            args1, (out, key) = state
            t0 = _time.perf_counter()
            while True:
                try:
                    if store_cddf:
                        stacked, hist_d, ex_d = out
                        cddf = (fetch_global(hist_d), fetch_global(ex_d))
                    else:
                        stacked, cddf = out, None
                    smalls = fetch_global(stacked)
                    break
                except Exception as exc:  # ladder recovery at fetch
                    fused_chain.recover_at_fetch(exc, key)
                    out, key = fused_chain.call(*args1)
            if timing:
                print(
                    f"[fused] batch {bi}: fetch {_time.perf_counter() - t0:.3f}s",
                    flush=True,
                )
            vecs = [np.asarray(smalls[i]) for i in range(len(VEC_KEYS))]
            writer.submit(
                finish_batch, bi, start, stop, ckpt_file, vecs, cddf
            )
            if meter is not None:
                meter.update(stop - start)

        # uploads on a side thread; the fused-chain issuance and the
        # fetch collectives keep serial program order on the main
        # thread — multi-controller-safe (overlap.py)
        run_pipelined_split(
            todo, upload, issue, complete, depth=config.pipeline_depth,
            threaded=config.dispatch_thread,
        )

    post = posteriors_from_evidence(
        log_p_no_dla, log_p_dla,
        host_vecs["log_likelihood_no_dla"], host_vecs["log_likelihood_dla"],
    )
    single = InferenceResults(
        min_z_dlas=host_vecs["min_z_dla"],
        max_z_dlas=host_vecs["max_z_dla"],
        log_priors_no_dla=log_p_no_dla,
        log_priors_dla=log_p_dla,
        log_likelihoods_no_dla=host_vecs["log_likelihood_no_dla"],
        log_likelihoods_dla=post["log_likelihoods_dla"],
        sample_log_likelihoods_dla=None,
        map_sample_inds=host_vecs["map_sample_ind"].astype(np.int64),
        log_posteriors_no_dla=post["log_posteriors_no_dla"],
        log_posteriors_dla=post["log_posteriors_dla"],
        model_posteriors=post["model_posteriors"],
        p_no_dlas=post["p_no_dlas"],
        p_dlas=post["p_dlas"],
    )
    cddf_out = None
    if store_cddf:
        from ..cddf_inputs import CDDFInputs

        cddf_out = CDDFInputs(
            spec=cddf_spec, hist=host_hist, ex=host_ex, second=True
        )
        cddf_out.validate()
    # all-NaN pair rows (no valid pair) keep NaN evidence: the host
    # finalize_multi does the same via np.nanmax of an all-NaN row
    return finalize_multi_from_evidence(
        single, host_vecs["log_likelihood_dla2"], spectra.z_qso,
        prior_z_qsos, prior_num, params,
        map_sample_inds2=host_vecs["map_sample_ind2"].astype(np.int64),
        map_base_sample_inds=host_vecs["map_base_sample_ind"].astype(np.int64),
        cddf_inputs=cddf_out,
    )
