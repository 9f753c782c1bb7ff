"""Two-process jax.distributed worker for tests/test_parallel.py.

Each worker owns half of an 8-device global CPU mesh (4 virtual local
devices, XLA_FLAGS set by the parent) and runs the *same* sharded
inference driver used single-process — the driver's host side is
replicated-by-construction, collectives ride gloo between processes.
This exercises the multi-host path the reference lacks entirely (it
shards manually across MATLAB jobs, process_qsos.m:51-54).

Usage: python distributed_worker.py <process_id> <num_processes>
       <coordinator_addr> <out_dir> [mode]

mode: "single" (default) — the sharded single-DLA driver;
      "lean_multi" — the FUSED lean two-stage {0,1,2}-DLA driver
      (store_sample_likelihoods=False: device-side reductions + base
      resample, fetch_global on the stacked small vectors, coordinator-
      only checkpoints — the full multi-controller code path).
"""

import sys
from pathlib import Path

import jax

# fresh interpreter: pin to CPU before any backend use (a sitecustomize
# may force another platform; the config update wins pre-initialization)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    addr, out_dir = sys.argv[3], Path(sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "single"
    here = Path(__file__).resolve().parent
    sys.path.insert(0, str(here))  # synthetic_problem
    sys.path.insert(0, str(here.parent))  # repo root, if not pip-installed

    import numpy as np

    from gp_dla_detection_tpu.parallel import (
        ShardedRunConfig,
        initialize_distributed,
        make_mesh,
        process_spectra_sharded,
    )
    from synthetic_problem import make_problem

    initialize_distributed(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc * jax.local_device_count()

    params, model, spectra, offsets, nhis, prior_z, prior_f = make_problem()
    mesh = make_mesh()  # global mesh spanning both processes
    ckpt = out_dir / "ckpt"

    if mode == "lean_multi":
        from gp_dla_detection_tpu.parallel.sharded_multi import (
            process_spectra_multi_sharded,
        )

        prior_num = np.random.default_rng(7).choice(
            [0, 0, 0, 0, 0, 1, 1, 2], 200
        )
        multi = process_spectra_multi_sharded(
            model, offsets, nhis, spectra, prior_z, prior_num,
            params=params, mesh=mesh,
            config=ShardedRunConfig(
                per_device_batch=1, sample_chunk=32, dtype="float64",
                store_sample_likelihoods=False,
                checkpoint_dir=str(ckpt),
            ),
        )
        payload = dict(
            log_likelihoods_no_dla=multi.single.log_likelihoods_no_dla,
            log_likelihoods_dla=multi.single.log_likelihoods_dla,
            log_likelihoods_dla2=multi.log_likelihoods_dla2,
            model_posteriors=multi.model_posteriors,
            map_sample_inds=multi.single.map_sample_inds,
            map_sample_inds2=multi.map_sample_inds2,
            map_base_sample_inds=multi.map_base_sample_inds,
            p_dlas=multi.single.p_dlas,
        )
        # every process must hold the identical replicated catalog
        np.savez(out_dir / f"result_p{pid}.npz", **payload)
        if jax.process_index() == 0:
            np.savez(out_dir / "result.npz", **payload)
        jax.distributed.shutdown()
        return

    results = process_spectra_sharded(
        model, offsets, nhis, spectra, prior_z, prior_f,
        params=params, mesh=mesh,
        config=ShardedRunConfig(
            per_device_batch=1, sample_chunk=32, dtype="float64",
            checkpoint_dir=str(ckpt),
        ),
    )
    if jax.process_index() == 0:
        np.savez(
            out_dir / "result.npz",
            log_likelihoods_no_dla=results.log_likelihoods_no_dla,
            sample_log_likelihoods_dla=results.sample_log_likelihoods_dla,
            p_dlas=results.p_dlas,
            min_z_dlas=results.min_z_dlas,
            max_z_dlas=results.max_z_dlas,
        )
    else:
        # non-coordinator holds the identical gathered result in memory;
        # persist it too so the test can assert replication
        np.savez(
            out_dir / f"result_p{pid}.npz",
            sample_log_likelihoods_dla=results.sample_log_likelihoods_dla,
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
