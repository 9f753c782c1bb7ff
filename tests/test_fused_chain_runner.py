"""Ladder semantics of the fused lean chain runner.

_FusedChainRunner (parallel/sharded_multi) replaced the split-dispatch
recover_fused/chain flow; these tests pin its failure-recovery surface
with stub stage runners that raise on cue:

  - dispatch-time failures are ATTRIBUTED: a single-kernel failure
    advances only the single ladder (the pair ladder is not burned and
    does not end pinned on a slow rung), a pair-kernel failure
    advances only the pair ladder;
  - non-recoverable errors re-raise immediately with no rung walked;
  - fetch-time failures degrade pair-first (attribution impossible
    without a re-run), and STALE fetch failures — from a rung pair
    some other in-flight batch already abandoned — retry without
    advancing further.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from gp_dla_detection_tpu.inference import LadderRunner
from gp_dla_detection_tpu.parallel.sharded_multi import _FusedChainRunner


def _vmem_error():
    return RuntimeError("RESOURCE_EXHAUSTED: scoped vmem allocation")


class _Stage:
    """Builds per-rung stage fns: rungs listed in ``failing`` raise a
    ladder-recoverable error when called; the rest add ``base`` to the
    input.  Config tuples are (rung_name, None, False)."""

    def __init__(self, base: float, n_rungs: int = 3, failing=()):
        self.base = base
        self.failing = set(failing)
        self.configs = [(f"rung{i}", None, False) for i in range(n_rungs)]
        self.calls: list[int] = []

    def build(self, backend, tile, windowed):
        rung = int(backend[4:])

        def fn(x):
            self.calls.append(rung)
            if rung in self.failing:
                raise _vmem_error()
            return x + self.base

        return fn


def _make(stage1: _Stage, stage2: _Stage):
    r1 = LadderRunner(stage1.configs, stage1.build, what="single")
    r2 = LadderRunner(stage2.configs, stage2.build, what="pair")

    def glue(fn1, fn2):
        def fused(x):
            return fn1(x) + fn2(x)

        return fused

    return r1, r2, _FusedChainRunner(r1, r2, glue)


X = jnp.asarray(np.arange(4.0, dtype=np.float32))


def test_happy_path_no_rungs_walked():
    s1, s2 = _Stage(1.0), _Stage(10.0)
    r1, r2, fused = _make(s1, s2)
    out, key = fused.call(X)
    assert key == (0, 0) and (r1.idx, r2.idx) == (0, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X) * 2 + 11.0)


def test_single_stage_dispatch_failure_advances_only_single_ladder():
    s1, s2 = _Stage(1.0, failing={0}), _Stage(10.0)
    r1, r2, fused = _make(s1, s2)
    with pytest.warns(UserWarning, match="single backend"):
        out, key = fused.call(X)
    assert key == (1, 0)
    assert (r1.idx, r2.idx) == (1, 0), "pair ladder must not be burned"
    np.testing.assert_allclose(np.asarray(out), np.asarray(X) * 2 + 11.0)


def test_pair_stage_dispatch_failure_advances_only_pair_ladder():
    s1, s2 = _Stage(1.0), _Stage(10.0, failing={0})
    r1, r2, fused = _make(s1, s2)
    with pytest.warns(UserWarning, match="pair backend"):
        out, key = fused.call(X)
    assert key == (0, 1)
    assert (r1.idx, r2.idx) == (0, 1), "single ladder must not be burned"
    np.testing.assert_allclose(np.asarray(out), np.asarray(X) * 2 + 11.0)


def test_both_stages_failing_walk_both_ladders():
    s1, s2 = _Stage(1.0, failing={0}), _Stage(10.0, failing={0, 1})
    r1, r2, fused = _make(s1, s2)
    with pytest.warns(UserWarning):
        out, key = fused.call(X)
    assert key == (1, 2) and (r1.idx, r2.idx) == (1, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X) * 2 + 11.0)


def test_pair_ladder_exhausted_at_dispatch_walks_single_ladder():
    """Co-residency failure with the pair ladder exhausted: the fused
    program holds BOTH kernels' buffers, so when the pair stage has no
    rungs left a cheaper single rung can still make it fit.  The single
    kernel probe passes in isolation, so attribution blames the pair —
    the runner must then fall through to the single ladder instead of
    aborting (every accepted config must complete)."""
    s1, s2 = _Stage(1.0), _Stage(10.0, n_rungs=1)
    r1 = LadderRunner(s1.configs, s1.build, what="single")
    r2 = LadderRunner(s2.configs, s2.build, what="pair")

    def glue(fn1, fn2):
        def fused_fn(x):
            out = fn1(x) + fn2(x)
            # both stages pass alone; co-resident they exceed VMEM
            # until the single stage degrades off its fastest rung
            if r1.idx == 0:
                raise _vmem_error()
            return out

        return fused_fn

    fused = _FusedChainRunner(r1, r2, glue)
    with pytest.warns(UserWarning, match="single backend"):
        out, key = fused.call(X)
    assert key == (1, 0) and (r1.idx, r2.idx) == (1, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X) * 2 + 11.0)


def test_non_recoverable_dispatch_error_reraises_without_walking():
    s1 = _Stage(1.0)
    s2 = _Stage(10.0)
    r1, r2, fused = _make(s1, s2)

    def bad_glue(fn1, fn2):
        def fused_fn(x):
            raise ValueError("bad shapes from the caller")

        return fused_fn

    fused.glue = bad_glue
    with pytest.raises(ValueError, match="bad shapes"):
        fused.call(X)
    assert (r1.idx, r2.idx) == (0, 0)


def test_single_ladder_exhaustion_reraises():
    s1 = _Stage(1.0, failing={0, 1, 2})
    s2 = _Stage(10.0)
    r1, r2, fused = _make(s1, s2)
    with pytest.warns(UserWarning), pytest.raises(RuntimeError,
                                                  match="RESOURCE_EXHAUSTED"):
        fused.call(X)


def test_fetch_failure_degrades_pair_first():
    s1, s2 = _Stage(1.0), _Stage(10.0)
    r1, r2, fused = _make(s1, s2)
    out, key = fused.call(X)
    with pytest.warns(UserWarning, match="pair backend"):
        fused.recover_at_fetch(_vmem_error(), key)
    assert (r1.idx, r2.idx) == (0, 1)
    # a second fresh fetch failure at the advanced pair rung
    with pytest.warns(UserWarning, match="pair backend"):
        fused.recover_at_fetch(_vmem_error(), (0, 1))
    assert (r1.idx, r2.idx) == (0, 2)
    # pair ladder exhausted: the single ladder absorbs the next one
    with pytest.warns(UserWarning, match="single backend"):
        fused.recover_at_fetch(_vmem_error(), (0, 2))
    assert (r1.idx, r2.idx) == (1, 2)


def test_stale_fetch_failure_retries_without_advancing():
    s1, s2 = _Stage(1.0), _Stage(10.0)
    r1, r2, fused = _make(s1, s2)
    fused.call(X)
    with pytest.warns(UserWarning):
        fused.recover_at_fetch(_vmem_error(), (0, 0))  # fresh: advances
    assert (r1.idx, r2.idx) == (0, 1)
    # stale: dispatched on (0, 0), current is (0, 1) — no further walk
    fused.recover_at_fetch(_vmem_error(), (0, 0))
    assert (r1.idx, r2.idx) == (0, 1)
    # stale + non-recoverable: re-raises
    with pytest.raises(ValueError, match="genuine bug"):
        fused.recover_at_fetch(ValueError("genuine bug"), (0, 0))
    assert (r1.idx, r2.idx) == (0, 1)


def test_verification_forced_once_per_rung_pair():
    s1, s2 = _Stage(1.0), _Stage(10.0)
    r1, r2, fused = _make(s1, s2)
    fused.call(X)
    n_first = len(s1.calls)
    fused.call(X)
    fused.call(X)
    # later calls reuse the verified compiled program: the stub bodies
    # only re-execute if jax re-traces (same jitted fn => no re-trace)
    assert len(s1.calls) == n_first
    assert (0, 0) in fused._verified and len(fused._verified) == 1
