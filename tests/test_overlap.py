"""Compute/transfer overlap utilities (parallel/overlap.py).

The sharded drivers rely on three contracts tested here: the pipelined
loop completes every item exactly once and in order while keeping the
dispatch-ahead bound; the background writer preserves write order and
surfaces worker errors; atomic writes never leave torn files behind.
"""

import json
import threading
import time

import numpy as np
import pytest

from gp_dla_detection_tpu.parallel.overlap import (
    BackgroundWriter,
    atomic_savez,
    atomic_write_json,
    run_pipelined,
)


def test_run_pipelined_completes_all_in_order():
    events = []
    run_pipelined(
        range(5),
        dispatch=lambda i: (events.append(("d", i)), i * 10)[1],
        complete=lambda i, s: events.append(("c", i, s)),
        depth=2,
    )
    assert [e for e in events if e[0] == "c"] == [
        ("c", i, i * 10) for i in range(5)
    ]
    # double buffering: item 1 dispatched BEFORE item 0 completes
    assert events.index(("d", 1)) < events.index(("c", 0, 0))
    # bounded lookahead: item 3 dispatched only after item 0 completed
    assert events.index(("c", 0, 0)) < events.index(("d", 3))


def test_run_pipelined_depth_one_is_serial():
    events = []
    run_pipelined(
        range(3),
        dispatch=lambda i: events.append(("d", i)),
        complete=lambda i, s: events.append(("c", i)),
        depth=1,
    )
    assert events == [
        ("d", 0), ("c", 0), ("d", 1), ("c", 1), ("d", 2), ("c", 2),
    ]
    with pytest.raises(ValueError, match="depth"):
        run_pipelined([], lambda i: i, lambda i, s: None, depth=0)


def test_background_writer_ordered_and_raises():
    order = []
    lock = threading.Lock()

    def work(i, delay):
        time.sleep(delay)
        with lock:
            order.append(i)

    with BackgroundWriter() as w:
        w.submit(work, 0, 0.05)  # slow first write must still land first
        w.submit(work, 1, 0.0)
        w.submit(work, 2, 0.0)
    assert order == [0, 1, 2]

    # worker errors surface at close (via the context manager exit)
    def boom():
        raise OSError("disk full")

    with pytest.raises(OSError, match="disk full"):
        with BackgroundWriter() as w:
            w.submit(boom)

    # ... or at a later submit, whichever comes first
    w2 = BackgroundWriter()
    w2.submit(boom)
    time.sleep(0.1)
    with pytest.raises(OSError, match="disk full"):
        for _ in range(50):
            w2.submit(time.sleep, 0)
    w2._pool.shutdown(wait=True, cancel_futures=True)


def test_background_writer_error_exit_does_not_mask(tmp_path):
    """An exception inside the with-block propagates unchanged even if a
    queued write also failed."""
    with pytest.raises(KeyError, match="original"):
        with BackgroundWriter() as w:
            w.submit(lambda: (_ for _ in ()).throw(OSError("late")))
            raise KeyError("original")


def test_atomic_writes_no_torn_files(tmp_path):
    target = tmp_path / "batch_000001.npz"
    atomic_savez(target, a=np.arange(5), b=np.eye(2))
    with np.load(target) as f:
        np.testing.assert_array_equal(f["a"], np.arange(5))
        np.testing.assert_array_equal(f["b"], np.eye(2))
    # overwrite is atomic too, and no .tmp remnants remain
    atomic_savez(target, a=np.zeros(3))
    with np.load(target) as f:
        np.testing.assert_array_equal(f["a"], np.zeros(3))
    mpath = tmp_path / "manifest.json"
    atomic_write_json(mpath, {"completed_batches": [0, 1]})
    assert json.loads(mpath.read_text()) == {"completed_batches": [0, 1]}
    assert list(tmp_path.iterdir()) and not list(tmp_path.glob("*.tmp"))
