"""Pipeline + protocol tests (parity: pipeline.rs:225-425, protocol.rs:147-205):
lifecycle, double start/stop, submit-to-stopped errors, status transitions,
split/merge triggers — using drain() instead of the reference's sleeps."""

import numpy as np
import pytest

from spfresh_tpu.lire import (
    LireConfig,
    LireContext,
    LireProtocol,
    LireStorage,
    Merge,
    PartitionStatus,
    PipelineError,
    Split,
    TwoStagePipeline,
)


def make_pipeline(tmp_path, dim=2):
    storage = LireStorage(str(tmp_path / "lire"), dim)
    ids = iter(range(1000, 2000))
    ctx = LireContext(storage=storage, alloc_posting_id=lambda: next(ids))
    return TwoStagePipeline(ctx), storage


def test_lifecycle(tmp_path):
    p, _ = make_pipeline(tmp_path)
    assert not p.is_running
    p.start()
    assert p.is_running
    with pytest.raises(PipelineError):
        p.start()  # double start
    p.stop()
    assert not p.is_running
    with pytest.raises(PipelineError):
        p.stop()  # double stop
    p.start()  # restartable
    p.stop()


def test_submit_to_stopped_errors(tmp_path):
    p, _ = make_pipeline(tmp_path)
    with pytest.raises(PipelineError):
        p.submit_task(Split(0))


def test_split_task_completes(tmp_path):
    p, storage = make_pipeline(tmp_path)
    for i in range(6):
        storage.store_vector(0, i, np.array([float(i > 2) * 10, 0.0]))
    p.start()
    p.submit_task(Split(0))
    p.drain()
    assert p.get_partition_status(0) == PartitionStatus.READY
    out = p.outcomes()
    assert len(out) == 1 and out[0].error is None
    assert len(out[0].result.new_postings) == 2
    p.stop()


def test_failed_op_marks_needs_maintenance(tmp_path):
    p, storage = make_pipeline(tmp_path)
    storage.store_vector(42, 0, np.array([1.0, 2.0]))  # 1 vector: unsplittable
    p.start()
    p.submit_task(Split(42))
    p.drain()
    assert p.get_partition_status(42) == PartitionStatus.NEEDS_MAINTENANCE
    out = p.outcomes()
    assert out[0].error is not None
    p.stop()


def test_stale_op_is_skipped_not_failed(tmp_path):
    # A split whose source was retired by an earlier op (here: simply gone)
    # is obsolete, not failed — status returns READY and no error records.
    from spfresh_tpu.utils import metrics

    p, storage = make_pipeline(tmp_path)
    p.start()
    before = metrics.snapshot().get("lire.split.stale", 0)
    p.submit_task(Split(4242))  # nonexistent: retired-source shape
    p.drain()
    assert p.get_partition_status(4242) == PartitionStatus.READY
    out = p.outcomes()
    assert out[0].error is None and out[0].result is None
    assert metrics.snapshot().get("lire.split.stale", 0) == before + 1
    p.stop()


def test_multi_task_sequencing(tmp_path):
    p, storage = make_pipeline(tmp_path)
    for i in range(4):
        storage.store_vector(0, i, np.array([float(i), 0.0]))
        storage.store_vector(1, 10 + i, np.array([float(i), 5.0]))
    p.start()
    p.submit_task(Split(0))
    p.submit_task(Merge(1, 1001))  # second split output does not exist yet -> fails
    p.drain()
    out = p.outcomes()
    assert len(out) == 2
    assert out[0].error is None
    p.stop()


def test_protocol_insert_triggers_split(tmp_path):
    storage = LireStorage(str(tmp_path / "lire"), 2)
    ids = iter(range(1000, 2000))
    ctx = LireContext(storage=storage, alloc_posting_id=lambda: next(ids))
    pipeline = TwoStagePipeline(ctx)
    pipeline.start()
    proto = LireProtocol(
        storage, LireConfig(max_partition_size=5, min_partition_size=1), pipeline
    )
    storage.store_vector(0, 0, np.zeros(2))
    for i in range(1, 6):
        proto.insert(np.array([float(i), 0.0]), i, posting_id=0)
    pipeline.drain()
    assert not storage.has_posting(0)  # split happened
    assert len(storage.posting_ids()) == 2
    pipeline.stop()


def test_protocol_delete_triggers_merge(tmp_path):
    storage = LireStorage(str(tmp_path / "lire"), 2)
    ids = iter(range(1000, 2000))
    ctx = LireContext(storage=storage, alloc_posting_id=lambda: next(ids))
    pipeline = TwoStagePipeline(ctx)
    pipeline.start()
    proto = LireProtocol(
        storage, LireConfig(max_partition_size=100, min_partition_size=3), pipeline
    )
    for i in range(4):
        storage.store_vector(0, i, np.array([float(i), 0.0]))
        storage.store_vector(1, 10 + i, np.array([float(i), 8.0]))
    proto.delete(0, 0)
    proto.delete(1, 0)  # live count 2 < min 3 -> merge scheduled
    pipeline.drain()
    assert len(storage.posting_ids()) == 1  # merged into one
    merged = storage.posting_ids()[0]
    assert storage.get_vector_count(merged) == 6
    pipeline.stop()


def test_protocol_nearest_partition_and_nearby(tmp_path):
    storage = LireStorage(str(tmp_path / "lire"), 2)
    proto = LireProtocol(storage, LireConfig())
    storage.store_vector(0, 0, np.array([0.0, 0.0]))
    storage.store_vector(1, 1, np.array([10.0, 0.0]))
    storage.store_vector(2, 2, np.array([20.0, 0.0]))
    assert proto.find_nearest_partition(np.array([1.0, 0.0])) == 0
    assert proto.find_nearest_partition(np.array([19.0, 0.0])) == 2
    # get_nearby_postings: real impl (reference stub returned empty)
    assert proto.get_nearby_postings(0, 2) == [1, 2]
    assert proto.get_nearby_postings(2, 1) == [1]


def test_protocol_gc_on_delete(tmp_path):
    storage = LireStorage(str(tmp_path / "lire"), 2)
    proto = LireProtocol(
        storage, LireConfig(min_partition_size=0, gc_threshold=0.2)
    )
    for i in range(10):
        storage.store_vector(0, i, np.ones(2))
    for i in range(3):
        proto.delete(i, 0)
    # 3 deletes of 10 > 0.2 -> GC compacted the log
    ids_all, _, _ = storage.get_posting(0, include_deleted=True)
    assert len(ids_all) == 7


def test_stale_merge_reflags_surviving_posting(tmp_path):
    """A Merge whose TARGET was retired is stale, but the still-existing
    (possibly still-undersized) source must not silently lose its pending
    maintenance: the survivor is flagged NEEDS_MAINTENANCE for the repair
    loop's threshold re-check; the missing posting returns READY."""
    p, storage = make_pipeline(tmp_path)
    for i in range(3):
        storage.store_vector(7, i, np.array([float(i), 0.0]))
    p.start()
    p.submit_task(Merge(7, 4242))  # target never existed: retired shape
    p.drain()
    assert p.get_partition_status(7) == PartitionStatus.NEEDS_MAINTENANCE
    assert p.get_partition_status(4242) == PartitionStatus.READY
    out = p.outcomes()
    assert out[0].error is None and out[0].result is None  # stale, not failed
    p.stop()


class _BoobyResult:
    """OperationResult stand-in whose fields raise on access."""

    new_postings: list = []
    retired_postings: list = []

    @property
    def vectors_moved(self):
        raise RuntimeError("boom: result accessor failed")


class _BoobyOp:
    """Duck-typed op that fails OUTSIDE execute()'s own error handling —
    the ADVICE r3 wedge path: the worker's catch-all used to leave the
    submit-time PROCESSING statuses in place forever."""

    def get_affected_partitions(self):
        return [0, 1]

    def is_stale(self, ctx):
        return False

    def stale_survivors(self, ctx):
        return []

    def execute(self, ctx):
        return _BoobyResult()


def test_worker_crash_unwedges_partitions(tmp_path):
    p, storage = make_pipeline(tmp_path)
    storage.store_vector(0, 0, np.zeros(2))
    storage.store_vector(1, 1, np.ones(2))
    p.start()
    p.submit_task(_BoobyOp())
    p.drain()  # worker survives (no deadlock) ...
    for pid in (0, 1):  # ... and the partitions are NOT stuck PROCESSING
        assert p.get_partition_status(pid) == PartitionStatus.NEEDS_MAINTENANCE
    # Maintenance on them is accepted again (PROCESSING would refuse it).
    storage.store_vector(0, 2, np.full(2, 2.0))
    p.submit_task(Split(0))
    p.drain()
    assert p.get_partition_status(0) != PartitionStatus.PROCESSING
    p.stop()


def test_submit_raise_leaves_statuses_untouched(tmp_path):
    class _RaisingOp:
        def get_affected_partitions(self):
            raise RuntimeError("malformed op")

    p, storage = make_pipeline(tmp_path)
    p.start()
    with pytest.raises(RuntimeError):
        p.submit_task(_RaisingOp())
    assert p.get_partition_status(0) == PartitionStatus.READY
    p.drain()
    p.stop()
