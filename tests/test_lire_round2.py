"""Round-2 LIRE hardening tests: orphan-proof appends, crash-safe
atomic_replace, the reverse id index, batched tombstones, bounded merges,
and insert re-routing."""

import os
import shutil

import numpy as np
import pytest

from spfresh_tpu.lire.operations import (
    LireContext,
    Merge,
    MergeError,
    Reassign,
)
from spfresh_tpu.lire.protocol import LireConfig, LireProtocol
from spfresh_tpu.lire.storage import LireStorage, LireStorageError


def _mk(tmp_path, name="s", **kw):
    return LireStorage(str(tmp_path / name), 2, **kw)


def test_store_vector_auto_create_policy(tmp_path):
    s = _mk(tmp_path, "a")  # default: reference-parity auto-create
    s.store_vector(7, 1, np.ones(2))
    assert s.has_posting(7)

    s2 = _mk(tmp_path, "b", auto_create_postings=False)
    with pytest.raises(LireStorageError):
        s2.store_vector(7, 1, np.ones(2))
    with pytest.raises(LireStorageError):
        s2.store_vectors(7, [1, 2], np.ones((2, 2)))
    s2.import_posting(7, np.array([1]), np.ones((1, 2)), np.ones(2))
    s2.store_vector(7, 2, np.ones(2))  # existing postings still accept appends
    assert s2.get_vector_count(7) == 2


def test_reverse_index_tracks_all_mutations(tmp_path):
    s = _mk(tmp_path)
    s.store_vector(0, 1, np.ones(2))
    s.store_vector(0, 2, np.ones(2))
    s.store_vector(1, 2, np.ones(2))  # replica of id 2
    assert s.postings_of(1) == [0]
    assert s.postings_of(2) == [0, 1]
    s.mark_deleted(0, 2)
    assert s.postings_of(2) == [1]
    s.delete_posting(1)
    assert s.postings_of(2) == []
    # Survives reload.
    s.store_vector(0, 3, np.ones(2))
    s2 = LireStorage(s.base_path, 2)
    assert s2.postings_of(1) == [0]
    assert s2.postings_of(3) == [0]
    assert s2.postings_of(2) == []


def test_reverse_index_after_atomic_replace(tmp_path):
    s = _mk(tmp_path)
    s.store_vector(0, 1, np.ones(2))
    s.store_vector(0, 2, np.ones(2))
    v = s.get_posting_version(0)
    ok = s.atomic_replace(
        [0], [v],
        [(10, np.array([1]), np.ones((1, 2)), np.ones(2)),
         (11, np.array([2]), np.ones((1, 2)), np.ones(2))],
    )
    assert ok
    assert s.postings_of(1) == [10]
    assert s.postings_of(2) == [11]


def test_mark_deleted_batch(tmp_path):
    s = _mk(tmp_path)
    for i in range(6):
        s.store_vector(0, i, np.full(2, i, np.float32))
    hit_ids, versions = s.mark_deleted_batch(0, [1, 3, 99, 3])  # 99 unknown, 3 repeated
    assert hit_ids == [1, 3] and len(versions) == 2
    assert s.get_vector_count(0) == 4
    ids, _, _ = s.get_posting(0)
    assert sorted(ids.tolist()) == [0, 2, 4, 5]
    # Batch tombstones survive reload.
    s2 = LireStorage(s.base_path, 2)
    ids2, _, _ = s2.get_posting(0)
    assert sorted(ids2.tolist()) == [0, 2, 4, 5]


def _snapshot(src, dst):
    shutil.copytree(src, dst)


def test_atomic_replace_crash_rolls_forward(tmp_path):
    """Crash AFTER the new generation is fully written but BEFORE the old
    files are removed: reopen must finish the swap (new generation wins)."""
    s = _mk(tmp_path)
    s.store_vector(0, 1, np.array([0.0, 0.0]))
    s.store_vector(0, 2, np.array([9.0, 9.0]))
    s.flush()  # fold the WAL so the snapshot holds per-posting logs
    v = s.get_posting_version(0)
    pre = str(tmp_path / "pre")
    _snapshot(s.base_path, pre)
    assert s.atomic_replace(
        [0], [v],
        [(10, np.array([1]), np.zeros((1, 2)), np.zeros(2)),
         (11, np.array([2]), 9 * np.ones((1, 2)), 9 * np.ones(2))],
    )
    # Reconstruct the mid-crash disk: new files present, old files present,
    # journal present.
    crash = str(tmp_path / "crash")
    _snapshot(s.base_path, crash)
    for sub in ("postings/posting_0.log", "metadata/posting_0_meta.bin"):
        shutil.copy(os.path.join(pre, sub), os.path.join(crash, sub))
    with open(os.path.join(crash, "replace.journal"), "w") as f:
        f.write('{"old": [0], "new": [10, 11]}')

    s2 = LireStorage(crash, 2)
    assert not s2.has_posting(0)
    assert s2.has_posting(10) and s2.has_posting(11)
    assert s2.postings_of(1) == [10] and s2.postings_of(2) == [11]
    assert not os.path.exists(os.path.join(crash, "replace.journal"))


def test_atomic_replace_crash_rolls_back(tmp_path):
    """Crash while writing the new generation (one new log missing): reopen
    must roll back — the OLD posting survives intact, partial new files go."""
    s = _mk(tmp_path)
    s.store_vector(0, 1, np.array([0.0, 0.0]))
    s.store_vector(0, 2, np.array([9.0, 9.0]))
    s.flush()
    base = s.base_path
    # Journal says 10 and 11 replace 0, but only 10's log got written.
    shutil.copy(
        os.path.join(base, "postings/posting_0.log"),
        os.path.join(base, "postings/posting_10.log"),
    )
    with open(os.path.join(base, "replace.journal"), "w") as f:
        f.write('{"old": [0], "new": [10, 11]}')

    s2 = LireStorage(base, 2)
    assert s2.has_posting(0)
    assert not s2.has_posting(10) and not s2.has_posting(11)
    ids, _, _ = s2.get_posting(0)
    assert sorted(ids.tolist()) == [1, 2]


def test_insert_reroutes_when_posting_retired(tmp_path):
    """An insert routed to a posting that a background split retired between
    routing and the append must land in the current nearest partition, not
    resurrect the orphan."""
    s = _mk(tmp_path, auto_create_postings=False)
    s.import_posting(0, np.array([1]), np.zeros((1, 2)), np.zeros(2))
    s.import_posting(1, np.array([2]), 9 * np.ones((1, 2)), 9 * np.ones(2))
    proto = LireProtocol(s, LireConfig())

    real_find = proto.find_nearest_partition
    state = {"first": True}

    def racy_find(vec):
        pid = real_find(vec)
        if state["first"]:
            state["first"] = False
            s.delete_posting(pid)  # the "background split" retires it
        return pid

    proto.find_nearest_partition = racy_find
    res = proto.insert(np.array([0.1, 0.1]), 42)
    assert res.partitions_affected == [1]  # re-routed to the survivor
    assert s.postings_of(42) == [1]
    assert not s.has_posting(0)  # and no orphan was resurrected


def test_merge_respects_max_size(tmp_path):
    s = _mk(tmp_path)
    for i in range(4):
        s.store_vector(0, i, np.zeros(2))
        s.store_vector(1, 10 + i, np.ones(2))
    ctx = LireContext(storage=s, alloc_posting_id=iter(range(100, 200)).__next__)
    with pytest.raises(MergeError):
        Merge(0, 1, max_size=5).execute(ctx)
    res = Merge(0, 1, max_size=8).execute(ctx)
    assert res.vectors_moved == 8


def test_plan_merge_picks_target_within_budget(tmp_path):
    s = _mk(tmp_path)
    # 0 is tiny and nearest to 1, but 1 is full; 2 is farther but has room.
    s.import_posting(0, np.array([1]), np.zeros((1, 2)), np.zeros(2))
    s.import_posting(
        1, np.arange(10, 18), np.ones((8, 2)), np.ones(2)
    )
    s.import_posting(
        2, np.arange(20, 22), 3 * np.ones((2, 2)), 3 * np.ones(2)
    )
    proto = LireProtocol(s, LireConfig(max_partition_size=6, min_partition_size=2))
    merge = proto._plan_merge(0)
    assert merge is not None
    assert merge.target_id == 2  # posting 1 would blow the cap
    assert merge.max_size == 6


def test_reassign_batched_moves_and_survives_dst_retirement(tmp_path):
    s = _mk(tmp_path)
    # Posting 0 holds two vectors that clearly belong to 1 and 2.
    s.import_posting(
        0, np.array([1, 2]),
        np.array([[5.0, 5.0], [9.0, 9.0]], np.float32), np.zeros(2)
    )
    s.import_posting(1, np.array([3]), 5 * np.ones((1, 2)), 5 * np.ones(2))
    s.import_posting(2, np.array([4]), 9 * np.ones((1, 2)), 9 * np.ones(2))
    _, _, vers = s.get_posting(0)
    ids0, _, _ = s.get_posting(0)
    triples = [(int(i), 0, int(v)) for i, v in zip(ids0, vers)]
    ctx = LireContext(storage=s, alloc_posting_id=iter(range(100, 200)).__next__)
    res = Reassign(triples, [0, 1, 2]).execute(ctx)
    assert res.vectors_moved == 2
    assert s.postings_of(1) == [1]
    assert s.postings_of(2) == [2]
    assert s.get_vector_count(0) == 0


def test_delete_batch_can_empty_a_posting(tmp_path, rng):
    """Deleting every member of a posting must not crash the mirror refresh
    (the (0, -1) reshape bug the round-2 drive caught)."""
    from spfresh_tpu.index import Config, SpannIndex
    from spfresh_tpu.lire import SpFreshIndex

    data = rng.standard_normal((40, 8)).astype(np.float32)
    index = SpannIndex(Config())
    for c in range(4):
        ids = np.arange(c * 10, (c + 1) * 10, dtype=np.int64)
        index.add_cluster(data[ids], ids, centroid=data[ids[0]])
    with SpFreshIndex(index, str(tmp_path / "st"), LireConfig(min_partition_size=0)) as fresh:
        assert fresh.delete_batch(np.arange(0, 10)) == 10  # all of posting 0
        ids_, _ = fresh.search(data[:4], k=5, nprobe=4)
        assert not (set(ids_.ravel().tolist()) & set(range(10)))


def test_wal_updates_survive_reopen_without_flush(tmp_path):
    """Inserts/tombstones live only in the WAL until compaction; a reopen
    must replay them exactly (the 'storage survives reopen' invariant)."""
    s = _mk(tmp_path)
    s.import_posting(0, np.array([1, 2]), np.ones((2, 2)), np.ones(2))
    s.store_vectors(0, [3, 4], 2 * np.ones((2, 2)))
    s.mark_deleted(0, 2)
    # No flush: the per-posting log predates the WAL records.
    s2 = LireStorage(s.base_path, 2)
    ids, vecs, _ = s2.get_posting(0)
    assert sorted(ids.tolist()) == [1, 3, 4]
    assert s2.postings_of(2) == []
    assert s2.get_vector_count(0) == 3
    # And versions stay monotonic across the reopen.
    v_before = s.current_version()
    assert s2.store_vector(0, 9, np.ones(2)) > v_before


def test_wal_crash_during_compaction_is_idempotent(tmp_path):
    """Crash AFTER the posting logs were rewritten but BEFORE the WAL was
    removed: replaying the WAL over the new logs must not duplicate adds or
    kill the wrong copies."""
    import shutil as _sh

    s = _mk(tmp_path)
    s.import_posting(0, np.array([1]), np.ones((1, 2)), np.ones(2))
    s.store_vectors(0, [2, 3], np.zeros((2, 2)))
    s.mark_deleted(0, 3)
    wal_copy = str(tmp_path / "wal.copy")
    _sh.copy(s._wal_path, wal_copy)
    s.flush()  # logs now contain everything; WAL gone
    _sh.copy(wal_copy, s._wal_path)  # "crash" restored the stale WAL
    s2 = LireStorage(s.base_path, 2)
    ids, _, _ = s2.get_posting(0)
    assert sorted(ids.tolist()) == [1, 2]
    assert s2.get_vector_count(0) == 2


def test_delete_then_reinsert_same_id_replays_exactly(tmp_path):
    """A DEL record names its exact entry version: replay must not tombstone
    the newer re-inserted copy of the same id."""
    s = _mk(tmp_path)
    s.import_posting(0, np.array([7]), np.ones((1, 2)), np.ones(2))
    s.flush()
    s.mark_deleted(0, 7)
    s.store_vector(0, 7, 5 * np.ones(2))  # re-insert the same id
    s2 = LireStorage(s.base_path, 2)
    ids, vecs, _ = s2.get_posting(0)
    assert ids.tolist() == [7]
    np.testing.assert_allclose(vecs[0], 5 * np.ones(2))


def test_route_dists_uses_one_topology_snapshot(tmp_path):
    """find_nearest_partition must route within ONE topology snapshot.

    Regression (caught by the threaded stress suite): _route_dists took a
    FRESH _router() snapshot, so a pipeline split landing between the
    caller's snapshot and the distance scan grew the centroid matrix — the
    argmin over the new (C+1,) distances indexed one past the caller's
    (C,) pids (IndexError on a concurrent insert)."""
    s = _mk(tmp_path, auto_create_postings=False)
    s.import_posting(0, np.array([1]), np.zeros((1, 2)), np.zeros(2))
    s.import_posting(1, np.array([2]), np.ones((1, 2)), np.ones(2))
    proto = LireProtocol(s, LireConfig())

    real_cm = s.centroid_matrix
    state = {"n": 0}

    def growing_cm():
        # Simulate a background split landing between consecutive
        # centroid-matrix reads: every read PAST the first one sees a new
        # posting whose centroid is nearest to the query below.
        state["n"] += 1
        if state["n"] == 2:
            s.centroid_matrix = real_cm  # restore before mutating
            s.import_posting(5, np.array([9]), 5 * np.ones((1, 2)), 5 * np.ones(2))
            s.centroid_matrix = growing_cm
        return real_cm()

    s.centroid_matrix = growing_cm
    pid = proto.find_nearest_partition(5 * np.ones(2, np.float32))
    # Routed consistently within the first snapshot: nearest of {0, 1}.
    assert pid == 1
