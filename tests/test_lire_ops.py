"""Split/Merge/Reassign tests (parity: operations.rs:324-616) — but against
the *completed* semantics: ops persist their results (quirk-5 fix)."""

import numpy as np
import pytest

from spfresh_tpu.lire import (
    LireContext,
    LireOperationError,
    LireStorage,
    Merge,
    Reassign,
    Split,
)


class Alloc:
    def __init__(self, start=100):
        self.next = start
        self.created = []
        self.retired = []

    def __call__(self):
        v = self.next
        self.next += 1
        return v


def make_ctx(tmp_path, dim=2, start=100):
    storage = LireStorage(str(tmp_path / "lire"), dim)
    alloc = Alloc(start)
    ctx = LireContext(
        storage=storage,
        alloc_posting_id=alloc,
        on_posting_created=lambda pid, c: alloc.created.append(pid),
        on_posting_retired=lambda pid: alloc.retired.append(pid),
    )
    return ctx, storage, alloc


def test_split_validate_rejects(tmp_path):
    ctx, storage, _ = make_ctx(tmp_path)
    with pytest.raises(LireOperationError):
        Split(0).validate(ctx)  # missing posting
    storage.store_vector(0, 1, np.ones(2))
    with pytest.raises(LireOperationError):
        Split(0).validate(ctx)  # < 2 vectors


def test_split_persists_two_postings(tmp_path):
    ctx, storage, alloc = make_ctx(tmp_path)
    # Two separated groups: split must recover them.
    pts = np.array([[0, 0], [0.1, 0], [0, 0.1], [10, 10], [10.1, 10], [10, 10.1]], np.float32)
    for i, p in enumerate(pts):
        storage.store_vector(0, i, p)
    res = Split(0).execute(ctx)
    assert res.retired_postings == [0]
    assert len(res.new_postings) == 2
    assert not storage.has_posting(0)
    groups = []
    for pid in res.new_postings:
        ids, vecs, _ = storage.get_posting(pid)
        groups.append(set(ids.tolist()))
        # centroid is a member (medoid rule)
        cent = storage.get_posting_centroid(pid)
        assert any(np.allclose(cent, v) for v in vecs)
    # each original vector lives in at least one new posting; the two
    # geometric groups are not mixed beyond boundary replicas
    assert set().union(*groups) == set(range(6))
    assert alloc.created == res.new_postings
    assert alloc.retired == [0]


def test_split_duplicate_points_progress(tmp_path):
    ctx, storage, _ = make_ctx(tmp_path)
    for i in range(8):
        storage.store_vector(0, i, np.ones(2))
    res = Split(0).execute(ctx)
    sizes = [storage.get_vector_count(p) for p in res.new_postings]
    assert sorted(sizes) == [4, 4]  # balanced fallback


def test_merge_validate_rejects(tmp_path):
    ctx, storage, _ = make_ctx(tmp_path)
    with pytest.raises(LireOperationError):
        Merge(0, 0).validate(ctx)
    with pytest.raises(LireOperationError):
        Merge(0, 1).validate(ctx)


def test_merge_unions_and_dedups(tmp_path):
    ctx, storage, _ = make_ctx(tmp_path)
    storage.store_vector(0, 1, np.array([0.0, 0.0]))
    storage.store_vector(0, 2, np.array([1.0, 0.0]))
    storage.store_vector(1, 3, np.array([0.0, 1.0]))
    # id 2 transiently lives in both (mid-reassign): newest version wins.
    storage.store_vector(1, 2, np.array([1.0, 0.1]))
    res = Merge(0, 1).execute(ctx)
    assert len(res.new_postings) == 1
    pid = res.new_postings[0]
    ids, vecs, _ = storage.get_posting(pid)
    assert sorted(ids.tolist()) == [1, 2, 3]
    row2 = vecs[list(ids).index(2)]
    np.testing.assert_allclose(row2, [1.0, 0.1])  # the newer copy
    assert not storage.has_posting(0) and not storage.has_posting(1)
    # medoid centroid is a member
    cent = storage.get_posting_centroid(pid)
    assert any(np.allclose(cent, v) for v in vecs)


def test_reassign_moves_to_nearest(tmp_path):
    ctx, storage, _ = make_ctx(tmp_path)
    storage.store_vector(0, 1, np.array([5.0, 5.0]))  # closer to posting 1
    storage.store_vector(0, 2, np.array([0.0, 0.0]))
    storage.store_vector(1, 3, np.array([6.0, 6.0]))
    storage.update_posting_centroid(0, np.array([0.0, 0.0]))
    storage.update_posting_centroid(1, np.array([6.0, 6.0]))
    _, _, vers = storage.get_posting(0)
    ids0, _, _ = storage.get_posting(0)
    tok = dict(zip(ids0.tolist(), vers.tolist()))
    res = Reassign([(1, 0, tok[1]), (2, 0, tok[2])], [0, 1]).execute(ctx)
    assert res.vectors_moved == 1
    assert sorted(storage.get_posting(1)[0].tolist()) == [1, 3]
    assert storage.get_posting(0)[0].tolist() == [2]


def test_reassign_stale_version_skipped(tmp_path):
    ctx, storage, _ = make_ctx(tmp_path)
    storage.store_vector(0, 1, np.array([5.0, 5.0]))
    storage.store_vector(1, 2, np.array([6.0, 6.0]))
    storage.update_posting_centroid(0, np.array([0.0, 0.0]))
    storage.update_posting_centroid(1, np.array([6.0, 6.0]))
    res = Reassign([(1, 0, 999999)], [0, 1]).execute(ctx)  # stale token
    assert res.vectors_moved == 0
    assert storage.get_posting(0)[0].tolist() == [1]  # untouched


def test_reassign_manhattan_metric(tmp_path):
    # operations.rs:596-615: reassignment respects the configured metric.
    ctx, storage, _ = make_ctx(tmp_path)
    ctx.metric = "Manhattan"
    storage.store_vector(0, 1, np.array([2.0, 2.0]))
    storage.store_vector(1, 9, np.array([3.0, 3.0]))
    storage.update_posting_centroid(0, np.array([0.0, 0.0]))
    storage.update_posting_centroid(1, np.array([3.0, 3.0]))
    ids, _, vers = storage.get_posting(0)
    res = Reassign([(1, 0, int(vers[0]))], [0, 1]).execute(ctx)
    assert res.vectors_moved == 1  # L1 dist 4 to c0 vs 2 to c1


def test_affected_partitions():
    assert Split(3).get_affected_partitions() == [3]
    assert Merge(1, 2).get_affected_partitions() == [1, 2]
    assert Reassign([(9, 4, 0)], [4, 5]).get_affected_partitions() == [4, 5]
