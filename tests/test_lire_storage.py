"""LireStorage tests (parity: /root/reference/src/spann/lire/storage.rs:262-456):
version monotonicity, tombstone delete, GC threshold, concurrent stores get
unique versions, metadata reload from disk, multi-posting isolation, centroid
get/update, error paths — plus the append-log semantics that fix quirk 4."""

import threading

import numpy as np
import pytest

from spfresh_tpu.lire import LireStorage, LireStorageError


def make_storage(tmp_path, dim=4):
    return LireStorage(str(tmp_path / "lire"), dim)


def test_version_monotonic(tmp_path):
    s = make_storage(tmp_path)
    v1 = s.store_vector(0, 1, np.ones(4))
    v2 = s.store_vector(0, 2, np.ones(4))
    v3 = s.store_vector(1, 3, np.ones(4))
    assert v1 < v2 < v3


def test_multi_vector_posting_persists(tmp_path):
    # Quirk-4 fix: store_vector must append, not overwrite.
    s = make_storage(tmp_path)
    for i in range(5):
        s.store_vector(0, i, np.full(4, i, np.float32))
    ids, vecs, vers = s.get_posting(0)
    assert list(ids) == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(vecs[3], np.full(4, 3))
    assert s.get_vector_count(0) == 5


def test_tombstone_delete(tmp_path):
    s = make_storage(tmp_path)
    s.store_vector(0, 1, np.ones(4))
    s.store_vector(0, 2, 2 * np.ones(4))
    s.mark_deleted(0, 1)
    ids, vecs, _ = s.get_posting(0)
    assert list(ids) == [2]
    assert s.get_vector_count(0) == 1
    ids_all, _, _ = s.get_posting(0, include_deleted=True)
    assert list(ids_all) == [1, 2]
    with pytest.raises(LireStorageError):
        s.mark_deleted(0, 1)  # already deleted
    with pytest.raises(LireStorageError):
        s.mark_deleted(0, 99)  # never existed


def test_gc_threshold_and_collect(tmp_path):
    s = make_storage(tmp_path)
    for i in range(10):
        s.store_vector(0, i, np.ones(4))
    for i in range(4):
        s.mark_deleted(0, i)
    assert s.needs_garbage_collection(0, 0.3)  # 0.4 > 0.3
    assert not s.needs_garbage_collection(0, 0.5)
    reclaimed = s.collect_garbage(0)
    assert reclaimed == 4
    assert not s.needs_garbage_collection(0, 0.0)
    ids, _, _ = s.get_posting(0)
    assert list(ids) == list(range(4, 10))


def test_concurrent_store_unique_versions(tmp_path):
    # storage.rs:340-367: 10 threads, all versions unique.
    s = make_storage(tmp_path)
    versions = []
    lock = threading.Lock()

    def worker(tid):
        for j in range(20):
            v = s.store_vector(tid % 3, tid * 100 + j, np.ones(4))
            with lock:
                versions.append(v)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(versions) == 200
    assert len(set(versions)) == 200


def test_reload_from_disk(tmp_path):
    s = make_storage(tmp_path)
    s.store_vector(0, 1, np.arange(4, dtype=np.float32))
    s.store_vector(0, 2, np.ones(4))
    s.mark_deleted(0, 1)
    s.store_vector(7, 3, 3 * np.ones(4))
    s.update_posting_centroid(7, np.full(4, 9.0))
    v_before = s.current_version()

    s2 = make_storage(tmp_path)  # same path -> reload
    assert s2.posting_ids() == [0, 7]
    ids, vecs, _ = s2.get_posting(0)
    assert list(ids) == [2]
    assert s2.get_vector_count(0) == 1
    np.testing.assert_allclose(s2.get_posting_centroid(7), np.full(4, 9.0))
    assert s2.current_version() >= v_before
    # New versions continue past the reloaded high-water mark.
    assert s2.store_vector(0, 5, np.ones(4)) > v_before


def test_posting_isolation(tmp_path):
    s = make_storage(tmp_path)
    s.store_vector(0, 1, np.ones(4))
    s.store_vector(1, 2, 2 * np.ones(4))
    ids0, _, _ = s.get_posting(0)
    ids1, _, _ = s.get_posting(1)
    assert list(ids0) == [1] and list(ids1) == [2]


def test_centroid_roundtrip_and_errors(tmp_path):
    s = make_storage(tmp_path)
    s.store_vector(0, 1, np.arange(4, dtype=np.float32))
    # Centroid bootstraps from the first vector (storage.rs:106).
    np.testing.assert_allclose(s.get_posting_centroid(0), np.arange(4))
    s.update_posting_centroid(0, np.full(4, 5.0))
    np.testing.assert_allclose(s.get_posting_centroid(0), np.full(4, 5.0))
    with pytest.raises(LireStorageError):
        s.get_posting_centroid(42)
    with pytest.raises(LireStorageError):
        s.get_posting_version(42)
    with pytest.raises(LireStorageError):
        s.get_posting(42)
    with pytest.raises(LireStorageError):
        s.store_vector(0, 9, np.ones(3))  # wrong dim


def test_atomic_replace_version_guard(tmp_path):
    s = make_storage(tmp_path)
    for i in range(4):
        s.store_vector(0, i, np.full(4, i, np.float32))
    v = s.get_posting_version(0)
    ids, vecs, _ = s.get_posting(0)
    # Concurrent insert advances the version -> replace must fail.
    s.store_vector(0, 99, np.ones(4))
    assert not s.atomic_replace([0], [v], [(10, ids[:2], vecs[:2], vecs[0])])
    assert s.has_posting(0) and not s.has_posting(10)
    # With the right version it succeeds.
    v2 = s.get_posting_version(0)
    ids2, vecs2, _ = s.get_posting(0)
    assert s.atomic_replace(
        [0], [v2], [(10, ids2[:3], vecs2[:3], vecs2[0]), (11, ids2[3:], vecs2[3:], vecs2[-1])]
    )
    assert not s.has_posting(0)
    assert s.has_posting(10) and s.has_posting(11)
    got = set(s.get_posting(10)[0]) | set(s.get_posting(11)[0])
    assert got == set(int(i) for i in ids2)


def test_import_posting_bulk(tmp_path):
    s = make_storage(tmp_path)
    ids = np.arange(100, dtype=np.int64)
    vecs = np.random.default_rng(0).standard_normal((100, 4)).astype(np.float32)
    s.import_posting(5, ids, vecs, vecs[0])
    assert s.get_vector_count(5) == 100
    s2 = make_storage(tmp_path)
    got_ids, got_vecs, _ = s2.get_posting(5)
    np.testing.assert_array_equal(got_ids, ids)
    np.testing.assert_allclose(got_vecs, vecs)


def test_store_vectors_batch(tmp_path):
    s = make_storage(tmp_path)
    ids = np.arange(50, dtype=np.int64)
    vecs = np.random.default_rng(1).standard_normal((50, 4)).astype(np.float32)
    versions = s.store_vectors(3, ids, vecs)
    assert len(versions) == 50
    assert len(set(versions)) == 50
    assert s.get_vector_count(3) == 50
    # Mixed with single stores, versions stay monotonic; reload preserves all.
    v_next = s.store_vector(3, 99, np.ones(4))
    assert v_next > max(versions)
    s2 = make_storage(tmp_path)
    got_ids, got_vecs, _ = s2.get_posting(3)
    assert len(got_ids) == 51
    np.testing.assert_allclose(got_vecs[:50], vecs)


def test_centroid_matrix_cached_across_steady_state_ops(tmp_path):
    """VERDICT r2 item 6: routing snapshots are cached per TOPOLOGY
    generation — appends/tombstones to existing postings must not rebuild
    the O(C) packed matrix; posting creation/retirement and centroid moves
    must."""
    storage = LireStorage(str(tmp_path / "s"), 2)
    for pid in range(5):
        storage.store_vector(pid, pid, np.array([float(pid), 0.0]))
    cm1 = storage.centroid_matrix()
    assert list(cm1[1]) == [0, 1, 2, 3, 4]
    # Steady-state append + tombstone: same generation, same cached object.
    storage.store_vector(0, 99, np.array([0.5, 0.5]))
    storage.mark_deleted(1, 1)
    assert storage.centroid_matrix() is cm1
    # Posting creation bumps.
    storage.store_vector(77, 100, np.array([9.0, 9.0]))
    cm2 = storage.centroid_matrix()
    assert cm2 is not cm1 and cm2[0] > cm1[0] and 77 in cm2[1]
    # Centroid move bumps.
    storage.update_posting_centroid(0, np.array([5.0, 5.0]))
    cm3 = storage.centroid_matrix()
    assert cm3 is not cm2
    np.testing.assert_array_equal(
        cm3[2][list(cm3[1]).index(0)], [5.0, 5.0]
    )
    # Retirement bumps.
    storage.delete_posting(77)
    cm4 = storage.centroid_matrix()
    assert cm4 is not cm3 and 77 not in cm4[1]


def test_protocol_router_uses_cache(tmp_path):
    """The protocol's routing must not rebuild per call: repeated inserts to
    existing postings reuse one matrix and the route cache object."""
    from spfresh_tpu.lire import LireProtocol

    storage = LireStorage(str(tmp_path / "s"), 2)
    for pid in range(4):
        storage.store_vector(pid, pid, np.array([float(pid) * 10, 0.0]))
    proto = LireProtocol(storage)
    assert proto.find_nearest_partition(np.array([19.0, 0.0])) == 2
    rc = proto._route_cache
    for i in range(20):
        proto.insert(np.array([31.0, 0.0]), 1000 + i, posting_id=3)
    assert proto._route_cache is rc  # no per-insert rebuild
    nearby = proto.get_nearby_postings(0, count=2)
    assert nearby == [1, 2]
    assert proto._route_cache is rc
