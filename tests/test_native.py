"""Native C++ runtime tests: build the shared library, exercise CSR mmap
reads, vecs IO, and the sync/async padded gathers against the pure-Python
implementations."""

import numpy as np
import pytest

from spfresh_tpu import native
from spfresh_tpu.index.posting_store import write_packed_postings
from spfresh_tpu.io import write_fvecs, write_ivecs

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _write_csr(tmp_path, rng):
    path = str(tmp_path / "p.csr")
    offsets = np.array([0, 3, 5, 9], np.int64)
    ids = np.arange(100, 109, dtype=np.int64)
    vecs = rng.standard_normal((9, 4)).astype(np.float32)
    write_packed_postings(path, [2, 5, 7], offsets, ids, vecs)
    return path, offsets, ids, vecs


def test_native_csr_reads(tmp_path, rng):
    path, offsets, ids, vecs = _write_csr(tmp_path, rng)
    csr = native.NativeCsr(path)
    assert csr.num_clusters == 3
    assert csr.num_points == 9
    assert csr.dim == 4
    np.testing.assert_array_equal(csr.cluster_ids(), [2, 5, 7])
    got_ids, got_vecs = csr.posting(1)
    np.testing.assert_array_equal(got_ids, ids[3:5])
    np.testing.assert_allclose(got_vecs, vecs[3:5])
    with pytest.raises(IndexError):
        csr.posting(3)
    csr.close()


def test_native_csr_posting_views_survive_reader_gc(tmp_path, rng):
    """posting() views keep the mmap alive: dropping the only reader
    reference while views are outstanding must not invalidate them."""
    import gc

    path, offsets, ids, vecs = _write_csr(tmp_path, rng)
    csr = native.NativeCsr(path)
    got_ids, got_vecs = csr.posting(2)
    del csr
    gc.collect()
    np.testing.assert_array_equal(got_ids, ids[5:9])
    np.testing.assert_allclose(got_vecs, vecs[5:9])


def test_native_csr_gather_padded(tmp_path, rng):
    path, offsets, ids, vecs = _write_csr(tmp_path, rng)
    csr = native.NativeCsr(path)
    out_vecs, out_ids, out_lens = csr.gather_padded(np.array([2, 0]), pad=8)
    assert out_vecs.shape == (2, 8, 4)
    np.testing.assert_array_equal(out_lens, [4, 3])
    np.testing.assert_allclose(out_vecs[0, :4], vecs[5:9])
    np.testing.assert_array_equal(out_ids[0, :4], ids[5:9])
    assert (out_ids[0, 4:] == -1).all()
    assert (out_vecs[1, 3:] == 0).all()
    csr.close()


def test_native_vecs_reader_matches_python(tmp_path, rng):
    arr = rng.standard_normal((23, 9)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, arr)
    out = native.read_vecs_native(p, "f")
    np.testing.assert_allclose(out, arr)
    ivec = rng.integers(0, 100, (7, 5)).astype(np.int32)
    pi = str(tmp_path / "x.ivecs")
    write_ivecs(pi, ivec)
    np.testing.assert_array_equal(native.read_vecs_native(pi, "i"), ivec)


def test_native_async_gather_matches_sync(tmp_path, rng):
    path, offsets, ids, vecs = _write_csr(tmp_path, rng)
    csr = native.NativeCsr(path)
    want = csr.gather_padded(np.array([2, 0, 1]), pad=8)
    job = csr.gather_padded_async(np.array([2, 0, 1]), pad=8)
    got = job.join()
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
    job.join()  # idempotent
    # A bad index surfaces at join time.
    bad = csr.gather_padded_async(np.array([99]), pad=8)
    with pytest.raises(IndexError):
        bad.join()
    csr.close()
