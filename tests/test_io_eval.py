"""IO (fvecs/ivecs roundtrip, main.rs:10-70 parity) and eval-harness tests."""

import numpy as np
import pytest

from spfresh_tpu.eval import make_groundtruth, recall_at_k
from spfresh_tpu.io import read_fvecs, read_ivecs, write_fvecs, write_ivecs


def test_fvecs_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((13, 7)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, arr)
    out = read_fvecs(p)
    np.testing.assert_allclose(out, arr)
    assert out.dtype == np.float32


def test_ivecs_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 1000, size=(9, 10)).astype(np.int32)
    p = str(tmp_path / "gt.ivecs")
    write_ivecs(p, arr)
    out = read_ivecs(p)
    np.testing.assert_array_equal(out, arr)


def test_fvecs_rejects_garbage(tmp_path):
    p = tmp_path / "bad.fvecs"
    p.write_bytes(b"\x03\x00\x00\x00" + b"\x00" * 7)  # truncated record
    with pytest.raises(ValueError):
        read_fvecs(str(p))


def test_recall_at_k():
    res = np.array([[1, 2, 3], [4, 5, -1]])
    gt = np.array([[1, 2, 9], [4, 7, 8]])
    # q0: 2/3 hits, q1: 1/3 -> mean 0.5
    assert recall_at_k(res, gt) == pytest.approx(0.5)


def test_make_groundtruth_is_exact(rng):
    data = rng.standard_normal((50, 4)).astype(np.float32)
    q = data[:5] + 1e-4  # queries near known points
    gt = make_groundtruth(data, q, k=1)
    np.testing.assert_array_equal(gt[:, 0], np.arange(5))
