"""Top-k selection utilities (ops/topk.py)."""

import numpy as np
import jax.numpy as jnp


def test_smallest_k_ties_and_inf_rows():
    """smallest_k keeps lax.top_k's tie semantics (equal values -> lower
    index) and walks +inf rows as 0, 1, 2, ..."""
    from spfresh_tpu.ops.topk import smallest_k

    rng = np.random.default_rng(5)
    d = rng.standard_normal((64, 300)).astype(np.float32)
    d[3, :] = np.inf                       # empty row
    d[7, 10:20] = d[7, 10]                 # 10-way tie
    for k in (1, 4, 8, 13):
        v, i = smallest_k(jnp.asarray(d), k)
        v, i = np.asarray(v), np.asarray(i)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
        np.testing.assert_array_equal(i, order)
        np.testing.assert_array_equal(v, np.take_along_axis(d, order, axis=1))


def test_dense_and_chunked_paths_agree(monkeypatch):
    """centroid_topk's dense and chunked routes return identical results
    (the threshold is a perf knob, never a semantics knob)."""
    import spfresh_tpu.ops.topk as T

    rng = np.random.default_rng(9)
    qf = jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32))
    cents = jnp.asarray(rng.standard_normal((600, 24)).astype(np.float32))
    valid = jnp.asarray(np.arange(600) < 590)

    monkeypatch.setattr(T, "LARGE_C_THRESHOLD", 32_768)
    d1, i1 = T.centroid_topk(qf, cents, valid, 8, "Euclidean")
    monkeypatch.setattr(T, "LARGE_C_THRESHOLD", 256)  # chunked (600 > 256)
    d2, i2 = T.centroid_topk(qf, cents, valid, 8, "Euclidean")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
