"""Top-k selection utilities (ops/topk.py)."""

import numpy as np
import jax.numpy as jnp


def test_smallest_k_rounds_identical_to_top_k():
    """The rounds variant must be bit-identical to smallest_k, including tie
    resolution (equal values -> lower index) and all-inf rows."""
    from spfresh_tpu.ops.topk import smallest_k, smallest_k_rounds

    rng = np.random.default_rng(5)
    d = rng.standard_normal((64, 300)).astype(np.float32)
    d[3, :] = np.inf                       # empty row
    d[7, 10:20] = d[7, 10]                 # 10-way tie
    d[11] = np.round(d[11], 1)             # tie-heavy row
    for k in (1, 4, 8, 13):
        v1, i1 = smallest_k(jnp.asarray(d), k)
        v2, i2 = smallest_k_rounds(jnp.asarray(d), k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_probe_engine_flag_parity(monkeypatch):
    """SPF_TOPK_ENGINE=rounds routes stage-1 selection through
    smallest_k_rounds with identical results on BOTH centroid_topk paths
    (dense and chunked — engine is a static jit key, so the in-process flip
    retraces the chunked kernel)."""
    import spfresh_tpu.ops.topk as T

    rng = np.random.default_rng(9)
    qf = jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32))
    cents = jnp.asarray(rng.standard_normal((600, 24)).astype(np.float32))
    valid = jnp.asarray(np.arange(600) < 590)

    def both(nprobe, threshold):
        monkeypatch.setattr(T, "LARGE_C_THRESHOLD", threshold)
        monkeypatch.delenv("SPF_TOPK_ENGINE", raising=False)
        d1, i1 = T.centroid_topk(qf, cents, valid, nprobe, "Euclidean")
        monkeypatch.setenv("SPF_TOPK_ENGINE", "rounds")
        d2, i2 = T.centroid_topk(qf, cents, valid, nprobe, "Euclidean")
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    both(nprobe=8, threshold=32_768)  # dense path
    both(nprobe=8, threshold=256)     # chunked path (600 > 256)
