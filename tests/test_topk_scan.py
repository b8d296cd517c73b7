"""Chunked centroid scan (large-C stage-1 probe) must be exactly equivalent
to the dense (Q, C) scan + top_k."""

import jax.numpy as jnp
import numpy as np
import pytest

from spfresh_tpu.ops.distances import pairwise_distance
from spfresh_tpu.ops.topk import chunked_centroid_topk, smallest_k


@pytest.mark.parametrize("metric", ["Euclidean", "Manhattan"])
@pytest.mark.parametrize("C,chunk", [(1000, 256), (777, 128), (64, 256)])
def test_chunked_matches_dense(rng, metric, C, chunk):
    d, Q, nprobe = 32, 9, 7
    cents = rng.standard_normal((C, d)).astype(np.float32)
    q = rng.standard_normal((Q, d)).astype(np.float32)
    valid = np.ones(C, bool)
    valid[5] = False  # an invalid row must never be selected
    dv, iv = chunked_centroid_topk(
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(valid),
        nprobe, metric, chunk=chunk,
    )
    D = pairwise_distance(jnp.asarray(q), jnp.asarray(cents), metric)
    D = jnp.where(jnp.asarray(valid)[None, :], D, jnp.inf)
    dd, di = smallest_k(D, nprobe)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dd), rtol=1e-6)
    assert not (np.asarray(iv) == 5).any()
    # Tie order may differ between the two selectors; distances fix the set.
    for r in range(Q):
        got = {(round(float(x), 4)) for x in np.asarray(dv)[r]}
        want = {(round(float(x), 4)) for x in np.asarray(dd)[r]}
        assert got == want


def test_search_kernel_uses_chunked_past_threshold(rng, monkeypatch):
    """Force the threshold low and check the full search pipeline still
    returns exact full-probe results through the chunked stage-1."""
    import spfresh_tpu.ops.topk as topk_mod

    monkeypatch.setattr(topk_mod, "LARGE_C_THRESHOLD", 4)
    from spfresh_tpu.index import Config, SpannIndex, brute_force_search

    data = rng.standard_normal((240, 16)).astype(np.float32)
    index = SpannIndex(Config())
    for c in range(12):
        ids = np.arange(c * 20, (c + 1) * 20, dtype=np.int64)
        index.add_cluster(data[ids], ids, centroid=data[ids[0]])
    q = rng.standard_normal((5, 16)).astype(np.float32)
    ids_x, _ = index.search(q, k=8, nprobe=index.num_clusters, engine="xla")
    ids_p, _ = index.search(q, k=8, nprobe=index.num_clusters, engine="pallas")
    _, gt = brute_force_search(data, q, k=8)
    for r in range(5):
        assert set(ids_x[r].tolist()) == set(gt[r].tolist())
        assert set(ids_p[r].tolist()) == set(gt[r].tolist())


@pytest.mark.parametrize("metric", ["Manhattan", "Chebyshev", "Euclidean"])
def test_brute_force_chunked_exact_all_metrics(rng, metric):
    """Past the 10k-row threshold ground truth goes through the chunked scan
    for every metric — it must equal a direct numpy computation."""
    from spfresh_tpu.index import brute_force_search

    n, d, Q, k = 12_000, 24, 7, 5
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((Q, d)).astype(np.float32)
    dists, idx = brute_force_search(corpus, q, k, metric=metric)
    diff = np.abs(corpus[None, :, :] - q[:, None, :])
    if metric == "Euclidean":
        D = (diff ** 2).sum(-1)
    elif metric == "Manhattan":
        D = diff.sum(-1)
    else:
        D = diff.max(-1)
    want = np.sort(D, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(dists, axis=1), want, rtol=1e-4, atol=1e-4)
