"""Pallas rerank kernel tests.

``interpret=True`` now executes the REAL kernel body (scalar-prefetched row
table, manual double-buffered DMAs) through the Pallas interpreter on the CPU
harness — not a jnp emulation — and is cross-checked against the ``_emulate``
oracle and the XLA engine."""

import numpy as np
import pytest

from spfresh_tpu.index import Config, SpannIndexBuilder, brute_force_search
from spfresh_tpu.ops.pallas.rerank import _emulate, padded_rerank_distances


def test_real_kernel_body_matches_oracle(rng):
    """The interpreted kernel (DMA pipeline and all) must agree with the
    pure-jnp oracle bit-for-bit on f32 inputs."""
    import jax.numpy as jnp

    C, pad, d, Q, nprobe = 16, 32, 128, 8, 8
    vecs = rng.standard_normal((C, pad, d)).astype(np.float32)
    q = rng.standard_normal((Q, d)).astype(np.float32)
    rows = rng.integers(0, C, size=(Q, nprobe)).astype(np.int32)
    kern = np.asarray(
        padded_rerank_distances(q, rows, vecs, "Euclidean", interpret=True)
    )
    oracle = np.asarray(
        _emulate(jnp.asarray(q), jnp.asarray(rows), jnp.asarray(vecs), "Euclidean")
    )
    np.testing.assert_array_equal(kern, oracle)


def test_padded_rerank_matches_direct(rng):
    C, pad, d = 8, 16, 128
    vecs = rng.standard_normal((C, pad, d)).astype(np.float32)
    q = rng.standard_normal((4, d)).astype(np.float32)
    rows = rng.integers(0, C, size=(4, 3)).astype(np.int32)
    out = np.asarray(padded_rerank_distances(q, rows, vecs, "Euclidean", interpret=True))
    assert out.shape == (4, 3, pad)
    for qi in range(4):
        for pi in range(3):
            expect = np.sum((vecs[rows[qi, pi]] - q[qi]) ** 2, axis=1)
            np.testing.assert_allclose(out[qi, pi], expect, rtol=1e-5, atol=1e-4)


def _sq8_fixture(rng, C=12, pad=32, d=128, Q=8, nprobe=8):
    import jax.numpy as jnp

    from spfresh_tpu.ops.pallas.rerank import quantize_centered_queries

    cents = rng.standard_normal((C, d)).astype(np.float32)
    resid = rng.standard_normal((C, pad, d)).astype(np.float32)
    scales = (np.abs(resid).max(axis=(1, 2)) / 127.0).astype(np.float32)
    codes = np.clip(
        np.rint(resid / scales[:, None, None]), -127, 127
    ).astype(np.int8)
    q = rng.standard_normal((Q, d)).astype(np.float32)
    rows = rng.integers(0, C, size=(Q, nprobe)).astype(np.int32)
    qcodes, qscale, qnorm2 = quantize_centered_queries(
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(rows)
    )
    codesT = jnp.asarray(np.ascontiguousarray(codes.transpose(0, 2, 1)))
    norms2 = jnp.asarray(
        (codes.astype(np.int64) ** 2).sum(axis=2).astype(np.int32)
    )
    return (qcodes, qscale, qnorm2, jnp.asarray(rows), codesT, norms2,
            jnp.asarray(scales), cents, resid, q, rows)


@pytest.mark.parametrize("native_int8", [False, True])
def test_int8mxu_kernel_matches_oracle(rng, native_int8):
    """The expansion-form IVF-SQ8 kernel (interpreted: real DMA rings,
    SMEM tables, MXU contraction) must agree with the jnp oracle.  The
    dots are exact in both (integer-valued, partial sums < 2^24); the
    final scalar combine may differ by 1 ulp between the two compiled
    programs (FMA contraction), so scores are checked to float tightness
    and candidate ORDER (the engine contract) exactly."""
    from spfresh_tpu.ops.pallas.rerank import (
        int8mxu_rerank_oracle,
        padded_rerank_distances_int8mxu,
    )

    (qcodes, qscale, qnorm2, rows, codesT, norms2, scales,
     _c, _r, _q, _rows_np) = _sq8_fixture(rng)
    kern = np.asarray(
        padded_rerank_distances_int8mxu(
            qcodes, qscale, qnorm2, rows, codesT, norms2, scales,
            interpret=True, native_int8=native_int8,
        )
    )
    oracle = np.asarray(
        int8mxu_rerank_oracle(
            qcodes, qscale, qnorm2, rows, codesT, norms2, scales
        )
    )
    np.testing.assert_allclose(kern, oracle, rtol=3e-7, atol=1e-3)
    np.testing.assert_array_equal(
        np.argsort(kern, axis=-1, kind="stable"),
        np.argsort(oracle, axis=-1, kind="stable"),
    )


def test_int8mxu_score_tracks_true_distance(rng):
    """Double-quantized scores approximate |x - q|^2 with error bounded by
    the two quantization steps — top-1 per probed slab must match the
    exact f32 distance's top-1 on well-separated data."""
    from spfresh_tpu.ops.pallas.rerank import int8mxu_rerank_oracle

    (qcodes, qscale, qnorm2, rows, codesT, norms2, scales,
     cents, resid, q, rows_np) = _sq8_fixture(rng, pad=16, Q=6, nprobe=4)
    approx = np.asarray(
        int8mxu_rerank_oracle(
            qcodes, qscale, qnorm2, rows, codesT, norms2, scales
        )
    )
    X = cents[:, None, :] + resid  # (C, pad, d) true vectors
    for qi in range(6):
        for pi in range(4):
            exact = np.sum((X[rows_np[qi, pi]] - q[qi]) ** 2, axis=1)
            # relative error of the quantized score stays small
            rel = np.abs(approx[qi, pi] - exact) / np.maximum(exact, 1e-6)
            assert rel.max() < 0.05, rel.max()
            assert int(np.argmin(approx[qi, pi])) == int(np.argmin(exact))


@pytest.mark.parametrize("metric", ["Manhattan", "Chebyshev"])
def test_padded_rerank_other_metrics(rng, metric):
    C, pad, d = 4, 16, 128
    vecs = rng.standard_normal((C, pad, d)).astype(np.float32)
    q = rng.standard_normal((2, d)).astype(np.float32)
    rows = rng.integers(0, C, size=(2, 2)).astype(np.int32)
    out = np.asarray(padded_rerank_distances(q, rows, vecs, metric, interpret=True))
    for qi in range(2):
        for pi in range(2):
            diff = np.abs(vecs[rows[qi, pi]] - q[qi])
            expect = diff.sum(1) if metric == "Manhattan" else diff.max(1)
            np.testing.assert_allclose(out[qi, pi], expect, rtol=1e-5, atol=1e-5)


def test_pallas_engine_matches_xla_engine(tmp_path, rng):
    data = rng.standard_normal((300, 24)).astype(np.float32)
    cfg = Config.from_dict(
        {
            "clustering_params": {
                "initial_k": 4,
                "desired_cluster_size": 40,
                "rng_seed": 42,
            },
            "output_path": str(tmp_path / "idx"),
        }
    )
    index = SpannIndexBuilder(cfg).with_data(data).build(save=False)
    queries = rng.standard_normal((6, 24)).astype(np.float32)
    for nprobe in (2, index.num_clusters):
        ids_x, d_x = index.search(queries, k=8, nprobe=nprobe, engine="xla")
        ids_p, d_p = index.search(queries, k=8, nprobe=nprobe, engine="pallas")
        np.testing.assert_array_equal(ids_x, ids_p)
        np.testing.assert_allclose(d_x, d_p, rtol=1e-5, atol=1e-5)
    # Full probe via pallas is exact too.
    ids_p, _ = index.search(queries, k=8, nprobe=index.num_clusters, engine="pallas")
    _, gt = brute_force_search(data, queries, k=8)
    rec = np.mean([len(set(ids_p[q]) & set(gt[q])) / 8 for q in range(6)])
    assert rec == 1.0


def test_pallas_engine_with_pruning(tmp_path, rng):
    data = rng.standard_normal((200, 16)).astype(np.float32)
    cfg = Config.from_dict(
        {
            "clustering_params": {"initial_k": 3, "desired_cluster_size": 40, "rng_seed": 1},
            "output_path": str(tmp_path / "idx"),
        }
    )
    index = SpannIndexBuilder(cfg).with_data(data).build(save=False)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    ids_x, d_x = index.search(q, k=5, nprobe=3, prune_factor=1.2, engine="xla")
    ids_p, d_p = index.search(q, k=5, nprobe=3, prune_factor=1.2, engine="pallas")
    np.testing.assert_array_equal(ids_x, ids_p)
