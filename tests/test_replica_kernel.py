"""Pallas closure-replica kernel (ops/pallas/replica.py) vs the XLA oracle.

The kernel is the TPU default for the Euclidean replica pass (both the
in-core `_finalize_replication` and the out-of-core `_stream_replicas`); the
XLA fused pass stays the oracle and the route for L1/Linf.  CI runs the real
kernel body through interpret mode, like the other Pallas kernels here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spfresh_tpu.clustering.hierarchical import (
    _final_replica_pass,
    _use_pallas_replica,
)
from spfresh_tpu.ops.pallas.replica import pallas_replica_topk


def _case(seed, n, C, d, dtype):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d)).astype(np.float32)
    cents = X[rng.integers(0, n, C)] + 0.1 * rng.standard_normal(
        (C, d)
    ).astype(np.float32)
    base = rng.integers(0, C, n).astype(np.int32)
    if dtype == "bfloat16":
        import ml_dtypes

        X = X.astype(ml_dtypes.bfloat16)
        cents = cents.astype(ml_dtypes.bfloat16)
    return jnp.asarray(X), jnp.asarray(base), jnp.asarray(cents)


@pytest.mark.parametrize(
    "n,C,d,ne,dtype",
    [
        (500, 37, 19, 3, "float32"),      # nothing aligned to BR/CT/128
        (300, 130, 64, 7, "float32"),
        (700, 600, 33, 1, "float32"),     # C spans >1 centroid chunk
        (256, 512, 128, 8, "float32"),    # exactly one block each
        (400, 50, 128, 3, "bfloat16"),
        (513, 700, 96, 4, "bfloat16"),
        (300, 200, 960, 4, "bfloat16"),   # GIST dims: d_pad spans 8 lanes of 128
    ],
)
def test_matches_xla_oracle(n, C, d, ne, dtype):
    X, base, cents = _case(42, n, C, d, dtype)
    bt = 1.3
    oi, od = _final_replica_pass(
        X, base, cents, "Euclidean", jnp.float32(bt), ne
    )
    ki, kd = pallas_replica_topk(X, base, cents, bt, ne, interpret=True)
    oi, od, ki, kd = map(np.asarray, (oi, od, ki, kd))
    fin = np.isfinite(od)
    assert np.array_equal(fin, np.isfinite(kd))
    # Summation-tree differences (padded-width dots) allow rounding-grade
    # distance deviation; ids may legitimately swap only on such near-ties.
    idx_eq = oi[fin] == ki[fin]
    if not idx_eq.all():
        assert np.allclose(od[fin][~idx_eq], kd[fin][~idx_eq], rtol=1e-4)
        assert idx_eq.mean() > 0.999
    np.testing.assert_allclose(od[fin], kd[fin], rtol=3e-4, atol=1e-5)


def test_db_contract_matches_internal_db():
    """A caller-supplied dist(p, c_base) computed with the same expansion
    must reproduce the internal-db route exactly (the out-of-core caller's
    contract)."""
    X, base, cents = _case(7, 400, 64, 48, "float32")
    bt = 1.25
    cf = X.astype(jnp.float32)
    cb = cents.astype(jnp.float32)[base]
    db = jnp.maximum(
        jnp.sum(cf * cf, axis=1)
        + jnp.sum(cb * cb, axis=1)
        - 2.0
        * jax.lax.dot_general(
            X, cents[base],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ),
        0.0,
    )
    i1, d1 = pallas_replica_topk(X, base, cents, bt, 3, interpret=True)
    i2, d2 = pallas_replica_topk(
        X, base, cents, bt, 3, db=db, interpret=True
    )
    fin = np.isfinite(np.asarray(d1))
    assert np.array_equal(fin, np.isfinite(np.asarray(d2)))
    assert np.array_equal(np.asarray(i1)[fin], np.asarray(i2)[fin])
    np.testing.assert_allclose(
        np.asarray(d1)[fin], np.asarray(d2)[fin], rtol=1e-6
    )


@pytest.mark.parametrize("lam", [0.5, 1.5])
def test_soar_matches_xla_oracle(lam):
    """SOAR ranking parity: the kernel and the XLA oracle agree on the
    selected replicas and scores for lambda > 0; lambda = 0 degenerates to
    the plain path bit-for-bit."""
    X, base, cents = _case(21, 450, 80, 32, "float32")
    bt = 1.4
    oi, od = _final_replica_pass(
        X, base, cents, "Euclidean", jnp.float32(bt), 3, soar_lambda=lam
    )
    ki, kd = pallas_replica_topk(
        X, base, cents, bt, 3, soar_lambda=lam, interpret=True
    )
    oi, od, ki, kd = map(np.asarray, (oi, od, ki, kd))
    fin = np.isfinite(od)
    assert np.array_equal(fin, np.isfinite(kd))
    idx_eq = oi[fin] == ki[fin]
    if not idx_eq.all():
        assert np.allclose(od[fin][~idx_eq], kd[fin][~idx_eq], rtol=1e-4)
        assert idx_eq.mean() > 0.999
    np.testing.assert_allclose(od[fin], kd[fin], rtol=3e-4, atol=1e-5)
    # lambda = 0 == plain path, exactly.
    i0, d0 = pallas_replica_topk(X, base, cents, bt, 3, interpret=True)
    iz, dz = pallas_replica_topk(
        X, base, cents, bt, 3, soar_lambda=0.0, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(iz))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(dz))


def test_soar_prefers_orthogonal_residual():
    """Two admitted candidates at EQUAL distance: plain ranking ties to the
    lower id; SOAR must pick the one whose residual is orthogonal to the
    primary residual regardless of id order."""
    d = 8
    x = np.zeros((1, d), np.float32)
    cents = np.zeros((3, d), np.float32)
    cents[0, 0] = 1.0                     # base: r1 = -e0, db = 1
    cents[1, 0] = -2.0                    # collinear candidate (id 1): D = 4
    cents[2, 1] = 2.0                     # orthogonal candidate (id 2): D = 4
    base = np.zeros(1, np.int32)
    kw = dict(interpret=True)
    # bt admits both (D=4 < 10*1); closure holds: cc = 9 and 5, both >= 4.
    i_plain, _ = pallas_replica_topk(
        jnp.asarray(x), jnp.asarray(base), jnp.asarray(cents), 10.0, 1, **kw
    )
    i_soar, _ = pallas_replica_topk(
        jnp.asarray(x), jnp.asarray(base), jnp.asarray(cents), 10.0, 1,
        soar_lambda=1.0, **kw
    )
    assert int(np.asarray(i_plain)[0, 0]) == 1   # tie -> lower id
    assert int(np.asarray(i_soar)[0, 0]) == 2    # orthogonality wins


def test_duplicate_heavy_invariants():
    """Ties everywhere (8 distinct rows repeated): the kernel must stay a
    valid closure pass — ascending distances, no duplicate ids per row,
    never the base id, eligibility holds in f64 up to f32 tie tolerance."""
    rng = np.random.default_rng(3)
    protos = rng.standard_normal((8, 24)).astype(np.float32)
    X = protos[rng.integers(0, 8, 320)]
    cents = protos[rng.integers(0, 8, 40)] * 1.01
    base = rng.integers(0, 40, 320).astype(np.int32)
    bt = 1.5
    ki, kd = pallas_replica_topk(
        jnp.asarray(X), jnp.asarray(base), jnp.asarray(cents), bt, 4,
        interpret=True,
    )
    ki, kd = np.asarray(ki), np.asarray(kd)
    fin = np.isfinite(kd)
    # Ascending, finite-prefix rows.
    with np.errstate(invalid="ignore"):
        assert np.all(np.diff(kd, axis=1)[fin[:, 1:]] >= 0)
    assert np.all(fin[:, :-1] | ~fin[:, 1:])  # inf only as a suffix
    Xd, Cd = X.astype(np.float64), np.asarray(cents, np.float64)
    for r in np.nonzero(fin.any(axis=1))[0][:64]:
        ids = ki[r][fin[r]]
        assert len(set(ids.tolist())) == len(ids)
        assert base[r] not in ids
        db = ((Xd[r] - Cd[base[r]]) ** 2).sum()
        for j, dv in zip(ids, kd[r][fin[r]]):
            dj = ((Xd[r] - Cd[j]) ** 2).sum()
            cc = ((Cd[base[r]] - Cd[j]) ** 2).sum()
            assert dj < bt * db * (1 + 1e-4)
            assert cc >= dj * (1 - 1e-4)
            assert abs(dj - dv) <= 1e-3 * max(1.0, dj)


@pytest.mark.parametrize(
    "n,C,d,dtype",
    [(500, 37, 19, "float32"), (300, 1100, 64, "float32"),
     (700, 90, 48, "bfloat16")],
)
def test_nearest_centroid_matches_oc_tile(n, C, d, dtype):
    """The streaming-argmin kernel vs the out-of-core base-assign oracle
    (`_oc_base_tile`): same nearest ids (ties to lowest id), same distances
    up to summation-tree rounding."""
    from spfresh_tpu.clustering.outofcore import _oc_base_tile, _pad_cents
    from spfresh_tpu.ops.pallas.replica import pallas_nearest_centroid

    X, _, cents = _case(9, n, C, d, dtype)
    Xf = X.astype(jnp.float32)
    cents_p, chunk = _pad_cents(np.asarray(cents, np.float32), 512)
    ob, od = _oc_base_tile(
        Xf, jnp.asarray(cents_p), "Euclidean", chunk, C
    )
    kb, kd = pallas_nearest_centroid(Xf, cents.astype(jnp.float32),
                                     interpret=True)
    ob, od, kb, kd = map(np.asarray, (ob, od, kb, kd))
    idx_eq = ob == kb
    if not idx_eq.all():  # only near-tie rounding may swap winners
        assert np.allclose(od[~idx_eq], kd[~idx_eq], rtol=1e-4)
        assert idx_eq.mean() > 0.999
    np.testing.assert_allclose(od, kd, rtol=3e-4, atol=1e-5)


def test_engine_selection(monkeypatch):
    monkeypatch.delenv("SPF_REPLICA_ENGINE", raising=False)
    on_tpu = jax.devices()[0].platform == "tpu"
    assert _use_pallas_replica("Euclidean", 3) == on_tpu
    assert not _use_pallas_replica("Manhattan", 3)
    assert not _use_pallas_replica("Euclidean", 9)
    monkeypatch.setenv("SPF_REPLICA_ENGINE", "pallas")
    assert _use_pallas_replica("Euclidean", 3)
    monkeypatch.setenv("SPF_REPLICA_ENGINE", "xla")
    assert not _use_pallas_replica("Euclidean", 3)


def test_compile_failure_falls_back_to_xla(monkeypatch, tmp_path):
    """A Mosaic compile failure on the real device must not crash the build:
    the call site records it and reroutes to the XLA pass."""
    import spfresh_tpu.ops.pallas.replica as rk

    monkeypatch.setenv("SPF_REPLICA_ENGINE", "pallas")
    monkeypatch.setattr(rk, "_UNAVAILABLE", False)

    def boom(*a, **k):
        raise RuntimeError("Mosaic says no")

    monkeypatch.setattr(rk, "pallas_replica_topk", boom)
    from spfresh_tpu.index.builder import SpannIndexBuilder
    from spfresh_tpu.index.config import Config

    rng = np.random.default_rng(13)
    data = rng.standard_normal((600, 16)).astype(np.float32)
    cfg = Config.from_dict(
        {
            "output_path": str(tmp_path / "idx"),
            "clustering_params": {"desired_cluster_size": 50, "rng_seed": 2},
        }
    )
    idx = SpannIndexBuilder(cfg).with_data(data).build(save=False)
    assert not rk.available()  # failure recorded -> future calls skip pallas
    ids, _ = idx.search(data[:8], 5, nprobe=idx.num_clusters, engine="xla")
    assert np.all(np.asarray(ids)[:, 0] == np.arange(8))
    monkeypatch.setattr(rk, "_UNAVAILABLE", False)


def test_build_with_pallas_replica_pass(monkeypatch, tmp_path):
    """End-to-end: a build routed through the kernel (interpret mode on CPU)
    yields a valid index — full-probe recall exactly 1.0, dedup invariant."""
    monkeypatch.setenv("SPF_REPLICA_ENGINE", "pallas")
    from spfresh_tpu.index.builder import SpannIndexBuilder
    from spfresh_tpu.index.config import Config

    rng = np.random.default_rng(11)
    data = rng.standard_normal((800, 24)).astype(np.float32)
    cfg = Config.from_dict(
        {
            "output_path": str(tmp_path / "idx"),
            "clustering_params": {"desired_cluster_size": 40, "rng_seed": 5},
        }
    )
    idx = SpannIndexBuilder(cfg).with_data(data).build(save=False)
    q = data[:32]
    ids, dists = idx.search(q, 10, nprobe=idx.num_clusters, engine="xla")
    ids = np.asarray(ids)
    assert np.all(ids[:, 0] == np.arange(32))
    assert np.allclose(np.asarray(dists)[:, 0], 0.0, atol=1e-5)
    for row in ids:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)


def test_row_tiled_matches_untiled():
    """Row tiling is exact (per-point independence): forcing multiple tiles
    including a ragged last one must be bit-identical to the one-shot call.
    The tiling exists because the impl stages ~4 (rows, d_pad) arrays —
    whole-corpus at 1M x 960-d f32 would OOM a 16 GB chip."""
    X, base, cents = _case(7, 900, 130, 48, "float32")
    i0, d0 = pallas_replica_topk(X, base, cents, 1.3, 3, interpret=True)
    # row_tile=256 -> tiles of 256/256/256/132 (ragged tail).
    i1, d1 = pallas_replica_topk(
        X, base, cents, 1.3, 3, interpret=True, row_tile=256
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    # The db-supplied contract tiles db alongside the rows.
    db = np.asarray(
        ((np.asarray(X) - np.asarray(cents)[np.asarray(base)]) ** 2).sum(1),
        np.float32,
    )
    i2, d2 = pallas_replica_topk(
        X, base, cents, 1.3, 3, db=jnp.asarray(db), interpret=True,
        row_tile=256,
    )
    i3, d3 = pallas_replica_topk(
        X, base, cents, 1.3, 3, db=jnp.asarray(db), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d3))


def test_compile_once_across_cluster_counts():
    """Builds with different (C, n) must reuse one compiled executable per
    (d, bucket): C enters via FAR-sentinel bucket padding (no static capture)
    and ragged row counts pad to a uniform row_tile.  The r4 phase profile
    paid a fresh ~5-7 s Mosaic compile per build because both were exact."""
    from spfresh_tpu.ops.pallas.replica import (
        _bucket_cpad,
        _nearest_centroid_impl,
        _replica_topk_impl,
    )

    assert _bucket_cpad(600) == _bucket_cpad(700) == 1024

    X1, b1, c1 = _case(1, 500, 600, 32, "float32")
    X2, b2, c2 = _case(2, 420, 700, 32, "float32")
    r0 = _replica_topk_impl._cache_size()
    a0 = _nearest_centroid_impl._cache_size()
    i1, d1 = pallas_replica_topk(X1, b1, c1, 1.2, 2, interpret=True,
                                 row_tile=512)
    i2, d2 = pallas_replica_topk(X2, b2, c2, 1.2, 2, interpret=True,
                                 row_tile=512)
    assert _replica_topk_impl._cache_size() == r0 + 1  # one shape for both
    from spfresh_tpu.ops.pallas.replica import pallas_nearest_centroid

    pallas_nearest_centroid(X1, c1, interpret=True)
    pallas_nearest_centroid(X1, c2, interpret=True)
    assert _nearest_centroid_impl._cache_size() == a0 + 1
    # And the bucketed results stay oracle-grade (same tolerance contract
    # as test_matches_xla_oracle: padded-width dots allow rounding-level
    # distance deviation, id swaps only on such near-ties).
    for (X, b, c, ki, kd) in ((X1, b1, c1, i1, d1), (X2, b2, c2, i2, d2)):
        oi, od = _final_replica_pass(
            X, b, c, "Euclidean", jnp.float32(1.2), 2
        )
        oi, od, ki, kd = map(np.asarray, (oi, od, ki, kd))
        fin = np.isfinite(od)
        assert np.array_equal(fin, np.isfinite(kd))
        idx_eq = oi[fin] == ki[fin]
        if not idx_eq.all():
            assert np.allclose(od[fin][~idx_eq], kd[fin][~idx_eq], rtol=1e-4)
            assert idx_eq.mean() > 0.999
        np.testing.assert_allclose(od[fin], kd[fin], rtol=3e-4, atol=1e-5)


def test_unfused_elementwise_route_matches_fused():
    """The L1/Linf closure pass runs UNFUSED on device (separate pairwise +
    selection dispatches — the fused program hangs the backend at GIST
    shapes, l1_probe.py); the unfused route must equal the fused oracle."""
    from spfresh_tpu.clustering.hierarchical import (
        _final_replica_pass_fused,
        _replica_select_from_dists,
    )
    from spfresh_tpu.ops.distances import pairwise_distance

    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((700, 48)).astype(np.float32))
    cents = jnp.asarray(rng.standard_normal((90, 48)).astype(np.float32))
    base = jnp.asarray(rng.integers(0, 90, 700).astype(np.int32))
    for metric in ("Manhattan", "Chebyshev"):
        fi, fd = _final_replica_pass_fused(
            X, base, cents, metric, jnp.float32(1.15), 3, 256, 3
        )
        D = pairwise_distance(X, cents, metric)
        CC = pairwise_distance(jnp.take(cents, base, axis=0), cents, metric)
        ui, ud = _replica_select_from_dists(D, CC, base, jnp.float32(1.15), 3)
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(ui))
        np.testing.assert_array_equal(np.asarray(fd), np.asarray(ud))


def test_bf16_wire_build_engines_identical(monkeypatch, tmp_path):
    """With a bf16 corpus wire (the bench default for non-f32 storage) the
    replica pass feeds value-lossless bf16 inputs to whichever engine runs —
    the pallas kernel and the XLA oracle must still produce the SAME index
    (identical posting membership per cluster), and determinism must hold."""
    from spfresh_tpu.index.builder import SpannIndexBuilder
    from spfresh_tpu.index.config import Config

    rng = np.random.default_rng(23)
    data = rng.standard_normal((900, 24)).astype(np.float32)

    def build(engine):
        monkeypatch.setenv("SPF_REPLICA_ENGINE", engine)
        cfg = Config.from_dict(
            {
                "output_path": str(tmp_path / f"idx_{engine}"),
                "storage_dtype": "bfloat16",  # => wire_dtype bfloat16
                "clustering_params": {"desired_cluster_size": 40, "rng_seed": 5},
            }
        )
        return SpannIndexBuilder(cfg).with_data(data).build(save=False)

    a = build("pallas")
    b = build("xla")
    assert a.num_clusters == b.num_clusters
    assert sorted(a.postings) == sorted(b.postings)
    for cid in a.postings:
        assert np.array_equal(
            np.sort(a.postings[cid][0]), np.sort(b.postings[cid][0])
        ), cid
