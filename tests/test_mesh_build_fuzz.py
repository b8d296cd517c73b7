"""Fuzz the mesh-resident subdivision driver (round 4).

Random corpora (varying cluster structure, duplicate fraction, dimensions,
metrics, split arity, and n modulo the mesh size) are fit twice — once on a
single device with the default drivers, once over the 8-device mesh with the
resident-subdivision driver forced through every big level — and the
resulting clusterings must be IDENTICAL: same cluster count, same seeds,
same depths, same member lists (the bit-equality contract of
``_subdivide_multiway_resident_mesh``).

Deeper runs: SPF_MESH_FUZZ_SEEDS=0-49 python -m pytest tests/test_mesh_build_fuzz.py
"""

import os

import numpy as np
import pytest

import spfresh_tpu.clustering.hierarchical as H
from spfresh_tpu.clustering.hierarchical import (
    ClusteringParams,
    HierarchicalClustering,
)


def _seed_range():
    spec = os.environ.get("SPF_MESH_FUZZ_SEEDS", "0-3")
    lo, _, hi = spec.partition("-")
    return list(range(int(lo), int(hi or lo) + 1))


def _mesh(n=8):
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices("cpu")[:n]), ("shard",))


def _random_corpus(rng):
    dim = int(rng.integers(4, 24))
    n = int(rng.integers(900, 2600))
    k_true = int(rng.integers(2, 9))
    centers = 3.0 * rng.standard_normal((k_true, dim)).astype(np.float32)
    noise = float(rng.uniform(0.05, 0.8))
    data = (
        centers[rng.integers(0, k_true, n)]
        + noise * rng.standard_normal((n, dim))
    ).astype(np.float32)
    # Duplicate blocks push levels into the degenerate quantile branch.
    dup_frac = float(rng.uniform(0.0, 0.5))
    ndup = int(n * dup_frac)
    if ndup > 8:
        n_src = int(rng.integers(1, 4))
        src = rng.standard_normal((n_src, dim)).astype(np.float32)
        data[-ndup:] = src[rng.integers(0, n_src, ndup)]
        data = data[rng.permutation(n)]
    return data


@pytest.mark.parametrize("seed", _seed_range())
def test_mesh_resident_fuzz_matches_single_device(monkeypatch, seed):
    rng = np.random.default_rng(77_000 + seed)
    data = _random_corpus(rng)
    params = ClusteringParams(
        metric=str(rng.choice(["Euclidean", "Manhattan", "Chebyshev"])),
        initialization_method=str(rng.choice(["Random", "KMeans++"])),
        initial_k=int(rng.integers(2, 7)),
        desired_cluster_size=int(rng.integers(20, 90)),
        max_split_ways=int(rng.choice([2, 4, 8])),
        rng_seed=int(rng.integers(0, 1_000_000)),
    )
    ref = HierarchicalClustering(params, data).fit()
    # Host-tail handoff point varies: 0 forces every big level through the
    # resident mesh kernel; larger values exercise the mid-build handoff.
    monkeypatch.setattr(
        H, "_HOST_SPLIT_MAX_P", int(rng.choice([0, 200, 800]))
    )
    monkeypatch.setenv("SPF_SUBDIV_RESIDENT", "1")
    mesh_hc = HierarchicalClustering(params, data, mesh=_mesh()).fit()
    snap = lambda hc: [
        (c.centroid_idx, c.depth, c.points.tolist()) for c in hc.clusters
    ]
    assert snap(ref) == snap(mesh_hc), (
        f"seed {seed}: mesh-resident fit diverged from single-device "
        f"(params={params})"
    )
