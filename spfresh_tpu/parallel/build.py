"""Multi-chip index build: the subdivision hot loop over a device mesh.

The reference parallelizes its build hot loops with rayon threads
(/root/reference/src/clustering/hierarchical.rs:144,261,302).  The TPU-native
equivalent shards the flat member list of each subdivision level across the
mesh: every chip scores its slice of the points against the (replicated)
seed vectors, and the cross-shard reductions — farthest-point seed selection,
membership counts — meet in ``pmax``/``pmin``/``psum`` collectives over ICI.

Semantics are IDENTICAL to the single-device
``hierarchical._split_level_multiway`` (same seeds, same assignment, same
tie-breaks), which the tests verify on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spfresh_tpu.ops.distances import rowwise_distance


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "metric", "num_segments", "m_ways")
)
def _sharded_split_call(
    X, point_list, cluster_of, valid, c1_idx, seed_valid,
    *, mesh, axis, metric, num_segments, m_ways,
):
    S = num_segments
    M = m_ways
    nshards = mesh.devices.size

    def step(X_rep, pl_local, co_local, valid_local, c1, sv):
        P_local = pl_local.shape[0]
        total = P_local * nshards
        pos0 = jax.lax.axis_index(axis) * P_local
        pos = pos0 + jnp.arange(P_local, dtype=jnp.int32)
        pts = X_rep[pl_local]
        seeds = jnp.zeros((S, M), jnp.int32).at[:, 0].set(c1.astype(jnp.int32))
        d_min = rowwise_distance(pts, X_rep[c1][co_local], metric)
        d1 = d_min
        best_j = jnp.zeros(P_local, jnp.int32)
        taken = pl_local == c1[co_local]

        for j in range(1, M):
            ok = sv[:, j]
            d_masked = jnp.where(
                valid_local & ~taken & ok[co_local], d_min, -jnp.inf
            )
            loc_max = jax.ops.segment_max(d_masked, co_local, num_segments=S)
            glob_max = jax.lax.pmax(loc_max, axis)
            at_max = (
                (d_masked == glob_max[co_local])
                & valid_local & ~taken & ok[co_local]
            )
            loc_pos = jax.ops.segment_min(
                jnp.where(at_max, pos, total), co_local, num_segments=S
            )
            glob_pos = jax.lax.pmin(loc_pos, axis)  # first point at the max
            found = glob_pos < total
            in_shard = (glob_pos >= pos0) & (glob_pos < pos0 + P_local)
            local_idx = jnp.clip(glob_pos - pos0, 0, P_local - 1)
            contrib = jnp.where(
                in_shard & found, pl_local[local_idx].astype(jnp.int32), 0
            )
            seed_j = jax.lax.psum(contrib, axis)  # exactly one shard owns it
            seed_j = jnp.where(found, seed_j, seeds[:, 0])
            seeds = seeds.at[:, j].set(seed_j)
            use = ok & found
            d_new = rowwise_distance(pts, X_rep[seed_j][co_local], metric)
            upd = use[co_local] & (d_new < d_min)
            best_j = jnp.where(upd, j, best_j)
            d_min = jnp.where(upd, d_new, d_min)
            taken = taken | ((pos == glob_pos[co_local]) & use[co_local])

        counts = jax.lax.psum(
            jax.ops.segment_sum(
                valid_local.astype(jnp.int32),
                co_local * M + best_j,
                num_segments=S * M,
            ),
            axis,
        ).reshape(S, M)
        return best_j, seeds, counts, d1

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(), P(), P(axis)),
        check_vma=False,
    )(X, point_list, cluster_of, valid, c1_idx, seed_valid)


def sharded_split_level(
    mesh: Mesh,
    X_rep: jax.Array,
    point_list: np.ndarray,
    cluster_of: np.ndarray,
    valid: np.ndarray,
    c1_idx: np.ndarray,
    seed_valid: np.ndarray,
    metric: str,
    num_segments: int,
    m_ways: int,
    axis: Optional[str] = None,
):
    """Mesh-sharded drop-in for ``_split_level_multiway``: shards the padded
    member arrays over the mesh (host staging only — never the default
    backend) and returns the same (assign, seeds, counts, d1)."""
    axis = axis or mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    point_list = np.asarray(point_list, np.int32)
    cluster_of = np.asarray(cluster_of, np.int32)
    valid = np.asarray(valid, bool)
    n = point_list.shape[0]
    # Pad the member axis to a mesh multiple (callers pad to pow2, which a
    # non-pow2 mesh does not divide).  Padding rows carry valid=False, so
    # they join no segment sum and win no seed; outputs slice back to n.
    S = mesh.devices.size
    n_pad = ((n + S - 1) // S) * S
    if n_pad != n:
        point_list = np.concatenate([point_list, np.repeat(point_list[:1], n_pad - n)])
        cluster_of = np.concatenate([cluster_of, np.repeat(cluster_of[:1], n_pad - n)])
        valid = np.concatenate([valid, np.zeros(n_pad - n, bool)])
    assign, seeds, counts, d1 = _sharded_split_call(
        X_rep,
        jax.device_put(point_list, shard),
        jax.device_put(cluster_of, shard),
        jax.device_put(valid, shard),
        jax.device_put(np.asarray(c1_idx, np.int32), rep),
        jax.device_put(np.asarray(seed_valid, bool), rep),
        mesh=mesh,
        axis=axis,
        metric=metric,
        num_segments=num_segments,
        m_ways=m_ways,
    )
    if n_pad != n:
        assign, d1 = assign[:n], d1[:n]
    return assign, seeds, counts, d1
