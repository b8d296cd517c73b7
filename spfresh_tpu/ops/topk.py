"""Top-k utilities for nearest-neighbor selection.

The reference sorts a host Vec of candidates and truncates
(/root/reference/src/spann/spann_index.rs:188-193).  On TPU, selection is
``jax.lax.top_k`` over negated distances — O(n log k) on-device, batched over
queries — plus a duplicate-suppression pass needed because SPANN's boundary
closure replicates points into multiple posting lists (the reference
deduplicates implicitly only through its pruning quirks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def smallest_k(dists: jnp.ndarray, k: int):
    """Per-row k smallest values of ``dists`` (..., n) -> (values, indices)."""
    neg, idx = jax.lax.top_k(-dists, k)
    return -neg, idx


@functools.partial(jax.jit, static_argnames=("k",))
def smallest_k_unique(dists: jnp.ndarray, ids: jnp.ndarray, k: int):
    """k smallest entries with distinct ``ids`` per row — exact.

    dists: (..., n) f32, ids: (..., n) int.  Replicated points appear in
    several probed posting lists with *identical* distances, so deduplication
    is exact: sort candidates by id, mask every entry equal to its
    predecessor to +inf, then top-k.  O(n log n) per row, fully batched.

    Returns (values (..., k), ids (..., k)); k must be <= n.
    """
    if k > dists.shape[-1]:
        raise ValueError(f"k={k} exceeds candidate count {dists.shape[-1]}")
    # Lexicographic sort by (id, dist): stable id-sort of a dist-sorted array
    # keeps entries dist-ascending within each id group, so keep-first keeps
    # the minimum-distance copy (a replica can coexist with a masked-to-inf
    # padding read of the same id — the finite copy must win).
    order1 = jnp.argsort(dists, axis=-1)
    ids1 = jnp.take_along_axis(ids, order1, axis=-1)
    d1 = jnp.take_along_axis(dists, order1, axis=-1)
    order = jnp.argsort(ids1, axis=-1, stable=True)
    sid = jnp.take_along_axis(ids1, order, axis=-1)
    sd = jnp.take_along_axis(d1, order, axis=-1)
    prev = jnp.concatenate(
        [jnp.full_like(sid[..., :1], jnp.iinfo(sid.dtype).min), sid[..., :-1]],
        axis=-1,
    )
    sd = jnp.where(sid == prev, jnp.inf, sd)
    out_vals, out_idx = jax.lax.top_k(-sd, k)
    out_ids = jnp.take_along_axis(sid, out_idx, axis=-1)
    return -out_vals, out_ids
