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
def smallest_k_unique(dists: jnp.ndarray, ids: jnp.ndarray, k: int, oversample: int = 4):
    """k smallest entries with distinct ``ids`` per row.

    dists: (..., n) f32, ids: (..., n) int.  Duplicate ids (replicated points
    appearing in several probed posting lists) are masked to +inf after the
    first occurrence inside an oversampled top-(k*oversample) prefilter, then
    re-selected down to k.  Exact as long as a row has < k*oversample
    duplicates among its top candidates, which holds in practice because a
    point is replicated into at most a handful of lists.

    Returns (values (..., k), ids (..., k)).
    """
    kk = min(k * oversample, dists.shape[-1])
    vals, idx = jax.lax.top_k(-dists, kk)
    vals = -vals
    cand_ids = jnp.take_along_axis(ids, idx, axis=-1)
    # Mark entries whose id equals an earlier (better-ranked) entry's id.
    same = cand_ids[..., :, None] == cand_ids[..., None, :]  # (..., kk, kk)
    earlier = jnp.tril(jnp.ones((kk, kk), dtype=bool), k=-1)
    dup = jnp.any(same & earlier, axis=-1)
    vals = jnp.where(dup, jnp.inf, vals)
    out_vals, out_idx = jax.lax.top_k(-vals, min(k, kk))
    out_ids = jnp.take_along_axis(cand_ids, out_idx, axis=-1)
    return -out_vals, out_ids
