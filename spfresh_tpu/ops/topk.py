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


@functools.partial(jax.jit, static_argnames=("k", "max_dup"))
def smallest_k_unique(dists: jnp.ndarray, ids: jnp.ndarray, k: int, max_dup: int = 8):
    """k smallest entries with distinct ``ids`` per row — exact given a
    duplication bound.

    dists: (..., n) f32, ids: (..., n) int.  ``max_dup`` is an upper bound on
    how many times one id can appear in a row (SPANN replication is capped at
    ``max_replicas`` postings per point, so the bound is structural).  An
    oversampled ``top_k(k * max_dup)`` prefilter is guaranteed to contain k
    distinct ids; duplicates inside the small prefilter are masked with an
    O(k'^2) comparison — orders of magnitude cheaper than the full
    sort-by-id dedup it replaces (measured 47 ms -> ~1 ms at n=4480, Q=200).

    Duplicate copies of an id carry identical distances (same vector, same
    query), so keeping the best-ranked copy is exact.  Entries masked to +inf
    by callers may share ids with finite copies; ranking puts the finite copy
    first, so it survives.

    Returns (values (..., k), ids (..., k)); k must be <= n.
    """
    n = dists.shape[-1]
    if k > n:
        # Fewer candidates than requested: pad with inf/-1 so callers get a
        # full-width result with -1 marking the empty slots.
        pad = k - n
        dists = jnp.concatenate(
            [dists, jnp.full((*dists.shape[:-1], pad), jnp.inf, dists.dtype)], axis=-1
        )
        ids = jnp.concatenate(
            [ids, jnp.full((*ids.shape[:-1], pad), -1, ids.dtype)], axis=-1
        )
        n = k
    kk = min(max(k * max(1, max_dup), k), n)
    neg, idx = jax.lax.top_k(-dists, kk)
    cand_ids = jnp.take_along_axis(ids, idx, axis=-1)
    if max_dup > 1:
        same = cand_ids[..., :, None] == cand_ids[..., None, :]  # (..., kk, kk)
        earlier = jnp.tril(jnp.ones((kk, kk), dtype=bool), k=-1)
        dup = jnp.any(same & earlier, axis=-1)
        neg = jnp.where(dup, -jnp.inf, neg)
        out_neg, out_idx = jax.lax.top_k(neg, min(k, kk))
        out_ids = jnp.take_along_axis(cand_ids, out_idx, axis=-1)
        return -out_neg, out_ids
    return -neg[..., :k], cand_ids[..., :k]
