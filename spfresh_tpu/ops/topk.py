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

# Centroid counts past this use the chunked scan in the search kernels: one
# (Q, C) distance matrix + top_k over C columns stops being the right shape
# for XLA's selection at ~100k+ columns (VMEM blowout + O(C log C) select).
LARGE_C_THRESHOLD = 32_768

# Stage-1 selection is lax.top_k everywhere.  A k-masked-argmin-rounds
# variant (`smallest_k_rounds`) was built and measured as an alternative;
# on device it lost at every k at the bench's operating shape (C=12,500,
# Q=4096: 0.90x/0.85x/0.79x/0.45x top_k at k=4/8/16/32 —
# benchmarks/r4_results/topk_bench2.log), so it was deleted in round 5.


@functools.partial(jax.jit, static_argnames=("nprobe", "metric", "chunk"))
def chunked_centroid_topk(qf, centroids, cent_valid, nprobe: int,
                          metric: str = "Euclidean", chunk: int = 8192):
    """Fused centroid scan + running top-nprobe for LARGE centroid counts.

    Streams the (C, d) centroid matrix in ``chunk``-row tiles: each step
    computes the (Q, chunk) distance block on the MXU and folds it into the
    running per-query best-nprobe via a (nprobe + chunk)-column top_k — the
    full (Q, C) matrix never materializes and selection cost is
    O(C/chunk * (chunk + nprobe) log nprobe) instead of one giant sort.
    Exact: every centroid is scanned.  Returns (dists, indices) (Q, nprobe).
    """
    from spfresh_tpu.ops.distances import pairwise_distance

    C, d = centroids.shape
    Q = qf.shape[0]
    chunk = min(chunk, C)
    n_chunks = (C + chunk - 1) // chunk
    pad_c = n_chunks * chunk
    cent_p = jnp.pad(centroids, ((0, pad_c - C), (0, 0)))
    valid_p = jnp.pad(cent_valid, (0, pad_c - C))

    def body(i, state):
        best_d, best_i = state
        start = i * chunk
        block = jax.lax.dynamic_slice(cent_p, (start, 0), (chunk, d))
        bval = jax.lax.dynamic_slice(valid_p, (start,), (chunk,))
        D = pairwise_distance(qf, block, metric)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (Q, chunk), 1)
        D = jnp.where(bval[None, :] & (col < C), D, jnp.inf)
        cat_d = jnp.concatenate([best_d, D], axis=1)
        cat_i = jnp.concatenate([best_i, col], axis=1)
        vals, idx = smallest_k(cat_d, nprobe)
        return vals, jnp.take_along_axis(cat_i, idx, axis=1)

    init = (jnp.full((Q, nprobe), jnp.inf), jnp.zeros((Q, nprobe), jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


def centroid_topk(qf, centroids, cent_valid, nprobe: int, metric: str):
    """Stage-1 probe used by every search kernel: dense (Q, C) scan + top_k
    for ordinary centroid counts, the chunked streaming scan past
    LARGE_C_THRESHOLD.  ``cent_valid`` may be None (all rows valid).  Traced
    under jit, so the branch is resolved statically per shape."""
    from spfresh_tpu.ops.distances import pairwise_distance

    C = centroids.shape[0]
    if cent_valid is None:
        cent_valid = jnp.ones((C,), bool)
    if (
        C > LARGE_C_THRESHOLD
        and nprobe <= 128
        and metric == "Euclidean"
        and jax.devices()[0].platform == "tpu"
    ):
        # Fused Pallas scan + windowed exact selection: one matmul pass, no
        # per-chunk top_k over (nprobe + chunk) columns (see centroid_scan.py).
        from spfresh_tpu.ops.pallas.centroid_scan import windowed_centroid_topk

        return windowed_centroid_topk(qf, centroids, cent_valid, nprobe)
    if C > LARGE_C_THRESHOLD and nprobe <= 1024:
        return chunked_centroid_topk(qf, centroids, cent_valid, nprobe, metric)
    Dc = pairwise_distance(qf, centroids, metric)
    Dc = jnp.where(cent_valid[None, :], Dc, jnp.inf)
    return smallest_k(Dc, nprobe)


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
