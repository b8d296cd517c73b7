"""Small clustering helpers (parity: /root/reference/src/clustering/utils.rs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spfresh_tpu.core.dtypes import ACCUM_DTYPE


@jax.jit
def compute_mean(data: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Mean of selected rows (utils.rs:5-15): data (n, d), indices (m,) -> (d,)."""
    return jnp.mean(data[indices].astype(ACCUM_DTYPE), axis=0)


@jax.jit
def masked_means(data: jnp.ndarray, member_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-cluster means from a bool membership mask.

    data (n, d), member_mask (n, k) -> (k, d).  The segment-sum is a single
    mask^T @ data matmul on the MXU.  Empty clusters get a zero mean (callers
    must guard with counts).
    """
    m = member_mask.astype(ACCUM_DTYPE)
    sums = jax.lax.dot_general(
        m, data,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=ACCUM_DTYPE,
    )  # (k, d)
    counts = jnp.sum(m, axis=0)[:, None]
    return sums / jnp.maximum(counts, 1.0)


def next_pow2(x: int) -> int:
    """Smallest power of two >= x (>=1). Used to bucket padded shapes so the
    level-synchronous subdivision compiles O(log n) kernel variants, not one
    per cluster size."""
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()
