"""Top-k selection utilities (ops/topk.py)."""

import numpy as np
import jax.numpy as jnp


def test_smallest_k_rounds_identical_to_top_k():
    """The rounds variant must be bit-identical to smallest_k, including tie
    resolution (equal values -> lower index) and all-inf rows."""
    from spfresh_tpu.ops.topk import smallest_k, smallest_k_rounds

    rng = np.random.default_rng(5)
    d = rng.standard_normal((64, 300)).astype(np.float32)
    d[3, :] = np.inf                       # empty row
    d[7, 10:20] = d[7, 10]                 # 10-way tie
    d[11] = np.round(d[11], 1)             # tie-heavy row
    for k in (1, 4, 8, 13):
        v1, i1 = smallest_k(jnp.asarray(d), k)
        v2, i2 = smallest_k_rounds(jnp.asarray(d), k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
