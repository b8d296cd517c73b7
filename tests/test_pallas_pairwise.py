"""Pallas L1/Linf pairwise kernel vs the jnp broadcast oracle (interpret
mode on the CPU harness)."""

import numpy as np
import pytest

from spfresh_tpu.ops.pallas.pairwise import pallas_l1_linf_pairwise


@pytest.mark.parametrize("metric", ["Manhattan", "Chebyshev"])
@pytest.mark.parametrize("n,m,d", [(16, 128, 128), (19, 131, 70), (3, 5, 960)])
def test_pallas_pairwise_matches_oracle(rng, metric, n, m, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.standard_normal((m, d)).astype(np.float32)
    out = np.asarray(pallas_l1_linf_pairwise(x, y, metric, interpret=True))
    diff = np.abs(x[:, None, :] - y[None, :, :])
    want = diff.sum(-1) if metric == "Manhattan" else diff.max(-1)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-4)
