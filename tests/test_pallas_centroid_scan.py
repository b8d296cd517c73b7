"""Windowed Pallas centroid scan vs the dense oracle.

CI runs the REAL kernel body through Pallas interpret mode (same policy as
test_pallas_rerank.py) and checks the windowed exact-selection theorem holds
against a brute-force (Q, C) top_k on seeded data.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spfresh_tpu.ops.pallas.centroid_scan import windowed_centroid_topk
from spfresh_tpu.ops.topk import smallest_k


def _oracle(qf, cents, valid, nprobe):
    qf = jnp.asarray(qf, jnp.float32)
    cf = jnp.asarray(cents, jnp.float32)
    D = jnp.sum((qf[:, None, :] - cf[None, :, :]) ** 2, axis=-1)
    D = jnp.where(jnp.asarray(valid)[None, :], D, jnp.inf)
    return smallest_k(D, nprobe)


def _check(qf, cents, valid, nprobe, superchunk=131072):
    got_d, got_i = windowed_centroid_topk(
        jnp.asarray(qf), jnp.asarray(cents), jnp.asarray(valid), nprobe,
        superchunk=superchunk, interpret=True,
    )
    exp_d, exp_i = _oracle(qf, cents, valid, nprobe)
    got_d, got_i = np.asarray(got_d), np.asarray(got_i)
    exp_d, exp_i = np.asarray(exp_d), np.asarray(exp_i)
    finite = np.isfinite(exp_d)
    assert np.allclose(got_d[finite], exp_d[finite], rtol=1e-4, atol=1e-3)
    # Distances ascending; id sets match wherever margins are unambiguous.
    assert np.all(np.diff(got_d, axis=1) >= -1e-6)
    for q in range(exp_i.shape[0]):
        ge, gg = set(exp_i[q][finite[q]].tolist()), set(got_i[q][finite[q]].tolist())
        if ge != gg:  # near-ties may legally swap across the top-k boundary
            diff_ids = ge.symmetric_difference(gg)
            edge = exp_d[q][finite[q]].max()
            for i in diff_ids:
                d = _oracle(qf[q : q + 1], cents[[i]], valid[[i]], 1)[0][0, 0]
                assert abs(float(d) - float(edge)) < 1e-2 * (1 + abs(float(edge)))


def test_matches_oracle_basic():
    rng = np.random.default_rng(0)
    cents = rng.standard_normal((3000, 48)).astype(np.float32)
    qf = rng.standard_normal((37, 48)).astype(np.float32)
    _check(qf, cents, np.ones(3000, bool), nprobe=9)


def test_invalid_centroids_excluded():
    rng = np.random.default_rng(1)
    cents = rng.standard_normal((1500, 16)).astype(np.float32)
    qf = rng.standard_normal((5, 16)).astype(np.float32)
    valid = np.ones(1500, bool)
    valid[::3] = False
    got_d, got_i = windowed_centroid_topk(
        jnp.asarray(qf), jnp.asarray(cents), jnp.asarray(valid), 8, interpret=True
    )
    assert np.all(np.asarray(got_i) % 3 != 0)
    _check(qf, cents, valid, nprobe=8)


def test_multi_superchunk_merge():
    rng = np.random.default_rng(2)
    cents = rng.standard_normal((4096, 8)).astype(np.float32)
    qf = rng.standard_normal((11, 8)).astype(np.float32)
    # superchunk=1024 forces 4 chunks through the exact cross-chunk merge.
    _check(qf, cents, np.ones(4096, bool), nprobe=6, superchunk=1024)


def test_bf16_centroids():
    rng = np.random.default_rng(3)
    cents = rng.standard_normal((2048, 32)).astype(np.float32)
    qf = rng.standard_normal((9, 32)).astype(np.float32)
    got_d, got_i = windowed_centroid_topk(
        jnp.asarray(qf),
        jnp.asarray(cents).astype(jnp.bfloat16),
        jnp.ones(2048, bool),
        4,
        interpret=True,
    )
    # bf16 storage: oracle on the bf16-rounded values.
    exp_d, exp_i = _oracle(
        qf, np.asarray(jnp.asarray(cents).astype(jnp.bfloat16).astype(jnp.float32)),
        np.ones(2048, bool), 4,
    )
    assert np.allclose(np.asarray(got_d), np.asarray(exp_d), rtol=1e-3, atol=1e-2)


def test_more_probes_than_windows():
    # nprobe > C/L: every window selected, result is the full exact top-k.
    rng = np.random.default_rng(4)
    cents = rng.standard_normal((256, 8)).astype(np.float32)
    qf = rng.standard_normal((3, 8)).astype(np.float32)
    _check(qf, cents, np.ones(256, bool), nprobe=16)


def test_fewer_valid_than_nprobe():
    rng = np.random.default_rng(5)
    cents = rng.standard_normal((300, 8)).astype(np.float32)
    qf = rng.standard_normal((2, 8)).astype(np.float32)
    valid = np.zeros(300, bool)
    valid[:5] = True
    got_d, got_i = windowed_centroid_topk(
        jnp.asarray(qf), jnp.asarray(cents), jnp.asarray(valid), 8, interpret=True
    )
    got_d = np.asarray(got_d)
    assert np.all(np.isfinite(got_d[:, :5])) and np.all(~np.isfinite(got_d[:, 5:]))
    assert np.all(np.asarray(got_i)[:, 5:] == 0)  # in-range sentinel
