"""Pallas TPU kernel: L1 / Linf pairwise distances.

Squared Euclidean rides the MXU via the |x|^2+|y|^2-2xy expansion, but
Manhattan/Chebyshev have no matmul factorization — they need an elementwise
|x_i - y_j| reduce over d for every (i, j) pair.  XLA's lowering of the
broadcast-and-reduce form is catastrophically slow for the L1 sum at GIST
dimensions (measured 72 s for (4096 x 13448) x 960 on v5e, vs 0.1 s for the
same-shape Linf max-reduce), so this kernel tiles the output and streams the
reduction through VMEM explicitly:

  grid (n/Nt, m/Mt); per step the (Nt, d) x-tile and (Mt, d) y-tile sit in
  VMEM and the d axis is consumed in 128-lane chunks, accumulating the
  (Nt, Mt) tile with VPU |diff| reduces — ~0.5 Telem/s, on par with the
  Chebyshev fast case, for both metrics.

Used by ``pairwise_distance`` for Manhattan/Chebyshev on TPU; the jnp
broadcast form remains the oracle (tests) and the off-TPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spfresh_tpu.ops.distances import CHEBYSHEV, MANHATTAN

_NT = 16   # x rows per step (sublane multiple)
_MT = 128  # y rows per step (lane multiple)
_DC = 128  # d-chunk per accumulation step


def _make_kernel(metric: str, d_chunks: int):
    def kernel(x_ref, yT_ref, o_ref):
        # y arrives TRANSPOSED (d, Mt): the diff tensor is then
        # (Nt, DC, Mt) with Mt on the lane axis and d on SUBLANES — the
        # reduction over d runs down sublanes, which the VPU does natively
        # (a lane-axis add-reduce measured 50x slower than the same-shape
        # max on this hardware).
        acc = jnp.zeros((_NT, _MT), jnp.float32)
        for c in range(d_chunks):  # static unroll: d_pad/128 chunks
            xc = x_ref[:, c * _DC : (c + 1) * _DC].astype(jnp.float32)
            yc = yT_ref[c * _DC : (c + 1) * _DC, :].astype(jnp.float32)
            diff = jnp.abs(xc[:, :, None] - yc[None, :, :])  # (Nt, DC, Mt)
            if metric == MANHATTAN:
                acc = acc + jnp.sum(diff, axis=1)
            else:
                acc = jnp.maximum(acc, jnp.max(diff, axis=1))
        o_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def pallas_l1_linf_pairwise(
    x: jax.Array, y: jax.Array, metric: str, interpret: bool = False
) -> jax.Array:
    """(n, d) x (m, d) -> (n, m) f32 Manhattan or Chebyshev distances.
    Pads d to a lane multiple with zeros (|0-0| contributes nothing to
    either metric) and n/m to tile multiples (sliced off)."""
    assert metric in (MANHATTAN, CHEBYSHEV), metric
    n, d = x.shape
    m = y.shape[0]
    d_pad = ((d + _DC - 1) // _DC) * _DC
    n_pad = ((n + _NT - 1) // _NT) * _NT
    m_pad = ((m + _MT - 1) // _MT) * _MT
    xp = jnp.pad(x, ((0, n_pad - n), (0, d_pad - d)))
    yT = jnp.pad(y, ((0, m_pad - m), (0, d_pad - d))).T  # (d_pad, m_pad)
    out = pl.pallas_call(
        _make_kernel(metric, d_pad // _DC),
        grid=(n_pad // _NT, m_pad // _MT),
        in_specs=[
            pl.BlockSpec((_NT, d_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((d_pad, _MT), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((_NT, _MT), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_pad * m_pad * d_pad,
            bytes_accessed=(n_pad + m_pad) * d_pad * x.dtype.itemsize
            + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, yT)
    return out[:n, :m]
