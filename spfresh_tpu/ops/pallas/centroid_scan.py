"""Pallas TPU kernels: fused centroid scan + windowed top-nprobe for huge C.

Stage-1 routing at C > ~100k centroids cannot materialize the (Q, C)
distance matrix AND run ``lax.top_k`` over C columns.  The windowed scheme
reduces the scan to per-window minima in one fused pass and then computes
EXACT distances only inside the selected windows:

pass 1 (``pallas_centroid_window_scan``): rank(q, c) = |c|^2 - 2 q.c
  (squared L2 minus the rank-irrelevant |q|^2) via one bf16 MXU matmul
  (-2 q.c; the dense oracle's dot carries the same bf16 input rounding)
  plus an in-kernel f32 |c|^2 epilogue; the (CT, QT) rank tile is reduced
  to L=128-centroid window minima IN REGISTER and only the (C/L, Q) minima
  ever reach HBM — the (Q, C) matrix is never written.  The min reduces
  down the SUBLANE axis (the lane-axis reduce is the slow VPU path, see
  pairwise.py), which is why the layout is transposed (C-major).

pass 2: the nprobe best windows per query (a small top_k over C/L minima)
  are streamed through the existing double-buffered slab-DMA rerank kernel
  (ops/pallas/rerank.py) with the centroid matrix viewed as (C/L, L, d)
  window slabs — whole-slab DMAs at HBM bandwidth, exact elementwise
  squared L2, no element gather anywhere.

Exactness: let T be the nprobe-th smallest window minimum for a query; the
nprobe windows achieving it contain nprobe distinct ranks <= T, so the
global nprobe-th smallest rank <= T, and any window with min > T holds no
top-nprobe member — the true top-nprobe live inside the nprobe best-min
windows.  Window selection ranks in the STORAGE dtype's rounding class:
bf16-storage indexes rank by one bf16 MXU pass (the same input rounding
their dense oracle carries) with a +8 window oversampling margin absorbing
near-tie swaps at that boundary; f32-storage indexes rank at
Precision.HIGHEST so the selection is margin-bounded against the f32
oracle, not a coarser one.

Invalid (and padding) centroid rows are filled with 1e18 in every column:
their in-kernel |c|^2 is ~1e38 (vs any real rank's magnitude), so their
window min can never win, and pass 2 masks them by validity rows.  This
keeps d' = the plain 128-lane round-up of d — no extra penalty column
forcing a whole extra lane block (d=128 would pad to 256, doubling both
the matmul operand bytes and the pass-2 window-slab DMAs).

Replaces the reference's k-d-tree centroid routing
(/root/reference/src/spann/spann_index.rs:120-141) at centroid counts where
neither a tree walk nor a full sort is the right TPU shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_CT = 1024  # centroid rows per step (sublane-tiled)
_QT = 256   # queries per step (lane axis)
_L = 128    # window size: _CT/_L = 8 keeps the minima tile sublane-aligned
_MARGIN = 8  # extra windows selected to absorb bf16 near-tie swaps


def _make_kernel(d_pad: int, bf16_rank: bool):
    def kernel(c_ref, qT_ref, min_ref):
        c = c_ref[...]                          # (CT, d')  [c | pen | 0pad] f32
        qT = qT_ref[...]                        # (d', QT)  [-2q | 0pad]^T  f32
        if bf16_rank:
            # bf16-storage centroids: one MXU pass with the same input
            # rounding the dense oracle's matmul carries for this index.
            dotp = jnp.dot(
                c.astype(jnp.bfloat16),
                qT.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # (CT, QT)
        else:
            # f32-storage centroids: the oracle scores in f32, so window
            # RANKING must too, or near-tie-heavy corpora could lose true
            # top-nprobe centroids past the +_MARGIN window margin (ADVICE
            # r2).  HIGHEST = 3-pass bf16 expansion on the MXU (~3x pass-1
            # FLOPs; pass 1 is a minority of scan wall at these C).
            dotp = jnp.dot(
                c, qT,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        # Exact f32 row norms on the VPU.  Invalid rows are 1e18 everywhere,
        # so cn2 ~ 1e38 dominates any real rank (|dotp| for them is ~1e21 at
        # most) — they can never win a window min.
        cn2 = jnp.sum(c * c, axis=1)  # (CT,)
        rank = cn2[:, None] + dotp
        min_ref[...] = jnp.min(rank.reshape(_CT // _L, _L, _QT), axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "bf16_rank"))
def pallas_centroid_window_scan(
    caug: jax.Array,  # (Cpad, d') f32 — [centroid | pen | zeros], Cpad % _CT == 0
    qaugT: jax.Array,  # (d', Qpad) f32 — [-2 q | zeros]^T, Qpad % _QT == 0
    interpret: bool = False,
    bf16_rank: bool = True,
):
    """Returns winminT (Cpad/_L, Qpad) f32 — per-window rank minima."""
    Cpad, d_pad = caug.shape
    Qpad = qaugT.shape[1]
    assert Cpad % _CT == 0 and Qpad % _QT == 0 and qaugT.shape[0] == d_pad
    return pl.pallas_call(
        _make_kernel(d_pad, bf16_rank),
        grid=(Qpad // _QT, Cpad // _CT),  # centroid axis minor: streams C
        in_specs=[
            pl.BlockSpec((_CT, d_pad), lambda qi, cj: (cj, 0)),
            pl.BlockSpec((d_pad, _QT), lambda qi, cj: (0, qi)),
        ],
        out_specs=pl.BlockSpec((_CT // _L, _QT), lambda qi, cj: (cj, qi)),
        out_shape=jax.ShapeDtypeStruct((Cpad // _L, Qpad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Cpad * Qpad * d_pad,
            bytes_accessed=(Cpad * d_pad + d_pad * Qpad) * 4
            + (Cpad // _L) * Qpad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(caug, qaugT)


def _augment(qf, centroids, cent_valid, d_pad: int):
    """Padded operands.  Invalid and C-padding rows are 1e18 in EVERY column
    (d-padding columns of valid rows stay 0 and meet a 0 in the query
    operand, so the dot product is untouched); their in-kernel |c|^2 ~ 1e38
    dominates every real rank, and pass 2 additionally masks them out."""
    C, d = centroids.shape
    Q = qf.shape[0]
    Cpad = ((C + _CT - 1) // _CT) * _CT
    Qpad = ((Q + _QT - 1) // _QT) * _QT
    cf = jnp.zeros((C, d_pad), jnp.float32).at[:, :d].set(
        centroids.astype(jnp.float32)
    )
    caug = jnp.full((Cpad, d_pad), 1e18, jnp.float32)
    caug = caug.at[:C].set(jnp.where(cent_valid[:, None], cf, 1e18))
    qaug = jnp.zeros((Qpad, d_pad), jnp.float32)
    qaug = qaug.at[:Q, :d].set(-2.0 * qf.astype(jnp.float32))
    return caug, qaug.T, Cpad, Qpad


@functools.partial(
    jax.jit, static_argnames=("nprobe", "superchunk", "interpret")
)
def windowed_centroid_topk(
    qf: jax.Array,  # (Q, d)
    centroids: jax.Array,  # (C, d) storage dtype
    cent_valid: jax.Array,  # (C,) bool
    nprobe: int,
    superchunk: int = 262144,
    interpret: bool = False,
):
    """Top-nprobe nearest centroids without sorting (Q, C) — see module
    docstring for the two-pass windowed scheme and its exactness argument.

    C is processed in ``superchunk`` pieces; per-chunk exact top-nprobe
    results merge exactly.  Returns (squared-L2 distances (Q, nprobe) f32
    ascending, centroid indices (Q, nprobe) int32) — the same contract as
    ``chunked_centroid_topk``.
    """
    from spfresh_tpu.ops.pallas.rerank import padded_rerank_distances
    from spfresh_tpu.ops.topk import smallest_k

    C, d = centroids.shape
    Q = qf.shape[0]
    # Ranking precision follows the STORAGE dtype: a bf16-storage index's
    # oracle matmul carries bf16 input rounding (windowed selection is in
    # the same rounding class + margin); an f32-storage index's oracle is
    # f32, so window ranking runs the MXU at HIGHEST precision instead.
    bf16_rank = centroids.dtype == jnp.bfloat16
    # Window slabs and queries pad d identically (zeros), so the elementwise
    # rerank's padding columns cancel for valid rows.
    d_pad = ((d + _L - 1) // _L) * _L
    qpad = jnp.zeros((Q, d_pad), jnp.float32).at[:, :d].set(
        qf.astype(jnp.float32)
    )

    best_d = jnp.full((Q, nprobe), jnp.inf, jnp.float32)
    best_i = jnp.full((Q, nprobe), -1, jnp.int32)
    superchunk = max(_CT, (superchunk // _CT) * _CT)
    for start in range(0, C, superchunk):
        end = min(start + superchunk, C)
        caug, qaugT, Cpad, Qpad = _augment(
            qf, centroids[start:end], cent_valid[start:end], d_pad
        )
        minT = pallas_centroid_window_scan(
            caug, qaugT, interpret=interpret, bf16_rank=bf16_rank
        )
        W = Cpad // _L
        S = min(nprobe + _MARGIN, W)
        _, wsel = smallest_k(minT.T[:Q], S)  # (Q, S) window ids
        # Pass 2: exact distances inside the selected windows — the rerank
        # kernel streams each (L, d') window slab by DMA.  Invalid rows are
        # 1e18, so their distances are astronomically large AND the validity
        # mask below removes them.
        slabs = caug.reshape(W, _L, d_pad)
        dw = padded_rerank_distances(
            qpad, wsel.astype(jnp.int32), slabs, "Euclidean",
            interpret=interpret,
        )  # (Q, S, L) exact squared L2
        cols = wsel[:, :, None] * _L + jnp.arange(_L)[None, None, :]
        valid2d = (
            jnp.zeros((Cpad,), bool).at[: end - start].set(
                cent_valid[start:end]
            ).reshape(W, _L)
        )
        dw = jnp.where(valid2d[wsel], dw, jnp.inf).reshape(Q, S * _L)
        cols = cols.reshape(Q, S * _L)
        k_here = min(nprobe, S * _L)
        loc_d, loc_j = smallest_k(dw, k_here)
        loc_i = jnp.take_along_axis(cols, loc_j, axis=1).astype(jnp.int32) + start
        if k_here < nprobe:
            padk = nprobe - k_here
            loc_d = jnp.pad(loc_d, ((0, 0), (0, padk)), constant_values=jnp.inf)
            loc_i = jnp.pad(loc_i, ((0, 0), (0, padk)), constant_values=-1)
        cat_d = jnp.concatenate([best_d, loc_d], axis=1)
        cat_i = jnp.concatenate([best_i, loc_i], axis=1)
        vals, idx = smallest_k(cat_d, nprobe)
        best_d = vals
        best_i = jnp.take_along_axis(cat_i, idx, axis=1)
    # Invalid probes keep an in-range index (0) like the chunked scan does —
    # downstream kernels mask by distance/length, and out-of-range rows
    # would silently alias real slabs.
    real = jnp.isfinite(best_d)
    best_i = jnp.where(real, best_i, 0)
    return best_d, best_i
