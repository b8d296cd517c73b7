"""Pallas TPU kernel: the SPANN closure-replica pass as one streaming scan.

For every corpus point p with base cluster b, the closure rule
(/root/reference/src/clustering/hierarchical.rs:328-346) admits cluster j as
a replica when

    dist(p, c_j) < bt * dist(p, c_b)   AND   dist(c_b, c_j) >= dist(p, c_j)

and the pass keeps the ``n_extra`` nearest admitted clusters per point.  The
XLA formulation (``_final_replica_pass_fused``) materializes (tile, C)
distance and centroid-centroid workspaces in HBM and runs ``lax.top_k`` over
C columns — at 1M x 12.5k that is ~100 GB of HBM traffic and a C-wide sort
per row for ~3 TFLOP of actual matmul work, measured at 12.8 s.

This kernel streams centroid chunks through VMEM instead and keeps a running
top-``n_extra`` per point, so the (n, C) distance space never touches HBM.
Measured at 1M x 12.5k x 128 (r4 replica_probe, warm executable): ~1.8 s
including the tunnel dispatch, vs 2.97 s for the XLA pass in the same
window; the kernel's own FLOP+HBM floor is ~60-100 ms.  The r4 build-phase
number (7.44 s) was dominated by Mosaic RECOMPILES, not execution: the
cluster count C was a static kernel capture and the padded shapes were
exact, so every build (C is data-dependent) and every ragged final row
tile compiled a fresh executable.  Round 5 removed both C-dependencies:
centroid matrices are padded to power-of-2 ``_CT`` buckets with FAR
sentinel rows (guaranteed never admitted — no ``cols < C`` mask needed)
and row tiles are uniform (the last tile zero-pads), so one executable per
(d, bucket) serves every build.

Grid layout:

  grid (Npad/BR, Cpad/CT), centroid axis minor.  Per step two MXU dots
  produce the transposed (CT, BR) point-centroid and basecentroid-centroid
  distance tiles via the |x|^2+|y|^2-2xy expansion (norms are precomputed
  1-lane vectors — in-kernel lane-axis add-reduces are the slow VPU path,
  see pairwise.py); eligibility is elementwise; the running top-``n_extra``
  (values AND centroid ids) lives in the revisited (8, BR) output block and
  merges with each chunk's selection by ``n_extra`` sublane-axis min rounds.

Tie semantics match ``lax.top_k`` on the negated distances: ascending
distance, equal distances resolve to the lower centroid id (chunks are
scanned in ascending id order and every min round breaks ties by id).

Euclidean only: L1/Linf have no matmul factorization, so their replica pass
keeps the XLA route (pairwise.py's elementwise kernel serves their search
path).  Missing replicas (fewer than ``n_extra`` eligible clusters) carry
distance +inf and an arbitrary id — callers filter by ``isfinite`` exactly
as with the XLA pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default SCOPED-vmem budget is 16 MB; at d_pad = 1024 (960-d
# corpora) the f32 row/base blocks + the (CT, BR) distance/eligibility/SOAR
# temporaries measure 17.39 MB and the real-device compile dies with
# "Ran out of memory in memory space vmem ... exceeded scoped vmem limit by
# 1.39M" (r5 gist session: the SOAR rank temporaries tipped the r4-passing
# shape over).  v5e has 128 MB of VMEM per core — raise the scoped budget
# well past the worst supported shape instead of shrinking tiles (smaller
# _CT/_BR would cost merge-round throughput at every d).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

_BR = 256   # corpus rows per block (lane axis of every elementwise tile)
_CT = 512   # centroid rows per step (sublane axis)
_NE8 = 8    # output sublane rows (top-n_extra state, n_extra <= 8)
_IBIG = 2**31 - 1  # python int: jnp constants would be captured by the kernel

# FAR sentinel for bucket-padding centroid rows: squared distance to any
# sane vector is ~_FAR^2 = 1.3e36 (f32-finite), so padded rows never win an
# argmin and never pass the `D < bt * db` admission bound — the kernels need
# no `cols < C` mask and compile once per (d, bucket), not once per C.
# Contract: corpus coordinate magnitudes stay below ~1e15 (any real
# embedding is O(1e3)); beyond that, real distances could rival _FAR^2.
_FAR = 2.0**60


def _bucket_cpad(C: int) -> int:
    """Padded centroid count: the next power-of-2 multiple of ``_CT``.
    Buckets keep the compiled-shape population tiny (<= log2(C_max) shapes
    ever) at <= 2x kernel-grid waste — irrelevant next to the ~seconds-long
    Mosaic compile a fresh shape costs through the tunnel."""
    nc = -(-C // _CT)
    return _CT * (1 << max(0, (nc - 1).bit_length()))


def _bucket_rows(n: int) -> int:
    """Padded row count: the next power-of-2 multiple of ``_BR`` — the row
    sibling of ``_bucket_cpad`` (corpus sizes vary per build/tile; exact row
    shapes would recompile per n)."""
    nb = -(-n // _BR)
    return _BR * (1 << max(0, (nb - 1).bit_length()))


def _pad_rows(arrs, n: int, n_b: int):
    """Zero-pad each (n, ...) array in ``arrs`` to ``n_b`` rows.  Padding
    rows are (0-vector, base 0, db 0): with a caller-supplied db the
    admission bound is 0 so they admit nothing; with a computed db their
    admissions are sliced off by the caller either way."""
    if n_b == n:
        return arrs
    out = []
    for a in arrs:
        pad_shape = (n_b - n,) + a.shape[1:]
        out.append(jnp.concatenate([a, jnp.zeros(pad_shape, a.dtype)], axis=0))
    return out


def pad_centroids_far(cents: jax.Array) -> jax.Array:
    """Pad (C, d) centroids to (_bucket_cpad(C), d) with FAR sentinel rows.
    Eager (a couple of device ops) — callers inside tile loops should pad
    ONCE up front and pass ``cents_prepadded=True``."""
    C, d = cents.shape
    c_pad = _bucket_cpad(C)
    if c_pad == C:
        return cents
    pad = jnp.zeros((c_pad - C, d), cents.dtype)
    pad = pad.at[:, 0].set(jnp.asarray(_FAR, cents.dtype))
    return jnp.concatenate([cents, pad], axis=0)

# Set by mark_unavailable() after a real-device compile failure: callers
# fall back to the XLA route for the rest of the process instead of
# crashing every subsequent tile/build on the same Mosaic error.
_UNAVAILABLE = False


def mark_unavailable() -> None:
    global _UNAVAILABLE
    _UNAVAILABLE = True


def available() -> bool:
    return not _UNAVAILABLE


def _select_rounds(d, i, ne: int):
    """``ne`` rounds of (sublane-min, tie-break by lower id) selection over
    (rows, BR) value/id tiles.  Returns ((ne, BR) values, (ne, BR) ids),
    ascending; exhausted lanes yield (+inf, whatever id survived)."""
    outs_d, outs_i = [], []
    for _ in range(ne):
        v = jnp.min(d, axis=0, keepdims=True)                      # (1, BR)
        at = d == v
        sel = jnp.min(jnp.where(at, i, _IBIG), axis=0, keepdims=True)
        outs_d.append(v)
        outs_i.append(sel)
        d = jnp.where(at & (i == sel), jnp.inf, d)
    return jnp.concatenate(outs_d, axis=0), jnp.concatenate(outs_i, axis=0)


def _make_kernel(ne: int, highest: bool, soar_lambda: float):
    prec = jax.lax.Precision.HIGHEST if highest else None

    def kernel(x_ref, cb_ref, x2_ref, cb2_ref, thr_ref, db_ref, base_ref,
               c_ref, od_ref, oi_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            od_ref[...] = jnp.full((_NE8, _BR), jnp.inf, jnp.float32)
            oi_ref[...] = jnp.full((_NE8, _BR), -1, jnp.int32)

        c = c_ref[...]                    # (CT, d') storage dtype
        xT = x_ref[...]                   # (d', BR) — pre-transposed rows
        cbT = cb_ref[...]                 # (d', BR) base-centroid rows^T
        x2 = x2_ref[...]                  # (1, BR) f32 |p|^2
        cb2 = cb2_ref[...]                # (1, BR) f32 |c_b|^2
        thr = thr_ref[...]                # (1, BR) f32 admission bound bt*db
        db = db_ref[...]                  # (1, BR) f32 dist(p, c_b)
        base = base_ref[...]              # (1, BR) int32

        # Transposed tiles: BR on lanes, CT on sublanes — every reduce below
        # runs down sublanes (the fast VPU direction), and the row operands
        # arrive pre-transposed so both dots are the standard (M, K) @ (K, N)
        # contraction Mosaic is guaranteed to lower.  |c_j|^2 is the one
        # lane-axis reduce (slow direction) but it is (CT, d') once per step,
        # and the keepdims form lands it directly in the (CT, 1) layout the
        # broadcast needs — no relayout.
        cf = c.astype(jnp.float32)
        cn2 = jnp.sum(cf * cf, axis=1, keepdims=True)   # (CT, 1)
        dxc = jnp.dot(
            c, xT, preferred_element_type=jnp.float32, precision=prec
        )                                  # (CT, BR)  c_j . p
        dcc = jnp.dot(
            c, cbT, preferred_element_type=jnp.float32, precision=prec
        )                                  # (CT, BR)  c_j . c_b
        D = jnp.maximum(cn2 + x2 - 2.0 * dxc, 0.0)
        CC = jnp.maximum(cn2 + cb2 - 2.0 * dcc, 0.0)

        # Bucket-padding rows carry the FAR sentinel: their D is ~1.3e36,
        # which can never pass `D < thr` for a finite threshold — no
        # `cols < C` mask, so the kernel code is C-invariant.
        cols = j * _CT + jax.lax.broadcasted_iota(jnp.int32, (_CT, _BR), 0)
        eligible = (D < thr) & (CC >= D) & (cols != base)
        if soar_lambda:
            # SOAR ranking (spilled, orthogonality-amplified residuals):
            # admitted candidates are ranked by D + lambda * (r_j.r_1)^2 /
            # |r_1|^2, where the residual dot comes free by polarization:
            # r_1 - r_j = c_j - c_b, so 2 r_j.r_1 = db + D - CC.
            rdot = 0.5 * (db + D - CC)
            rank = D + soar_lambda * rdot * rdot / jnp.maximum(db, 1e-30)
        else:
            rank = D
        Dm = jnp.where(eligible, rank, jnp.inf)

        cd, ci = _select_rounds(Dm, cols, ne)          # chunk top-ne
        pd, pi = od_ref[...], oi_ref[...]
        md, mi = _select_rounds(                        # merge with running
            jnp.concatenate([pd[:ne], cd], axis=0),
            jnp.concatenate([pi[:ne], ci], axis=0),
            ne,
        )
        od_ref[...] = jnp.concatenate(
            [md, jnp.full((_NE8 - ne, _BR), jnp.inf, jnp.float32)], axis=0
        )
        oi_ref[...] = jnp.concatenate(
            [mi, jnp.full((_NE8 - ne, _BR), -1, jnp.int32)], axis=0
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_extra", "interpret", "has_db", "soar_lambda"),
)
def _replica_topk_impl(
    X, base, cents, bt, db_in, n_extra: int, interpret: bool,
    has_db: bool, soar_lambda: float,
):
    n, d = X.shape
    c_pad = cents.shape[0]  # prepadded to a _CT bucket with FAR rows
    d_pad = ((d + 127) // 128) * 128
    n_pad = ((n + _BR - 1) // _BR) * _BR

    Xp = jnp.zeros((n_pad, d_pad), X.dtype).at[:n, :d].set(X)
    Cp = jnp.zeros((c_pad, d_pad), cents.dtype).at[:, :d].set(cents)
    bp = jnp.zeros((1, n_pad), jnp.int32).at[0, :n].set(base.astype(jnp.int32))
    Cb = jnp.take(Cp, bp[0, :], axis=0)                # (n_pad, d') base rows

    xf = Xp.astype(jnp.float32)
    cbf = Cb.astype(jnp.float32)
    x2 = jnp.sum(xf * xf, axis=1)[None, :]              # (1, n_pad)
    cb2 = jnp.sum(cbf * cbf, axis=1)[None, :]           # (1, n_pad)
    prec = None if X.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    if has_db:
        # Caller supplies dist(p, c_base) — the out-of-core contract, where
        # the streamed assignment already measured it.
        db = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
            db_in.astype(jnp.float32)
        )
    else:
        # dist(p, c_b) in the same expansion arithmetic the tiles use.
        dxb = jax.lax.dot_general(
            Xp, Cb, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        )[None, :]                                      # (1, n_pad) p . c_b
        db = jnp.maximum(x2 + cb2 - 2.0 * dxb, 0.0)
    # Admission bound bt * db, precomputed exactly like the XLA routes
    # (f32 multiply is the same either way); padding rows admit nothing.
    thr = jnp.full((1, n_pad), -jnp.inf, jnp.float32).at[0, :n].set(
        jnp.asarray(bt, jnp.float32) * db[0, :n]
    )

    od, oi = pl.pallas_call(
        _make_kernel(
            n_extra, highest=prec is not None,
            soar_lambda=float(soar_lambda),
        ),
        grid=(n_pad // _BR, c_pad // _CT),  # centroid axis minor: streams C
        in_specs=[
            pl.BlockSpec((d_pad, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((d_pad, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((1, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((1, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((1, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((1, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((1, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((_CT, d_pad), lambda i, j: (j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((_NE8, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((_NE8, _BR), lambda i, j: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_NE8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((_NE8, n_pad), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * c_pad * d_pad,
            bytes_accessed=2 * n_pad * d_pad * X.dtype.itemsize
            + (n_pad // _BR) * c_pad * d_pad * cents.dtype.itemsize
            + 2 * _NE8 * n_pad * 4,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(Xp.T, Cb.T, x2, cb2, thr, db, bp, Cp)
    return oi[:n_extra, :n].T, od[:n_extra, :n].T


def _make_assign_kernel(highest: bool):
    prec = jax.lax.Precision.HIGHEST if highest else None

    def kernel(x_ref, x2_ref, c_ref, od_ref, oi_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            od_ref[...] = jnp.full((_NE8, _BR), jnp.inf, jnp.float32)
            oi_ref[...] = jnp.full((_NE8, _BR), -1, jnp.int32)

        c = c_ref[...]
        xT = x_ref[...]                                  # (d', BR)
        x2 = x2_ref[...]
        cf = c.astype(jnp.float32)
        cn2 = jnp.sum(cf * cf, axis=1, keepdims=True)   # (CT, 1)
        dxc = jnp.dot(
            c, xT, preferred_element_type=jnp.float32, precision=prec
        )                                                # (CT, BR)
        D = jnp.maximum(cn2 + x2 - 2.0 * dxc, 0.0)
        # FAR bucket-padding rows measure ~1.3e36 — they never win the
        # argmin, so no `cols < C` mask (keeps the kernel C-invariant).
        cols = j * _CT + jax.lax.broadcasted_iota(jnp.int32, (_CT, _BR), 0)
        cd, ci = _select_rounds(D, cols, 1)
        pd, pi = od_ref[...], oi_ref[...]
        md, mi = _select_rounds(
            jnp.concatenate([pd[:1], cd], axis=0),
            jnp.concatenate([pi[:1], ci], axis=0),
            1,
        )
        od_ref[...] = jnp.concatenate(
            [md, jnp.full((_NE8 - 1, _BR), jnp.inf, jnp.float32)], axis=0
        )
        oi_ref[...] = jnp.concatenate(
            [mi, jnp.full((_NE8 - 1, _BR), -1, jnp.int32)], axis=0
        )

    return kernel


def pallas_nearest_centroid(
    X: jax.Array,       # (n, d) storage dtype (f32 or bf16)
    cents: jax.Array,   # (C, d) storage dtype
    interpret: bool = False,
    cents_prepadded: bool = False,
):
    """Nearest centroid per row (squared-L2): (base (n,) int32, db (n,) f32).
    The streaming-argmin sibling of the replica kernel — the out-of-core
    base-assignment (`outofcore._oc_base_tile`) materializes (tile, chunk)
    distance workspaces in HBM per chunk; this never leaves VMEM.  Ties
    break to the lowest centroid id (the `_oc_base_tile` contract).

    The centroid matrix is FAR-bucket-padded and the row count power-of-2
    bucketed before entering the jit so the compiled shape depends on the
    buckets, not the exact (n, C); tile-loop callers pad once via
    ``pad_centroids_far`` and pass ``cents_prepadded=True`` (their uniform
    tile sizes already sit on a bucket)."""
    if not cents_prepadded:
        cents = pad_centroids_far(cents)
    n = X.shape[0]
    (Xs,) = _pad_rows((X,), n, _bucket_rows(n))
    b, d = _nearest_centroid_impl(Xs, cents, interpret)
    return b[:n], d[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_centroid_impl(X, cents, interpret: bool):
    n, d = X.shape
    c_pad = cents.shape[0]  # prepadded to a _CT bucket with FAR rows
    d_pad = ((d + 127) // 128) * 128
    n_pad = ((n + _BR - 1) // _BR) * _BR
    Xp = jnp.zeros((n_pad, d_pad), X.dtype).at[:n, :d].set(X)
    Cp = jnp.zeros((c_pad, d_pad), cents.dtype).at[:, :d].set(cents)
    xf = Xp.astype(jnp.float32)
    x2 = jnp.sum(xf * xf, axis=1)[None, :]
    prec = None if X.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    od, oi = pl.pallas_call(
        _make_assign_kernel(highest=prec is not None),
        grid=(n_pad // _BR, c_pad // _CT),
        in_specs=[
            pl.BlockSpec((d_pad, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((1, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((_CT, d_pad), lambda i, j: (j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((_NE8, _BR), lambda i, j: (0, i)),
            pl.BlockSpec((_NE8, _BR), lambda i, j: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_NE8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((_NE8, n_pad), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * c_pad * d_pad,
            bytes_accessed=n_pad * d_pad * X.dtype.itemsize
            + (n_pad // _BR) * c_pad * d_pad * cents.dtype.itemsize
            + 2 * _NE8 * n_pad * 4,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(Xp.T, x2, Cp)
    return oi[0, :n], od[0, :n]


def pallas_replica_topk(
    X: jax.Array,       # (n, d) storage dtype (f32 or bf16)
    base: jax.Array,    # (n,) int32 base cluster per point
    cents: jax.Array,   # (C, d) storage dtype
    bt,                 # boundary_threshold scalar
    n_extra: int,
    db: jax.Array | None = None,  # (n,) f32 dist(p, c_base); None = computed
    soar_lambda: float = 0.0,
    interpret: bool = False,
    row_tile: int | None = None,
    cents_prepadded: bool = False,
):
    """Top-``n_extra`` closure replicas per point (squared-L2 metric).
    Returns (idx (n, n_extra) int32, ranks (n, n_extra) f32 ascending);
    missing replicas are (arbitrary id, +inf) — filter by ``isfinite``.

    ``db`` supplies dist(p, c_base) when the caller already measured it
    (the out-of-core contract); otherwise it is computed here with the same
    expansion arithmetic the distance tiles use.  ``soar_lambda`` > 0 ranks
    admitted candidates by the SOAR score D + lambda (r_j.r_1)^2/|r_1|^2
    instead of plain distance (returned values are then scores).

    Rows are processed in bounded tiles: the impl stages ~4 (rows, d_pad)
    arrays (padded rows + base-centroid rows, each plus its transpose) —
    whole-corpus at 1M x 960-d f32 is ~16 GB of staging next to the corpus,
    an OOM on a 16 GB chip.  Per-point independence makes row tiling exact;
    ``row_tile`` (tests) overrides the ~256 MB-per-staging-array default.

    Compile-once shapes: centroids are FAR-bucket-padded (outside the jit —
    tile-loop callers prepad via ``pad_centroids_far`` and pass
    ``cents_prepadded=True``) and every row tile is padded to exactly
    ``row_tile`` rows, so a 1M build reuses one executable per (d, bucket)
    instead of recompiling for each data-dependent cluster count (the r4
    phase profile measured that recompile at ~5-7 s per build)."""
    assert 1 <= n_extra <= _NE8, n_extra
    n, d = X.shape
    d_pad = ((d + 127) // 128) * 128
    if row_tile is None:
        row_tile = max(_BR, (1 << 28) // (d_pad * 4))
    row_tile = ((row_tile + _BR - 1) // _BR) * _BR
    if not cents_prepadded:
        cents = pad_centroids_far(cents)
    soar = float(soar_lambda or 0.0)
    z = jnp.zeros((n,), jnp.float32)
    dbx = db if db is not None else z
    base = jnp.asarray(base, jnp.int32)
    if n <= row_tile:
        n_b = min(_bucket_rows(n), row_tile)
        Xs, bs, dbs = _pad_rows((X, base, dbx), n, n_b)
        oi, od = _replica_topk_impl(
            Xs, bs, cents, bt, dbs,
            n_extra, interpret, db is not None, soar,
        )
        return oi[:n], od[:n]
    outs_i, outs_d = [], []
    for s in range(0, n, row_tile):
        e = min(s + row_tile, n)
        # Uniform tiles (the last one zero-pads): one compiled shape for
        # every n at a given (d, bucket).
        Xs, bs, dbs = _pad_rows(
            (X[s:e], base[s:e], dbx[s:e]), e - s, row_tile
        )
        oi, od = _replica_topk_impl(
            Xs, bs, cents, bt, dbs,
            n_extra, interpret, db is not None, soar,
        )
        outs_i.append(oi[: e - s])
        outs_d.append(od[: e - s])
    return jnp.concatenate(outs_i, axis=0), jnp.concatenate(outs_d, axis=0)
