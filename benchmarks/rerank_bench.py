"""Rerank-kernel dtype A/B: bf16 slabs vs int8 residual slabs (IVF-SQ8).

The r4 session measured engine QPS at the 1M operating point regressing
~4x under int8 storage (11,452 vs 45,412) while stage 1 (centroid scan)
and stage 3 (merge) are storage-dtype-independent — the suspect is the
quantized rerank path.  This bench isolates `padded_rerank_distances` at
the exact serving geometry and also times the full fused search step per
dtype, so the regression is attributable to a stage, not a guess.

    python benchmarks/rerank_bench.py --c 10775 --pad 240 --q 4096
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spfresh_tpu.ops.pallas.rerank import padded_rerank_distances


def bench(fn, *args, reps=5, **kw):
    out = jax.block_until_ready(fn(*args, **kw))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--c", type=int, default=10775)
    p.add_argument("--pad", type=int, default=240)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--q", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=8)
    args = p.parse_args()

    C, pad, d, Q, nprobe = args.c, args.pad, args.d, args.q, args.nprobe
    interp = jax.devices()[0].platform != "tpu"
    rng = np.random.default_rng(0)

    cents = rng.standard_normal((C, d)).astype(np.float32)
    resid = rng.standard_normal((C, pad, d)).astype(np.float32)
    scales_c = (np.abs(resid).max(axis=(1, 2)) / 127.0).astype(np.float32)
    codes = np.clip(
        np.rint(resid / scales_c[:, None, None]), -127, 127
    ).astype(np.int8)
    slabs_bf16 = jnp.asarray(
        cents[:, None, :] + resid, jnp.bfloat16
    )                                               # (C, pad, d)
    slabs_int8 = jnp.asarray(codes)
    queries = jnp.asarray(rng.standard_normal((Q, d)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, C, (Q, nprobe)).astype(np.int32))
    scales = jnp.asarray(scales_c)[rows]            # (Q, nprobe)
    qc = queries[:, None, :] - jnp.asarray(cents)[rows]  # (Q, nprobe, d)
    jax.block_until_ready((slabs_bf16, slabs_int8, queries, rows, scales, qc))

    gb = Q * nprobe * pad * d / 1e9  # slab elements touched, in billions
    t_bf, _ = bench(
        padded_rerank_distances, queries, rows, slabs_bf16,
        interpret=interp,
    )
    print(
        f"bf16  rerank {t_bf * 1e3:8.2f} ms   "
        f"{gb * 2 / t_bf:7.1f} GB/s slab stream", flush=True,
    )
    t_i8, _ = bench(
        padded_rerank_distances, queries, rows, slabs_int8,
        interpret=interp, scales=scales, centered_queries=qc,
    )
    print(
        f"int8  rerank {t_i8 * 1e3:8.2f} ms   "
        f"{gb * 1 / t_i8:7.1f} GB/s slab stream   "
        f"ratio {t_i8 / t_bf:4.2f}x", flush=True,
    )
    # Cost isolation: int8 slabs through the FLOAT kernel path (wrong math,
    # right cost structure) — separates the int8->f32 convert + int8 VMEM
    # relayout cost from the quantized variant's extra machinery (per-probe
    # centered-query block, dynamic qc row select, scale multiply).
    t_i8f, _ = bench(
        padded_rerank_distances, queries, rows, slabs_int8,
        interpret=interp,
    )
    print(
        f"int8-as-float (cost probe, wrong math) {t_i8f * 1e3:8.2f} ms   "
        f"ratio {t_i8f / t_bf:4.2f}x vs bf16", flush=True,
    )
    # And the quantized machinery at f32 convert cost: bf16 slabs through
    # the QUANTIZED path with scale=1 codes (bf16 'codes' are just the
    # residuals; math valid).
    slabs_resid = jnp.asarray(resid, jnp.bfloat16)
    ones = jnp.ones_like(scales)
    t_bfq, _ = bench(
        padded_rerank_distances, queries, rows, slabs_resid,
        interpret=interp, scales=ones, centered_queries=qc,
    )
    print(
        f"bf16-residual-quantized-path {t_bfq * 1e3:8.2f} ms   "
        f"ratio {t_bfq / t_bf:4.2f}x vs bf16", flush=True,
    )
    # Expansion-form IVF-SQ8 (int8-MXU): quantized centered queries, the
    # r.qc dot on the MXU, per-element VPU work ~1 op (f32-accum) or 0
    # (native int8).  Each guarded: a Mosaic refusal prints FAIL and the
    # earlier rows stand.
    from spfresh_tpu.ops.pallas.rerank import (
        padded_rerank_distances_int8mxu,
        quantize_centered_queries,
    )

    codesT = jnp.asarray(np.ascontiguousarray(codes.transpose(0, 2, 1)))
    norms2 = jnp.asarray(
        (codes.astype(np.int64) ** 2).sum(axis=2).astype(np.int32)
    )
    qcodes, qscale, qnorm2 = quantize_centered_queries(
        queries, jnp.asarray(cents), rows
    )
    jax.block_until_ready((codesT, norms2, qcodes, qscale, qnorm2))
    for name, native in (("int8-mxu-f32acc", False), ("int8-mxu-native", True)):
        try:
            t_mxu, _ = bench(
                padded_rerank_distances_int8mxu,
                qcodes, qscale, qnorm2, rows, codesT, norms2,
                jnp.asarray(scales_c), interpret=interp, native_int8=native,
            )
            print(
                f"{name} {t_mxu * 1e3:8.2f} ms   "
                f"{gb * 1 / t_mxu:7.1f} GB/s slab stream   "
                f"ratio {t_mxu / t_bf:4.2f}x vs bf16   "
                f"{t_mxu / t_i8:4.2f}x vs int8-elementwise", flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report, keep earlier rows
            print(f"{name} FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
