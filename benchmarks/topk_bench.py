"""smallest_k (lax.top_k sort) vs smallest_k_rounds (k argmin rounds).

Decides by measurement whether stage-1 probe selection (top-nprobe over the
(Q, C) centroid distance matrix) should route through the rounds variant at
small nprobe.  Run on the attached device:

    python benchmarks/topk_bench.py --q 4096 --c 12500
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from spfresh_tpu.ops.topk import smallest_k, smallest_k_rounds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--q", type=int, default=4096)
    p.add_argument("--c", type=int, default=12500)
    p.add_argument("--ks", default="4,8,16,32")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    D = jnp.asarray(rng.standard_normal((args.q, args.c)).astype(np.float32))
    jax.block_until_ready(D)
    # flush every line: the r4 session's run was killed by its timeout and
    # block-buffered stdout would have eaten any progress evidence.
    print(f"(Q, C) = ({args.q}, {args.c})", flush=True)
    for k in (int(s) for s in args.ks.split(",")):
        rows = {}
        for name, fn in (("top_k", smallest_k), ("rounds", smallest_k_rounds)):
            print(f"  compiling {name} k={k} ...", file=sys.stderr, flush=True)
            out = jax.block_until_ready(fn(D, k))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = jax.block_until_ready(fn(D, k))
                ts.append(time.perf_counter() - t0)
            rows[name] = (min(ts), out)
        (tt, ot), (tr, orr) = rows["top_k"], rows["rounds"]
        same = np.array_equal(np.asarray(ot[1]), np.asarray(orr[1]))
        print(
            f"k={k:3d}  top_k {tt * 1e3:7.2f} ms   rounds {tr * 1e3:7.2f} ms"
            f"   speedup {tt / tr:4.2f}x   identical={same}",
            flush=True,
        )


if __name__ == "__main__":
    main()
