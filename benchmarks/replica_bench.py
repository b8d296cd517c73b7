"""Closure-replica pass micro-benchmark: XLA fused pass vs Pallas kernel.

The replica pass was the largest single device phase of the 1M build
(12.8 s in the r3 phase profile) and of the 20M out-of-core build (1068 s);
its MXU floor is well under a second.  This harness times both engines at
build-representative shapes on the attached device.

    python benchmarks/replica_bench.py --n 1000000 --c 12500 --dim 128
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

from spfresh_tpu.clustering.hierarchical import _final_replica_pass_fused
from spfresh_tpu.ops.pallas.replica import pallas_replica_topk


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--c", type=int, default=12_500)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--n-extra", type=int, default=3)
    p.add_argument("--bt", type=float, default=4.0)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--engines", default="pallas,xla")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    X = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    cents = X[rng.integers(0, args.n, args.c)] + 0.05 * rng.standard_normal(
        (args.c, args.dim)
    ).astype(np.float32)
    base = rng.integers(0, args.c, args.n).astype(np.int32)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    Xd = jnp.asarray(X, dt)
    Cd = jnp.asarray(cents, dt)
    Bd = jnp.asarray(base)
    jax.block_until_ready((Xd, Cd, Bd))
    interp = jax.devices()[0].platform != "tpu"

    def run(engine):
        if engine == "pallas":
            return pallas_replica_topk(
                Xd, Bd, Cd, args.bt, args.n_extra, interpret=interp
            )
        tile = min(args.n, max(256, (1 << 28) // args.c))
        idx, d = _final_replica_pass_fused(
            Xd, Bd, Cd, "Euclidean", jnp.float32(args.bt), args.n_extra,
            tile, -(-args.n // tile),
        )
        return idx, d

    results = {}
    for engine in args.engines.split(","):
        out = jax.block_until_ready(run(engine))  # compile
        best = min(
            (lambda t0: (jax.block_until_ready(run(engine)), time.perf_counter() - t0))(
                time.perf_counter()
            )[1]
            for _ in range(3)
        )
        results[engine] = (best, out)
        n_rep = int(np.isfinite(np.asarray(out[1])).sum())
        print(f"{engine:7s}  {best * 1e3:9.1f} ms   replicas={n_rep:,}")
    if len(results) == 2:
        (ti, oi), (tx, ox) = results["pallas"], results["xla"]
        same = np.array_equal(
            np.isfinite(np.asarray(oi[1])), np.isfinite(np.asarray(ox[1]))
        )
        agree = float(
            (np.asarray(oi[0]) == np.asarray(ox[0]))[
                np.isfinite(np.asarray(ox[1]))
            ].mean()
        )
        print(f"speedup {tx / ti:.1f}x   finite-match={same} idx-agree={agree:.6f}")


if __name__ == "__main__":
    main()
