"""Micro-bench: stage-1 centroid probe at large C (>=100k centroids).

Compares the dense (Q, C) distance matrix + lax.top_k against the chunked
streaming scan (running top-nprobe merge) that the search kernels switch to
past LARGE_C_THRESHOLD.

    python benchmarks/centroid_scan_bench.py [--c 131072] [--q 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=131_072)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8192)
    args = ap.parse_args()

    from spfresh_tpu.ops.distances import pairwise_distance
    from spfresh_tpu.ops.topk import chunked_centroid_topk, smallest_k

    rng = np.random.default_rng(0)
    cents = jnp.asarray(rng.standard_normal((args.c, args.dim)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((args.q, args.dim)).astype(np.float32))
    valid = jnp.ones((args.c,), bool)
    jax.block_until_ready((cents, q))

    @jax.jit
    def dense(q, cents, valid):
        D = pairwise_distance(q, cents, "Euclidean")
        D = jnp.where(valid[None, :], D, jnp.inf)
        return smallest_k(D, args.nprobe)

    def run(fn, *a, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        best = min(
            (lambda t0: (jax.block_until_ready(fn(*a, **kw)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        return out, best

    (dd, di), t_dense = run(dense, q, cents, valid)
    (cd, ci), t_chunk = run(
        chunked_centroid_topk, q, cents, valid, args.nprobe, "Euclidean",
        chunk=args.chunk,
    )
    np.testing.assert_allclose(np.asarray(cd), np.asarray(dd), rtol=1e-5)
    print(
        f"C={args.c} Q={args.q} nprobe={args.nprobe}: "
        f"dense={t_dense*1e3:.1f}ms chunked={t_chunk*1e3:.1f}ms "
        f"speedup={t_dense/t_chunk:.2f}x"
    )


if __name__ == "__main__":
    main()
