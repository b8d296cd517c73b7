"""Bisect the Manhattan-1M closure-pass device fault (r4 + r5 sessions).

Both rounds' Manhattan 1M x 960 builds died ``UNAVAILABLE: TPU device
error`` at the FIRST dispatch-bounded closure group's readback
(hierarchical._replica_pass_xla), while the same build's earlier phases —
which also route L1 through the Pallas pairwise kernel — and the 620 s
Manhattan ground-truth scan all ran clean.  The failing group is
(rows ~12,083, C ~10,775, d 960, bf16): this probe runs each suspect in
its own subprocess at exactly that shape.

  pairwise   pallas_l1_linf_pairwise alone (x-tile vs cents)
  topk       lax.top_k over the (rows, C) masked matrix alone
  fused      one _final_replica_pass_fused group (the failing dispatch)
  fused_sm   same at half the rows (dispatch-seconds hypothesis)
  fused_xla  same group with the Pallas pairwise disabled (oracle route)

    python benchmarks/l1_probe.py              # full table
    python benchmarks/l1_probe.py --one fused  # single case
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS, C, D = 12_083, 10_775, 960

CASES = ("pairwise", "topk", "fused", "fused_sm", "fused_xla")


def run_case(name: str) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    rows = ROWS // 2 if name == "fused_sm" else ROWS
    rng = np.random.default_rng(0)
    X = jnp.asarray(
        rng.standard_normal((rows, D)).astype(np.float32), jnp.bfloat16
    )
    cents = jnp.asarray(
        rng.standard_normal((C, D)).astype(np.float32), jnp.bfloat16
    )
    base = jnp.asarray(rng.integers(0, C, rows).astype(np.int32))
    jax.block_until_ready((X, cents, base))

    if name == "fused_xla":
        # Force the jnp broadcast route inside the fused pass (hierarchical
        # binds pairwise_distance at import, so patch ITS module global).
        import spfresh_tpu.ops.distances as dmod
        import spfresh_tpu.clustering.hierarchical as hmod

        def no_pallas(x, y, metric="Euclidean", tile_n=1024, exact=False):
            return dmod._elementwise_pairwise(
                x, y, dmod.canonical_metric(metric), tile_n
            )

        hmod.pairwise_distance = no_pallas

    times = []
    for rep in range(2):
        t0 = time.perf_counter()
        if name == "pairwise":
            from spfresh_tpu.ops.pallas.pairwise import pallas_l1_linf_pairwise

            out = pallas_l1_linf_pairwise(X, cents, "Manhattan")
        elif name == "topk":
            Dm = jnp.broadcast_to(
                jnp.arange(C, dtype=jnp.float32)[None, :], (rows, C)
            ) + jnp.arange(rows, dtype=jnp.float32)[:, None]
            out = jax.lax.top_k(-Dm, 3)[0]
        else:
            from spfresh_tpu.clustering.hierarchical import (
                _final_replica_pass_fused,
            )

            out = _final_replica_pass_fused(
                X, base, cents, "Manhattan", jnp.float32(1.1), 3, rows, 1
            )
        out = jax.block_until_ready(out)
        times.append(round(time.perf_counter() - t0, 2))
    host = np.asarray(out[1] if isinstance(out, tuple) else out)
    return {"ok": True, "times_s": times, "sum": float(np.sum(host[:8]))}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None)
    ap.add_argument("--cases", default=",".join(CASES))
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    if args.one:
        print(json.dumps({"case": args.one, **run_case(args.one)}))
        return
    results = {}
    for name in args.cases.split(","):
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, timeout=args.timeout + 60,
                cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "rc": "timeout",
                             "wall_s": round(time.perf_counter() - t0, 1)}
            print(f"{name:10s} TIMEOUT after {args.timeout + 60}s", flush=True)
            continue
        wall = time.perf_counter() - t0
        lines = (proc.stdout or "").strip().splitlines()
        payload = None
        if lines:
            try:
                payload = json.loads(lines[-1])
            except json.JSONDecodeError:
                pass
        if proc.returncode == 0 and payload:
            results[name] = payload
            print(f"{name:10s} OK   {payload['times_s']} s", flush=True)
        else:
            tail = (proc.stderr or "").strip().splitlines()[-4:]
            results[name] = {"ok": False, "rc": proc.returncode,
                             "wall_s": round(wall, 1), "stderr_tail": tail}
            print(f"{name:10s} FAIL rc={proc.returncode} after {wall:.0f}s")
            for t in tail:
                print(f"    {t}", flush=True)
    print(json.dumps({"l1_probe": results}))


if __name__ == "__main__":
    main()
