"""Bisect the real-Mosaic replica-kernel abort (round-4 session finding).

`benchmarks/replica_bench.py --n 1000000 --c 12500 --dim 128` died with
``ABORTED: TPU backend error`` at result readback after its pallas timing
loop — the backend process itself went down (the next session step ran
fine, so the damage is process-scoped).  The 1M builds in the same session
succeeded, so either the in-build pallas call works and the bench's
4-calls-back-to-back staging churn kills the tunnel allocator, or the
in-build call silently fell back to XLA (bench.py now records
``replica_engine`` to answer that for future artifacts).

This probe runs each hypothesis in its OWN SUBPROCESS so one abort cannot
poison the next measurement:

  size sweep   one pallas call + readback at n = 100k / 500k / 1M
  bt sweep     build-realistic bt=1.1 vs the bench's bt=4.0 at 1M
  churn        4 back-to-back calls at 1M (the bench's exact pattern)
  assign       pallas_nearest_centroid at 1M (the out-of-core base pass)
  xla          the XLA fused pass at 1M (control)

    python benchmarks/replica_probe.py            # full table
    python benchmarks/replica_probe.py --one size_100k   # single case
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

# repeats=2 splits compile/cache-load time (first call) from steady-state
# execution (second): the r4 "bt anomaly" (9.15 s at bt=1.1 vs 1.83 s at
# bt=4.0, same shapes, bt traced) was the first 1M case paying two cold
# row-tile compiles while the second hit the disk cache.  Post-r5 the
# kernels are compile-once (bucketed shapes), so the first call should be
# cold exactly once per (d, bucket) across ALL cases.
CASES = {
    "size_100k": dict(kind="pallas", n=100_000, bt=1.1, repeats=2),
    "size_500k": dict(kind="pallas", n=500_000, bt=1.1, repeats=2),
    "size_1m": dict(kind="pallas", n=1_000_000, bt=1.1, repeats=2),
    "bt4_1m": dict(kind="pallas", n=1_000_000, bt=4.0, repeats=2),
    "churn_1m": dict(kind="pallas", n=1_000_000, bt=4.0, repeats=4),
    "assign_1m": dict(kind="assign", n=1_000_000, bt=0.0, repeats=2),
    "xla_1m": dict(kind="xla", n=1_000_000, bt=4.0, repeats=2),
}


def run_case(case: dict) -> dict:
    """Executes IN THIS PROCESS; called via --one in a subprocess."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from spfresh_tpu.clustering.hierarchical import _final_replica_pass_fused
    from spfresh_tpu.ops.pallas.replica import (
        pallas_nearest_centroid,
        pallas_replica_topk,
    )

    n, c, dim, ne = case["n"], 12_500, 128, 3
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, dim)).astype(np.float32)
    cents = X[rng.integers(0, n, c)]
    base = rng.integers(0, c, n).astype(np.int32)
    Xd = jnp.asarray(X, jnp.bfloat16)
    Cd = jnp.asarray(cents, jnp.bfloat16)
    Bd = jnp.asarray(base)
    jax.block_until_ready((Xd, Cd, Bd))
    interp = jax.devices()[0].platform != "tpu"

    def call():
        if case["kind"] == "pallas":
            return pallas_replica_topk(
                Xd, Bd, Cd, case["bt"], ne, interpret=interp
            )
        if case["kind"] == "assign":
            return pallas_nearest_centroid(Xd, Cd, interpret=interp)
        tile = min(n, max(256, (1 << 28) // c))
        return _final_replica_pass_fused(
            Xd, Bd, Cd, "Euclidean", jnp.float32(case["bt"]), ne,
            tile, -(-n // tile),
        )

    times = []
    out = None
    for _ in range(case["repeats"]):
        t0 = time.perf_counter()
        out = jax.block_until_ready(call())
        times.append(time.perf_counter() - t0)
    # The crash site in replica_bench was the host READBACK — exercise it.
    host = np.asarray(out[1])
    finite = int(np.isfinite(host).sum()) if case["kind"] != "assign" else -1
    return {"ok": True, "times_s": [round(t, 2) for t in times],
            "finite": finite}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None, help="run one case in-process")
    ap.add_argument("--cases", default=",".join(CASES))
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    if args.one:
        print(json.dumps({"case": args.one, **run_case(CASES[args.one])}))
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
        except subprocess.TimeoutExpired as e:
            # A hung case (dead-ish tunnel, minutes-long cold Mosaic compile)
            # must not kill the whole probe: record it and keep bisecting —
            # the r5 session-D run died here on its FIRST case and lost the
            # other six rows.
            wall = time.perf_counter() - t0
            tail = (e.stderr or b"")
            if isinstance(tail, bytes):
                tail = tail.decode("utf-8", "replace")
            results[name] = {"ok": False, "rc": "timeout",
                             "wall_s": round(wall, 1),
                             "stderr_tail": tail.strip().splitlines()[-3:]}
            print(f"{name:12s} TIMEOUT after {wall:.0f}s", flush=True)
            continue
        wall = time.perf_counter() - t0
        line = (proc.stdout or "").strip().splitlines()
        payload = None
        if line:
            try:
                payload = json.loads(line[-1])
            except json.JSONDecodeError:
                pass
        if proc.returncode == 0 and payload:
            results[name] = payload
            print(f"{name:12s} OK   {payload['times_s']} s "
                  f"finite={payload['finite']:,}", flush=True)
        else:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            results[name] = {"ok": False, "rc": proc.returncode,
                             "wall_s": round(wall, 1), "stderr_tail": tail}
            print(f"{name:12s} FAIL rc={proc.returncode} after {wall:.0f}s")
            for t in tail:
                print(f"    {t}", flush=True)
    print(json.dumps({"replica_probe": results}))


if __name__ == "__main__":
    main()
