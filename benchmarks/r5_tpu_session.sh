#!/bin/bash
# Round-5 TPU session A: the quick device decisions first, then the two
# artifacts VERDICT r4 named as the round's missing evidence.
#
#   smoke        warm the (wiped) compile cache, prove the session works
#   b8192/b16384 the upward half of the query-batch sweep (VERDICT item 8:
#                b1024/b2048 measured the downward half; ~60 ms dispatch
#                amortization says bigger batches should win through the
#                tunnel)
#   1m + soar    a same-window SOAR QPS A/B pair (VERDICT item 3: the r4
#                pair straddled different weather windows — engine QPS 84k
#                vs 67k — so the default decision was confounded)
#   manhattan2   Manhattan 1M x 960 latent-32 on device (VERDICT item 2:
#                staged in r4 session2, never ran)
#   rerank       the int8 rerank-cost bisect (staged in r4, never ran)
#
# Session B (r5_tpu_session2.sh) carries the replica-kernel recapture, the
# 960-d int8 A/B, and the DEEP-100M device build once the compile-once
# replica work lands.
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=/tmp/r5_tpu
RESULTS=/root/repo/benchmarks/r5_results
mkdir -p "$OUT" "$RESULTS"
cd /root/repo

probe_or_rearm() {
  if ! timeout 240 python -c "import jax, jax.numpy as jnp; jax.devices(); (jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"; then
    echo "TUNNEL DIED MID-SESSION $(date)" >> "$OUT/probe.log"
    exec bash /root/repo/benchmarks/tunnel_watch.sh "${BASH_SOURCE[0]}"
  fi
}

commit_retry() {
  # The main working session may hold the git index; retry a few times.
  local n
  for n in 1 2 3; do
    ( cd /root/repo \
      && git add benchmarks/r5_results \
      && git commit -q -m "r5 session artifact: $1" -- benchmarks/r5_results ) \
      && return 0
    sleep 7
  done
  return 0
}

run_step() {
  local name="$1" tmo="$2" json="$3"; shift 3
  if [ -e "$OUT/$name.ok" ]; then return 0; fi
  local rc
  if [ "$json" = "-" ]; then
    timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1; rc=$?
    tail -5 "$OUT/$name.log"
  else
    timeout "$tmo" "$@" > "$json" 2> "$OUT/$name.log"; rc=$?
    tail -5 "$OUT/$name.log"; cat "$json"
  fi
  if [ "$rc" -eq 0 ] && { [ "$json" = "-" ] || ! grep -q '"error"' "$json"; }; then
    touch "$OUT/$name.ok"
    if [ "$json" != "-" ]; then
      cp -f "$json" "$RESULTS/"
    else
      cp -f "$OUT/$name.log" "$RESULTS/"
    fi
    commit_retry "$name"
  fi
  probe_or_rearm
}

date | tee -a "$OUT/session_start.log"

# 0. Smoke + compile-cache warm (the VM restart wiped /tmp/jax_cache).
run_step bench_small 1800 "$OUT/bench_small.json" python bench.py --small

# 1. Upward batch sweep: 2x8192 and 1x16384 over the same 16384 queries.
run_step b8192 3600 "$OUT/b8192.json" python bench.py --nq 16384 --batch 8192
run_step b16384 3600 "$OUT/b16384.json" python bench.py --nq 16384 --batch 16384

# 2. Same-window SOAR A/B (back to back; same corpus seed, same weather).
run_step bench_1m_r5 3600 "$OUT/bench_1m_r5.json" python bench.py
run_step bench_1m_soar_r5 3600 "$OUT/bench_1m_soar_r5.json" \
  python bench.py --soar-lambda 0.5

# 3. Manhattan 1M x 960 latent-32 on device (BASELINE config 4's missing
#    row; dispatch-bounded L1 closure groups landed in r4 after the first
#    attempt tripped the tunnel RPC deadline).
run_step bench_manhattan2 9000 "$OUT/bench_manhattan2.json" \
  python bench.py --metric Manhattan --dim 960 --latent-dim 32

# 4. int8 rerank-cost bisect at the 1M serving geometry.
run_step rerank_bench 1800 - \
  python benchmarks/rerank_bench.py --c 10775 --pad 240 --q 4096

date | tee -a "$OUT/session_end.log"
