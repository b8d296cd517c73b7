#!/bin/bash
# Round-5 TPU session B (chained after r5_tpu_session.sh): measure the
# round's code changes on device, then the big deferred artifacts.
#
#   bench_1m_newdef x2  the new headline operating point: batch 8192 +
#                       SOAR-auto + compile-once replica kernels (two
#                       samples — tunnel wall jitter is +-40%)
#   replica_probe2      warm/cold split per case (repeats=2) — verifies
#                       fit/replica_pass is compile-bound no more and the
#                       r4 ABORT doesn't reproduce post-fix
#   gist bf16/int8 A/B  960-d latent-32, back-to-back same-window: int8's
#                       claimed regime (bandwidth-bound rerank); bf16 twin
#                       re-captured in the same code state
#   lazy bf16/int8 A/B  disk-tier staging: int8 slabs halve the per-batch
#                       wire (500k corpus, same synthesized dir)
#   oc100m_dev LAST     the DEEP-100M device build (can eat hours)
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=/tmp/r5_tpu
RESULTS=/root/repo/benchmarks/r5_results
mkdir -p "$OUT" "$RESULTS"
cd /root/repo

probe_or_rearm() {
  if ! timeout 240 python -c "import jax, jax.numpy as jnp; jax.devices(); (jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"; then
    echo "TUNNEL DIED MID-SESSION2 $(date)" >> "$OUT/probe.log"
    exec bash /root/repo/benchmarks/tunnel_watch.sh "${BASH_SOURCE[0]}"
  fi
}

commit_retry() {
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
      cp -f "$json" "$RESULTS/$name.json"
    else
      cp -f "$OUT/$name.log" "$RESULTS/"
    fi
    commit_retry "$name"
  fi
  probe_or_rearm
}

date | tee -a "$OUT/session2_start.log"

# 0. Manhattan 1M x 960 retry on the UNFUSED closure route (the fused
#    program's per-C compile ran minutes and tripped the tunnel RPC
#    deadline at the blocking readback — l1_probe.log; the session-A
#    attempt died there with its GT already cached, so this is build +
#    sweep only).  nq/batch pinned to the r4-comparable operating point.
run_step bench_manhattan3 9000 "$OUT/bench_manhattan3.json" \
  python bench.py --metric Manhattan --dim 960 --latent-dim 32 \
  --nq 4096 --batch 4096

# 1. New headline operating point (new defaults: nq 16384, batch 8192,
#    SOAR auto-0.5, compile-once replica kernels).
run_step bench_1m_newdef 5400 "$OUT/bench_1m_newdef.json" python bench.py
run_step bench_1m_newdef2 5400 "$OUT/bench_1m_newdef2.json" python bench.py

# 2. Replica kernel warm/cold probe post compile-once fix.
run_step replica_probe2 3600 - python benchmarks/replica_probe.py

# 3. GIST-shape 960-d same-window dtype A/B (VERDICT items 4+5).  nq/batch
#    pinned to the r4 operating point (wire-bound at 960-d: bigger batches
#    don't amortize anything — the 345 ms/batch is query bytes).
run_step bench_gist_bf16_r5 9000 "$OUT/bench_gist_bf16_r5.json" \
  python bench.py --dim 960 --latent-dim 32 --nq 4096 --batch 4096
run_step bench_gist_int8_r5 9000 "$OUT/bench_gist_int8_r5.json" \
  python bench.py --dim 960 --latent-dim 32 --nq 4096 --batch 4096 \
  --storage-dtype int8

# 3b. int8 QUERY wire at 960-d: the serve path is query-wire-bound
#     (345 ms/batch = 7.9 MB bf16 queries at tunnel bandwidth); int8 codes
#     + per-query scales halve that again.  Same window as the pair above.
run_step bench_gist_qint8 9000 "$OUT/bench_gist_qint8.json" \
  python bench.py --dim 960 --latent-dim 32 --nq 4096 --batch 4096 \
  --query-wire int8

# 4. Disk-tier staging dtype A/B: int8 slabs halve the per-batch wire.
run_step lazy_bf16 3600 - python benchmarks/lazy_search_bench.py \
  --n 500000 --storage-dtype bfloat16 --dir /root/lazy500k
run_step lazy_int8 3600 - python benchmarks/lazy_search_bench.py \
  --n 500000 --storage-dtype int8 --dir /root/lazy500k

# 5. DEEP-100M device build, LAST (hours of link time).
run_step oc100m_dev 14400 "$OUT/oc100m_dev.json" python benchmarks/outofcore_build_bench.py \
  --n 100000000 --dim 32 --cluster-size 4096 --sample 1000000 --nq 256 \
  --workdir /root/oc100m

date | tee -a "$OUT/session2_end.log"
