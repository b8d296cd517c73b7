#!/bin/bash
# Round-5 TPU session D (fresh VM; /tmp + compile cache wiped mid-round):
# every remaining device artifact, ordered by VERDICT-r4 priority.
#
#   smoke          prove the session + re-warm the wiped compile cache
#   manhattan4     Manhattan 1M x 960 latent-32 (VERDICT item 2) on the
#                  memory-bounded unfused L1 closure route (b9bc1e2);
#                  GT recomputes (~300 s) — the /tmp cache was wiped
#   replica_probe2 warm/cold split per case — confirms fit/replica_pass is
#                  compile-bound no more (VERDICT item 3 device confirm)
#   gist A/B/C     960-d latent-32 same-window: bf16 / int8 slabs / int8
#                  query wire (VERDICT items 4+5 — int8's claimed regime)
#   lazy A/B       disk-tier staging dtype pair (same synthesized dir)
#   oc100m_dev     the DEEP-100M device build, LAST (VERDICT item 2)
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=/tmp/r5_tpu
RESULTS=/root/repo/benchmarks/r5_results
mkdir -p "$OUT" "$RESULTS"
cd /root/repo

probe_or_rearm() {
  if ! timeout 240 python -c "import jax, jax.numpy as jnp; jax.devices(); (jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"; then
    echo "TUNNEL DIED MID-SESSION4 $(date)" >> "$OUT/probe.log"
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
  # Steps whose artifact already landed in a previous session: skip.
  if [ "$json" != "-" ] && [ -s "$RESULTS/$name.json" ]; then
    touch "$OUT/$name.ok"; return 0
  fi
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

date | tee -a "$OUT/session4_start.log"

# 0. Smoke + compile-cache warm.
run_step bench_small 1800 "$OUT/bench_small2.json" python bench.py --small

# 1. Manhattan 1M x 960 latent-32 (memory-bounded unfused closure route).
run_step bench_manhattan4 12000 "$OUT/bench_manhattan4.json" \
  python bench.py --metric Manhattan --dim 960 --latent-dim 32 \
  --nq 4096 --batch 4096

# 2. Replica kernel warm/cold probe post compile-once fix.
run_step replica_probe2 3600 - python benchmarks/replica_probe.py

# 3. GIST-shape 960-d same-window dtype A/B + int8 query wire.
run_step bench_gist_bf16_r5 9000 "$OUT/bench_gist_bf16_r5.json" \
  python bench.py --dim 960 --latent-dim 32 --nq 4096 --batch 4096
run_step bench_gist_int8_r5 9000 "$OUT/bench_gist_int8_r5.json" \
  python bench.py --dim 960 --latent-dim 32 --nq 4096 --batch 4096 \
  --storage-dtype int8
run_step bench_gist_qint8 9000 "$OUT/bench_gist_qint8.json" \
  python bench.py --dim 960 --latent-dim 32 --nq 4096 --batch 4096 \
  --query-wire int8

# 4. Disk-tier staging dtype A/B: int8 slabs halve the per-batch wire.
run_step lazy_bf16 3600 - python benchmarks/lazy_search_bench.py \
  --n 500000 --storage-dtype bfloat16 --dir /root/lazy500k
run_step lazy_int8 3600 - python benchmarks/lazy_search_bench.py \
  --n 500000 --storage-dtype int8 --dir /root/lazy500k

# 5. DEEP-100M device build, LAST (hours of link time).
run_step oc100m_dev 28800 "$OUT/oc100m_dev.json" python benchmarks/outofcore_build_bench.py \
  --n 100000000 --dim 32 --cluster-size 4096 --sample 1000000 --nq 256 \
  --workdir /root/oc100m

date | tee -a "$OUT/session4_end.log"
