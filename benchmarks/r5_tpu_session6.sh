#!/bin/bash
# Round-5 TPU session F: prove the warm-cache 1M build wall with tonight's
# replica fixes (bf16 inputs, prepadded cents, radix budget sort, fused
# assign+medoid), then spend whatever window remains on the DEEP-100M
# device build.
#
#   bench_1m_warm1   warms the new executables (cold Mosaic/XLA compiles)
#   bench_1m_warm2   THE capture: warm-cache wall + sub-phase decomposition
#   oc100m_dev       VERDICT item 2's second half, last (longest)
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=/tmp/r5_tpu
RESULTS=/root/repo/benchmarks/r5_results
mkdir -p "$OUT" "$RESULTS"
cd /root/repo

probe_or_rearm() {
  if ! timeout 240 python -c "import jax, jax.numpy as jnp; jax.devices(); (jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"; then
    echo "TUNNEL DIED MID-SESSION6 $(date)" >> "$OUT/probe.log"
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

date | tee -a "$OUT/session6_start.log"

# 1+2. Warm-cache 1M pair: first run compiles tonight's new shapes, the
#      second is the measured warm wall.
run_step bench_1m_warm1 3600 "$OUT/bench_1m_warm1.json" python bench.py
run_step bench_1m_warm2 3600 "$OUT/bench_1m_warm2.json" python bench.py

# 3. DEEP-100M device build with whatever window remains.
rm -f "$OUT/oc100m_dev.ok"
run_step oc100m_dev 28800 "$OUT/oc100m_dev.json" python benchmarks/outofcore_build_bench.py \
  --n 100000000 --dim 32 --cluster-size 4096 --sample 1000000 --nq 256 \
  --workdir /root/oc100m

date | tee -a "$OUT/session6_end.log"
