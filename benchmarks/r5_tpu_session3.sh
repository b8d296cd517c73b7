#!/bin/bash
# Round-5 TPU session C: waits for session B to finish, then runs the
# Manhattan 1M retry on the memory-bounded unfused closure route and the
# deferred DEEP-100M device build (oc100m_dev was pre-marked .ok in
# session B so the Manhattan fix could land first).
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=/tmp/r5_tpu
RESULTS=/root/repo/benchmarks/r5_results
mkdir -p "$OUT" "$RESULTS"
cd /root/repo

# Wait for session B (writes session2_end.log as its last step).
while [ ! -e "$OUT/session2_end.log" ]; do sleep 60; done

probe_or_rearm() {
  if ! timeout 240 python -c "import jax, jax.numpy as jnp; jax.devices(); (jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"; then
    echo "TUNNEL DIED MID-SESSION3 $(date)" >> "$OUT/probe.log"
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

date | tee -a "$OUT/session3_start.log"

# 1. Manhattan 1M x 960 on the memory-bounded unfused closure route
#    (GT cached; ~27k-row groups, ~1.5 s + ~1 GB per dispatch).
run_step bench_manhattan4 9000 "$OUT/bench_manhattan4.json" \
  python bench.py --metric Manhattan --dim 960 --latent-dim 32 \
  --nq 4096 --batch 4096

# 2. DEEP-100M device build (deferred from session B).
run_step oc100m_dev2 18000 "$OUT/oc100m_dev2.json" python benchmarks/outofcore_build_bench.py \
  --n 100000000 --dim 32 --cluster-size 4096 --sample 1000000 --nq 256 \
  --workdir /root/oc100m

date | tee -a "$OUT/session3_end.log"
