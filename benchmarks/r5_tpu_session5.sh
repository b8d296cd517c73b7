#!/bin/bash
# Round-5 TPU session E: fires after session D (PID in /tmp/session4.pid)
# exits.  Steps, by VERDICT-r4 priority:
#
#   replica_probe3   retry of the session-D probe that hung on its first
#                    case (the probe now records per-case TIMEOUTs and
#                    keeps bisecting); decides VERDICT item 3's
#                    execution-half question
#   bench_1m_final   fresh 1M headline: budget_sort (u64 radix) in the
#                    replica pass + replica/* sub-phase decomposition in
#                    the artifact
#   session4 sweep   re-exec session D — its run_step skips every landed
#                    artifact and re-runs only what failed (gist/lazy/
#                    oc100m stragglers)
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=/tmp/r5_tpu
RESULTS=/root/repo/benchmarks/r5_results
mkdir -p "$OUT" "$RESULTS"
cd /root/repo

probe_or_rearm() {
  if ! timeout 240 python -c "import jax, jax.numpy as jnp; jax.devices(); (jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"; then
    echo "TUNNEL DIED MID-SESSION5 $(date)" >> "$OUT/probe.log"
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

date | tee -a "$OUT/session5_start.log"

# 1. Fresh 1M headline: u64-radix budget sort + fused assign+medoid +
#    replica/* sub-phase rows (the 128-d decomposition VERDICT item 3 needs).
run_step bench_1m_final 3600 "$OUT/bench_1m_final.json" python bench.py

# 2. Replica probe retry (per-case timeouts survive now and record TIMEOUT
#    rows; the step budget is capped so a wedged case can't starve step 3).
run_step replica_probe3 3600 - python benchmarks/replica_probe.py

# 3. Sweep session D's stragglers (each landed step skips itself).  The
#    oc100m skip-gate (dropped into $OUT so session D exits after the lazy
#    pair instead of starving these quick steps) is lifted first so the
#    sweep runs the 100M device build with whatever window remains.
rm -f "$OUT/oc100m_dev.ok"
bash /root/repo/benchmarks/r5_tpu_session4.sh

date | tee -a "$OUT/session5_end.log"
