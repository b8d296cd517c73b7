#!/bin/bash
# Idle-machine robustness campaign: loop the threaded stress suite (tight
# interleavings surface races loaded runs hide — two r4 bugs were found
# exactly this way), then grind fresh fuzz seeds via tests/marathon.py.
#
#   bash benchmarks/stress_campaign.sh [STRESS_ITERS] [SEED_LO] [SEED_HI]
#
# IMPORTANT: on failure the FULL pytest output is preserved (an earlier
# ad-hoc loop kept only `tail -2` and destroyed the evidence of a
# 1-in-100 interleaving trip).  Each iteration re-invokes pytest, so
# test-code fixes land mid-campaign without a restart.  Stop with the pid
# file, never by pattern:  kill $(cat /tmp/r4_campaign.pid)
set -u
ITERS=${1:-200}
LO=${2:-200}
HI=${3:-400}
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd "$(dirname "$0")/.."
for i in $(seq 1 "$ITERS"); do
  echo "=== stress iter $i $(date -u +%H:%M:%S)"
  timeout 300 python -m pytest tests/test_concurrent_stress.py -x -q \
    > /tmp/stress_iter.out 2>&1
  rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "STRESS FAILED iter $i rc=$rc — full output follows"
    cat /tmp/stress_iter.out
    exit 1
  fi
  tail -n 1 /tmp/stress_iter.out
done
echo "STRESS LOOP CLEAN ($ITERS iters); marathon seeds [$LO, $HI)"
exec python tests/marathon.py --seeds "$LO" "$HI"
