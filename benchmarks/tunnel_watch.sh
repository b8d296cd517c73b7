#!/bin/bash
# Probe the axon tunnel every 2 minutes; when it answers a real matmul,
# hand off to the measurement session.  A dead tunnel hangs python at
# interpreter start (sitecustomize registration), so every probe is bounded.
SESSION=${1:-/root/repo/benchmarks/r4_tpu_session.sh}
LOG=/tmp/r4_tpu/probe.log
mkdir -p /tmp/r4_tpu
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
y = (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
print('live:', d[0])
" >> "$LOG" 2>&1; then
    echo "TUNNEL LIVE $(date)" >> "$LOG"
    # The 1-core host must belong to the TPU session: stop any CPU-side
    # stress/fuzz campaign before firing (pid file, never pattern-kill).
    # Kill the WHOLE TREE by parent-pid walk — killing just the campaign
    # bash orphans its running marathon/pytest python, which would hog
    # the core for hours alongside the measurement session.
    kill_tree() {
      local p
      for p in $(ps -o pid= --ppid "$1" 2>/dev/null); do kill_tree "$p"; done
      kill "$1" 2>/dev/null
    }
    # Stands down the grind supervisor permanently (grind_forever.sh).
    touch /tmp/r4_tpu/session_running
    if [ -f /tmp/r4_campaign.pid ]; then
      kill_tree "$(cat /tmp/r4_campaign.pid)"
      rm -f /tmp/r4_campaign.pid
      echo "campaign stopped for session $(date)" >> "$LOG"
    fi
    exec bash "$SESSION"
  fi
  echo "dead $(date)" >> "$LOG"
  sleep 120
done
