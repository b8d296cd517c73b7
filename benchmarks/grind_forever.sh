#!/bin/bash
# Keep the idle 1-core host grinding fuzz seeds between TPU windows.
#
# Supervises benchmarks/stress_campaign.sh: when the current campaign
# exits cleanly (seed range exhausted), relaunch it on the next range.
# PERMANENTLY stands down the moment the TPU measurement session fires
# (tunnel_watch.sh touches $SESSION_MARKER before exec'ing the session) —
# the session owns the core from then on.  A campaign that exits non-zero
# with a FAIL in its log also stops the grind: a real fuzz finding must
# be triaged, not ground past.
#
#   bash benchmarks/grind_forever.sh [START_SEED] [RANGE]
set -u
SESSION_MARKER=/tmp/r4_tpu/session_running
PIDFILE=/tmp/r4_campaign.pid
LOG=/tmp/r4_campaign_grind.log
seed=${1:-400}
range=${2:-200}
while true; do
  if [ -e "$SESSION_MARKER" ]; then
    echo "grind: session fired; standing down $(date)" >> "$LOG"
    exit 0
  fi
  if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    sleep 60
    continue
  fi
  # Previous campaign ended.  A FAIL line means a real finding: stop.
  if grep -q "FOUND A FAILURE\|STRESS FAILED" "$LOG" 2>/dev/null; then
    echo "grind: previous campaign found a failure; stopping" >> "$LOG"
    exit 1
  fi
  hi=$((seed + range))
  echo "grind: launching campaign seeds [$seed, $hi) $(date)" >> "$LOG"
  bash benchmarks/stress_campaign.sh 5 "$seed" "$hi" >> "$LOG" 2>&1 &
  echo $! > "$PIDFILE"
  seed=$hi
done
