#!/bin/bash
# Round-4 TPU measurement session (VERDICT r3 items 1, 3, 4, 5, 6, 7).
# Launched by benchmarks/tunnel_watch.sh the moment the axon tunnel answers.
# RESUMABLE: every step is skipped when its artifact already exists, and a
# quick probe runs between steps — if the tunnel died mid-session the script
# re-arms the watcher instead of burning hours of hangs, and the next fire
# continues where this one stopped.  Artifacts under /tmp/r4_tpu/.
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=/tmp/r4_tpu
mkdir -p "$OUT"
cd /root/repo

probe_or_rearm() {
  if ! timeout 240 python -c "import jax, jax.numpy as jnp; jax.devices(); (jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"; then
    echo "TUNNEL DIED MID-SESSION $(date)" >> "$OUT/probe.log"
    exec bash /root/repo/benchmarks/tunnel_watch.sh
  fi
}

date | tee -a "$OUT/session_start.log"

# 0. verify smoke: toy end-to-end build + reload on the real chip
[ -s "$OUT/ex_build.log" ] || timeout 900 python examples/build_index.py 2>&1 | tail -3 | tee "$OUT/ex_build.log"
[ -s "$OUT/ex_load.log" ] || timeout 600 python examples/load_index.py 2>&1 | tail -3 | tee "$OUT/ex_load.log"
probe_or_rearm

# 1. smoke bench then the 1M headline — THE round deliverable (VERDICT item 1)
[ -s "$OUT/bench_small.json" ] || timeout 1200 python bench.py --small > "$OUT/bench_small.json" 2> "$OUT/bench_small.log"
probe_or_rearm
[ -s "$OUT/bench_1m.json" ] || timeout 5400 python bench.py > "$OUT/bench_1m.json" 2> "$OUT/bench_1m.log"
tail -5 "$OUT/bench_1m.log"; cat "$OUT/bench_1m.json"
probe_or_rearm

# 1b. resident-subdivision A/B (round-4 lever): same 1M build, upload path
[ -s "$OUT/bench_1m_noresident.json" ] || SPF_SUBDIV_RESIDENT=0 timeout 5400 python bench.py > "$OUT/bench_1m_noresident.json" 2> "$OUT/bench_1m_noresident.log"
grep -E "phase|build:" "$OUT/bench_1m_noresident.log" | tail -15
probe_or_rearm

# 1c. int8 residual-SQ tier (round-4 feature): Mosaic-compile the quantized
# rerank kernel, then the 1M headline on int8 slabs (DMA halves vs bf16)
[ -s "$OUT/bench_small_int8.json" ] || timeout 1200 python bench.py --small --storage-dtype int8 > "$OUT/bench_small_int8.json" 2> "$OUT/bench_small_int8.log"
tail -3 "$OUT/bench_small_int8.log"; cat "$OUT/bench_small_int8.json"
probe_or_rearm
[ -s "$OUT/bench_1m_int8.json" ] || timeout 5400 python bench.py --storage-dtype int8 > "$OUT/bench_1m_int8.json" 2> "$OUT/bench_1m_int8.log"
cat "$OUT/bench_1m_int8.json"
probe_or_rearm

# 2. Mosaic compile + replica/assign kernel device timing (VERDICT weak-2)
[ -s "$OUT/replica_bench.log" ] || {
  timeout 1200 python benchmarks/replica_bench.py --n 1000000 --c 12500 --dim 128 2>&1 | tee "$OUT/replica_bench.log"
  timeout 1200 python benchmarks/replica_bench.py --n 500000 --c 50000 --dim 96 --dtype float32 2>&1 | tee -a "$OUT/replica_bench.log"
}
probe_or_rearm

# 3. top-k rounds crossover -> wire-or-delete smallest_k_rounds (VERDICT weak-3)
[ -s "$OUT/topk_bench.log" ] || timeout 900 python benchmarks/topk_bench.py --q 4096 --c 12500 2>&1 | tee "$OUT/topk_bench.log"
probe_or_rearm

# 4. mr=4 vs mr=8 clean-window 1M pair (VERDICT weak-7; mr=4 run is step 1's)
[ -s "$OUT/bench_mr8.json" ] || timeout 5400 python bench.py --max-replicas 8 > "$OUT/bench_mr8.json" 2> "$OUT/bench_mr8.log"
cat "$OUT/bench_mr8.json"
probe_or_rearm

# 5. SOAR at the 1M operating point -> default decision (VERDICT weak-4)
[ -s "$OUT/soar_1m.log" ] || timeout 7200 python benchmarks/soar_sweep.py --n 1000000 --nq 2000 --lambdas 0,0.5,1 --nprobes 4,8,16 2>&1 | tee "$OUT/soar_1m.log"
probe_or_rearm

# 6. Manhattan 0.90 on the GIST-realistic latent manifold (VERDICT weak-5)
[ -s "$OUT/bench_manhattan.json" ] || timeout 7200 python bench.py --metric Manhattan --dim 960 --latent-dim 32 > "$OUT/bench_manhattan.json" 2> "$OUT/bench_manhattan.log"
cat "$OUT/bench_manhattan.json"
probe_or_rearm

# 7. criterion-parity 1M row, probe cap removed (VERDICT weak-6)
[ -s "$OUT/criterion_1m.json" ] || timeout 7200 python benchmarks/clustering_benchmark.py --sizes 1000000 --json "$OUT/criterion_1m.json" 2>&1 | tee "$OUT/criterion_1m.log"
probe_or_rearm

# 8. QPS batch sweep (upload/compute overlap through the tunnel)
for B in 2048 1024; do
  [ -s "$OUT/bench_b$B.json" ] || timeout 3600 python bench.py --batch "$B" > "$OUT/bench_b$B.json" 2> "$OUT/bench_b$B.log"
  probe_or_rearm
done
# 8b. Throughput-optimal query-set size: larger nq amortizes the fixed
# per-call dispatch + upload overhead (the measured tunnel bottleneck).
for NQ in 8192 16384; do
  [ -s "$OUT/bench_nq$NQ.json" ] || timeout 3600 python bench.py --nq "$NQ" > "$OUT/bench_nq$NQ.json" 2> "$OUT/bench_nq$NQ.log"
  probe_or_rearm
done

# 9. DEEP-100M BUILD half (VERDICT weak-7; serve half proven on CPU):
# 100M rows x 32-d, coarse clusters to bound the streamed-assign FLOPs.
[ -s "$OUT/oc100m.json" ] || timeout 14400 python benchmarks/outofcore_build_bench.py \
  --n 100000000 --dim 32 --cluster-size 4096 --sample 1000000 --nq 256 \
  --workdir /root/oc100m > "$OUT/oc100m.json" 2> "$OUT/oc100m.log"
cat "$OUT/oc100m.json"

date | tee -a "$OUT/session_end.log"
