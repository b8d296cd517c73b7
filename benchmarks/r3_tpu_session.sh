#!/bin/bash
# Round-3 TPU measurement session — run when the axon tunnel recovers.
# Each step appends to /tmp/r3_tpu/: keep partial results if weather dies.
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p /tmp/r3_tpu
cd /root/repo

# 0. tunnel probe + verify drive recipe (finish the /verify TPU leg)
timeout 120 python -c "import jax,time; t0=time.time(); print(jax.devices(), time.time()-t0)" |& tee /tmp/r3_tpu/probe.log || exit 1
timeout 600 python examples/build_index.py |& tail -3 | tee /tmp/r3_tpu/ex_build.log
timeout 300 python examples/load_index.py  |& tail -3 | tee /tmp/r3_tpu/ex_load.log

# 1. Mosaic compile check + replica kernel speedup at 1M shapes
timeout 900 python benchmarks/replica_bench.py --n 1000000 --c 12500 --dim 128 |& tee /tmp/r3_tpu/replica_bench.log
# 1b. out-of-core shape (f32 HIGHEST route)
timeout 900 python benchmarks/replica_bench.py --n 500000 --c 50000 --dim 96 --dtype float32 |& tee -a /tmp/r3_tpu/replica_bench.log

# 2. top-k rounds crossover (stage-1 candidate)
timeout 600 python benchmarks/topk_bench.py --q 4096 --c 12500 |& tee /tmp/r3_tpu/topk_bench.log

# 3. smoke + headline bench (phase profile shows the replica-kernel effect)
timeout 900 python bench.py --small |& tee /tmp/r3_tpu/bench_small.log
timeout 3600 python bench.py > /tmp/r3_tpu/bench_1m.json 2> /tmp/r3_tpu/bench_1m.log

# 4. QPS batch sweep (upload/compute overlap through the tunnel)
for B in 4096 2048 1024 512; do
  timeout 3600 python bench.py --batch $B > /tmp/r3_tpu/bench_b$B.json 2> /tmp/r3_tpu/bench_b$B.log
done

# 5. SOAR at the 1M operating point (same build shapes as bench)
timeout 7200 python benchmarks/soar_sweep.py --n 1000000 --nq 2000 --lambdas 0,1 --nprobes 4,8,16 |& tee /tmp/r3_tpu/soar_1m.log
