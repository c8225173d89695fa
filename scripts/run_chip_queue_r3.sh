#!/bin/bash
# Round-3 session-6 pending chip measurements (docs/PERF.md "pending chip
# rows").  Run unattended when the TPU tunnel is back:
#   nohup bash scripts/run_chip_queue_r3.sh > /tmp/chip_queue.log 2>&1 &
# Each bench runs in its own process (heavy step benches hold two param
# trees; see CLAUDE.md) with a hard timeout; completed compiles are cached
# across processes, so a timed-out cold compile just needs the rerun that
# the retry loop below provides.

set -u
cd "$(dirname "$0")/.."
OUT=${CHIP_QUEUE_OUT:-/tmp/chip_queue_r3}
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name (attempt $attempt): $*" | tee -a "$OUT/summary.log"
    if timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1; then
      echo "--- $name OK" | tee -a "$OUT/summary.log"
      tail -5 "$OUT/$name.log" >> "$OUT/summary.log"
      return 0
    fi
    echo "--- $name FAILED/TIMEOUT (attempt $attempt)" | tee -a "$OUT/summary.log"
    tail -5 "$OUT/$name.log" >> "$OUT/summary.log"
  done
  return 1
}

# 0. tunnel sanity (fast fail if still down)
run probe 300 python -c "import jax; print(jax.devices())" || exit 1

# 1. patch-dropout 0.5 pretraining row (expected ~1.6-1.9x of the 867 img/s
#    bs=128 baseline; vision FLOPs scale with kept tokens 197->99)
run pd05 2400 python scripts/pretrain_bench.py 128 ViT-B-16 10 none infonce 1 0 0.5 0 1

# 2. patch-dropout + full unroll (the two wins should compose)
run pd05_unroll 2400 python scripts/pretrain_bench.py 128 ViT-B-16 10 none infonce 12 0 0.5 0 1

# 3. on-device augmentation row (expected ~free vs the 158 ms step)
run augment 2400 python scripts/pretrain_bench.py 128 ViT-B-16 10 none infonce 1 0 0 1 1

# 4. GradCache accumulation: accum=4 x bs=64 (macro 256) vs plain bs=256
run accum4x64 2400 python scripts/pretrain_bench.py 64 ViT-B-16 10 none infonce 1 0 0 0 4
run plain256 2400 python scripts/pretrain_bench.py 256 ViT-B-16 10 none infonce 1 0 0 0 1

# 5. kernel smoke end-to-end (nothing new kernel-side this session, but the
#    standing rule: interpret mode can't catch Mosaic-only failures)
run e2e 2400 python scripts/tpu_train_e2e.py

# 6. backward profile for the vision 3.78x->3x gap analysis
run bwd_profile 2400 python scripts/bwd_profile.py

echo "=== queue complete ===" | tee -a "$OUT/summary.log"
