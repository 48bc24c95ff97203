#!/usr/bin/env bash
# Round-4 follow-up on-chip measurements (run after tpu_session_r4.sh):
#  - decodeops rerun with the n_op=512 chain (the 64-op chain's (2n-n)
#    difference measured 0.0 us under tunnel RTT jitter)
#  - finer beam-scan unroll probe around the shipped 6 (4 and 8; round 3
#    swept 1/6/12)
# Usage: bash scripts/tpu_session_r4c.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4c}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/session.log"
  local t0=$SECONDS
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/session.log"
  tail -4 "$OUT/$name.out" | tee -a "$OUT/session.log"
  return $rc
}

run health 180 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256),jnp.bfloat16)@jnp.ones((256,256),jnp.bfloat16)).sum()))" || {
  echo "tunnel unhealthy — aborting session" | tee -a "$OUT/session.log"; exit 1; }

run decodeops 2400 python scripts/bench_pack_ab.py --what decodeops --batch 64 --reps 3
# retry: the main-session run died on a transient remote-compile drop
run regroupmm 2400 python scripts/bench_pack_ab.py --what regroupmm --batch 64 --reps 3 --unroll 6
run unroll4 2400 python scripts/bench_pack_ab.py --what unroll --unroll 4 --batch 64 --reps 3
run unroll8 2400 python scripts/bench_pack_ab.py --what unroll --unroll 8 --batch 64 --reps 3

# pipelined-batcher A/B, interleaved in ONE process/tunnel window (the
# separate-process main-session runs measured 216.9 vs 65.2 req/s for the
# same workload — tunnel weather, not the knob)
run batcher_ab 2400 python scripts/bench_serving.py --clients 32 --requests 192 \
    --ab 4 --pipeline-depth 2 --feat-int8 1 --dv 256 --t-clips 8

# space-to-depth stem A/B, interleaved in one window (separate-process
# extractor runs vary with tunnel weather: 3054/2211/2747 clips/s at
# batch 128/192/256 in adjacent minutes of the main session)
run s2d_ab 2400 python scripts/bench_extractor.py --batch 128 --bf16 1 --ab-s2d 1 --reps 3

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
