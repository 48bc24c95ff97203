#!/usr/bin/env bash
# Round-4 session-13 decider batch: re-tune the decode schedule knobs under
# the NEW layout defaults (split KV cache + heads-last, flipped session 12 —
# the old optima unroll=4 / B=64 were decided on the pre-flip program), plus
# the train-step half of the heads-last A/B that the r4i session died before
# printing.  Decider protocol: --iters 8 --reps 7 interleaved (session-6
# methodology; n=3 reads carry +/-6-8% on this tunnel).
# Waits for the tunnel to heal first, so it can be launched while wedged.
# Usage: bash scripts/tpu_session_r4j.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4j}"
PROBE_SLEEP="${PROBE_SLEEP:-180}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

i=0
while true; do
  i=$((i+1))
  echo "[$(date +%H:%M:%S)] probe $i" | tee -a "$OUT/session.log"
  if timeout 120 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256),jnp.bfloat16)@jnp.ones((256,256),jnp.bfloat16)).sum()))" >>"$OUT/session.log" 2>&1; then
    echo "[$(date +%H:%M:%S)] tunnel healthy after $i probes" | tee -a "$OUT/session.log"
    break
  fi
  echo "[$(date +%H:%M:%S)] probe $i failed/hung; sleeping ${PROBE_SLEEP}s" | tee -a "$OUT/session.log"
  sleep "$PROBE_SLEEP"
  if [ "$i" -ge 40 ]; then
    echo "tunnel never healed after $i probes — giving up" | tee -a "$OUT/session.log"
    exit 1
  fi
done

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s): $*" | tee -a "$OUT/session.log"
  start=$(date +%s)
  timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  rc=$?
  echo "=== $name rc=$rc ($(( $(date +%s) - start ))s)" | tee -a "$OUT/session.log"
  tail -3 "$OUT/$name.out" | tee -a "$OUT/session.log"
}

# 1. unroll re-tune under the new layout: is 4 still >= 6?
run unroll_4v6 4200 python scripts/bench_pack_ab.py \
    --what unroll --unroll 4 --unroll-b 6 --iters 8 --reps 7 --batch 64

# 2. and does a higher unroll now win (shorter step body after the flips)?
run unroll_8v4 4200 python scripts/bench_pack_ab.py \
    --what unroll --unroll 8 --unroll-b 4 --iters 8 --reps 7 --batch 64

# 3. batch-size re-check at the new step cost: 64 vs 96
run batch_64v96 4200 python scripts/bench_pack_ab.py \
    --what batchsize --batch 64 --batch-b 96 --iters 8 --reps 7

# 4. train-step heads-last attribution (the half r4i never printed)
run trainheads 4200 python scripts/bench_pack_ab.py \
    --what trainheads --iters 8 --reps 7 --batch 32

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
