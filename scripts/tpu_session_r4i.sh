#!/usr/bin/env bash
# Round-4 session-12 decider batch: the two profile-motivated decode LAYOUT
# options (BIST_SPLIT_CACHE per-layer KV tuples; BIST_HEADS_LAST attention
# layout) measured at DECIDER precision (--iters 8 --reps 7, the session-6
# protocol) on the v5e, plus the open-loop serving load sweep that session
# 12's r4h plan staged.  Order: the combined flip decides the default
# (layoutcombo), the two singles attribute the win.
# Waits for the tunnel to heal first (probe loop), so it can be launched
# while the tunnel is wedged.
# Usage: bash scripts/tpu_session_r4i.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4i}"
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

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/session.log"
  local t0=$SECONDS
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/session.log"
  tail -12 "$OUT/$name.out" | tee -a "$OUT/session.log"
  return $rc
}

run layoutcombo 4200 python scripts/bench_pack_ab.py \
    --what layoutcombo --iters 8 --reps 7 --batch 64

run splitcache 4200 python scripts/bench_pack_ab.py \
    --what cachelayout --iters 8 --reps 7 --batch 64

run headslast 4200 python scripts/bench_pack_ab.py \
    --what headslast --iters 8 --reps 7 --batch 64

run load_sweep 3000 python scripts/bench_serving.py \
    --dv 256 --t-clips 8 --feat-int8 1 --max-batch 64 --max-wait-ms 10 \
    --load-sweep 60,120,180,240,300 --sweep-requests 240

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
