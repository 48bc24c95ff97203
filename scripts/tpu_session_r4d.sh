#!/usr/bin/env bash
# Round-4 decision measurements (after tpu_session_r4c.sh):
#  - unroll 8 vs 6 HEAD-TO-HEAD in one window (r4c measured 8 -> 1.227x and
#    4 -> 1.064x vs unroll=1 in separate windows; 6 is the shipped default
#    from round 3's 1/6/12 sweep — this decides whether the default moves)
#  - space-to-depth stem A/B retry (r4c run produced no output in 2400s —
#    mid-session tunnel wedge; smaller chains this time)
# Usage: bash scripts/tpu_session_r4d.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4d}"
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

run unroll8v6 2400 python scripts/bench_pack_ab.py --what unroll \
    --unroll 8 --unroll-b 6 --batch 64 --reps 3

run s2d_ab 3000 python scripts/bench_extractor.py --batch 128 --bf16 1 \
    --ab-s2d 1 --iters 4 --reps 3

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
