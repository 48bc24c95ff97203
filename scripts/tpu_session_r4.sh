#!/usr/bin/env bash
# Round-4 on-chip measurement session: run everything the round needs from
# the TPU in one pass, tolerating individual failures (the tunnel wedges).
# Results land in $OUT (default /tmp/tpu_r4); summarize into BENCH.md after.
#
# Usage: bash scripts/tpu_session_r4.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/session.log"
  local t0=$SECONDS
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/session.log"
  tail -3 "$OUT/$name.out" | tee -a "$OUT/session.log"
  return $rc
}

# 0. health check — bail early if the tunnel is wedged
run health 180 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256),jnp.bfloat16)@jnp.ones((256,256),jnp.bfloat16)).sum()))" || {
  echo "tunnel unhealthy — aborting session" | tee -a "$OUT/session.log"; exit 1; }

# 1. the round's headline: hardened bench.py (the driver capture rehearsal)
run bench 3600 python bench.py

# 2. per-op decode costs: per-head vs block-diagonal cross-attention
run decodeops 2400 python scripts/bench_pack_ab.py --what decodeops --batch 64 --reps 3

# 3. full-program A/Bs (shipped defaults on both sides except the knob)
run bdcross 2400 python scripts/bench_pack_ab.py --what bdcross --batch 64 --reps 3 --unroll 6
run regroupmm 2400 python scripts/bench_pack_ab.py --what regroupmm --batch 64 --reps 3 --unroll 6

# 4. on-chip AOT bundle smoke (export on CPU, serve on the chip, one HTTP
#    response) — VERDICT r3 #4
run bundle_smoke 2400 python scripts/bundle_smoke.py

# 5. pipelined batcher A/B at a decode-bound operating point (small int8
#    grids so the tunnel H2D doesn't drown decode) — VERDICT r3 #6
run batcher_d1 1800 python scripts/bench_serving.py --clients 32 --requests 96 --pipeline-depth 1 --feat-int8 1 --dv 256 --t-clips 8
run batcher_d2 1800 python scripts/bench_serving.py --clients 32 --requests 96 --pipeline-depth 2 --feat-int8 1 --dv 256 --t-clips 8

# 6. extractor MFU push: batch sweep past 128, bf16 — VERDICT r3 #8 —
#    and the space-to-depth stem A/B (BIST_STEM_S2D, round 4: the 7^3
#    C_in=3 stem is ~43% of network FLOPs; s2d is the exact reformulation)
run extractor_128 1800 python scripts/bench_extractor.py --batch 128 --bf16 1
run extractor_192 1800 python scripts/bench_extractor.py --batch 192 --bf16 1
run extractor_256 1800 python scripts/bench_extractor.py --batch 256 --bf16 1
run extractor_128_nos2d 1800 env BIST_STEM_S2D=0 \
    python scripts/bench_extractor.py --batch 128 --bf16 1

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
