#!/usr/bin/env bash
# Round-4 session-12 TPU batch: (1) does jax.profiler device tracing work
# over the axon tunnel at all (would give direct per-fusion evidence for the
# op-latency-floor claim, BENCH.md round 4)?  (2) open-loop serving
# latency-vs-offered-load curve at the decode-bound operating point
# (--dv 256 --t-clips 8 --feat-int8 1, the r4c loopback regime) — where is
# the knee, and what do p50/p99 look like on either side of it?
# Usage: bash scripts/tpu_session_r4h.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4h}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

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

run health 180 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256),jnp.bfloat16)@jnp.ones((256,256),jnp.bfloat16)).sum()))" || {
  echo "tunnel unhealthy — aborting session" | tee -a "$OUT/session.log"; exit 1; }

run profiler_probe 300 python - <<'EOF'
import glob, os
import jax, jax.numpy as jnp

x = jnp.ones((512, 512), jnp.bfloat16)
f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
print("warm:", float(f(x)))
out = "/tmp/jxtrace_r4h"
os.makedirs(out, exist_ok=True)
with jax.profiler.trace(out):
    print("traced:", float(f(x)))
files = glob.glob(out + "/**/*", recursive=True)
print("trace files:", len([p for p in files if os.path.isfile(p)]))
for p in sorted(files)[:10]:
    print(" ", p, os.path.getsize(p) if os.path.isfile(p) else "(dir)")
EOF

run load_sweep 3000 python scripts/bench_serving.py \
    --dv 256 --t-clips 8 --feat-int8 1 --max-batch 64 --max-wait-ms 10 \
    --load-sweep 60,120,180,240,300 --sweep-requests 240

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
