#!/usr/bin/env bash
# Wait for the TPU tunnel to heal, then run the round-4 on-chip session.
# Probes with a short-timeout trivial matmul every PROBE_SLEEP seconds;
# logs every attempt so the wait is observable.
#
# Usage: bash scripts/tpu_session_wait.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4}"
PROBE_SLEEP="${PROBE_SLEEP:-240}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

i=0
while true; do
  i=$((i+1))
  echo "[$(date +%H:%M:%S)] probe $i" | tee -a "$OUT/wait.log"
  if timeout 120 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256),jnp.bfloat16)@jnp.ones((256,256),jnp.bfloat16)).sum()))" >>"$OUT/wait.log" 2>&1; then
    echo "[$(date +%H:%M:%S)] tunnel healthy after $i probes — starting session" | tee -a "$OUT/wait.log"
    bash scripts/tpu_session_r4.sh "$OUT"
    exit $?
  fi
  echo "[$(date +%H:%M:%S)] probe $i failed/hung; sleeping ${PROBE_SLEEP}s" | tee -a "$OUT/wait.log"
  sleep "$PROBE_SLEEP"
done
