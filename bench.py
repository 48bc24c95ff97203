#!/usr/bin/env python
"""Benchmark: AVSD response-generation throughput (responses/sec/chip).

The BASELINE.json north star is generation throughput — the reference decodes
batch-1, beam-5, re-running its full decoder over the whole prefix per
hypothesis per step on a GPU (reference model/decode.py:53-104,
generate.py:112); this framework decodes batches of turns through one
compiled lax.scan beam search with KV caching and precomputed cross-attention
K/V.

Setup: flagship reference configuration (d_model=128, att_h=8, 3/3/3 blocks,
summary caption, pointer generator; reference scripts/exec.sh:24-37), beam=5,
maxlen=12, nbest=5 (exec.sh:50-53).  Dispatch is CHAINED by default (one jit
call per clip-count bucket runs its whole share of the schedule as a
lax.scan of beam batches): this harness reaches its TPU through a tunnel
whose per-call dispatch overhead would otherwise leak into the measurement
(mostly pipelined by async dispatch; measured +5% at B=64, larger at small
batches); a production host dispatches in microseconds and the chip-side
work per response is identical.  BENCH_CHAIN=0 restores per-call dispatch.
Inputs are real AVSD test-set turns (vendored
dstc7avsd_eval/data/test_set4DSTC7-AVSD.json — real question / history /
caption lengths) with randomly initialised weights and random ResNeXt-grid
features in bfloat16 (quality is covered by the metric goldens and training
tests, not this benchmark).  Everything is padded to ONE static shape so the
search compiles exactly once (jit cache), and host→device feature transfers
overlap device compute via async dispatch.

vs_baseline: measured against REFERENCE_GPU_RESP_PER_SEC = 2.0, a documented
estimate of the reference's single-GPU generation throughput (batch-1 beam-5
re-encode decoding at ~0.5 s/turn); BASELINE.json's target is ≥10× ⇒
vs_baseline ≥ 10 means target met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (+
"value_per_call_lower_bound", a short per-call-dispatch probe on the dominant
bucket, when chained mode is on — ADVICE r2 #4: both dispatch bases explicit;
+ "tier": "full" | "quick").

Resilience (rounds 4-5): the TPU tunnel this harness runs over occasionally
fails backend init or wedges for minutes (CLAUDE.md; the round-3 driver
capture died on the FIRST device op with rc=1/no JSON, and the round-4
capture was killed by the DRIVER's timeout while the launcher was still
health-probing a wedge, rc=124).  `python bench.py` therefore runs as a
LAUNCHER: it health-checks the backend in a throwaway subprocess
(60s-timeout trivial matmul, retried with backoff), runs the actual
benchmark as a child process (`bench.py --run`) with a per-attempt timeout,
and ALWAYS prints one well-formed JSON line — with an "error" field instead
of dying — so the capture parses no matter what the tunnel does.

TWO protocol tiers (VERDICT r4 #1):
  full  — the multi-bucket 16-batch schedule above (~3-6 min of healthy
          tunnel: 4 T-bucket stagings + per-(bucket, chain-length) compiles
          + the per-call probe).
  quick — fallback when full attempts fail: the single DOMINANT T bucket
          only, one staged batch, one chained program (fixed chain length so
          the persistent XLA cache prewarmed by a prior run hits), no
          per-call probe.  Needs ~60-90 s of healthy tunnel with a warm
          cache; a short heal window late in the capture still yields a
          real (honestly-labelled) number instead of 0.0.
The launcher tries full once (when the remaining deadline affords it plus a
reserved quick slot), then quick until the deadline.  The deadline default is
calibrated UNDER any plausible driver timeout (1500 s) so the launcher's own
JSON — success or error — always lands with rc=0 before the driver kills it
(round 4's failure mode).  Knobs: BENCH_ATTEMPTS (3), BENCH_ATTEMPT_TIMEOUT
(700 s, full tier), BENCH_QUICK_TIMEOUT (420 s), BENCH_DEADLINE (1500 s),
BENCH_TIER=quick forces quick-only.
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_GPU_RESP_PER_SEC = 2.0
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

HEALTH_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256), jnp.bfloat16);"
    "print(float((x @ x).sum()))"
)

# quick-tier chain length: FIXED (not weather-tuned) so the compiled chained
# program is byte-identical across runs and the persistent XLA cache
# prewarmed by rehearsals/prior attempts hits (seconds instead of minutes)
QUICK_CHAIN = 32
QUICK_REPS = 2


def _health_check(timeout=90):
    """One trivial matmul in a throwaway subprocess (the CLAUDE.md recipe):
    proves the backend initialises AND a host fetch completes.  A subprocess
    because jax caches backend-init failures in-process."""
    try:
        r = subprocess.run([sys.executable, "-c", HEALTH_SRC], cwd=HERE,
                           capture_output=True, text=True, timeout=timeout)
        return r.returncode == 0, (r.stderr or "")[-2000:]
    except subprocess.TimeoutExpired:
        return False, f"health check timed out after {timeout}s (tunnel wedge?)"


def _extract_json_line(text):
    for ln in reversed(text.splitlines()):
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    return None


def _fail_line(err):
    return json.dumps({
        "metric": "avsd_generation_throughput",
        "value": 0.0,
        "unit": "responses/sec/chip (BENCHMARK FAILED — see error field)",
        "vs_baseline": 0.0,
        "error": (err or "")[-1500:] or "backend never became healthy",
    })


def _plan_attempt(attempt, remaining, full_timeout, quick_timeout,
                  forced_tier=""):
    """Pick (tier, budget_seconds) for this attempt, or (None, 0) to stop.

    Policy: the FIRST attempt runs the full protocol iff the remaining
    deadline affords the full timeout PLUS a reserved quick slot (so a full
    failure still leaves room for the fallback); everything else is quick.
    Pure function — unit-tested in tests/test_bench_launcher.py."""
    margin = 90.0          # JSON-emission + teardown headroom
    if remaining < 60 + margin:
        return None, 0.0
    quick_reserve = quick_timeout + margin
    if forced_tier == "quick":
        tier = "quick"
    elif forced_tier == "full":
        tier = "full"
    else:
        tier = ("full" if attempt == 1
                and remaining > full_timeout + quick_reserve else "quick")
    budget = full_timeout if tier == "full" else quick_timeout
    budget = min(budget, remaining - margin)
    return tier, max(60.0, budget)


def launcher():
    import signal

    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    full_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "700"))
    quick_timeout = float(os.environ.get("BENCH_QUICK_TIMEOUT", "420"))
    forced_tier = os.environ.get("BENCH_TIER", "")
    deadline = time.time() + float(os.environ.get("BENCH_DEADLINE", "1500"))
    last_err = ""

    # If the CALLER times us out (SIGTERM) mid-retry, still emit the one
    # parseable JSON line before dying — a capture with an error record
    # beats a capture with a truncated traceback (round 3's failure mode).
    def on_term(signum, frame):
        print(_fail_line(last_err or "killed by caller (SIGTERM) mid-run"),
              flush=True)
        sys.exit(0)

    def emit(line):
        # block SIGTERM BEFORE printing so a kill landing between the real
        # result line and process exit cannot trigger on_term's second JSON
        # line — the capture invariant is exactly ONE line on stdout
        signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGTERM})
        print(line, flush=True)

    signal.signal(signal.SIGTERM, on_term)
    # readiness marker for harnesses that SIGTERM the launcher (the JSON-on-
    # kill guarantee only holds once the handler above is installed)
    print("[bench] launcher ready", file=sys.stderr, flush=True)
    # test-only hook: substitute the benchmark child with an injected
    # `python -c` snippet (argv[1] = tier) so the full→quick fallback wiring
    # is testable without an accelerator
    test_child = os.environ.get("BENCH_TEST_CHILD", "")
    skip_health = os.environ.get("BENCH_SKIP_HEALTH", "") == "1"

    for attempt in range(1, attempts + 1):
        # wait until the backend passes a health check (wedges self-heal in
        # minutes; backend-init failures are transient).  Backoff stays short
        # (45→120 s) so a late heal still leaves room for a quick attempt.
        if not skip_health:
            backoff = 45
            while True:
                ok, err = _health_check(timeout=min(
                    90, max(30, deadline - time.time() - 120)))
                if ok:
                    break
                last_err = err
                print(f"[bench] health check failed; retrying in {backoff}s: "
                      f"{err.splitlines()[-1] if err else '?'}",
                      file=sys.stderr)
                if time.time() + backoff > deadline - 180:
                    break
                time.sleep(backoff)
                backoff = min(backoff * 2, 120)
            if not ok:
                break
        tier, budget = _plan_attempt(attempt, deadline - time.time(),
                                     full_timeout, quick_timeout, forced_tier)
        if tier is None:
            break
        if test_child:
            cmd = [sys.executable, "-c", test_child, tier]
        else:
            cmd = [sys.executable, __file__, "--run"]
            if tier == "quick":
                cmd.append("--quick")
        print(f"[bench] attempt {attempt}: tier={tier} budget={budget:.0f}s",
              file=sys.stderr, flush=True)
        try:
            r = subprocess.run(cmd, cwd=HERE, capture_output=True, text=True,
                               timeout=budget)
            sys.stderr.write(r.stderr[-8000:])
            parsed = _extract_json_line(r.stdout)
            if r.returncode == 0 and parsed is not None:
                emit(json.dumps(parsed))
                return 0
            last_err = (f"attempt {attempt} ({tier}): rc={r.returncode}, "
                        f"stdout tail: {r.stdout[-500:]!r}, "
                        f"stderr tail: {r.stderr[-1500:]!r}")
        except subprocess.TimeoutExpired:
            last_err = (f"attempt {attempt} ({tier}): benchmark child timed "
                        f"out after {budget:.0f}s")
        print(f"[bench] {last_err[:300]}", file=sys.stderr)
        if time.time() > deadline - 150:
            break
        time.sleep(float(os.environ.get("BENCH_RETRY_SLEEP", "30")))
    # final failure: still ONE parseable JSON line (the round-3 capture
    # failed precisely because a raw traceback replaced this line)
    emit(_fail_line(last_err))
    return 0

# one static shape: covers the AVSD test distribution (queries ≤32, summary
# captions ≤64, histories clipped to 256, ≤40 clips of (16, 2048))
LQ, LH, LC, T_CLIPS, S = 32, 256, 64, 40, 16
DV = 2048


def main(quick=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent XLA compilation cache (BIST_XLA_CACHE=0 disables).  Verified
    # under the axon backend: a fresh process recompiling the beam program
    # hits the on-disk executable (8.96 s cold -> 1.61 s warm, B=8 probe), so
    # a prewarmed cache cuts this child's remote-compile warmup to seconds —
    # less time on the tunnel = less exposure to the wedge failure mode the
    # launcher exists to ride out.  The QUICK tier depends on this: its one
    # program uses a fixed chain length precisely so reruns are cache hits.
    from bist_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bist_tpu.config import GenerateConfig
    from bist_tpu.data.avsd import load_avsd
    from bist_tpu.data.batching import Batch, pad_to
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.models.model import init_model
    from bist_tpu.vocab import get_vocabulary
    from __graft_entry__ import _flagship_cfg

    test_json = os.path.join(HERE, "dstc7avsd_eval", "data",
                             "test_set4DSTC7-AVSD.json")
    vocab = get_vocabulary(test_json, cutoff=3, include_caption="summary")
    cfg = _flagship_cfg(vocab_size=len(vocab), dv=DV)
    data = load_avsd(test_json, vocab, include_caption="summary",
                     separate_caption=True, undisclosed_only=True)

    B = int(os.environ.get("BENCH_BATCH", "64"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "16"))
    # bf16 KV cache = the serving default (1.68x measured, BENCH.md round 3;
    # BENCH_CACHE_DTYPE=float32 restores the bit-parity cache)
    # scan_unroll=4: beam-scan body replication, identical numerics.  The
    # full ladder at decider precision (iters=16/reps=7 interleaved, BENCH.md
    # round 4 session 6): 4 beats 6 (1.041x), 3 (1.016x), 8 (6 beat 8 0.942x)
    # and ties 2/12; 8's earlier reps=3 win (1.017x) was inside the noise
    # band.  BENCH_UNROLL=1 restores the plain loop.
    gcfg = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                          cache_dtype=os.environ.get("BENCH_CACHE_DTYPE",
                                                     "bfloat16"),
                          encode_dtype=os.environ.get("BENCH_ENCODE_DTYPE",
                                                      ""),
                          scan_unroll=int(os.environ.get("BENCH_UNROLL",
                                                         "4")))

    # random bf16 feature grids with realistic clip counts, reused across
    # turns (feature *content* does not affect timing); each turn is assigned
    # a clip count drawn per-vid
    rng = np.random.default_rng(0)
    t_buckets = (16, 24, 32, 40)
    pool = {}
    for t in t_buckets:
        g = rng.standard_normal((t, S, DV)).astype(np.float32)
        pool[t] = np.asarray(g, dtype=jnp.bfloat16)
    turn_T = rng.integers(8, T_CLIPS + 1, size=len(data.examples))

    def t_bucket(t):
        for b in t_buckets:
            if t <= b:
                return b
        return t_buckets[-1]

    def make_batch_rows(idx_rows, t_pad):
        examples = [data.examples[i] for i in idx_rows]
        dummy = np.full((B, 1), 2, np.int32)
        q = pad_to([e.question[:LQ] for e in examples], LQ)
        h = pad_to([e.history[-LH:] for e in examples], LH)
        c = pad_to([e.caption[:LC] for e in examples], LC)
        fts = np.zeros((B, t_pad, S, DV), dtype=jnp.bfloat16)
        for r, i in enumerate(idx_rows):
            t = min(int(turn_T[i]), t_pad)
            fts[r, :t] = pool[t_pad][:t]
        return Batch(query=q, his=h, trg=dummy, trg_y=dummy, cap=c,
                     fts=fts, audio_fts=None)

    # clip-count-grouped batching (the serving analogue of the training
    # loader's length grouping): batches pad to their own T bucket, cutting
    # transferred bytes vs padding everything to the global max
    order = np.argsort([t_bucket(t) for t in turn_T], kind="stable")
    all_batches = []
    for s in range(0, len(order), B):
        rows = order[s:s + B]
        if len(rows) < B:
            break
        t_pad = t_bucket(max(int(turn_T[i]) for i in rows))
        all_batches.append((rows, t_pad))
    # one representative batch per T bucket, weighted by bucket frequency in
    # the timed loop — keeps staged bytes minimal (this harness's tunnel is
    # slow and flaky under volume) while measuring the full T spectrum
    from collections import Counter, OrderedDict

    bucket_count = Counter(t for _, t in all_batches)
    total = sum(bucket_count.values())
    t_main = max(bucket_count, key=lambda t: bucket_count[t])

    rep: "OrderedDict[int, Batch]" = OrderedDict()
    for rows, t_pad in all_batches:
        if t_pad not in rep:
            if quick and t_pad != t_main:
                continue          # quick tier: the dominant bucket ONLY
            rep[t_pad] = make_batch_rows(rows, t_pad)
    schedule = []
    for t_pad in rep:
        k = max(1, round(n_batches * bucket_count[t_pad] / total))
        schedule += [t_pad] * k

    params = jax.device_put(init_model(jax.random.PRNGKey(0), cfg))
    beam_jit = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))

    # Stage the batches on device OUTSIDE the timed region.  Rationale: in
    # the full pipeline the ResNeXt-101 extraction stage (extract_features.py)
    # runs on the same chip, so the dialogue model consumes feature grids
    # already resident in HBM; host→device feature shipping is not part of
    # the serving path.  (It also is the honest choice under this harness,
    # whose tunnelled H2D link runs at ~0.05-0.14 GB/s vs the ≥10 GB/s of a
    # real TPU host — timing it would benchmark the tunnel, not the
    # framework: decode compute is ~70 ms/batch, the tunnel transfer ~2.7 s.)
    staged = {}
    for t_pad, b in rep.items():
        staged[t_pad] = jax.device_put(b)
        jax.block_until_ready(staged[t_pad].fts)

    # Two dispatch modes:
    #   chained (default): ONE jit call per T bucket runs that bucket's whole
    #     share of the schedule as a lax.scan of beam batches (consecutive
    #     iterations made data-dependent via an unprovably-zero perturbation,
    #     so XLA cannot CSE them — BENCH.md methodology note).  This removes
    #     this harness's ~15 ms/call remote-dispatch RTT (tunnelled TPU) from
    #     the measurement; a production host dispatches in microseconds, and
    #     chip-side work per response is identical.
    #   BENCH_CHAIN=0: one host dispatch per batch (includes the tunnel's
    #     per-call RTT; round-1/2 behaviour).
    chained = os.environ.get("BENCH_CHAIN", "1") != "0"
    from collections import Counter as _C

    sched_count = _C(schedule)

    if chained or quick:
        from functools import partial

        from bist_tpu.utils.benchtime import unprovable_zero

        @partial(jax.jit, static_argnames="n")
        def beam_chain(p, b, n):
            def body(c, _):
                b2 = b._replace(query=b.query + unprovable_zero(c))
                r = beam_search(p, cfg, b2, gcfg)
                return c + jnp.sum(r.scores), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        if quick:
            # QUICK TIER: one program (dominant bucket, FIXED chain length —
            # prewarmed-cache hit), one warm call, QUICK_REPS timed calls.
            # Total healthy-tunnel need: backend init + one batch staging +
            # one (cached) compile + ~1 s device time.
            b = staged[t_main]
            float(beam_chain(params, b, n=QUICK_CHAIN))       # warm/compile
            t0 = time.time()
            for _ in range(QUICK_REPS):
                float(beam_chain(params, b, n=QUICK_CHAIN))   # fetch = sync
            dt = time.time() - t0
            rps = QUICK_REPS * QUICK_CHAIN * B / dt
            print(json.dumps({
                "metric": "avsd_generation_throughput",
                "value": round(rps, 2),
                "unit": ("responses/sec/chip (QUICK TIER fallback: beam=5, "
                         "maxlen=12, d_model=128, "
                         f"{gcfg.cache_dtype} KV cache, "
                         f"scan_unroll={gcfg.scan_unroll}, single dominant "
                         f"T={t_main} bucket, chained dispatch, features "
                         "staged in HBM — full multi-bucket protocol "
                         "attempts failed this window)"),
                "vs_baseline": round(rps / REFERENCE_GPU_RESP_PER_SEC, 2),
                "tier": "quick",
            }))
            return

        # warm up one compile per distinct (T bucket, chain length)
        for t_pad, k in sched_count.items():
            float(beam_chain(params, staged[t_pad], n=k))
        n_resp = 0
        t0 = time.time()
        outs = []
        for t_pad, k in sched_count.items():
            outs.append(beam_chain(params, staged[t_pad], n=k))
            n_resp += k * B
        for o in outs:
            float(o)             # drain
        dt = time.time() - t0
        # Per-call probe (ADVICE r2 #4: make the comparison basis explicit).
        # A short per-call-dispatch measurement on the most frequent T bucket
        # — includes this harness's ~15 ms/call tunnel RTT, so it is a
        # conservative lower bound on what a production host (µs dispatch)
        # would see; the reference 2.0/s estimate is per-call on a local host.
        np.asarray(beam_jit(params, staged[t_main]).scores)   # warm compile
        k_probe = 8
        t0 = time.time()
        probe = [beam_jit(params, staged[t_main]) for _ in range(k_probe)]
        for r in probe:
            np.asarray(r.scores)
        rps_per_call = k_probe * B / (time.time() - t0)
    else:
        # warm up one compile per distinct T bucket
        for t_pad, batch in staged.items():
            np.asarray(beam_jit(params, batch).scores)
        n_resp = 0
        t0 = time.time()
        results = []
        for t_pad in schedule:
            results.append(beam_jit(params, staged[t_pad]))
            n_resp += B
        for r in results:
            np.asarray(r.scores)     # drain
        dt = time.time() - t0
        rps_per_call = None
    rps = n_resp / dt

    line = {
        "metric": "avsd_generation_throughput",
        "value": round(rps, 2),
        "unit": ("responses/sec/chip (beam=5, maxlen=12, d_model=128, "
                 f"{gcfg.cache_dtype} KV cache, scan_unroll={gcfg.scan_unroll},"
                 " feature grids staged in HBM"
                 + (", chained dispatch — ~5% above per-call dispatch, "
                    "the basis of the 2.0/s reference estimate)"
                    if chained else ")")),
        "vs_baseline": round(rps / REFERENCE_GPU_RESP_PER_SEC, 2),
        "tier": "full",
    }
    if rps_per_call is not None:
        # lower bound: per-call dispatch through this harness's tunnel
        # (~15 ms RTT/call that a production host would not pay)
        line["value_per_call_lower_bound"] = round(rps_per_call, 2)
    print(json.dumps(line))


if __name__ == "__main__":
    if "--run" in sys.argv:
        main(quick="--quick" in sys.argv)   # child: the actual benchmark
    else:
        sys.exit(launcher())
