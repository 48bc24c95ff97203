#!/usr/bin/env python
"""Device-timeline profile of the flagship beam-search program.

jax.profiler tracing WORKS over the axon tunnel (round 4 session 12 probe:
the Chrome trace carries a real /device:TPU:0 "XLA Ops" timeline with per-op
durations — a 512^3 bf16 matmul reads ~1.8 us = ~150 TFLOP/s, i.e. the
device numbers are credible).  This script captures ONE traced beam_search
call at the serving operating point and aggregates the device timeline:

  * per-op-category time (fusion / dot / copy / dynamic-update-slice ...)
  * top-N individual ops by total time
  * sum(op durations) vs module span  →  the scheduling-gap share, which is
    the direct test of the op-latency-floor claim (BENCH.md round 4: ~180
    fusion-surviving ops/step, step time ~0.65 ms  →  ~3.6 us/op)

Feature grids are synthesized ON DEVICE (jnp.zeros → prng bits) so the trace
never waits on the tunnel's ~0.1 GB/s H2D link.

Usage: python scripts/decode_profile.py [--batch 64] [--t-clips 16]
       [--maxlen 12] [--unroll 4] [--cache-dtype bfloat16] [--top 25]
       [--keep-trace DIR]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _category(name: str) -> str:
    """Bucket XLA op names (fusion.123, dot.4, copy-start...) by kind."""
    base = name.split("(")[0]
    base = base.split(".")[0]
    return base.rstrip("0123456789_")


def load_device_ops(trace_dir):
    """Parse the newest Chrome trace; return (module_events, op_events)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace found under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # map pid -> process name, (pid, tid) -> thread name
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]
    mods, ops = [], []
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pnames.get(e.get("pid"), ""):
            continue
        thread = tnames.get((e.get("pid"), e.get("tid")), "")
        rec = (e["name"], float(e.get("dur", 0.0)), float(e.get("ts", 0.0)))
        if thread == "XLA Modules":
            mods.append(rec)
        elif thread == "XLA Ops":
            ops.append(rec)
    return mods, ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t-clips", type=int, default=16)
    ap.add_argument("--maxlen", type=int, default=12)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--cache-dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--keep-trace", default="",
                    help="directory for the raw trace (default: temp dir)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bist_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bist_tpu.config import GenerateConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.models.model import init_model
    from bist_tpu.vocab import get_vocabulary
    from __graft_entry__ import _flagship_cfg

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    test_json = os.path.join(here, "dstc7avsd_eval", "data",
                             "test_set4DSTC7-AVSD.json")
    vocab = get_vocabulary(test_json, cutoff=3, include_caption="summary")
    cfg = _flagship_cfg(vocab_size=len(vocab), dv=2048)
    gcfg = GenerateConfig(maxlen=args.maxlen, beam=5, penalty=1.0, nbest=5,
                          cache_dtype=args.cache_dtype,
                          scan_unroll=args.unroll)

    B, T, S, DV = args.batch, args.t_clips, 16, 2048
    LQ, LH, LC = 32, 256, 64
    rng = np.random.default_rng(0)

    def toks(L, lo=4):
        x = rng.integers(lo, min(len(vocab), 400), size=(B, L))
        return jnp.asarray(x, jnp.int32)

    # device-side feature synthesis: no tunnel H2D in the traced region
    fts = jax.jit(lambda k: jax.random.normal(k, (B, T, S, DV),
                                              jnp.bfloat16))(
        jax.random.PRNGKey(0))
    dummy = jnp.full((B, 1), 2, jnp.int32)
    batch = Batch(query=toks(LQ), his=toks(LH), trg=dummy, trg_y=dummy,
                  cap=toks(LC), fts=fts, audio_fts=None)

    params = jax.device_put(init_model(jax.random.PRNGKey(0), cfg))
    beam_jit = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))
    print("warmup compile...", file=sys.stderr)
    np.asarray(beam_jit(params, batch).scores)          # compile + run

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="bist_prof_")
    with jax.profiler.trace(trace_dir):
        r = beam_jit(params, batch)
        np.asarray(r.scores)                            # host fetch = sync

    mods, ops = load_device_ops(trace_dir)
    if not ops:
        raise SystemExit("trace captured no XLA Ops events — profiler "
                         "unsupported on this backend?")
    # the beam module is the longest module span in the trace
    mod_name, mod_dur, _ = max(mods, key=lambda m: m[1]) if mods else (
        "?", 0.0, 0.0)
    total_op = sum(d for _, d, _ in ops)
    cats = defaultdict(lambda: [0, 0.0])
    per_op = defaultdict(lambda: [0, 0.0])
    for name, dur, _ in ops:
        c = cats[_category(name)]
        c[0] += 1
        c[1] += dur
        o = per_op[name.split("(")[0]]
        o[0] += 1
        o[1] += dur

    print(f"\nmodule: {mod_name}  span {mod_dur / 1e3:.3f} ms   "
          f"({args.batch} rows x beam 5, maxlen {args.maxlen}, "
          f"unroll {args.unroll}, {args.cache_dtype} cache)")
    print(f"device ops: {len(ops)}  sum(op dur) {total_op / 1e3:.3f} ms  "
          f"mean {total_op / len(ops):.2f} us"
          + (f"  scheduling gap {(mod_dur - total_op) / 1e3:.3f} ms "
             f"({100 * (mod_dur - total_op) / mod_dur:.1f}% of span)"
             if mod_dur else ""))
    print("\nby category:            count      total_us   mean_us")
    for cat, (n, d) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
        print(f"  {cat:<20} {n:6d}  {d:12.1f}  {d / n:8.2f}")
    print(f"\ntop {args.top} ops by total time:")
    for name, (n, d) in sorted(per_op.items(),
                               key=lambda kv: -kv[1][1])[:args.top]:
        print(f"  {name:<44} x{n:<5d} {d:10.1f} us")
    if not args.keep_trace:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
    else:
        print(f"\nraw trace kept in {trace_dir}")


if __name__ == "__main__":
    main()
