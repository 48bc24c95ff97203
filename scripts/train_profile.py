#!/usr/bin/env python
"""Device-timeline profile of ONE flagship train step (VERDICT r4 #3).

Same machinery as scripts/decode_profile.py (whose copy-family hunt paid the
round-4 1.21x decode win), pointed at the fwd + bwd + Noam/Adam update
program at the training operating point (d_model=128 flagship, batch 32 —
the measured answer-tok/s peak).  Reports per-category device time (is there
a copy/relayout family to kill?), the top ops, and the scheduling-gap share
(the op-latency-floor check the round-4 op-budget tables could not make at
the timeline level).

The RNG path is the interesting categorical axis (threefry adds +22k
pre-fusion elementwise ops vs rbg at the lowering level — does any of it
survive fusion into device time?): --prng {rbg,threefry} profiles either.

Feature grids and token batches are synthesized ON DEVICE so the trace never
waits on the tunnel's ~0.1 GB/s H2D link.

Usage: python scripts/train_profile.py [--batch 32] [--d-model 128]
       [--prng rbg] [--top 25] [--keep-trace DIR] [--grad-accum 1]
"""

import argparse
import os
import sys
import tempfile
from collections import defaultdict

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from decode_profile import _category, load_device_ops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--prng", default="rbg", choices=["rbg", "threefry"])
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--donate", type=int, default=1,
                    help="donate state buffers as the real loop does "
                         "(=0 forces update-copies; diagnostic only)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=1,
                    help="traced steps (module stats use the longest span)")
    ap.add_argument("--keep-trace", default="",
                    help="directory for the raw trace (default: temp dir)")
    args = ap.parse_args()

    import jax

    if args.prng == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np

    from bist_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bist_tpu.config import TrainConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.models.model import init_model
    from bist_tpu.train.loop import TrainState, make_train_step
    from bist_tpu.train.schedule import make_optimizer
    from bist_tpu.vocab import get_vocabulary
    from __graft_entry__ import _flagship_cfg

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    test_json = os.path.join(here, "dstc7avsd_eval", "data",
                             "test_set4DSTC7-AVSD.json")
    vocab = get_vocabulary(test_json, cutoff=3, include_caption="summary")
    cfg = _flagship_cfg(vocab_size=len(vocab), dv=2048)
    if args.d_model != 128:
        nb = {128: 3, 256: 4, 512: 6}.get(args.d_model, 3)
        cfg = cfg.replace(d_model=args.d_model, nb_blocks=nb,
                          nb_venc_blocks=nb, nb_cenc_blocks=nb)
    tcfg = TrainConfig()

    # the bench_train.py training geometry (answer-tok/s rows in BENCH.md)
    B, Lq, Lh, Lc, Lt, T, S, Dv = args.batch, 16, 64, 16, 16, 16, 16, 2048
    rng = np.random.default_rng(0)

    def toks(L):
        x = rng.integers(4, len(vocab), size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        return jnp.asarray(x)

    # device-side feature synthesis: no tunnel H2D in the traced region
    fts = jax.jit(lambda k: jax.random.normal(k, (B, T, S, Dv),
                                              jnp.float32))(
        jax.random.PRNGKey(0))
    t = toks(Lt)
    batch = Batch(query=toks(Lq), his=toks(Lh), trg=t, trg_y=toks(Lt),
                  cap=toks(Lc), fts=fts, audio_fts=None)

    params = jax.device_put(init_model(jax.random.PRNGKey(0), cfg))
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps)
    state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(cfg, tcfg, tx, donate=bool(args.donate),
                              grad_accum=args.grad_accum)
    key = jax.random.PRNGKey(1)

    print("warmup compile...", file=sys.stderr)
    state, metrics = step_fn(state, batch, key)
    print(f"warm loss {float(metrics['loss']):.4f}", file=sys.stderr)
    if args.donate:
        # donated buffers: keep stepping the REUSED state (as the loop does)
        state, metrics = step_fn(state, batch, key)

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="bist_tprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch, key)
        _ = float(metrics["loss"])                  # host fetch = sync

    mods, ops = load_device_ops(trace_dir)
    if not ops:
        raise SystemExit("trace captured no XLA Ops events — profiler "
                         "unsupported on this backend?")
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
          f"(train step: batch {B}, d_model {cfg.d_model}, "
          f"prng {args.prng}, grad_accum {args.grad_accum}, "
          f"{args.steps} step(s) traced)")
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
