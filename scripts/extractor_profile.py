#!/usr/bin/env python
"""Device-timeline profile of the ResNeXt-101 3D extractor (VERDICT r4 #7).

Points scripts/decode_profile.py's trace machinery at the conv pipeline:
each component (stem+pool, stage1..4, whole net) runs as its OWN jit program
inside one jax.profiler trace, so ops bin into per-component module windows
by timestamp — a per-stage category table (is stage1's 12% MFU a copy/
relayout family like the one worth 1.21x on decode, or genuinely
conv-shaped?) plus the whole-net scheduling-gap share.

Inputs are synthesized on device; nothing crosses the tunnel inside the
traced region.  BIST_GROUP_CH applies as shipped (default 16) — profile
with =0 to see the un-merged grouped-conv program.

Usage: python scripts/extractor_profile.py [--batch 128] [--bf16 1]
       [--top 15] [--keep-trace DIR]
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--keep-trace", default="",
                    help="directory for the raw trace (default: temp dir)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bist_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bist_tpu.models import resnext3d as rx

    dt_ = jnp.bfloat16 if args.bf16 else jnp.float32
    params = rx.init_resnext101(jax.random.PRNGKey(0))
    if args.bf16:
        params = jax.tree_util.tree_map(lambda x: x.astype(dt_), params)
    B = args.batch

    def stem_fn(p, x):
        y = jax.nn.relu(rx._bn(p["stem"]["bn"],
                               rx._stem_conv(x, p["stem"]["conv"])))
        return rx._maxpool3d(y)

    def make_stage_fn(s):
        def f(p, x):
            for b, blk in enumerate(p["stages"][s]):
                x = rx._block(blk, x, rx.STAGE_STRIDES[s] if b == 0 else 1)
            return x
        return f

    comps = [
        ("stem+pool", stem_fn, (B, 16, 112, 112, 3)),
        ("stage1", make_stage_fn(0), (B, 8, 28, 28, 64)),
        ("stage2", make_stage_fn(1), (B, 8, 28, 28, 256)),
        ("stage3", make_stage_fn(2), (B, 4, 14, 14, 512)),
        ("stage4", make_stage_fn(3), (B, 2, 7, 7, 1024)),
        ("WHOLE NET", lambda p, x: rx.resnext101_apply(
            p, x, mode="spatio_temporal"), (B, 16, 112, 112, 3)),
    ]

    jitted = []
    for name, fn, shape in comps:
        x = jax.jit(lambda k, s=shape: jax.random.normal(k, s, dt_))(
            jax.random.PRNGKey(0))
        jf = jax.jit(fn)
        print(f"warmup {name}...", file=sys.stderr, flush=True)
        jnp.sum(jf(params, x)).block_until_ready()
        jitted.append((name, jf, x))

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="bist_xprof_")
    with jax.profiler.trace(trace_dir):
        outs = [jnp.sum(jf(params, x)) for _, jf, x in jitted]
        for o in outs:
            float(o)                        # host fetch = sync

    mods, ops = load_device_ops(trace_dir)
    if not ops:
        raise SystemExit("trace captured no XLA Ops events")
    # bin ops into module windows by timestamp; modules in trace order
    mods = sorted(mods, key=lambda m: m[2])
    ops = sorted(ops, key=lambda o: o[2])
    windows = [(name, ts, ts + dur) for name, dur, ts in mods]

    def window_of(ts):
        for k, (_, a, b) in enumerate(windows):
            if a <= ts <= b:
                return k
        return None

    per_mod_ops = defaultdict(list)
    for name, dur, ts in ops:
        k = window_of(ts)
        if k is not None:
            per_mod_ops[k].append((name, dur))

    print(f"\nextractor timeline (batch {B}, "
          f"{'bf16' if args.bf16 else 'f32'}, "
          f"BIST_GROUP_CH={os.environ.get('BIST_GROUP_CH', '16')}):")
    # the i-th traced jit call should be the i-th module window, but guard
    # against runtime-internal modules by matching on op population order
    labels = [c[0] for c in comps]
    used = 0
    for k, (mname, a, b) in enumerate(windows):
        if k not in per_mod_ops:
            continue
        if "reduce_sum" in mname or len(per_mod_ops[k]) <= 4:
            # the jnp.sum() drain wrapper compiles as its own tiny module
            # interleaved between the component modules — skip it so labels
            # stay aligned with the traced component call order
            continue
        label = labels[used] if used < len(labels) else mname
        used += 1
        mdur = b - a
        mops = per_mod_ops[k]
        total = sum(d for _, d in mops)
        cats = defaultdict(lambda: [0, 0.0])
        for name, d in mops:
            c = cats[_category(name)]
            c[0] += 1
            c[1] += d
        cat_str = "  ".join(
            f"{c}={d / 1e3:.2f}ms" for c, (n, d) in
            sorted(cats.items(), key=lambda kv: -kv[1][1])[:6])
        print(f"\n== {label:<10} span {mdur / 1e3:8.3f} ms  ops {len(mops):4d} "
              f" sum {total / 1e3:8.3f} ms  gap "
              f"{100 * (mdur - total) / mdur if mdur else 0:.1f}%")
        print(f"   {cat_str}")
        per_op = defaultdict(lambda: [0, 0.0])
        for name, d in mops:
            o = per_op[name.split("(")[0]]
            o[0] += 1
            o[1] += d
        for name, (n, d) in sorted(per_op.items(),
                                   key=lambda kv: -kv[1][1])[:args.top]:
            print(f"   {name:<48} x{n:<4d} {d:10.1f} us")
    if not args.keep_trace:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
    else:
        print(f"\nraw trace kept in {trace_dir}")


if __name__ == "__main__":
    main()
