#!/usr/bin/env python
"""ResNeXt-101 3D feature-extraction throughput (clips/sec) on the local
accelerator — BASELINE.json config 4's measurement.  Random-init weights
(identical FLOPs to the Kinetics checkpoint), 16-frame 112x112 clips.

Two modes:
  --chain 1 (default): chain-difference timing via bist_tpu.utils.benchtime
    (the on-chip rate; per-call dispatch/D2H cancels — this harness's
    tunnel would otherwise dominate);
  --chain 0: one dispatch per batch with a full D2H drain per iteration
    (the round-1 behaviour; on this harness it mostly measures the tunnel).

Usage: python scripts/bench_extractor.py [--batch 32] [--iters 4] [--bf16 1]
"""
import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default="16",
                   help="batch size, or comma-separated sizes measured in "
                        "ONE process/tunnel window (separate-process sweeps "
                        "vary ±10%% with tunnel weather)")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--device", default="")
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--chain", type=int, default=1)
    p.add_argument("--ab-s2d", type=int, default=0,
                   help="interleaved A/B of the space-to-depth stem vs the "
                        "direct 7^3 conv in ONE process/tunnel window "
                        "(separate-process extractor runs vary +-10% with "
                        "tunnel weather)")
    p.add_argument("--ab-groupmerge", default="0",
                   help="interleaved A/B of block-diagonal group merging "
                        "(BIST_GROUP_CH spec: one int target channels/group "
                        "or a per-granularity 't4,t8,t16,t32' list, exact "
                        "numerics) vs --ab-groupmerge-vs")
    p.add_argument("--ab-groupmerge-vs", default="0",
                   help="the B side of --ab-groupmerge (same spec syntax; "
                        "default 0 = native 32-way grouped convs)")
    p.add_argument("--ab-int8", type=int, default=0,
                   help="interleaved A/B of the int8 bottleneck path "
                        "(static first-batch-calibrated scales, stem bf16) "
                        "vs the float path in ONE window; run with --bf16 1 "
                        "so the B side is the shipped bf16 extractor")
    p.add_argument("--ab-int8-stages", default="",
                   help="comma list of 1-based stages to quantize in the "
                        "--ab-int8 A side (e.g. '3,4'); empty = all")
    p.add_argument("--ab-batch", type=int, default=0,
                   help="interleaved A/B of --batch vs this batch size in "
                        "clips/s terms (one window; the sequential --batch "
                        "comma-sweep is weather-confounded across compiles)")
    args = p.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bist_tpu.models.resnext3d import init_resnext101, resnext101_apply

    params = init_resnext101(jax.random.PRNGKey(0))
    dt_ = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.bf16:
        params = jax.tree_util.tree_map(lambda x: x.astype(dt_), params)
    batches = [int(b) for b in str(args.batch).split(",")]
    for bs in batches:
        run_one(args, bs, params, dt_)


def run_one(args, batch, params, dt_):
    import jax
    import jax.numpy as jnp

    from bist_tpu.models.resnext3d import resnext101_apply

    clips = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, 16, 112, 112, 3)), dt_)

    if args.ab_int8:
        # int8 (static calibrated scales) vs float, one jit wrapper
        # specialized per params pytree, ABAB in one tunnel window
        import statistics

        import bist_tpu.models.resnext3d as rx
        from bist_tpu.utils.benchtime import unprovable_zero

        q_stages = ([int(s) - 1 for s in args.ab_int8_stages.split(",")]
                    if args.ab_int8_stages else None)
        scales = jax.device_get(
            jax.jit(rx.collect_act_scales)(params, clips))
        qparams = rx.quantize_resnext_int8(params, act_scales=scales,
                                           stages=q_stages)

        @partial(jax.jit, static_argnames="n")
        def chain(p_, c_, n):
            def body(acc, _):
                c2 = c_ + unprovable_zero(acc).astype(c_.dtype)
                out = resnext101_apply(p_, c2, mode="spatio_temporal")
                return acc + jnp.sum(out).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.zeros(()), None, length=n)[0]

        n_it = args.iters
        for p_ in (qparams, params):
            for n in (n_it, 2 * n_it):
                float(chain(p_, clips, n=n))

        def timed(p_, n):
            t0 = time.perf_counter()
            float(chain(p_, clips, n=n))
            return time.perf_counter() - t0

        t = {k: [] for k in ("a1", "a2", "b1", "b2")}
        for _ in range(args.reps):
            t["a1"].append(timed(qparams, n_it))
            t["b1"].append(timed(params, n_it))
            t["a2"].append(timed(qparams, 2 * n_it))
            t["b2"].append(timed(params, 2 * n_it))
        med = {k: statistics.median(v) for k, v in t.items()}
        ms_a = max(med["a2"] - med["a1"], 1e-9) / n_it * 1e3
        ms_b = max(med["b2"] - med["b1"], 1e-9) / n_it * 1e3
        tag = (f"int8 static (stages {args.ab_int8_stages})"
               if args.ab_int8_stages else "int8 static")
        print(f"{tag}: {batch / ms_a * 1e3:.1f} clips/sec  "
              f"{'bf16' if args.bf16 else 'f32'}: "
              f"{batch / ms_b * 1e3:.1f} clips/sec  "
              f"(int8 speedup {ms_b / ms_a:.3f}x; batch {batch}, "
              f"{args.reps} interleaved reps)")
        return

    if args.ab_batch:
        # interleaved batch-size A/B in clips/s terms: both batch shapes
        # through one jit wrapper (shape-specialized), ABAB in one window.
        import statistics

        from bist_tpu.utils.benchtime import unprovable_zero

        clips_b = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (args.ab_batch, 16, 112, 112, 3)), dt_)

        @partial(jax.jit, static_argnames="n")
        def chain(p_, c_, n):
            def body(acc, _):
                c2 = c_ + unprovable_zero(acc).astype(dt_)
                out = resnext101_apply(p_, c2, mode="spatio_temporal")
                return acc + jnp.sum(out).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        n_it = args.iters
        for c in (clips, clips_b):
            for n in (n_it, 2 * n_it):
                float(chain(params, c, n=n))

        def timed(c, n):
            t0 = time.perf_counter()
            float(chain(params, c, n=n))
            return time.perf_counter() - t0

        t = {k: [] for k in ("a1", "a2", "b1", "b2")}
        for _ in range(args.reps):
            t["a1"].append(timed(clips, n_it))
            t["b1"].append(timed(clips_b, n_it))
            t["a2"].append(timed(clips, 2 * n_it))
            t["b2"].append(timed(clips_b, 2 * n_it))
        med = {k: statistics.median(v) for k, v in t.items()}
        ms_a = max(med["a2"] - med["a1"], 1e-9) / n_it * 1e3
        ms_b = max(med["b2"] - med["b1"], 1e-9) / n_it * 1e3
        cps_a = batch / ms_a * 1e3
        cps_b = args.ab_batch / ms_b * 1e3
        print(f"batch {batch}: {cps_a:.1f} clips/sec  "
              f"batch {args.ab_batch}: {cps_b:.1f} clips/sec  "
              f"(batch-{batch} speedup {cps_a / cps_b:.3f}x; bf16="
              f"{args.bf16}, {args.reps} interleaved reps)")
        return

    if args.ab_s2d or str(args.ab_groupmerge) != "0":
        import statistics

        import bist_tpu.models.resnext3d as rx
        from bist_tpu.utils.benchtime import unprovable_zero

        if args.ab_s2d:
            attr, a_val, b_val = "STEM_S2D", True, False
            a_name, b_name = "s2d stem", "direct stem"
        else:
            attr = "GROUP_CH"
            a_val = rx._parse_group_ch(args.ab_groupmerge)
            b_val = rx._parse_group_ch(args.ab_groupmerge_vs)
            a_name = f"group-merge {args.ab_groupmerge}"
            b_name = (f"group-merge {args.ab_groupmerge_vs}"
                      if str(args.ab_groupmerge_vs) != "0"
                      else "native 32-way grouped")
        n_it = args.iters

        def build(flag):
            # the flag is read at TRACE time — compile this wrapper's two
            # chain lengths while it is set, then restore it
            old = getattr(rx, attr)
            setattr(rx, attr, flag)

            @partial(jax.jit, static_argnames="n")
            def chain(p_, c_, n):
                def body(acc, _):
                    c2 = c_ + unprovable_zero(acc).astype(dt_)
                    out = resnext101_apply(p_, c2, mode="spatio_temporal")
                    return acc + jnp.sum(out).astype(jnp.float32), None

                out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
                return out

            try:
                for n in (n_it, 2 * n_it):
                    float(chain(params, clips, n=n))
            finally:
                setattr(rx, attr, old)
            return chain

        ch_s2d, ch_dir = build(a_val), build(b_val)

        def timed(ch, n):
            t0 = time.perf_counter()
            float(ch(params, clips, n=n))
            return time.perf_counter() - t0

        t = {k: [] for k in ("a1", "a2", "b1", "b2")}
        for _ in range(args.reps):
            t["a1"].append(timed(ch_s2d, n_it))
            t["b1"].append(timed(ch_dir, n_it))
            t["a2"].append(timed(ch_s2d, 2 * n_it))
            t["b2"].append(timed(ch_dir, 2 * n_it))
        med = {k: statistics.median(v) for k, v in t.items()}
        ms_a = max(med["a2"] - med["a1"], 1e-9) / n_it * 1e3
        ms_b = max(med["b2"] - med["b1"], 1e-9) / n_it * 1e3
        print(f"{a_name}: {batch / ms_a * 1e3:.1f} clips/sec  "
              f"{b_name}: {batch / ms_b * 1e3:.1f} clips/sec  "
              f"(A speedup {ms_b / ms_a:.3f}x; batch {batch}, "
              f"bf16={args.bf16}, {args.reps} interleaved reps)")
        return

    if args.chain:
        from bist_tpu.utils.benchtime import chain_diff_ms, unprovable_zero

        @partial(jax.jit, static_argnames="n")
        def chain(p_, c_, n):
            def body(acc, _):
                c2 = c_ + unprovable_zero(acc).astype(dt_)
                out = resnext101_apply(p_, c2, mode="spatio_temporal")
                return acc + jnp.sum(out).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        n_it = args.iters
        for n in (n_it, 2 * n_it):
            float(chain(params, clips, n=n))          # compile + warm
        ms = chain_diff_ms(lambda n: float(chain(params, clips, n=n)),
                           n_it, args.reps)
        dt = ms / 1e3
    else:
        fn = jax.jit(lambda p, c: resnext101_apply(p, c, mode="spatio_temporal")
                     .astype(jnp.float32))
        np.asarray(fn(params, clips))    # compile + settle
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(fn(params, clips))   # force full D2H drain per iter
        dt = (time.time() - t0) / args.iters
    cps = batch / dt
    # one clip covers 16 frames with stride 4 → 4 frames of video at ~24fps
    print(f"{cps:.1f} clips/sec (batch {batch}, {dt*1e3:.0f} ms/batch; "
          f"~{cps * 4 / 24:.1f}x realtime video at 24fps stride 4)")


if __name__ == "__main__":
    main()
