#!/usr/bin/env python
"""Per-STAGE on-chip timing of the ResNeXt-101 3D extractor: where the
wall-clock lives vs where the FLOPs live (extractor_flops.py), giving a
per-stage MFU table — the measurement that either exposes the next
extractor lever or formally closes the MFU question (VERDICT r3 #8) the
way scripts/decode_op_budget.py closed the decode op-latency floor.

Method: each component (stem+maxpool, stage1..4, plus the whole network
as a coverage control) is chained n/2n times inside one jit via
bist_tpu.utils.benchtime semantics (data-dependent scan body, host-fetched
scalar, (2n-n) difference cancels dispatch+fetch).  All components are
compiled first, then timed INTERLEAVED within each rep — separate-window
numbers swing +-10% with tunnel weather (BENCH.md round-4 methodology).
FLOPs come from each compiled chain's own XLA cost analysis / n, so the
per-stage MFU uses exactly what the timed executable computes.

Caveat: per-iteration chain overhead (input re-materialisation `x +
unprovable_zero` and the first-row output reduce) does not cancel in the
difference; it is O(input bytes / HBM bw) ~ 3-10% of stage compute here,
so stage MFUs read slightly LOW and their sum slightly exceeds the
whole-network row.

Usage: python scripts/bench_extractor_stages.py [--batch 128] [--bf16 1]
       [--iters 3] [--reps 3] [--device cpu] [--peak-tflops 197]
"""
import argparse
import statistics
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--device", default="")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak for the MFU column (v5e bf16 = 197)")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bist_tpu.models import resnext3d as rx
    from bist_tpu.utils.benchtime import unprovable_zero

    dt_ = jnp.bfloat16 if args.bf16 else jnp.float32
    params = rx.init_resnext101(jax.random.PRNGKey(0))
    if args.bf16:
        params = jax.tree_util.tree_map(lambda x: x.astype(dt_), params)
    B, n = args.batch, args.iters
    rng = np.random.default_rng(0)

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

    # component -> (fn, representative input shape at that boundary)
    comps = [
        ("stem+pool", stem_fn, (B, 16, 112, 112, 3)),
        ("stage1", make_stage_fn(0), (B, 8, 28, 28, 64)),
        ("stage2", make_stage_fn(1), (B, 8, 28, 28, 256)),
        ("stage3", make_stage_fn(2), (B, 4, 14, 14, 512)),
        ("stage4", make_stage_fn(3), (B, 2, 7, 7, 1024)),
        ("WHOLE NET", lambda p, x: rx.resnext101_apply(
            p, x, mode="spatio_temporal"), (B, 16, 112, 112, 3)),
    ]

    def build(fn, shape):
        x = jnp.asarray(rng.standard_normal(shape), dt_)

        @partial(jax.jit, static_argnames="n")
        def chain(p_, c_, n):
            def body(acc, _):
                c2 = c_ + unprovable_zero(acc).astype(dt_)
                out = fn(p_, c2)
                return acc + jnp.sum(out[:1]).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        # AOT-compile both lengths so cost analysis reads the TIMED program.
        # NOTE: XLA cost analysis counts a lax.scan's while-loop BODY ONCE
        # (not × trip count), so ca["flops"] is already per-iteration —
        # verified against hand-computed conv FLOPs (stem: 5.72 GFLOP/clip,
        # extractor_flops.py) and against a CPU n=1 control.  The first cut
        # of this script divided by n and under-read MFU 3× at --iters 3.
        c1 = chain.lower(params, x, n=n).compile()
        c2 = chain.lower(params, x, n=2 * n).compile()
        ca = c1.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        gflop = float(ca.get("flops", 0.0)) / 1e9
        return x, c1, c2, gflop

    built = {}
    for name, fn, shape in comps:
        t0 = time.perf_counter()
        built[name] = build(fn, shape)
        print(f"# compiled {name} ({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)

    def timed(c, x):
        t0 = time.perf_counter()
        float(c(params, x))
        return time.perf_counter() - t0

    t1 = {k: [] for k in built}
    t2 = {k: [] for k in built}
    for name in built:          # settle run per executable
        x, c1, c2, _ = built[name]
        timed(c1, x), timed(c2, x)
    for _ in range(args.reps):  # interleave components within each rep
        for name in built:
            x, c1, c2, _ = built[name]
            t1[name].append(timed(c1, x))
            t2[name].append(timed(c2, x))

    peak = args.peak_tflops * 1e12
    print(f"ResNeXt-101 3D per-stage timing, batch {B}, bf16={args.bf16}, "
          f"n={n} chain-diff, {args.reps} interleaved reps "
          f"(MFU vs {args.peak_tflops:.0f} TFLOP/s peak):")
    total_ms = None
    for name, fn, shape in comps:
        x, c1, c2, gflop = built[name]
        ms = max(statistics.median(t2[name]) - statistics.median(t1[name]),
                 1e-9) / n * 1e3
        jitter = ms < 0.05      # (2n-n) difference below tunnel-RTT jitter
        mfu = gflop * 1e9 / (ms / 1e3) / peak
        if name == "WHOLE NET":
            stage_sum = total_ms or 0.0
            print(f"  {'sum of stages':12s} {stage_sum:8.2f} ms/batch")
            print(f"  {name:12s} {ms:8.2f} ms/batch  {gflop:8.1f} GFLOP  "
                  f"{mfu * 100:5.1f}% MFU  "
                  f"({B / ms * 1e3:.0f} clips/s; stages cover "
                  f"{stage_sum / ms * 100:.0f}%)"
                  + ("  [≤jitter — unreliable]" if jitter else ""))
        else:
            # jitter-level stages still count toward the stage sum (at their
            # clamped reading) so "stages cover N%" stays an honest total
            total_ms = ms if total_ms is None else total_ms + ms
            print(f"  {name:12s} {ms:8.2f} ms/batch  {gflop:8.1f} GFLOP  "
                  f"{mfu * 100:5.1f}% MFU"
                  + ("  [≤jitter — unreliable]" if jitter else ""))


if __name__ == "__main__":
    main()
