#!/usr/bin/env python
"""Int8-vs-bf16 conv3d A/B at extractor hot geometries (v5e int8 MXU probe).

The v5e MXU runs s8xs8->s32 at 2x the bf16 peak (394.7 vs 197 TOPS), and
extractor stage 3 already sits at ~61% bf16 MFU (BENCH.md round 4) — the
CEILING, not the lane fill, is the remaining lever there.  This measures
whether XLA-TPU lowers `lax.conv_general_dilated` on int8 operands
(preferred_element_type=int32) to the native int8 path at the geometries the
extractor actually runs (post group-merge, BIST_GROUP_CH=16), and what the
per-layer dynamic-requant overhead (abs-max + scale + round + clip + cast)
costs on top.

Four variants per case, interleaved in one tunnel window:
  * bf16     — the shipped path (baseline)
  * int8+rq  — bf16 input, DYNAMIC per-tensor requant (abs-max reduce +
               quantize = 2 extra HBM passes), int8 conv, bf16 rescale
  * int8+sq  — bf16 input, STATIC (calibrated-constant) scale: quantize is
               one fused elementwise pass, no reduce — what the per-layer
               cost looks like once scales come from calibration
  * int8     — input already int8, conv + rescale only (the amortized
               ceiling when quantize-on-write fuses into the previous
               layer's epilogue, as in the full static-PTQ network)

Chain-difference methodology (scripts/bench_conv_layout.py): data-dependent
chains, (n, 3n) lengths, host fetch; per-call dispatch/D2H cancels.

Usage: python scripts/bench_conv_int8.py [--batch 128] [--iters 8] [--reps 7]
       [--device cpu] [--cases stage3_1x1,stage3_g,stage2_g]
"""
import argparse
import statistics
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# (x NDHWC shape fn of B, w DHWIO shape, stride, feature_group_count,
#  iters multiplier — stage3 tensors are ~8x smaller, so they need ~8x the
#  chain length for the same timed signal over the tunnel jitter)
CASES = {
    # stage3 bottleneck at (2,7,7) spatial, 23 blocks — the FLOP bulk
    "stage3_1x1": (lambda B: (B, 2, 7, 7, 1024), (1, 1, 1, 1024, 512),
                   (1, 1, 1), 1, 8),
    "stage3_g": (lambda B: (B, 2, 7, 7, 512), (3, 3, 3, 16, 512),
                 (1, 1, 1), 32, 8),
    # stage2 grouped conv at the shipped merge depth (native cg=8, m=2)
    "stage2_g": (lambda B: (B, 4, 14, 14, 256), (3, 3, 3, 16, 256),
                 (1, 1, 1), 16, 1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--device", default="")
    ap.add_argument("--cases", default="stage3_1x1,stage3_g,stage2_g")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bist_tpu.utils.benchtime import unprovable_zero

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind}), batch={args.batch}, "
          f"iters={args.iters}, reps={args.reps} interleaved", file=sys.stderr)
    rng = np.random.default_rng(0)
    B = args.batch

    def build(xs, ws, stride, groups, variant, n_it):
        pad = [(k // 2, k // 2) for k in ws[:3]]
        dn = ("NDHWC", "DHWIO", "NDHWC")
        xf = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        wf = rng.standard_normal(ws)
        # per-output-channel symmetric weight scales
        sw = np.abs(wf).max(axis=(0, 1, 2, 3)) / 127.0
        wq = jnp.asarray(np.clip(np.round(wf / sw), -127, 127), jnp.int8)
        swj = jnp.asarray(sw, jnp.bfloat16)
        xq0 = jnp.clip(jnp.round(xf.astype(jnp.float32) / 0.02), -127,
                       127).astype(jnp.int8)

        def conv(x, w, pet=None):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=stride, padding=pad,
                dimension_numbers=dn, feature_group_count=groups,
                preferred_element_type=pet)

        @partial(jax.jit, static_argnames="n")
        def chain_bf16(x_, w_, n):
            def body(acc, _):
                x2 = x_ + unprovable_zero(acc).astype(jnp.bfloat16)
                return acc + jnp.sum(conv(x2, w_)).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.zeros(()), None, length=n)[0]

        @partial(jax.jit, static_argnames="n")
        def chain_int8_rq(x_, wq_, sw_, n):
            def body(acc, _):
                x2 = x_ + unprovable_zero(acc).astype(jnp.bfloat16)
                s = (jnp.max(jnp.abs(x2)).astype(jnp.float32) / 127.0)
                xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                out = conv(xq, wq_, jnp.int32)
                y = out.astype(jnp.bfloat16) * (s.astype(jnp.bfloat16) * sw_)
                return acc + jnp.sum(y).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.zeros(()), None, length=n)[0]

        @partial(jax.jit, static_argnames="n")
        def chain_int8_sq(x_, wq_, sw_, n):
            s_const = 0.02
            def body(acc, _):
                x2 = x_ + unprovable_zero(acc).astype(jnp.bfloat16)
                xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / s_const),
                              -127, 127).astype(jnp.int8)
                out = conv(xq, wq_, jnp.int32)
                y = out.astype(jnp.bfloat16) * (s_const * sw_)
                return acc + jnp.sum(y).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.zeros(()), None, length=n)[0]

        @partial(jax.jit, static_argnames="n")
        def chain_int8(xq_, wq_, sw_, n):
            def body(acc, _):
                x2 = xq_ + unprovable_zero(acc).astype(jnp.int8)
                out = conv(x2, wq_, jnp.int32)
                y = out.astype(jnp.bfloat16) * sw_
                return acc + jnp.sum(y).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.zeros(()), None, length=n)[0]

        if variant == "bf16":
            fns = lambda n: float(chain_bf16(xf, jnp.asarray(wf, jnp.bfloat16), n=n))  # noqa: E731
        elif variant == "int8+rq":
            fns = lambda n: float(chain_int8_rq(xf, wq, swj, n=n))  # noqa: E731
        elif variant == "int8+sq":
            fns = lambda n: float(chain_int8_sq(xf, wq, swj, n=n))  # noqa: E731
        else:
            fns = lambda n: float(chain_int8(xq0, wq, swj, n=n))  # noqa: E731
        for n in (n_it, 3 * n_it):
            fns(n)
        return fns

    for name in args.cases.split(","):
        xs_fn, ws, stride, groups, mult = CASES[name]
        xs, n_it = xs_fn(B), args.iters * mult
        runs = {v: build(xs, ws, stride, groups, v, n_it)
                for v in ("bf16", "int8+rq", "int8+sq", "int8")}
        t = {(v, n): [] for v in runs for n in (n_it, 3 * n_it)}
        for _ in range(args.reps):
            for v, fn in runs.items():
                for n in (n_it, 3 * n_it):
                    t0 = time.perf_counter()
                    fn(n)
                    t[(v, n)].append(time.perf_counter() - t0)
        ms = {}
        for v in runs:
            m1 = statistics.median(t[(v, n_it)])
            m2 = statistics.median(t[(v, 3 * n_it)])
            ms[v] = max(m2 - m1, 1e-9) / (2 * n_it) * 1e3
        base = ms["bf16"]
        parts = "  ".join(
            f"{v} {ms[v]:.3f} ms ({base / max(ms[v], 1e-9):.3f}x)"
            for v in ("int8+rq", "int8+sq", "int8"))
        print(f"{name}: bf16 {base:.3f} ms  {parts}")


if __name__ == "__main__":
    main()
