#!/usr/bin/env python
"""Conv3d logical-layout A/B: NDHWC (the extractor's layout) vs NCDHW.

Closes VERDICT r3 #8's layout sub-item with a measurement instead of an
assumption.  Times the two extractor stages with the LOWEST measured MFU
(BENCH.md round-4 per-stage table) as standalone convs in both logical
layouts, interleaved in one tunnel window:

  * stem: 7x7x7 stride-(1,2,2) conv, C_in=3 — (B,16,112,112,3)x(7,7,7,3,64)
  * stage1 grouped 3^3 conv at the shipped merge depth (ch/group=16):
    (B,8,28,28,128)x(3,3,3,16,128), feature_group_count=8

XLA-TPU re-tiles physical layouts behind the logical spec, so this measures
what the logical layout choice actually costs/buys (transposes, lane
mapping), not a hand-written schedule.  Chain-difference methodology
(scripts/bench_extractor.py): data-dependent chains, (n, 3n) lengths, host
fetch; per-call dispatch/D2H cancels in the difference.

Usage: python scripts/bench_conv_layout.py [--batch 128] [--iters 8]
       [--reps 7] [--bf16 1] [--device cpu]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--device", default="")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bist_tpu.utils.benchtime import unprovable_zero

    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind}), batch={args.batch}, "
          f"dtype={dt.__name__}, iters={args.iters}, reps={args.reps} "
          "interleaved", file=sys.stderr)
    rng = np.random.default_rng(0)
    B = args.batch

    cases = {
        # name: (x NDHWC shape, w DHWIO shape, stride, groups)
        "stem 7^3 s(1,2,2) Cin=3": ((B, 16, 112, 112, 3), (7, 7, 7, 3, 64),
                                    (1, 2, 2), 1),
        "stage1 3^3 grouped cg=16": ((B, 8, 28, 28, 128), (3, 3, 3, 16, 128),
                                     (1, 1, 1), 8),
    }

    n_it = args.iters

    def build(xs, ws, stride, groups, layout):
        pad = [(k // 2, k // 2) for k in ws[:3]]
        if layout == "NDHWC":
            dn, x_shape = ("NDHWC", "DHWIO", "NDHWC"), xs
            w_shape = ws
        else:
            dn = ("NCDHW", "DHWIO", "NCDHW")
            x_shape = (xs[0], xs[4], xs[1], xs[2], xs[3])
            w_shape = ws
        x = jnp.asarray(rng.standard_normal(x_shape), dt)
        w = jnp.asarray(rng.standard_normal(w_shape), dt)

        @partial(jax.jit, static_argnames="n")
        def chain(x_, w_, n):
            def body(acc, _):
                x2 = x_ + unprovable_zero(acc).astype(dt)
                out = jax.lax.conv_general_dilated(
                    x2, w_, window_strides=stride, padding=pad,
                    dimension_numbers=dn, feature_group_count=groups)
                return acc + jnp.sum(out).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        for n in (n_it, 3 * n_it):
            float(chain(x, w, n=n))
        return lambda n: float(chain(x, w, n=n))

    for name, (xs, ws, stride, groups) in cases.items():
        run_a = build(xs, ws, stride, groups, "NDHWC")
        run_b = build(xs, ws, stride, groups, "NCDHW")
        t = {k: [] for k in ("a1", "a2", "b1", "b2")}
        for _ in range(args.reps):
            for key, fn, n in (("a1", run_a, n_it), ("b1", run_b, n_it),
                               ("a2", run_a, 3 * n_it),
                               ("b2", run_b, 3 * n_it)):
                t0 = time.perf_counter()
                fn(n)
                t[key].append(time.perf_counter() - t0)
        med = {k: statistics.median(v) for k, v in t.items()}
        ms_a = max(med["a2"] - med["a1"], 1e-9) / (2 * n_it) * 1e3
        ms_b = max(med["b2"] - med["b1"], 1e-9) / (2 * n_it) * 1e3
        print(f"{name}:  NDHWC {ms_a:.2f} ms  NCDHW {ms_b:.2f} ms  "
              f"(NDHWC speedup {ms_b / max(ms_a, 1e-9):.3f}x)")


if __name__ == "__main__":
    main()
