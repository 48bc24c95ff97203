#!/usr/bin/env python
"""Kernel dispatch-crossover sweep (VERDICT round-1 item #3).

Measures, on the attached accelerator, the kv-length crossover between the
XLA einsum paths and the Pallas kernels:

  1. flash attention (ops/flash_attention.py) vs the fused-einsum reference,
     at BiST head geometry (d_k = d_model/h = 16);
  2. fused hop-1 (ops/bist_kernels.py) vs the projection-once einsum path,
     at the flagship hop shape (D=128, h=8, G=16 spatial regions).

Prints a markdown table (for BENCH.md) and the measured crossover points —
the source of the constants in bist_tpu/ops/dispatch.py.

Usage: python scripts/bench_kernels.py [--device cpu] [--reps 20]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    out.block_until_ready()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return statistics.median(times) * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--quick", action="store_true",
                   help="short kv list (smoke/CI)")
    args = p.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bist_tpu.ops.bist_kernels import bist_hop1_fused, hop1_reference
    from bist_tpu.ops.flash_attention import (attention_reference,
                                              flash_attention)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", file=sys.stderr)
    rng = np.random.default_rng(0)

    kv_lens = [256, 1024, 4096] if args.quick else \
        [256, 512, 1024, 2048, 4096, 8192, 16384]

    # --- 1. flash attention at BiST head geometry -------------------------
    G, Lq, d = 64, 16, 16
    xla_attn = jax.jit(attention_reference)
    pal_attn = jax.jit(lambda q, k, v, m: flash_attention(q, k, v, m))
    rows1 = []
    for Lk in kv_lens:
        q = jax.device_put(rng.standard_normal((G, Lq, d)).astype(np.float32), dev)
        k = jax.device_put(rng.standard_normal((G, Lk, d)).astype(np.float32), dev)
        v = jax.device_put(rng.standard_normal((G, Lk, d)).astype(np.float32), dev)
        m = jax.device_put((rng.random((G, Lk)) > 0.1).astype(np.int32), dev)
        t_xla = bench(xla_attn, q, k, v, m, reps=args.reps)
        t_pal = bench(pal_attn, q, k, v, m, reps=args.reps)
        rows1.append((Lk, t_xla, t_pal))
        print(f"flash Lk={Lk:6d}: xla {t_xla:8.3f} ms  pallas {t_pal:8.3f} ms",
              file=sys.stderr)

    # --- 2. fused hop-1 at flagship shape ---------------------------------
    B, Gh, Lq2, D, h = 8, 16, 16, 128, 8
    key = jax.random.PRNGKey(0)
    from bist_tpu.models.layers import mha_init

    params = mha_init(key, h, D)
    hop_params = {k: jax.device_put(v) for k, v in
                  ((n, params[n]) for n in ("wk", "wv", "wo"))}
    xla_hop = jax.jit(lambda x, q, kv, m: hop1_reference(
        x, q, kv, hop_params, h, m))
    pal_hop = jax.jit(lambda x, q, kv, m: bist_hop1_fused(
        x, q, kv, hop_params, h, m))
    rows2 = []
    for Lk in kv_lens:
        x = jax.device_put(rng.standard_normal((B, Lq2, D)).astype(np.float32), dev)
        qp = jax.device_put(rng.standard_normal((B, Lq2, D)).astype(np.float32), dev)
        kv = jax.device_put(
            rng.standard_normal((B, Gh, Lk, D)).astype(np.float32), dev)
        m = jax.device_put((rng.random((B, 1, Lk)) > 0.1).astype(np.int32), dev)
        t_xla = bench(xla_hop, x, qp, kv, m, reps=args.reps)
        t_pal = bench(pal_hop, x, qp, kv, m, reps=args.reps)
        rows2.append((Lk, t_xla, t_pal))
        print(f"hop1  Lk={Lk:6d}: xla {t_xla:8.3f} ms  pallas {t_pal:8.3f} ms",
              file=sys.stderr)

    def crossover(rows):
        for Lk, t_xla, t_pal in rows:
            if t_pal < t_xla:
                return Lk
        return None

    print(f"\n## Kernel dispatch crossover ({dev.device_kind})\n")
    print("| kv len | flash XLA ms | flash Pallas ms | hop1 XLA ms | hop1 Pallas ms |")
    print("|---|---|---|---|---|")
    for (Lk, a, b), (_, c, d2) in zip(rows1, rows2):
        print(f"| {Lk} | {a:.3f} | {b:.3f} | {c:.3f} | {d2:.3f} |")
    print(f"\nflash crossover (first Pallas win): {crossover(rows1)}")
    print(f"hop1 crossover (first Pallas win): {crossover(rows2)}")


if __name__ == "__main__":
    main()
