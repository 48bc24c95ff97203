#!/usr/bin/env python
"""Kernel dispatch-crossover sweep (VERDICT round-1 item #3).

Measures, on the attached accelerator, the kv-length crossover between the
XLA einsum paths and the Pallas kernels:

  1. flash attention (ops/flash_attention.py) vs the fused-einsum reference,
     at BiST head geometry (d_k = d_model/h = 16);
  2. fused hop-1 (ops/bist_kernels.py, kv-streamed) vs the projection-once
     einsum path, at the flagship hop shape (D=128, h=8, G=16 regions).

Timing methodology (this image's remote-TPU tunnel makes naive timing lie:
`block_until_ready()` returns without waiting — only a host fetch syncs):
the op is CHAINED inside one jitted lax.fori_loop (output feeds the next
iteration's query) REDUCED TO A SCALAR, fetched to host; per-iter time is
the difference between an n-iteration and a 2n-iteration chain divided by
n, cancelling all fixed dispatch/fetch overhead.  Weights are passed as jit
arguments, not closure constants.

Prints a markdown table (for BENCH.md) and the measured crossover points —
the source of the constants in bist_tpu/ops/dispatch.py.

Usage: python scripts/bench_kernels.py [--device cpu] [--iters 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bist_tpu.utils.benchtime import timeit_median


def timeit_scalar(fn, *args, reps=5):
    """Median wall time of fn(*args) where fn returns a SCALAR jax array;
    syncs by fetching the scalar (block_until_ready is a no-op over the
    tunnel).  Timing core shared with the other benches (utils/benchtime)."""
    float(fn(*args))                     # compile + warm
    return timeit_median(lambda: float(fn(*args)), reps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="")
    p.add_argument("--iters", type=int, default=32,
                   help="chained on-device iterations per timing call")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from bist_tpu.models.layers import mha_init
    from bist_tpu.ops.bist_kernels import bist_hop1_fused, hop1_reference
    from bist_tpu.ops.flash_attention import (attention_reference,
                                              flash_attention)

    dev = jax.devices()[0]
    n_it = args.iters
    print(f"device: {dev.platform} ({dev.device_kind}), chained iters={n_it}",
          file=sys.stderr)
    rng = np.random.default_rng(0)

    kv_lens = [256, 1024, 4096] if args.quick else \
        [256, 512, 1024, 2048, 4096, 8192, 16384]

    # --- 1. flash attention at BiST head geometry -------------------------
    G, Lq, d = 64, 16, 16

    @partial(jax.jit, static_argnames=("use_flash", "n"))
    def attn_chain(q, k, v, m, use_flash, n):
        def body(_, qc):
            if use_flash:
                return flash_attention(qc, k, v, m)
            return attention_reference(qc, k, v, m)
        return jnp.sum(jax.lax.fori_loop(0, n, body, q))

    def per_iter_ms(chain, *args, **kw):
        t1 = timeit_scalar(lambda *a: chain(*a, n=n_it, **kw), *args)
        t2 = timeit_scalar(lambda *a: chain(*a, n=2 * n_it, **kw), *args)
        return max(t2 - t1, 0.0) / n_it * 1e3

    rows1 = []
    for Lk in kv_lens:
        q = jax.device_put(rng.standard_normal((G, Lq, d)).astype(np.float32))
        k = jax.device_put(rng.standard_normal((G, Lk, d)).astype(np.float32))
        v = jax.device_put(rng.standard_normal((G, Lk, d)).astype(np.float32))
        m = jax.device_put((rng.random((G, Lk)) > 0.1).astype(np.int32))
        t_xla = per_iter_ms(attn_chain, q, k, v, m, use_flash=False)
        t_pal = per_iter_ms(attn_chain, q, k, v, m, use_flash=True)
        rows1.append((Lk, t_xla, t_pal))
        print(f"flash Lk={Lk:6d}: xla {t_xla:8.3f} ms  pallas {t_pal:8.3f} ms",
              file=sys.stderr)

    # --- 2. fused hop-1 at flagship shape ---------------------------------
    B, Gh, Lq2, D, h = 8, 16, 16, 128, 8
    params = mha_init(jax.random.PRNGKey(0), h, D)
    hop_params = {n: params[n] for n in ("wk", "wv", "wo")}

    @partial(jax.jit, static_argnames=("use_pallas", "n"))
    def hop_chain(x, qp, kv, m, hp, use_pallas, n):
        def body(_, carry):
            xc, qc = carry
            if use_pallas:
                out = bist_hop1_fused(xc, qc, kv, hp, h, m)
            else:
                out = hop1_reference(xc, qc, kv, hp, h, m)
            return out[:, 0], out[:, -1]
        xf, qf = jax.lax.fori_loop(0, n, body, (x, qp))
        return jnp.sum(xf) + jnp.sum(qf)

    rows2 = []
    for Lk in kv_lens:
        x = jax.device_put(rng.standard_normal((B, Lq2, D)).astype(np.float32))
        qp = jax.device_put(rng.standard_normal((B, Lq2, D)).astype(np.float32))
        kv = jax.device_put(
            rng.standard_normal((B, Gh, Lk, D)).astype(np.float32))
        m = jax.device_put((rng.random((B, 1, Lk)) > 0.1).astype(np.int32))
        t_xla = per_iter_ms(hop_chain, x, qp, kv, m, hop_params,
                            use_pallas=False)
        t_pal = per_iter_ms(hop_chain, x, qp, kv, m, hop_params,
                            use_pallas=True)
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
