#!/usr/bin/env python
"""Train-step dtype/width benchmark (VERDICT round-1 item #2).

Measures the full train step (forward + backward + Adam update) at several
model widths in f32 and bf16, scan-chaining N steps inside one jit reduced
to a host-fetched scalar (block_until_ready does NOT sync over this image's
TPU tunnel); per-step time is the (2n − n)-chain difference / n, cancelling
fixed dispatch/fetch overhead.

Usage: python scripts/bench_train.py [--device cpu] [--iters 8] [--widths 128,256,512]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--widths", default="128,256,512")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bist_tpu.config import ModelConfig, TrainConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.models.model import init_model
    from bist_tpu.train.loop import TrainState, make_train_step
    from bist_tpu.train.schedule import make_optimizer

    dev = jax.devices()[0]
    n_it = args.iters
    print(f"device: {dev.platform} ({dev.device_kind}), "
          f"batch={args.batch}, chained steps={n_it}", file=sys.stderr)
    rng = np.random.default_rng(0)
    B, Lq, Lh, Lc, Lt, T, S, Dv = args.batch, 16, 64, 16, 16, 16, 16, 2048

    def toks(L, V):
        x = rng.integers(4, V, size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        return x

    rows = []
    for d_model in [int(w) for w in args.widths.split(",")]:
        # flagship layout at 128 (3 blocks); reference train_configs defaults
        # at 512 (6 blocks); 256 interpolates
        nb = {128: 3, 256: 4, 512: 6}.get(d_model, 3)
        V = 4000
        batch = Batch(query=toks(Lq, V), his=toks(Lh, V), trg=toks(Lt, V),
                      trg_y=toks(Lt, V), cap=toks(Lc, V),
                      fts=rng.standard_normal((B, T, S, Dv)).astype(np.float32),
                      audio_fts=None)
        batch = jax.tree_util.tree_map(
            lambda x: None if x is None else jax.device_put(x), batch,
            is_leaf=lambda x: x is None)
        for dtype in ("float32", "bfloat16"):
            cfg = ModelConfig(vocab_size=V, nb_blocks=nb, nb_venc_blocks=nb,
                              nb_cenc_blocks=nb, d_model=d_model,
                              att_h=8, dropout=0.2,
                              include_caption="summary", separate_caption=True,
                              ft_sizes=(Dv,), enc_st_combine="none",
                              enc_vc_combine="dyn", dec_st_combine="seq",
                              dtype=dtype)
            tcfg = TrainConfig(warmup_steps=13000, batch_size=B)
            params = init_model(jax.random.PRNGKey(0), cfg)
            tx = make_optimizer(cfg.d_model, tcfg.warmup_steps)
            state = TrainState(params=params, opt_state=tx.init(params),
                               step=jnp.zeros((), jnp.int32))
            state = jax.device_put(state)
            raw_step = make_train_step(cfg, tcfg, tx, jit_compile=False)
            # rbg = the train.py default (TPU hardware RNG for dropout sites)
            key = jax.device_put(jax.random.key(1, impl="rbg"))

            from functools import partial

            @partial(jax.jit, static_argnames="n")
            def chain(state, batch, key, n):
                def body(s, i):
                    s2, m = raw_step(s, batch, jax.random.fold_in(key, i))
                    return s2, m["loss"]
                _, losses = jax.lax.scan(body, state, jnp.arange(n))
                return jnp.sum(losses)

            from bist_tpu.utils.benchtime import chain_diff_ms

            for n in (n_it, 2 * n_it):
                float(chain(state, batch, key, n=n))   # compile + warm
            ms = chain_diff_ms(lambda n: float(chain(state, batch, key, n=n)),
                               n_it, args.reps)
            rows.append((d_model, nb, dtype, ms))
            print(f"d_model={d_model} blocks={nb} {dtype}: {ms:.2f} ms/step",
                  file=sys.stderr)

    print(f"\n## Train step dtype sweep ({dev.device_kind}, batch {B})\n")
    print("| d_model | blocks | f32 ms/step | bf16 ms/step | bf16 speedup |")
    print("|---|---|---|---|---|")
    for i in range(0, len(rows), 2):
        d, nb, _, f32 = rows[i]
        _, _, _, b16 = rows[i + 1]
        print(f"| {d} | {nb} | {f32:.2f} | {b16:.2f} | {f32 / b16:.2f}x |")


if __name__ == "__main__":
    main()
