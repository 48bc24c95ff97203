#!/usr/bin/env python
"""Training batch-scaling benchmark: ms/step, answer-tokens/s and MFU across
batch sizes (VERDICT round-2 item #2 — "publish a saturating operating
point").

The flagship config is latency-bound at batch 32 (BENCH.md); this script
sweeps the batch axis to find the throughput-optimal point and reports MFU
(model flops utilisation) there.  FLOPs per step come from XLA's own cost
analysis of the compiled step (compiled().cost_analysis()['flops']) — an
HLO-level count covering forward + backward + Adam, so the MFU numerator is
the program actually executed, not a hand-model.

Peak reference: TPU v5e ≈ 197 TFLOP/s bf16 (MXU).  f32 rows are reported
against the SAME peak (the v5e MXU has no faster f32 mode), so f32 MFU is
conservative-but-comparable.

Chain-difference methodology as scripts/bench_train.py (block_until_ready
does not sync over this image's tunnel; chains are data-dependent through
the carried TrainState so XLA cannot CSE the steps).

Usage:
  python scripts/bench_train_scaling.py [--device cpu] \
      [--widths 128,512] [--batches 32,64,128,256,512] [--dtypes float32,bfloat16]
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_FLOPS = 197e12     # bf16 MXU peak, single v5e chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--widths", default="128,512")
    ap.add_argument("--batches", default="32,64,128,256,512")
    ap.add_argument("--dtypes", default="float32,bfloat16")
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
    from bist_tpu.utils.benchtime import chain_diff_ms

    dev = jax.devices()[0]
    n_it = args.iters
    print(f"device: {dev.platform} ({dev.device_kind}), chained steps={n_it}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    Lq, Lh, Lc, Lt, T, S, Dv = 16, 64, 16, 16, 16, 16, 2048
    V = 4000

    def make_batch(B):
        def toks(L):
            x = rng.integers(4, V, size=(B, L)).astype(np.int32)
            x[:, -1] = 1
            return x

        # feature grids are generated ON DEVICE: at B=512 the f32 grid is
        # ~1 GiB, which would take many minutes through this harness's
        # ~0.1 GB/s tunnel; timing does not depend on feature content
        fts = jax.jit(lambda k: jax.random.normal(
            k, (B, T, S, Dv), jnp.float32))(jax.random.PRNGKey(B))
        b = Batch(query=toks(Lq), his=toks(Lh), trg=toks(Lt), trg_y=toks(Lt),
                  cap=toks(Lc), fts=fts, audio_fts=None)
        return jax.tree_util.tree_map(
            lambda x: None if x is None else jax.device_put(x), b,
            is_leaf=lambda x: x is None)

    rows = []
    widths = [int(w) for w in args.widths.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    dtypes = args.dtypes.split(",")
    for d_model in widths:
        nb = {128: 3, 256: 4, 512: 6}.get(d_model, 3)
        for dtype in dtypes:
            cfg = ModelConfig(vocab_size=V, nb_blocks=nb, nb_venc_blocks=nb,
                              nb_cenc_blocks=nb, d_model=d_model, att_h=8,
                              dropout=0.2, include_caption="summary",
                              separate_caption=True, ft_sizes=(Dv,),
                              enc_st_combine="none", enc_vc_combine="dyn",
                              dec_st_combine="seq", dtype=dtype)
            tcfg = TrainConfig(warmup_steps=13000)
            params = init_model(jax.random.PRNGKey(0), cfg)
            tx = make_optimizer(cfg.d_model, tcfg.warmup_steps)
            state = jax.device_put(TrainState(
                params=params, opt_state=tx.init(params),
                step=jnp.zeros((), jnp.int32)))
            raw_step = make_train_step(cfg, tcfg, tx, jit_compile=False,
                                       donate=False)
            key = jax.device_put(jax.random.key(1, impl="rbg"))

            @partial(jax.jit, static_argnames="n")
            def chain(state, batch, key, n):
                def body(s, i):
                    s2, m = raw_step(s, batch, jax.random.fold_in(key, i))
                    return s2, m["loss"]

                _, losses = jax.lax.scan(body, state, jnp.arange(n))
                return jnp.sum(losses)

            for B in batches:
                batch = make_batch(B)
                try:
                    # AOT-compile both chain lengths once; the n_it chain's
                    # cost analysis / n_it is the per-step FLOPs (same
                    # program the timing runs — no extra compile)
                    compiled = {n: chain.lower(state, batch, key, n=n)
                                .compile() for n in (n_it, 2 * n_it)}
                    try:
                        ca = compiled[n_it].cost_analysis()
                        if isinstance(ca, list):
                            ca = ca[0]
                        flops = float(ca.get("flops",
                                             float("nan"))) / n_it
                    except Exception as e:   # cost model backend-dependent
                        print(f"cost_analysis failed ({e}); flops=nan",
                              file=sys.stderr)
                        flops = float("nan")
                    for n in (n_it, 2 * n_it):
                        float(compiled[n](state, batch, key))   # warm
                    ms = chain_diff_ms(
                        lambda n: float(compiled[n](state, batch, key)),
                        n_it, args.reps)
                except Exception as e:
                    print(f"d={d_model} {dtype} B={B}: FAILED ({e})",
                          file=sys.stderr)
                    rows.append((d_model, nb, dtype, B, float("nan"),
                                 float("nan"), float("nan")))
                    continue
                ans_tok_s = B * Lt / (ms / 1e3)
                mfu = flops / (ms / 1e3) / V5E_PEAK_FLOPS
                rows.append((d_model, nb, dtype, B, ms, ans_tok_s, mfu))
                print(f"d={d_model} blocks={nb} {dtype} B={B}: {ms:.2f} "
                      f"ms/step, {ans_tok_s / 1e3:.1f}k answer-tok/s, "
                      f"MFU {mfu * 100:.1f}% ({flops / 1e9:.1f} GFLOP/step)",
                      file=sys.stderr)

    print(f"\n## Train batch scaling ({dev.device_kind})\n")
    print("| d_model | blocks | dtype | batch | ms/step | answer-tok/s | MFU |")
    print("|---|---|---|---|---|---|---|")
    for d, nb, dt, B, ms, tok, mfu in rows:
        print(f"| {d} | {nb} | {dt} | {B} | {ms:.2f} | {tok / 1e3:.1f}k "
              f"| {mfu * 100:.1f}% |")


if __name__ == "__main__":
    main()
