#!/usr/bin/env python
"""Train-step time breakdown at the flagship configuration.

Measures nested prefixes of the step — encode, + decoder forward,
+ generator, + losses, + backward, + Adam update — each as a chain-difference
timing (see scripts/bench_train.py for why: block_until_ready does not sync
over this image's TPU tunnel).  Every chain threads an unprovably-zero
perturbation of the inputs through its iterations so XLA cannot CSE the
repeated applications into one (hazard documented in BENCH.md).

Stage deltas approximate the cost of each component; they are measured
sequentially on a shared tunnel, so treat ±10-20% as noise.

Usage: python scripts/bench_breakdown.py [--device cpu] [--iters 8] [--reps 5]
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--decode", type=int, default=0,
                    help="also run the decode-side breakdown (greedy rows "
                         "vs pointer generator vs beam bookkeeping)")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bist_tpu.config import ModelConfig, TrainConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.models.model import (
        apply_model, encode, forward_logprobs, init_model,
    )
    from bist_tpu.train.loop import TrainState, make_train_step
    from bist_tpu.train.losses import compute_losses
    from bist_tpu.train.schedule import make_optimizer

    dev = jax.devices()[0]
    n_it = args.iters
    print(f"device: {dev.platform} ({dev.device_kind}), batch={args.batch}, "
          f"chained steps={n_it}", file=sys.stderr)
    rng = np.random.default_rng(0)
    B, Lq, Lh, Lc, Lt, T, S, Dv = args.batch, 16, 64, 16, 16, 16, 16, 2048
    V = 4000

    def toks(L):
        x = rng.integers(4, V, size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        return x

    batch = Batch(query=toks(Lq), his=toks(Lh), trg=toks(Lt), trg_y=toks(Lt),
                  cap=toks(Lc),
                  fts=rng.standard_normal((B, T, S, Dv)).astype(np.float32),
                  audio_fts=None)
    batch = jax.tree_util.tree_map(
        lambda x: None if x is None else jax.device_put(x), batch,
        is_leaf=lambda x: x is None)

    cfg = ModelConfig(vocab_size=V, nb_blocks=3, nb_venc_blocks=3,
                      nb_cenc_blocks=3, d_model=128, att_h=8, dropout=0.2,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(Dv,), enc_st_combine="none",
                      enc_vc_combine="dyn", dec_st_combine="seq")
    tcfg = TrainConfig(warmup_steps=13000, batch_size=B)
    params = jax.device_put(init_model(jax.random.PRNGKey(0), cfg))
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps)
    state = jax.device_put(TrainState(params=params, opt_state=tx.init(params),
                                      step=jnp.zeros((), jnp.int32)))
    # rbg = the train.py default (TPU hardware RNG for dropout sites); the
    # committed breakdown table's full-step row was measured pre-switch with
    # threefry — the prng A/B (bench_pack_ab --what prng) holds both numbers
    key = jax.device_put(jax.random.key(1, impl="rbg"))
    raw_step = make_train_step(cfg, tcfg, tx, jit_compile=False)

    from bist_tpu.utils.benchtime import chain_diff_ms, unprovable_zero

    def perturbed(batch, c):
        return batch._replace(query=batch.query + unprovable_zero(c))

    # each stage: batch -> scalar (all feed the same chain harness)
    def s_encode(b):
        ft = encode(params, cfg, b, None)
        return sum(jnp.sum(v).astype(jnp.float32) for v in ft.values())

    def s_decoder(b):
        ft = apply_model(params, cfg, b, None)
        return jnp.sum(ft["decoded_text"]).astype(jnp.float32)

    def s_generator(b):
        logp, _ = forward_logprobs(params, cfg, b, None)
        return jnp.sum(logp).astype(jnp.float32)

    def s_loss(b):
        logp, ft = forward_logprobs(params, cfg, b, None)
        loss, _ = compute_losses(logp, ft, params["embed"]["lut"], cfg, b,
                                 tcfg.smoothing)
        return loss

    def s_grad(b):
        def lf(p):
            logp, ft = forward_logprobs(p, cfg, b, None)
            loss, _ = compute_losses(logp, ft, p["embed"]["lut"], cfg, b,
                                     tcfg.smoothing)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        return loss + jnp.sum(grads["embed"]["lut"][0]).astype(jnp.float32)

    stages = [("encode (text norms + vid proj)", s_encode),
              ("+ decoder forward", s_decoder),
              ("+ generator log-probs", s_generator),
              ("+ losses (incl. 4 AE generator passes)", s_loss),
              ("+ backward (value_and_grad)", s_grad)]

    def make_chain(fn):
        @partial(jax.jit, static_argnames="n")
        def chain(batch, n):
            def body(c, _):
                return c + fn(perturbed(batch, c)), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        return chain

    results = []
    for name, fn in stages:
        ch = make_chain(fn)
        for n in (n_it, 2 * n_it):
            float(ch(batch, n=n))     # compile + warm
        ms = chain_diff_ms(lambda n: float(ch(batch, n=n)), n_it, args.reps)
        results.append((name, ms))
        print(f"{name}: {ms:.2f} ms", file=sys.stderr)

    # full optimizer step (dropout active, Adam update) via the real step fn
    @partial(jax.jit, static_argnames="n")
    def step_chain(state, batch, key, n):
        def body(s, i):
            s2, m = raw_step(s, batch, jax.random.fold_in(key, i))
            return s2, m["loss"]

        _, losses = jax.lax.scan(body, state, jnp.arange(n))
        return jnp.sum(losses)

    for n in (n_it, 2 * n_it):
        float(step_chain(state, batch, key, n=n))
    full = chain_diff_ms(lambda n: float(step_chain(state, batch, key, n=n)),
                         n_it, args.reps)
    results.append(("full train step (dropout + Adam)", full))
    print(f"full train step: {full:.2f} ms", file=sys.stderr)

    print(f"\n## Train-step breakdown ({dev.device_kind}, batch {B}, "
          f"flagship d128 config)\n")
    print("| cumulative stage | ms | delta vs previous |")
    print("|---|---|---|")
    prev = 0.0
    for name, ms in results:
        print(f"| {name} | {ms:.2f} | {ms - prev:+.2f} |")
        prev = ms

    if args.decode:
        # Decode-side decomposition at matched row counts: greedy over
        # B*beam rows = the beam program's decoder work without the beam
        # bookkeeping (top-k, parent gather, completion tracking); the
        # ptr_gen=False variant drops the multi-pointer generator (params
        # are unused, not restructured, so the same pytree serves both).
        import dataclasses

        from bist_tpu.config import GenerateConfig
        from bist_tpu.decode.beam import beam_search, greedy_decode

        K = 5
        gcfg = GenerateConfig(maxlen=12, beam=K, penalty=1.0, nbest=5)
        gcfg1 = GenerateConfig(maxlen=12, beam=1, penalty=1.0, nbest=1)
        cfg_noptr = dataclasses.replace(cfg, ptr_gen=False)

        def d_beam(b):
            r = beam_search(params, cfg, b, gcfg)
            return jnp.sum(r.scores)

        def d_beam1(b):
            r = beam_search(params, cfg, b, gcfg1)
            return jnp.sum(r.scores)

        def d_greedy(b):
            return jnp.sum(greedy_decode(params, cfg, b, gcfg.maxlen)
                           .astype(jnp.float32))

        def d_greedy_noptr(b):
            return jnp.sum(greedy_decode(params, cfg_noptr, b, gcfg.maxlen)
                           .astype(jnp.float32))

        # all four at B input rows: greedy vs greedy-noptr isolates the
        # multi-pointer generator; beam(K=1) vs greedy isolates the beam
        # bookkeeping (top-k over K·V, parent gather, completion tracking) at
        # matched decoder rows; beam(K=5) vs beam(K=1) adds the 4 extra
        # row-batches per step + the wider top-k.
        dec_stages = [
            (f"greedy, tied softmax ({B} rows)", d_greedy_noptr, batch),
            (f"greedy, multi-pointer gen ({B} rows)", d_greedy, batch),
            (f"beam K=1 ({B} rows + bookkeeping)", d_beam1, batch),
            (f"beam K=5 (B={B}, the shipped program)", d_beam, batch),
        ]
        n_dec = max(2, n_it // 4)    # each iteration is a full 12-step decode
        print(f"\n## Decode breakdown ({dev.device_kind}, maxlen 12)\n")
        print("| program | ms/batch | delta |")
        print("|---|---|---|")
        prev = 0.0
        for name, fn, data in dec_stages:
            ch = make_chain(fn)
            for n in (n_dec, 2 * n_dec):
                float(ch(data, n=n))
            ms = chain_diff_ms(lambda n: float(ch(data, n=n)), n_dec,
                               args.reps)
            print(f"| {name} | {ms:.2f} | {ms - prev:+.2f} |")
            prev = ms


if __name__ == "__main__":
    main()
