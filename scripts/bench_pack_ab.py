#!/usr/bin/env python
"""Interleaved A/B benchmark: packed vs separate q/k/v projections.

Separate-process A/B on this image's tunnelled TPU is drowned by tunnel
weather (±20% run to run).  This script compiles BOTH lowerings in one
process — bist_tpu.models.layers.PACK_PROJECTIONS is read at trace time, so
two distinct jit wrappers traced under different flag values produce the two
programs — and interleaves timed reps ABAB... in the same tunnel window.
Chain-difference methodology as scripts/bench_train.py (block_until_ready
does not sync over this tunnel; only host fetches do).

Usage: python scripts/bench_pack_ab.py [--device cpu] [--iters 8] [--reps 5]
       [--what train|decode|both]
"""

import argparse
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--what", default="both",
                    choices=["train", "decode", "prng", "adam", "presplit",
                             "cachedtype", "unroll", "computedtype",
                             "batchsize", "bdcross", "regroupmm",
                             "decodeops", "earlyexit", "encodedtype",
                             "ctxshare", "cachelayout", "headslast",
                             "trainheads", "layoutcombo", "scoresqhk",
                             "scoresqhkdecode", "both"])
    ap.add_argument("--batch-b", type=int, default=96,
                    help="the B side of --what batchsize (decode-throughput "
                         "A/B of two batch sizes in one tunnel window)")
    ap.add_argument("--cache-a", default="bfloat16",
                    help="A-side cache_dtype for --what cachedtype")
    ap.add_argument("--cache-b", default="float32",
                    help="B-side cache_dtype for --what cachedtype")
    ap.add_argument("--unroll", type=int, default=3,
                    help="beam-scan unroll factor for --what unroll")
    ap.add_argument("--unroll-b", type=int, default=1,
                    help="baseline unroll factor for --what unroll (head-to-"
                         "head A/B of two candidates in one tunnel window)")
    ap.add_argument("--d-model", type=int, default=128,
                    help="model width (128 = flagship; 512 = reference "
                         "default width) for regime-dependent A/Bs")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.device != "cpu":
        # persistent cache: cuts the multi-minute remote axon compiles.  NOT
        # on CPU — the CPU backend AOT-loads cache entries whose recorded
        # machine features can mismatch the host (XLA cpu_aot_loader warns of
        # possible SIGILL), and a differently-specialized executable would
        # skew the very timing this harness exists to make trustworthy.
        from bist_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    from bist_tpu.config import GenerateConfig, ModelConfig, TrainConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.models import layers
    from bist_tpu.utils.benchtime import unprovable_zero
    from bist_tpu.models.model import init_model
    from bist_tpu.train.loop import TrainState, make_train_step
    from bist_tpu.train.schedule import make_optimizer

    dev = jax.devices()[0]
    n_it = args.iters
    print(f"device: {dev.platform} ({dev.device_kind}), batch={args.batch}, "
          f"d_model={args.d_model}, chained steps={n_it}, reps={args.reps} "
          "interleaved", file=sys.stderr)
    rng = np.random.default_rng(0)
    B, Lq, Lh, Lc, Lt, T, S, Dv = args.batch, 16, 64, 16, 16, 16, 16, 2048
    V = 4000

    def make_batch(Bv):
        def toks(L):
            x = rng.integers(4, V, size=(Bv, L)).astype(np.int32)
            x[:, -1] = 1
            return x

        b = Batch(query=toks(Lq), his=toks(Lh), trg=toks(Lt), trg_y=toks(Lt),
                  cap=toks(Lc),
                  fts=rng.standard_normal((Bv, T, S, Dv)).astype(np.float32),
                  audio_fts=None)
        return jax.tree_util.tree_map(
            lambda x: None if x is None else jax.device_put(x), b,
            is_leaf=lambda x: x is None)

    batch = make_batch(B)

    cfg = ModelConfig(vocab_size=V, nb_blocks=3, nb_venc_blocks=3,
                      nb_cenc_blocks=3, d_model=args.d_model, att_h=8,
                      dropout=0.2,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(Dv,), enc_st_combine="none",
                      enc_vc_combine="dyn", dec_st_combine="seq")
    tcfg = TrainConfig(warmup_steps=13000, batch_size=B)
    params = init_model(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps)
    state = jax.device_put(TrainState(params=params, opt_state=tx.init(params),
                                      step=jnp.zeros((), jnp.int32)))
    key = jax.device_put(jax.random.PRNGKey(1))

    def build_train_chain(pack: bool, presplit: int = 0, warm_key=None):
        layers.PACK_PROJECTIONS = pack
        raw_step = make_train_step(cfg, tcfg, tx, jit_compile=False,
                                   rng_presplit=presplit)
        warm_key = key if warm_key is None else warm_key

        @partial(jax.jit, static_argnames="n")
        def chain(state, batch, key, n):
            def body(s, i):
                s2, m = raw_step(s, batch, jax.random.fold_in(key, i))
                return s2, m["loss"]

            _, losses = jax.lax.scan(body, state, jnp.arange(n))
            return jnp.sum(losses)

        # warm both chain lengths NOW, while the flag is set (trace time)
        for n in (n_it, 2 * n_it):
            float(chain(state, batch, warm_key, n=n))
        return chain

    def interleave(fa, fb, reps):
        a, b = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); fa(); a.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); fb(); b.append(time.perf_counter() - t0)
        return statistics.median(a), statistics.median(b)

    gcfg = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5)

    # Decode chains honour --iters too: chain lengths (d_lo, 3*d_lo), the
    # 2*d_lo-call difference is the timed signal.  The first cut hard-coded
    # (2, 6) — ~44 ms of signal at flagship shapes, comparable to tunnel-RTT
    # jitter; the session-6 decider protocol (BENCH.md) wants >=8/24.
    d_lo = max(2, n_it)
    d_hi = 3 * d_lo
    d_div = d_hi - d_lo

    def build_decode_chain(pack: bool, gc: "GenerateConfig" = None,
                           unroll: int = 1):
        layers.PACK_PROJECTIONS = pack
        gc = gcfg if gc is None else gc

        @partial(jax.jit, static_argnames="n")
        def chain(params, batch, n):
            def body(c, _):
                # data-dependence between iterations, or XLA CSEs the
                # identical beam programs into one (measured: it does) —
                # bist_tpu.utils.benchtime docstring
                b2 = batch._replace(query=batch.query + unprovable_zero(c))
                r = beam_search(params, cfg, b2, gc, unroll=unroll)
                return c + jnp.sum(r.scores), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        for n in (d_lo, d_hi):
            float(chain(params, batch, n=n))
        return chain

    def decode_ab(dc_a, dc_b, label_a, label_b, batch_a=None, batch_b=None,
                  check_match=False, resp=None, extra=""):
        """The shared decode-chain A/B skeleton: time both chains at d_lo
        and d_hi interleaved ABAB in one tunnel window, difference the two
        chain lengths (the only tunnel-robust signal — BENCH.md
        methodology), print per-call ms + A-over-B speedup.  `resp=(Ba,Bb)`
        prints throughput (resp/s) instead; `check_match` compares the two
        d_lo chain sums first (bit-exactness double-check for sides that
        claim identical semantics)."""
        ba = batch if batch_a is None else batch_a
        bb = batch if batch_b is None else batch_b
        note = ""
        if check_match:
            va = float(dc_a(params, ba, n=d_lo))
            vb = float(dc_b(params, bb, n=d_lo))
            note = ("; score sums identical" if va == vb
                    else f"; score sums MISMATCH {va} vs {vb}")
        a_1, b_1 = interleave(lambda: float(dc_a(params, ba, n=d_lo)),
                              lambda: float(dc_b(params, bb, n=d_lo)),
                              args.reps)
        a_2, b_2 = interleave(lambda: float(dc_a(params, ba, n=d_hi)),
                              lambda: float(dc_b(params, bb, n=d_hi)),
                              args.reps)
        ms_a = max(a_2 - a_1, 1e-9) / d_div * 1e3
        ms_b = max(b_2 - b_1, 1e-9) / d_div * 1e3
        if resp:
            ra, rb = resp[0] / ms_a * 1e3, resp[1] / ms_b * 1e3
            print(f"beam decode  {label_a}: {ms_a:.2f} ms/call = "
                  f"{ra:.0f} resp/s  {label_b}: {ms_b:.2f} ms/call = "
                  f"{rb:.0f} resp/s  ({label_a} speedup "
                  f"{ra / max(rb, 1e-9):.3f}x{extra}{note})")
        else:
            print(f"beam batch  {label_a}: {ms_a:.2f} ms  "
                  f"{label_b}: {ms_b:.2f} ms  ({label_a} speedup "
                  f"{ms_b / max(ms_a, 1e-9):.3f}x{extra}{note})")
        return ms_a, ms_b

    if args.what == "cachedtype":
        # decode-memory storage dtype A/B (KV cache + precomputed ctx +
        # pointer sources; scores accumulate f32 either way).  --cache-a/-b
        # pick the two sides: bf16-vs-f32 was the round-3 decider (1.68x);
        # fp8-vs-bf16 is the round-4 storage-halving candidate.
        dc_a = build_decode_chain(False, gc=GenerateConfig(
            maxlen=12, beam=5, penalty=1.0, nbest=5,
            cache_dtype=args.cache_a))
        dc_b = build_decode_chain(False, gc=GenerateConfig(
            maxlen=12, beam=5, penalty=1.0, nbest=5,
            cache_dtype=args.cache_b))
        decode_ab(dc_a, dc_b, f"{args.cache_a}-cache", f"{args.cache_b}-cache",
                  extra=f"; batch {B}")

    if args.what == "unroll":
        # beam-scan unroll A/B: replicate the decode-step loop body `unroll`x
        # inside the scan (identical numerics; trades program size for loop
        # overhead and cross-step scheduling freedom).  Uses the shipped bf16
        # cache default.
        gc_bf = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                               cache_dtype="bfloat16")
        dc_un = build_decode_chain(False, gc=gc_bf, unroll=args.unroll)
        dc_1 = build_decode_chain(False, gc=gc_bf, unroll=args.unroll_b)
        decode_ab(dc_un, dc_1, f"unroll={args.unroll}",
                  f"unroll={args.unroll_b}", extra=f"; batch {B}")

    if args.what == "batchsize":
        # decode batch-size A/B in THROUGHPUT terms (resp/s) under the
        # shipped bf16-cache default.  The round-3 B sweep (64 → 4126,
        # 96 → 3919, 128 → 3464 resp/s) ran same-window but NOT interleaved;
        # at the session-6 noise floor the 64-vs-96 margin (5%) needs a
        # decider read.  Both batch shapes go through ONE chain wrapper
        # (jit specializes per shape), interleaved ABAB.
        gc_bf = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                               cache_dtype="bfloat16")
        batch_b = make_batch(args.batch_b)
        dc = build_decode_chain(False, gc=gc_bf, unroll=args.unroll)
        for n in (d_lo, d_hi):                  # warm the B-side shapes
            float(dc(params, batch_b, n=n))
        decode_ab(dc, dc, f"B={args.batch}", f"B={args.batch_b}",
                  batch_b=batch_b, resp=(args.batch, args.batch_b))

    if args.what == "earlyexit":
        # Exact early termination of the beam while-loop (GenerateConfig.
        # early_exit) vs the fixed-maxlen scan, both on the shipped
        # bf16-cache default.  The saved steps are DATA-DEPENDENT (this
        # harness decodes a random-init model — document the regime next to
        # the number).  The chain sums r.scores, so identical A/B return
        # values double-check the bit-exactness claim on-chip.
        gc_s = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                              cache_dtype="bfloat16")
        gc_e = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                              cache_dtype="bfloat16", early_exit=True)
        dc_e = build_decode_chain(False, gc=gc_e, unroll=args.unroll)
        dc_s = build_decode_chain(False, gc=gc_s, unroll=args.unroll)
        decode_ab(dc_e, dc_s, "early-exit", "full-scan", check_match=True,
                  extra=f"; batch {B}, unroll {args.unroll}")

    if args.what == "computedtype":
        # decode-step activation dtype A/B on top of the shipped bf16-cache +
        # unroll defaults: bf16 step GEMMs (scores/generator stay f32) vs f32
        gc_f = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                              cache_dtype="bfloat16")
        gc_b = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                              cache_dtype="bfloat16",
                              compute_dtype="bfloat16")
        dc_b = build_decode_chain(False, gc=gc_b, unroll=args.unroll)
        dc_f = build_decode_chain(False, gc=gc_f, unroll=args.unroll)
        decode_ab(dc_b, dc_f, "bf16-compute", "f32-compute",
                  extra=f"; batch {B}, unroll {args.unroll}")

    if args.what == "encodedtype":
        # ctx-PRECOMPUTE activation dtype A/B (GenerateConfig.encode_dtype):
        # the encoder + BiST reasoning stack run once per batch BEFORE the
        # step loop and are MXU-bound over full sequences — the opposite
        # regime of the per-step GEMMs where bf16 compute measured 0.57x.
        # Both sides keep the shipped bf16 cache + unroll.
        gc_f = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                              cache_dtype="bfloat16")
        gc_e = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                              cache_dtype="bfloat16",
                              encode_dtype="bfloat16")
        dc_e = build_decode_chain(False, gc=gc_e, unroll=args.unroll)
        dc_f = build_decode_chain(False, gc=gc_f, unroll=args.unroll)
        decode_ab(dc_e, dc_f, "bf16-encode", "f32-encode",
                  extra=f"; batch {B}, unroll {args.unroll}")

    if args.what == "ctxshare":
        # How much of a generate call is ctx PRECOMPUTE vs the step loop?
        # Side A = the full beam call, side B = precompute_decode_ctx alone
        # (reduced over every float leaf so XLA cannot dead-code-eliminate
        # any layer's projections).  B/A is the share the encode_dtype knob
        # can touch; (A - B) bounds the step loop + finalize.
        from bist_tpu.models.model import precompute_decode_ctx

        gc_bf = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                               cache_dtype="bfloat16")

        @partial(jax.jit, static_argnames="n")
        def ctx_chain(params, batch, n):
            def body(c, _):
                b2 = batch._replace(query=batch.query + unprovable_zero(c))
                ctx = precompute_decode_ctx(params, cfg, b2,
                                            dtype=jnp.bfloat16)
                s = sum(jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree_util.tree_leaves(ctx)
                        if jnp.issubdtype(x.dtype, jnp.inexact))
                return c + s, None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        for n in (d_lo, d_hi):
            float(ctx_chain(params, batch, n=n))
        dc_full = build_decode_chain(False, gc=gc_bf, unroll=args.unroll)
        ms_full, ms_ctx = decode_ab(
            dc_full, ctx_chain, "full-beam-call", "ctx-precompute-only",
            extra=f"; batch {B}, unroll {args.unroll}")
        print(f"ctx-precompute share: {ms_ctx / max(ms_full, 1e-9):.1%} "
              f"of the full call ({ms_ctx:.2f} of {ms_full:.2f} ms)")

    def flag_chain_ab(set_flag, label_a, label_b):
        """A/B a trace-time module flag over the shipped bf16-cache decode
        chain: build both programs (flag read at trace time), then run the
        shared decode_ab skeleton."""
        gc_bf = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=5,
                               cache_dtype="bfloat16")

        def build(v: bool):
            set_flag(v)
            return build_decode_chain(False, gc=gc_bf, unroll=args.unroll)

        dc_a, dc_b = build(True), build(False)
        decode_ab(dc_a, dc_b, label_a, label_b,
                  extra=f"; batch {B}, unroll {args.unroll}")

    if args.what == "bdcross":
        # Block-diagonal short-source cross-attention (models/model.py
        # BIST_BD_CROSS) vs the per-head layout.
        from bist_tpu.models import model as model_mod

        flag_chain_ab(lambda v: setattr(model_mod, "BD_CROSS", v),
                      "bd-cross", "per-head")

    if args.what == "regroupmm":
        # KV-cache parent regroup: one-hot matmul vs take_along_axis gather
        # (decode/beam.py BIST_REGROUP_MM).
        from bist_tpu.decode import beam as beam_mod

        flag_chain_ab(lambda v: setattr(beam_mod, "REGROUP_MM", v),
                      "regroup-mm", "gather")

    if args.what == "cachelayout":
        # KV-cache storage: per-layer tuples vs one stacked (layers, ...)
        # array (models/model.py SPLIT_CACHE).  Motivated by the round-4
        # device-timeline profile: the stacked layout pays an unstack +
        # whole-cache layout-change copies every scan iteration
        # (scripts/decode_profile.py; BENCH.md round 4 session 12).
        from bist_tpu.models import model as model_mod

        flag_chain_ab(lambda v: setattr(model_mod, "SPLIT_CACHE", v),
                      "split-cache", "stacked-cache")

    if args.what == "layoutcombo":
        # BOTH profile-motivated layout options together (heads-last
        # attention + per-layer split KV cache) vs both off — the A/B that
        # decides the combined default flip (the individual deciders
        # attribute the win; tests/test_heads_last.py guards composition).
        from bist_tpu.models import model as model_mod

        def set_both(v: bool):
            layers.HEADS_LAST = v
            model_mod.SPLIT_CACHE = v

        flag_chain_ab(set_both, "both-layouts", "baseline")

    if args.what == "headslast":
        # Heads-LAST attention layout (layers.HEADS_LAST): head axis stays
        # (..., L, h, d_k) — free reshape — instead of the split_heads
        # moveaxis that the round-4 device timeline showed materialising as
        # ~80 GB/s layout-change copies in the decode-ctx precompute
        # (scripts/decode_profile.py; BENCH.md round 4).  A/Bs the full
        # decode chain (ctx share ~32%) AND the train step (mha everywhere).
        flag_chain_ab(lambda v: setattr(layers, "HEADS_LAST", v),
                      "heads-last", "split-heads")

    if args.what in ("headslast", "trainheads"):
        # trainheads = the TRAIN-STEP half alone (the r4i session died
        # before this line printed; re-running just this costs one decider
        # window instead of two)
        def build_hl_train(v: bool):
            layers.HEADS_LAST = v
            return build_train_chain(False)

        ch_a, ch_b = build_hl_train(True), build_hl_train(False)
        a_n, b_n = interleave(lambda: float(ch_a(state, batch, key, n=n_it)),
                              lambda: float(ch_b(state, batch, key, n=n_it)),
                              args.reps)
        a_2n, b_2n = interleave(
            lambda: float(ch_a(state, batch, key, n=2 * n_it)),
            lambda: float(ch_b(state, batch, key, n=2 * n_it)), args.reps)
        a = max(a_2n - a_n, 0.0) / n_it * 1e3
        b = max(b_2n - b_n, 0.0) / n_it * 1e3
        print(f"train step  heads-last: {a:.2f} ms  split-heads: {b:.2f} ms  "
              f"(heads-last speedup {b / max(a, 1e-9):.3f}x)")

    if args.what == "scoresqhk":
        # round-5 train-step timeline finding (scripts/train_profile.py):
        # ~2.5 ms/step of (B,T,S,h,dk) <-> (B,T,h,S,dk) relayout copies
        # around the grid-attention einsums.  SCORES_QHK keeps the score/
        # attn tensors as (..., q, h, k) so h never moves in front of the
        # sequence axes.  Train-step A/B at flagship geometry.
        def build_qhk_train(v: bool):
            layers.SCORES_QHK = v
            return build_train_chain(False)

        ch_a, ch_b = build_qhk_train(True), build_qhk_train(False)
        a_n, b_n = interleave(lambda: float(ch_a(state, batch, key, n=n_it)),
                              lambda: float(ch_b(state, batch, key, n=n_it)),
                              args.reps)
        a_2n, b_2n = interleave(
            lambda: float(ch_a(state, batch, key, n=2 * n_it)),
            lambda: float(ch_b(state, batch, key, n=2 * n_it)), args.reps)
        a = max(a_2n - a_n, 0.0) / n_it * 1e3
        b = max(b_2n - b_n, 0.0) / n_it * 1e3
        print(f"train step  scores-qhk: {a:.2f} ms  scores-hqk: {b:.2f} ms  "
              f"(qhk speedup {b / max(a, 1e-9):.3f}x)")

    if args.what == "scoresqhkdecode":
        # the decode-side half of the same flag (beam chain, bf16 cache)
        flag_chain_ab(lambda v: setattr(layers, "SCORES_QHK", v),
                      "scores-qhk", "scores-hqk")

    if args.what == "decodeops":
        # ISOLATED op-level costs of one decode-step cross-attention at
        # flagship shapes (B=batch, beam=5, h=8, d_k=16): per-head layout
        # (the (B·h)-batched d_k=16 matmuls) vs block-diagonal (two
        # B-batched dense GEMMs) vs the bare q-projection GEMM.  Chained
        # per-op timing — this is the op-count budget VERDICT r3 #5 asks
        # for, per op instead of per step.
        from bist_tpu.models.layers import linear_init, split_heads
        from bist_tpu.models.model import _bd_kv, _mha_cross_cached

        h, dk = cfg.att_h, cfg.d_model // cfg.att_h
        beam = 5
        rngk = jax.random.PRNGKey(7)
        p_attn = {w: linear_init(jax.random.fold_in(rngk, i),
                                 cfg.d_model, cfg.d_model)
                  for i, w in enumerate(("wq", "wk", "wv", "wo"))}
        p_attn = jax.device_put(p_attn)
        x0 = jax.device_put(jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (B * beam, 1, cfg.d_model)), jnp.float32))
        for name, Lk in (("query/temporal/spatial/cap (Lk=32)", 32),
                         ("his (Lk=256)", 256)):
            Kh = jax.device_put(jnp.asarray(
                np.random.default_rng(1).standard_normal(
                    (B, h, Lk, dk)), jnp.bfloat16))
            Vh = jax.device_put(jnp.asarray(
                np.random.default_rng(2).standard_normal(
                    (B, h, Lk, dk)), jnp.bfloat16))
            Kbd, Vbd = jax.jit(_bd_kv)(Kh, Vh)
            mask = jax.device_put(
                jnp.ones((B, 1, Lk), jnp.int32))

            def build_attn_chain(KV):
                @partial(jax.jit, static_argnames="n")
                def chain(x, n):
                    def body(c, _):
                        xi = x + unprovable_zero(c).astype(x.dtype)
                        o = _mha_cross_cached(p_attn, h, xi, KV, mask, beam)
                        return c + jnp.sum(o).astype(jnp.float32), None

                    out, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                          length=n)
                    return out

                return chain

            # chain long enough that the (2n − n) wall-time difference
            # clears the tunnel's multi-ms per-call RTT jitter: at ~10 us/op
            # 512 ops ≈ 5 ms of signal; 64 was measured as 0.0 (round 4)
            n_op = 512
            ch_ph = build_attn_chain((Kh, Vh))
            ch_bd = build_attn_chain((Kbd, Vbd))
            for ch in (ch_ph, ch_bd):
                for n in (n_op, 2 * n_op):
                    float(ch(x0, n=n))
            a_1, b_1 = interleave(lambda: float(ch_bd(x0, n=n_op)),
                                  lambda: float(ch_ph(x0, n=n_op)),
                                  args.reps)
            a_2, b_2 = interleave(lambda: float(ch_bd(x0, n=2 * n_op)),
                                  lambda: float(ch_ph(x0, n=2 * n_op)),
                                  args.reps)
            bd_us = max(a_2 - a_1, 0.0) / n_op * 1e6
            ph_us = max(b_2 - b_1, 0.0) / n_op * 1e6
            print(f"cross-attn [{name}]  per-head: {ph_us:.1f} us/op  "
                  f"block-diag: {bd_us:.1f} us/op  "
                  f"(bd speedup {ph_us / max(bd_us, 1e-9):.3f}x; "
                  f"{B * beam} rows)")

    if args.what == "adam":
        # optimizer-update lowering A/B: per-leaf Adam (~6 elementwise ops x
        # ~hundreds of small param leaves) vs optax.flatten (params raveled
        # into one vector -> a handful of big fused ops).  Numerically exact.
        import optax

        key_rbg = jax.device_put(jax.random.key(1, impl="rbg"))

        def build_opt_chain(flat: bool):
            layers.PACK_PROJECTIONS = False
            tx_u = optax.flatten(tx) if flat else tx
            st = jax.device_put(TrainState(
                params=params, opt_state=tx_u.init(params),
                step=jnp.zeros((), jnp.int32)))
            raw = make_train_step(cfg, tcfg, tx_u, jit_compile=False)

            @partial(jax.jit, static_argnames="n")
            def chain(state, batch, key, n):
                def body(s, i):
                    s2, m = raw(s, batch, jax.random.fold_in(key, i))
                    return s2, m["loss"]

                _, losses = jax.lax.scan(body, state, jnp.arange(n))
                return jnp.sum(losses)

            for n in (n_it, 2 * n_it):
                float(chain(st, batch, key_rbg, n=n))
            return lambda n: float(chain(st, batch, key_rbg, n=n))

        ch_flat = build_opt_chain(True)
        ch_tree = build_opt_chain(False)
        a_n, b_n = interleave(lambda: ch_flat(n_it), lambda: ch_tree(n_it),
                              args.reps)
        a_2n, b_2n = interleave(lambda: ch_flat(2 * n_it),
                                lambda: ch_tree(2 * n_it), args.reps)
        fl = max(a_2n - a_n, 0.0) / n_it * 1e3
        tr = max(b_2n - b_n, 0.0) / n_it * 1e3
        print(f"train step  flat-adam: {fl:.2f} ms  tree-adam: {tr:.2f} ms  "
              f"(flatten speedup {tr / max(fl, 1e-9):.3f}x)")

    if args.what == "prng":
        # dropout RNG impl A/B: threefry (jax default; ~60 fold_in+bernoulli
        # sites per step, each a software threefry chain) vs rbg (TPU
        # hardware RNG instruction).  Same step function; the key's impl
        # decides the lowering.
        ch = build_train_chain(False)
        key_tf = jax.device_put(jax.random.PRNGKey(1))
        key_rbg = jax.device_put(jax.random.key(1, impl="rbg"))
        for k in (key_tf, key_rbg):
            for n in (n_it, 2 * n_it):
                float(ch(state, batch, k, n=n))
        a_n, b_n = interleave(lambda: float(ch(state, batch, key_rbg, n=n_it)),
                              lambda: float(ch(state, batch, key_tf, n=n_it)),
                              args.reps)
        a_2n, b_2n = interleave(
            lambda: float(ch(state, batch, key_rbg, n=2 * n_it)),
            lambda: float(ch(state, batch, key_tf, n=2 * n_it)), args.reps)
        rbg = max(a_2n - a_n, 0.0) / n_it * 1e3
        tf = max(b_2n - b_n, 0.0) / n_it * 1e3
        print(f"train step  rbg: {rbg:.2f} ms  threefry: {tf:.2f} ms  "
              f"(rbg speedup {tf / max(rbg, 1e-9):.3f}x)")

    if args.what == "presplit":
        # dropout site-key derivation A/B: one vectorized split of 128 keys
        # vs ~60 per-site fold_in hash chains (layers.RngGen presplit).
        # Both run under the shipped rbg dropout keys.
        key_rbg = jax.device_put(jax.random.key(1, impl="rbg"))
        ch_pre = build_train_chain(False, presplit=128, warm_key=key_rbg)
        ch_fold = build_train_chain(False, presplit=0, warm_key=key_rbg)
        a_n, b_n = interleave(
            lambda: float(ch_pre(state, batch, key_rbg, n=n_it)),
            lambda: float(ch_fold(state, batch, key_rbg, n=n_it)), args.reps)
        a_2n, b_2n = interleave(
            lambda: float(ch_pre(state, batch, key_rbg, n=2 * n_it)),
            lambda: float(ch_fold(state, batch, key_rbg, n=2 * n_it)),
            args.reps)
        pre = max(a_2n - a_n, 0.0) / n_it * 1e3
        fold = max(b_2n - b_n, 0.0) / n_it * 1e3
        print(f"train step  presplit: {pre:.2f} ms  fold_in: {fold:.2f} ms  "
              f"(presplit speedup {fold / max(pre, 1e-9):.3f}x)")

    if args.what in ("train", "both"):
        ch_pack = build_train_chain(True)
        ch_sep = build_train_chain(False)
        pa_n, se_n = interleave(lambda: float(ch_pack(state, batch, key, n=n_it)),
                                lambda: float(ch_sep(state, batch, key, n=n_it)),
                                args.reps)
        pa_2n, se_2n = interleave(
            lambda: float(ch_pack(state, batch, key, n=2 * n_it)),
            lambda: float(ch_sep(state, batch, key, n=2 * n_it)), args.reps)
        pa = max(pa_2n - pa_n, 0.0) / n_it * 1e3
        se = max(se_2n - se_n, 0.0) / n_it * 1e3
        print(f"train step  packed: {pa:.2f} ms  separate: {se:.2f} ms  "
              f"(packed speedup {se / max(pa, 1e-9):.3f}x)")

    if args.what in ("decode", "both"):
        dc_pack = build_decode_chain(True)
        dc_sep = build_decode_chain(False)
        decode_ab(dc_pack, dc_sep, "packed", "separate", resp=(B, B),
                  extra=f"; batch {B}")


if __name__ == "__main__":
    main()
