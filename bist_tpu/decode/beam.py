"""Batched beam search + greedy decoding as single compiled programs.

Scoring parity with the reference `beam_search_decode` (model/decode.py:53-104):
  * cumulative log-prob expansion with a fixed-size beam = top-`beam`
    continuations (the reference's argmin-eviction loop computes exactly the
    top-beam set, decode.py:79-97);
  * completion candidates at every step l ≥ min_len with score
    lp[<eos>] + penalty · (len + 1), collected across ALL steps and ranked at
    the end (decode.py:73-77, 100-104);
  * <unk> always banned from expansion; <eos> banned unless dec_eos
    (decode.py:80-83);
  * returned hypotheses exclude <sos>/<eos>.

TPU-native design: the whole search is one jit program — encode once, then a
`lax.scan` over maxlen steps where each step advances B·beam cached decoder
rows (models.model.decode_step).  The reference instead re-runs its full
decoder over the whole prefix for every hypothesis of every step at batch
size 1 with a host-side numpy beam (decode.py:62-71) — the structural source
of the ≥10× throughput gap.

`greedy_decode` replaces the reference's broken greedy path (decode.py:31-51
calls a nonexistent free `encode()`) with working argmax decoding.
"""

from __future__ import annotations

import functools
import os as _os
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bist_tpu.config import GenerateConfig, ModelConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import (
    DecodeCache, decode_step, encode_cfg, init_cache, precompute_decode_ctx,
    storage_dtype,
)
from bist_tpu.vocab import EOS, PAD, SOS, UNK

NEG = -1.0e30

# Structural A/B knob for the beam-step bookkeeping (read at import, like
# layers.PACK_PROJECTIONS).  BIST_REGROUP_MM: KV-cache parent regroup as a
# one-hot batched matmul (MXU) instead of take_along_axis (gather) —
# selection by 0/1 weights is bit-exact in any dtype.  Default off until
# measured (the regroup moves <1 ms/batch even at B=128, BENCH.md round 3).
# NOTE: two-stage expansion top-k was tried and measured 13× SLOWER than the
# flat top_k((B, K·V), K) on the v5e (BENCH.md round 3) — do not revisit.
REGROUP_MM = _os.environ.get("BIST_REGROUP_MM", "0") != "0"


class BeamResult(NamedTuple):
    tokens: jnp.ndarray   # (B, nbest, maxlen) int32, PAD-padded, no sos/eos
    scores: jnp.ndarray   # (B, nbest) float32 (NEG = empty slot)
    lengths: jnp.ndarray  # (B, nbest) int32


def beam_search(params, cfg: ModelConfig, batch: Batch,
                gcfg: GenerateConfig, unroll: int | None = None,
                _return_exit_step: bool = False) -> BeamResult:
    """Run beam search for every row of `batch` simultaneously.

    `params` may be a single params pytree or a LIST of pytrees (same cfg):
    ensemble decoding sums per-model log-probs per step — the semantics of
    the reference's (dead) ensemble_beam_search_decode (decode.py:149-151),
    made to work."""
    K, maxlen, nbest = gcfg.beam, gcfg.maxlen, gcfg.nbest
    B = batch.query.shape[0]
    params_list = params if isinstance(params, (list, tuple)) else [params]
    M = len(params_list)

    # unroll: lax.scan loop-body replication (identical numerics; measured
    # 1.13x at 6 on the v5e for ~6x program size — BENCH.md round 3,
    # scripts/bench_pack_ab.py --what unroll).  Defaults to the config knob.
    if unroll is None:
        unroll = gcfg.scan_unroll
    # config guards live BEFORE ctx/cache construction so a bad config fails
    # before the (expensive, possibly remote) encoder runs
    if _return_exit_step and not gcfg.early_exit:
        raise ValueError("_return_exit_step requires gcfg.early_exit=True "
                         "(the fixed-maxlen scan always runs maxlen steps)")
    if gcfg.early_exit and unroll < 1:
        # the scan path rejects unroll<1 inside lax.scan; the early-exit
        # while bodies would spin forever (l never advances) — fail fast
        raise ValueError(f"early_exit needs scan_unroll >= 1, got {unroll}")

    # Contexts stay at B rows: decode_step folds the K hypotheses of each
    # batch element into the cross-attention query axis, so the per-layer
    # K/V, masks and pointer sources are read from HBM once per batch
    # element per step instead of K times (the round-≤2 tiled scheme).
    # cache_dtype governs ALL decode-memory storage: the growing self-attn
    # KV cache AND the precomputed cross-attention/pointer context (scores
    # still accumulate f32) — measured 1.68× (cache alone) on the v5e,
    # answers identical on trained models (BENCH.md round 3)
    cache_dt = storage_dtype(gcfg.cache_dtype)
    # compute_dtype governs the per-step decoder ACTIVATIONS (and thus the
    # projection GEMMs); scores/softmax/generator stay f32 — see decode_step
    compute_dt = (jnp.bfloat16 if gcfg.compute_dtype == "bfloat16"
                  else jnp.float32)
    # encode_dtype governs the ctx PRECOMPUTE activations only (encode +
    # modality stack, run once per batch) — see model.encode_cfg
    ecfg = encode_cfg(cfg, gcfg.encode_dtype)
    ctxs = [precompute_decode_ctx(p, ecfg, batch, dtype=cache_dt)
            for p in params_list]
    caches = [init_cache(cfg, B * K, maxlen + 1, dtype=cache_dt)
              for _ in params_list]

    tokens0 = jnp.full((B, K, maxlen + 1), PAD, jnp.int32).at[:, :, 0].set(SOS)
    scores0 = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)
    comp_tokens0 = jnp.full((B, nbest, maxlen), PAD, jnp.int32)
    comp_scores0 = jnp.full((B, nbest), NEG, jnp.float32)
    comp_lens0 = jnp.zeros((B, nbest), jnp.int32)

    V = cfg.vocab_size
    pos_range = jnp.arange(maxlen)

    def step_fn(carry, l):
        tokens, scores, caches, comp_tokens, comp_scores, comp_lens = carry
        cur = jax.lax.dynamic_index_in_dim(tokens, l, axis=2, keepdims=False)
        logp = 0.0
        new_caches = []
        for p, ctx_m, cache in zip(params_list, ctxs, caches):
            lp_m, cache = decode_step(p, cfg, ctx_m, cache,
                                      cur.reshape(B * K), l, beam=K,
                                      compute_dtype=compute_dt)
            logp = logp + lp_m
            new_caches.append(cache)
        caches = tuple(new_caches)
        lp = scores[:, :, None] + logp.reshape(B, K, V)      # (B, K, V)

        # --- completion candidates (decode.py:73-77) ---
        cand_score = lp[:, :, EOS] + gcfg.penalty * (l + 1).astype(jnp.float32)
        cand_score = jnp.where(l >= gcfg.min_len, cand_score, NEG)
        prefix = tokens[:, :, 1:]                            # (B, K, maxlen)
        cand_tok = jnp.where(pos_range[None, None, :] < l, prefix, PAD)
        all_scores = jnp.concatenate([comp_scores, cand_score], axis=1)
        all_tokens = jnp.concatenate([comp_tokens, cand_tok], axis=1)
        all_lens = jnp.concatenate(
            [comp_lens, jnp.full((B, K), l, jnp.int32)], axis=1)
        top_scores, top_idx = jax.lax.top_k(all_scores, nbest)
        comp_scores = top_scores
        comp_tokens = jnp.take_along_axis(all_tokens, top_idx[:, :, None], axis=1)
        comp_lens = jnp.take_along_axis(all_lens, top_idx, axis=1)

        # --- expansion (decode.py:79-97): top-K over (K·V) continuations ---
        lp = lp.at[:, :, UNK].set(NEG)
        if not gcfg.dec_eos:
            lp = lp.at[:, :, EOS].set(NEG)
        flat = lp.reshape(B, K * V)
        new_scores, flat_idx = jax.lax.top_k(flat, K)
        parent = flat_idx // V                                # (B, K)
        new_tok = (flat_idx % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, new_tok, l + 1, axis=2)

        # gather the KV cache rows of the chosen parents
        def regroup_one(a):
            # per-layer array (B·K, h, L, d_k) — the split cache layout
            tail = a.shape[1:]
            a = a.reshape((B, K) + tail)
            if REGROUP_MM:
                sel = jax.nn.one_hot(parent, K, dtype=a.dtype)
                out = jnp.einsum("bij,bjf->bif", sel, a.reshape(B, K, -1))
                return out.reshape((B * K,) + tail)
            a = jnp.take_along_axis(a, parent[:, :, None, None, None],
                                    axis=1)
            return a.reshape((B * K,) + tail)

        def regroup(c):
            if isinstance(c, tuple):
                return tuple(regroup_one(a) for a in c)
            tail = c.shape[2:]
            c = c.reshape((cfg.nb_blocks, B, K) + tail)
            if REGROUP_MM:
                # selection as (K_new, K_old) one-hot × (K_old, F) batched
                # matmul: copies rows through the MXU instead of a gather
                sel = jax.nn.one_hot(parent, K, dtype=c.dtype)
                out = jnp.einsum("bij,nbjf->nbif", sel,
                                 c.reshape(cfg.nb_blocks, B, K, -1))
                return out.reshape((cfg.nb_blocks, B * K) + tail)
            c = jnp.take_along_axis(
                c, parent[None, :, :, None, None, None], axis=2)
            return c.reshape((cfg.nb_blocks, B * K) + tail)

        caches = tuple(DecodeCache(k=regroup(c.k), v=regroup(c.v))
                       for c in caches)
        return (tokens, new_scores, caches, comp_tokens, comp_scores,
                comp_lens)

    carry0 = (tokens0, scores0, tuple(caches), comp_tokens0, comp_scores0,
              comp_lens0)
    if gcfg.early_exit:
        # Exact early termination.  Every expansion adds a log-probability
        # term (≤ 0 up to float rounding), so max-over-beams of `scores` is
        # non-increasing across steps, and a completion candidate emitted at
        # any FUTURE step l' ∈ [l, maxlen) scores at most
        #     max_k scores[b,k] + penalty·(l'+1)
        # (cand_score = lp[eos] + penalty·(l'+1), decode.py:73-77, with
        # lp ≤ scores).  Once that upper bound cannot exceed the worst kept
        # n-best score in ANY row, the remaining steps provably cannot
        # change the result, so the search may stop.  Ties are safe with
        # `<=`: lax.top_k is stable (lowest index wins) and the kept
        # completions precede new candidates in the concatenation, so an
        # equal-scoring future candidate never displaces one.
        #
        # SLACK guards the "≤ 0" premise against float rounding: the
        # pointer-generator's log is taken of a convex MIXTURE whose f32
        # entries can round a few ulp above 1.0, so a per-step log-prob can
        # be +O(1e-6); penalty·maxlen here is also double-rounded slightly
        # differently from the per-step f32 product.  Requiring the bound to
        # clear by maxlen·1e-5 absorbs the worst accumulated drift — the
        # exit can only become LATER (never wrong), preserving the
        # bit-identical-to-full-scan contract.
        slack = jnp.float32(1e-5 * maxlen + 1e-6)

        def converged(carry, l):
            _, scores, _, _, comp_scores, _ = carry
            # penalty·(l'+1) over l' ∈ [l, maxlen) is maximised at
            # l' = maxlen-1 for penalty ≥ 0, at l' = l otherwise
            bonus = jnp.maximum(gcfg.penalty * maxlen,
                                gcfg.penalty * (l + 1).astype(jnp.float32))
            best_possible = jnp.max(scores, axis=1) + bonus
            return jnp.all(best_possible + slack
                           <= jnp.min(comp_scores, axis=1))

        # strided main loop (`unroll` replicated step bodies per iteration,
        # the same program-size/perf trade as scan unroll), then a stride-1
        # tail for maxlen % unroll and for finer-grained exits
        def cond_u(state):
            l, carry = state
            return (l + unroll <= maxlen) & ~converged(carry, l)

        def body_u(state):
            l, carry = state
            for i in range(unroll):
                carry = step_fn(carry, l + i)
            return (l + unroll, carry)

        def cond_1(state):
            l, carry = state
            return (l < maxlen) & ~converged(carry, l)

        def body_1(state):
            l, carry = state
            return (l + 1, step_fn(carry, l))

        state = jax.lax.while_loop(cond_u, body_u, (jnp.int32(0), carry0))
        l_exit, (tokens, scores, _, comp_tokens, comp_scores, comp_lens) = \
            jax.lax.while_loop(cond_1, body_1, state)
        if _return_exit_step:
            # diagnostic: number of decode steps actually run (≤ maxlen)
            return BeamResult(tokens=comp_tokens, scores=comp_scores,
                              lengths=comp_lens), l_exit
    else:
        (tokens, scores, _, comp_tokens, comp_scores, comp_lens), _ = \
            jax.lax.scan(lambda c, l: (step_fn(c, l), None), carry0,
                         jnp.arange(maxlen), unroll=unroll)
    return BeamResult(tokens=comp_tokens, scores=comp_scores, lengths=comp_lens)


@functools.partial(jax.jit, static_argnames=("cfg", "gcfg"))
def beam_search_jit(params, cfg: ModelConfig, batch: Batch,
                    gcfg: GenerateConfig) -> BeamResult:
    return beam_search(params, cfg, batch, gcfg)


def greedy_decode(params, cfg: ModelConfig, batch: Batch,
                  maxlen: int, cache_dtype: str = "float32",
                  unroll: int = 1, encode_dtype: str = "") -> jnp.ndarray:
    """Argmax decoding; returns (B, maxlen) token ids (may contain <eos>;
    caller truncates).  Fixes the reference's dead greedy path.
    `unroll` = scan-body replication, the same perf knob as
    GenerateConfig.scan_unroll (identical numerics); `encode_dtype` = the
    ctx-precompute activation dtype (GenerateConfig.encode_dtype)."""
    B = batch.query.shape[0]
    dt = storage_dtype(cache_dtype)
    ctx = precompute_decode_ctx(params, encode_cfg(cfg, encode_dtype),
                                batch, dtype=dt)
    cache = init_cache(cfg, B, maxlen + 1, dtype=dt)
    tok0 = jnp.full((B,), SOS, jnp.int32)

    def step(carry, l):
        tok, cache = carry
        logp, cache = decode_step(params, cfg, ctx, cache, tok, l)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, _), out = jax.lax.scan(step, (tok0, cache), jnp.arange(maxlen),
                               unroll=unroll)
    return jnp.moveaxis(out, 0, 1)  # (B, maxlen)


def oracle_decode(params, cfg: ModelConfig, batch: Batch) -> jnp.ndarray:
    """Teacher-forced argmax: the model's most-likely token at every target
    position given the GROUND-TRUTH prefix.  Returns (B, Lt) token ids.

    Working replacement for the reference's dead oracle path
    (decode.py:13-27 calls a nonexistent free `encode()` and `batch.his_st`,
    so `--decode-style` oracle crashes there).  Requires labeled targets
    (batch.trg), i.e. a labeled test set rather than --undisclosed-only."""
    from bist_tpu.models.model import forward_logprobs

    logp, _ = forward_logprobs(params, cfg, batch, rngs=None)
    return jnp.argmax(logp, axis=-1).astype(jnp.int32)


def extract_hyps(result: BeamResult, id2word: List[str],
                 row: int, nbest: int) -> List[Tuple[List[str], float]]:
    """Host-side: decode the nbest hypotheses of one batch row to words.

    Mirrors generate.py:61-71: stop at <eos> (none stored), join words."""
    out = []
    toks = np.asarray(result.tokens[row])
    scores = np.asarray(result.scores[row])
    lens = np.asarray(result.lengths[row])
    for n in range(min(nbest, toks.shape[0])):
        if scores[n] <= NEG / 2:
            continue
        words = [id2word[t] for t in toks[n, : lens[n]]]
        out.append((words, float(scores[n])))
    return out
