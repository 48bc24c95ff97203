"""Full BiST model: parameter init, masks, training forward, and the
incremental (KV-cached) decode path.

Container parity: reference MTN + make_model (model/mtn.py:14-167):
  * text "encoder" = 3 independent LayerNorms over embedded query/cap/his
    (encoder.py:11-41) with the reference's index-advance-on-non-None rule;
  * video/audio input projection Linear+ReLU+LayerNorm (VidEncoder8,
    encoder.py:55-93); positional encoding over video is NOT applied — the
    reference parses --vid-pos but never wires it (mtn.py:108);
  * shared embedding for query/cap/his/target, scaled ×√d_model, tied into
    the generator and the AE generator (mtn.py:77-103);
  * xavier-uniform init for every ndim>1 parameter (mtn.py:163-165).

TPU-first addition — the incremental decode path: the whole modality
reasoning stack depends only on the sources (never on the target), so
`precompute_decode_ctx` runs it once per batch, pre-projects every
cross-attention K/V, and `decode_step` advances one token with a growing
self-attention KV cache.  The reference instead re-runs the FULL decoder on
the whole prefix for every hypothesis at every step (decode.py:62-70) —
O(beam·L²) full forward passes per response."""

from __future__ import annotations

import os as _os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models import bist
from bist_tpu.models.generator import apply_generator, generator_init
from bist_tpu.models.layers import (
    Params, RngGen, add_positional, attention_weights, embed, embedding_init,
    layer_norm, layer_norm_init, linear, linear_init, linear_packed,
    merge_heads, positional_encoding_table, split_heads, storage_dtype,
    subsequent_mask,
)
from bist_tpu.models.layers import upcast_fp8 as _ld
from bist_tpu.vocab import PAD

FT = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Init


def init_model(key: jax.Array, cfg: ModelConfig) -> Params:
    ks = jax.random.split(key, 8)
    params: Params = {
        "embed": embedding_init(ks[0], cfg.vocab_size, cfg.d_model),
        "text_enc": {"norms": [layer_norm_init(cfg.d_model) for _ in range(3)]},
        "decoder": bist.decoder_init(ks[1], cfg),
        "gen": generator_init(ks[2], cfg),
    }
    vid_enc: Params = {}
    if cfg.has_video:
        vid_enc["W"] = linear_init(ks[3], cfg.ft_sizes[0], cfg.d_model)
        vid_enc["in_norm"] = layer_norm_init(cfg.d_model)
    if cfg.has_audio:
        vid_enc["a_W"] = linear_init(ks[4], cfg.ft_sizes[1], cfg.d_model)
        vid_enc["a_in_norm"] = layer_norm_init(cfg.d_model)
    params["vid_enc"] = vid_enc
    return params


def count_params(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Masks (reference Batch, data/dataset.py:59-105)


def build_masks(cfg: ModelConfig, batch: Batch) -> Dict[str, Optional[jnp.ndarray]]:
    masks: Dict[str, Optional[jnp.ndarray]] = {}
    masks["query_mask"] = (batch.query != PAD)[:, None, :].astype(jnp.int32)
    masks["his_mask"] = (batch.his != PAD)[:, None, :].astype(jnp.int32)
    masks["cap_mask"] = ((batch.cap != PAD)[:, None, :].astype(jnp.int32)
                         if batch.cap is not None else None)
    trg_pad = (batch.trg != PAD)[:, None, :].astype(jnp.int32)
    masks["trg_mask"] = trg_pad & subsequent_mask(batch.trg.shape[-1])
    if batch.fts is not None:
        f = batch.fts
        if jnp.issubdtype(f.dtype, jnp.integer):
            # int8-quantised features: |max| avoids integer-sum overflow;
            # zero padding stays exactly zero through quantisation
            a = jnp.abs(f).astype(jnp.int32)
            masks["spatial_mask"] = (jnp.max(a, axis=(1, 3)) != 0)[:, None, :] \
                .astype(jnp.int32)
            masks["temporal_mask"] = (jnp.max(a, axis=(2, 3)) != 0)[:, None, :] \
                .astype(jnp.int32)
        else:
            masks["spatial_mask"] = (jnp.sum(f, axis=(1, 3)) != 0)[:, None, :] \
                .astype(jnp.int32)
            masks["temporal_mask"] = (jnp.sum(f, axis=(2, 3)) != 0)[:, None, :] \
                .astype(jnp.int32)
    else:
        masks["spatial_mask"] = masks["temporal_mask"] = None
    if batch.audio_fts is not None:
        masks["audio_mask"] = (jnp.sum(batch.audio_fts, axis=-1) != 0)[:, None, :] \
            .astype(jnp.int32)
    else:
        masks["audio_mask"] = None
    return masks


def token_counts(batch: Batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ntokens, qntokens) — loss normalisers (dataset.py:98-99)."""
    return (jnp.sum(batch.trg_y != PAD), jnp.sum(batch.query != PAD))


# ---------------------------------------------------------------------------
# Encode (MTN.encode, mtn.py:36-51)


def activation_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _embed_seq(params: Params, cfg: ModelConfig, pe: jnp.ndarray,
               ids: Optional[jnp.ndarray], rngs: Optional[RngGen],
               offset: int = 0) -> Optional[jnp.ndarray]:
    if ids is None:
        return None
    x = embed(params["embed"], ids, cfg.d_model).astype(activation_dtype(cfg))
    return add_positional(pe, x, cfg.dropout, rngs, offset=offset)


def encode(params: Params, cfg: ModelConfig, batch: Batch,
           rngs: Optional[RngGen] = None) -> FT:
    """Text norms + video/audio input projections."""
    pe = positional_encoding_table(cfg.d_model, cfg.max_pos)
    ft: FT = {}
    q_emb = _embed_seq(params, cfg, pe, batch.query, rngs)
    c_emb = _embed_seq(params, cfg, pe, batch.cap, rngs)
    h_emb = _embed_seq(params, cfg, pe, batch.his, rngs)
    # Encoder norm index advances only over non-None inputs (encoder.py:19-41):
    # query always norm[0]; cap norm[1] if present; his takes the next slot.
    norms = params["text_enc"]["norms"]
    ft["encoded_query"] = layer_norm(norms[0], q_emb)
    i = 1
    if c_emb is not None:
        ft["encoded_cap"] = layer_norm(norms[i], c_emb)
        i += 1
    ft["encoded_his"] = layer_norm(norms[i], h_emb)

    adt = activation_dtype(cfg)
    if cfg.has_video and batch.fts is not None:
        fts = batch.fts
        if batch.fts_scale is not None:       # int8 transfer → dequant on device
            fts = fts.astype(adt) * batch.fts_scale.astype(adt)
        v = jax.nn.relu(linear(params["vid_enc"]["W"], fts.astype(adt)))
        ft["video_grid"] = layer_norm(params["vid_enc"]["in_norm"], v)
    if cfg.has_audio and batch.audio_fts is not None:
        a = jax.nn.relu(linear(params["vid_enc"]["a_W"],
                               batch.audio_fts.astype(adt)))
        ft["encoded_audio"] = layer_norm(params["vid_enc"]["a_in_norm"], a)
    return ft


def generator_tokens(batch: Batch, masks) -> Dict[str, jnp.ndarray]:
    toks = {
        "query": batch.query, "query_mask": masks["query_mask"],
        "his": batch.his, "his_mask": masks["his_mask"],
    }
    if batch.cap is not None:
        toks["cap"] = batch.cap
        toks["cap_mask"] = masks["cap_mask"]
    return toks


# ---------------------------------------------------------------------------
# Training forward (MTN.forward, mtn.py:31-61)


def apply_model(params: Params, cfg: ModelConfig, batch: Batch,
                rngs: Optional[RngGen] = None) -> FT:
    """Full forward: returns ft with 'decoded_text', 'encoded_tgt' and the
    final-layer modality features (for AE losses and the generator)."""
    masks = build_masks(cfg, batch)
    ft = encode(params, cfg, batch, rngs)
    pe = positional_encoding_table(cfg.d_model, cfg.max_pos)
    tgt = _embed_seq(params, cfg, pe, batch.trg, rngs)
    ft["encoded_tgt"] = tgt
    ft = bist.decoder_apply(params["decoder"], cfg, ft, tgt, masks, rngs)
    return ft


def forward_logprobs(params: Params, cfg: ModelConfig, batch: Batch,
                     rngs: Optional[RngGen] = None) -> Tuple[jnp.ndarray, FT]:
    """Forward + generator → (B, Lt, V) log-probs (the training criterion
    input, optimize.py:49)."""
    masks = build_masks(cfg, batch)
    ft = apply_model(params, cfg, batch, rngs)
    toks = generator_tokens(batch, masks)
    logp = apply_generator(params["gen"], cfg, params["embed"]["lut"], ft, toks)
    return logp, ft


# ---------------------------------------------------------------------------
# Incremental decoding


class PtrSource(NamedTuple):
    """One pointer-generator source, fully precomputed for decoding:
    the projected key tensor, the scatter one-hot (text ids → vocab columns,
    built ONCE per batch instead of re-materialised every decode step), the
    raw encoded text for the context vector, and the validity mask (with
    <unk> already banned when cfg.mask_unk).  All at B rows — shared across
    beam hypotheses of the same batch element."""
    text: jnp.ndarray      # (B, Ltext) int32
    enc: jnp.ndarray       # (B, Ltext, D)
    mask: jnp.ndarray      # (B, 1, Ltext)
    k: jnp.ndarray         # (B, 1, Ltext, D) head-split pointer keys
    onehot: jnp.ndarray    # (B, Ltext, V) float32


class DecodeCtx(NamedTuple):
    """Everything target-independent, precomputed once per batch:
    per-layer cross-attention K/V (already head-split) + masks + generator
    sources.  A pure pytree — safe to jit over.  Kept at B rows even under
    beam search: decode_step folds the beam axis into the cross-attention
    query-position axis, so the context is never tiled per hypothesis."""
    layer_kv: Tuple[Dict[str, Tuple[jnp.ndarray, jnp.ndarray]], ...]
    masks: Dict[str, Optional[jnp.ndarray]]
    ptr_src: Tuple[PtrSource, ...]


class DecodeCache(NamedTuple):
    """Per-layer self-attention KV cache.

    Two storage layouts, selected by SPLIT_CACHE (numerics identical —
    the per-layer arithmetic never crosses layers):

      * split (BIST_SPLIT_CACHE=1, the default): k/v are TUPLES of per-layer
        (B, h, Lmax, d_k) arrays.  Motivation: the round-4 device-timeline
        profile (scripts/decode_profile.py) showed the stacked layout
        costing two whole-cache data-formatting op families per scan
        iteration — an unstack (slice_bitcast over (layers, B·K, h, L,
        d_k), ~62 us/iter) and (layers,B,K,h,L,d_k) layout-change copies
        after the beam regroup (~57 us each) — pure copies a split layout
        never asks for.
      * stacked (BIST_SPLIT_CACHE=0): single (layers, B, h, Lmax, d_k)
        arrays, the pre-round-4 layout.

    The default follows the measured winner of the decider A/B
    (`scripts/bench_pack_ab.py --what cachelayout`, v5e --iters 8 --reps 7:
    split 1.103x alone, 1.210x combined with heads-last; BENCH.md round 4).
    """
    k: Any
    v: Any


def _cross_kv(p_attn: Params, h: int, memory: jnp.ndarray):
    from bist_tpu.models import layers as _layers

    if _layers.PACK_PROJECTIONS:
        k_p, v_p = linear_packed((p_attn["wk"], p_attn["wv"]), memory)
        return split_heads(k_p, h), split_heads(v_p, h)
    return (split_heads(linear(p_attn["wk"], memory), h),
            split_heads(linear(p_attn["wv"], memory), h))


# Block-diagonal decode cross-attention (BIST_BD_CROSS=1, read at trace
# time): store each short-source K/V as head-block-diagonal matrices so the
# per-step attention becomes TWO B-batched (beam × D) @ (D × h·Lk) GEMMs —
# no head split/merge transposes and no (B·h)-batched tiny (beam × d_k)
# matmuls, which the op-level decode breakdown fingers as the per-step cost
# at d_k=16 (scripts/bench_decode_ops.py).  The zero blocks cost 8× the
# K/V bytes, so this only pays for short sources: slots with
# Lk > BIST_BD_MAX_LK (default 64 — i.e. the 256-token history) keep the
# per-head layout.  Exact up to f32 summation order (the extra terms are
# exact zeros).
BD_CROSS = _os.environ.get("BIST_BD_CROSS", "0") != "0"
BD_MAX_LK = int(_os.environ.get("BIST_BD_MAX_LK", "64"))


def _bd_kv(K: jnp.ndarray, V: jnp.ndarray):
    """(B, h, Lk, dk) K/V → block-diagonal (B, h·dk, h·Lk) / (B, h·Lk, h·dk).
    Row/column order matches the d_model layout split_heads uses
    (flat index = head·d_k + d), so q @ Kbd reproduces per-head scores."""
    B, h, Lk, dk = K.shape
    eye = jnp.eye(h, dtype=K.dtype)
    Kbd = jnp.einsum("bhkd,hg->bhdgk", K, eye).reshape(B, h * dk, h * Lk)
    Vbd = jnp.einsum("bhkd,hg->bhkgd", V, eye).reshape(B, h * Lk, h * dk)
    return Kbd, Vbd


def encode_cfg(cfg: ModelConfig, encode_dtype: str) -> ModelConfig:
    """Resolve GenerateConfig.encode_dtype into the cfg used for ctx
    precompute (encode + the full modality reasoning stack).

    '' inherits cfg.dtype (the historical behaviour); 'bfloat16'/'float32'
    override the activation dtype for the precompute ONLY — decode_step
    keeps its own compute_dtype knob, because the two slices live in
    different regimes (precompute is MXU-bound over full sequences, the
    step loop is op-latency-bound; BENCH.md round 3/4)."""
    if not encode_dtype or encode_dtype == cfg.dtype:
        return cfg
    if encode_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"encode_dtype {encode_dtype!r}: expected '' "
                         "(inherit), 'float32' or 'bfloat16'")
    return cfg.replace(dtype=encode_dtype)


def precompute_decode_ctx(params: Params, cfg: ModelConfig,
                          batch: Batch, dtype=jnp.float32) -> DecodeCtx:
    """Run encode + the full modality reasoning stack once; pre-project every
    mm-layer cross-attention's K/V.

    `dtype` is the storage precision of the precomputed decode memory
    (cross-attention K/V, pointer keys/encodings/one-hot) — bf16 halves the
    dominant per-step HBM reads; attention scores still accumulate f32
    (layers.attention_weights preferred_element_type).  Masks/token ids
    stay integer."""
    masks = build_masks(cfg, batch)
    ft = encode(params, cfg, batch, None)
    dec = params["decoder"]
    in_ft: FT = {k: ft["encoded_query"] for k in ("t2s", "s2t", "audio", "cap")}
    layer_kv = []
    for n in range(cfg.nb_blocks):
        ft, in_ft = bist.modality_step(dec, cfg, n, in_ft, ft, masks, None)
        lp = dec["mm_layers"][n]
        kv: Dict[str, Any] = {
            "his": _cross_kv(lp["his"]["attn"], cfg.att_h, ft["encoded_his"]),
            "query": _cross_kv(lp["query"]["attn"], cfg.att_h, ft["encoded_query"]),
        }
        for name, ft_key, mask_key in bist.mm_layer_cross_slots(cfg):
            kv[name] = _cross_kv(lp[name]["attn"], cfg.att_h, ft[ft_key])
        if BD_CROSS:
            kv = {name: (_bd_kv(*KV) if KV[0].shape[2] <= BD_MAX_LK else KV)
                  for name, KV in kv.items()}
        layer_kv.append(kv)
    toks = generator_tokens(batch, masks)
    keep = ("encoded_query", "encoded_cap", "encoded_his")
    ctx_ft = {k: v for k, v in ft.items() if k in keep}
    # pointer sources: keys projected + scatter one-hot built ONCE per batch
    # (both are target-independent; the reference reprojects/scatters every
    # step, generator.py:62-67,113-114)
    ptr_src = ()
    if cfg.ptr_gen:
        from bist_tpu.models.generator import _source, pointer_k

        srcs = []
        for i, name in enumerate(cfg.ptr_ft_list):
            text, enc, mask = _source(name, ctx_ft, toks)
            if cfg.mask_unk:
                mask = mask & (text != 0)[:, None, :]
            srcs.append(PtrSource(
                text=text, enc=enc.astype(dtype), mask=mask,
                k=pointer_k(params["gen"]["pointer_attn"][i], enc)
                .astype(dtype),
                onehot=jax.nn.one_hot(text, cfg.vocab_size, dtype=dtype)))
        ptr_src = tuple(srcs)
    # unconditional: with encode_dtype=bf16 the projections come out bf16
    # even when f32 STORAGE was requested (cache_dtype default) — the cast
    # must land the contract dtype either way (same-dtype astype is free)
    layer_kv = [
        {name: (k.astype(dtype), v.astype(dtype))
         for name, (k, v) in kv.items()} for kv in layer_kv]
    # NOTE: the raw encoded_* tensors and token arrays are consumed here to
    # build ptr_src but are NOT carried in the context — decode_step reads
    # only layer_kv/masks/ptr_src, and dead (B, L, D) tensors would otherwise
    # sit in HBM and in every beam program's argument list for the whole
    # decode (round-3 code-review finding).
    return DecodeCtx(layer_kv=tuple(layer_kv), masks=masks, ptr_src=ptr_src)


# Cache storage layout, read at trace time — see DecodeCache.
SPLIT_CACHE = _os.environ.get("BIST_SPLIT_CACHE", "1") != "0"


def init_cache(cfg: ModelConfig, batch_size: int, max_len: int,
               dtype=jnp.float32) -> DecodeCache:
    shape = (batch_size, cfg.att_h, max_len, cfg.d_model // cfg.att_h)
    if SPLIT_CACHE:
        return DecodeCache(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.nb_blocks)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.nb_blocks)))
    return DecodeCache(k=jnp.zeros((cfg.nb_blocks,) + shape, dtype),
                       v=jnp.zeros((cfg.nb_blocks,) + shape, dtype))


def _mha_cached_self(p_attn: Params, h: int, x: jnp.ndarray,
                     cache_k: jnp.ndarray, cache_v: jnp.ndarray, pos):
    """Single-position self-attention against the KV cache.

    x: (B, 1, D) normed input; cache_k/v: (B, h, Lmax, d_k); pos: scalar index
    of the current position.  Returns (out (B,1,D), new_k, new_v)."""
    from bist_tpu.models import layers as _layers

    if _layers.PACK_PROJECTIONS:
        q_p, k_p, v_p = linear_packed(
            (p_attn["wq"], p_attn["wk"], p_attn["wv"]), x)
    else:
        q_p, k_p, v_p = (linear(p_attn["wq"], x), linear(p_attn["wk"], x),
                         linear(p_attn["wv"], x))
    Q = split_heads(q_p, h)                              # (B, h, 1, dk)
    K1 = split_heads(k_p, h).astype(cache_k.dtype)
    V1 = split_heads(v_p, h).astype(cache_v.dtype)
    cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, K1, pos, axis=2)
    cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, V1, pos, axis=2)
    Lmax = cache_k.shape[2]
    valid = (jnp.arange(Lmax) <= pos)[None, None, None, :]   # (1,1,1,Lmax)
    attn = attention_weights(Q, _ld(cache_k), valid, 0.0, None)
    out = linear(p_attn["wo"], merge_heads(
        jnp.einsum("...qk,...kd->...qd", attn, _ld(cache_v))))
    return out, cache_k, cache_v


def _mha_cross_cached(p_attn: Params, h: int, x: jnp.ndarray, KV, mask,
                      beam: int):
    """Cross-attention of `beam` hypothesis rows per batch element against a
    SHARED (un-tiled) precomputed K/V.

    x: (B·beam, 1, D); KV: (B, h, Lk, d_k); mask: (B, 1, Lk).  The beam axis
    folds into the query-position axis — cross-attention has no structure
    over query positions, so K hypotheses of one batch element are just K
    query rows.  vs tiling the context per hypothesis (round ≤2) this reads
    each K/V from HBM once per batch element instead of `beam` times and
    feeds the MXU (beam × Lk) score matmuls instead of (1 × Lk).

    A 3-D K means the slot was precomputed block-diagonally (BIST_BD_CROSS):
    attention is then two B-batched dense GEMMs with per-head-segment
    softmax — no head transposes, no (B·h)-batched d_k=16 matmuls."""
    import math as _math

    K, V = _ld(KV[0]), _ld(KV[1])
    B = K.shape[0]
    xf = x.reshape(B, beam, x.shape[-1])
    q = linear(p_attn["wq"], xf)                         # (B, beam, D)
    if K.ndim == 3:                                      # block-diagonal slot
        Lk = K.shape[2] // h
        d_k = K.shape[1] // h
        scores = jnp.einsum("bqd,bdm->bqm", q, K,
                            preferred_element_type=jnp.float32) \
            / _math.sqrt(d_k)
        scores = scores.reshape(B, beam, h, Lk)
        if mask is not None:
            from bist_tpu.models.layers import NEG_INF

            scores = jnp.where(mask[:, :, None, :] == 0, NEG_INF, scores)
        attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        ctxv = jnp.einsum("bqm,bmd->bqd", attn.reshape(B, beam, h * Lk), V)
        out = linear(p_attn["wo"], ctxv)                 # (B, beam, D)
        return out.reshape(x.shape)
    Q = split_heads(q, h)                                # (B, h, beam, dk)
    if mask is not None:
        mask = mask[..., None, :, :]                     # (B, 1, 1, Lk)
    attn = attention_weights(Q, K, mask, 0.0, None)
    out = linear(p_attn["wo"], merge_heads(
        jnp.einsum("...qk,...kd->...qd", attn, V)))      # (B, beam, D)
    return out.reshape(x.shape)


def decode_step(params: Params, cfg: ModelConfig, ctx: DecodeCtx,
                cache: DecodeCache, token: jnp.ndarray, pos,
                beam: int = 1,
                compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, DecodeCache]:
    """Advance one token for B·beam hypothesis rows.  token: (B·beam,) int32
    ids at absolute position `pos` (0 = <sos>).  `ctx` stays at B rows (never
    tiled); `cache` has B·beam rows.  Returns (log-probs (B·beam, V), updated
    cache).

    `compute_dtype=bfloat16` runs the per-step decoder activations (and thus
    every projection GEMM — layers.linear casts weights to the activation
    dtype) in bf16; attention scores/softmax stay f32
    (layers.attention_weights) and the generator head consumes f32 inputs so
    log-prob ranking is computed at full precision.

    Eval mode (no dropout) — matches generation (generate.py:26 model.eval)."""
    from bist_tpu.models.generator import apply_generator_step
    from bist_tpu.models.layers import ffn  # local to avoid cycle noise

    pe = positional_encoding_table(cfg.d_model, cfg.max_pos)
    x = embed(params["embed"], token[:, None], cfg.d_model)    # (B·beam, 1, D)
    x = add_positional(pe, x, 0.0, None, offset=pos)
    x = x.astype(compute_dtype)
    encoded_tgt = x
    dec = params["decoder"]
    slots = bist.mm_layer_cross_slots(cfg)
    new_k, new_v = [], []
    for n in range(cfg.nb_blocks):
        lp = dec["mm_layers"][n]
        normed = layer_norm(lp["self"]["norm"], x)
        out, ck, cv = _mha_cached_self(lp["self"]["attn"], cfg.att_h, normed,
                                       cache.k[n], cache.v[n], pos)
        new_k.append(ck)
        new_v.append(cv)
        x = x + out
        x = x + _mha_cross_cached(lp["his"]["attn"], cfg.att_h,
                                  layer_norm(lp["his"]["norm"], x),
                                  ctx.layer_kv[n]["his"], ctx.masks["his_mask"],
                                  beam)
        x = x + _mha_cross_cached(lp["query"]["attn"], cfg.att_h,
                                  layer_norm(lp["query"]["norm"], x),
                                  ctx.layer_kv[n]["query"],
                                  ctx.masks["query_mask"], beam)
        parallel_st = (cfg.nb_venc_blocks > 0 and cfg.enc_st_combine == "none"
                       and cfg.dec_st_combine != "seq" and cfg.both_directions)
        i = 0
        while i < len(slots):
            name, ft_key, mask_key = slots[i]
            if parallel_st and name == "temporal":
                t = _mha_cross_cached(lp["temporal"]["attn"], cfg.att_h,
                                      layer_norm(lp["temporal"]["norm"], x),
                                      ctx.layer_kv[n]["temporal"],
                                      ctx.masks["query_mask"], beam)
                s = _mha_cross_cached(lp["spatial"]["attn"], cfg.att_h,
                                      layer_norm(lp["spatial"]["norm"], x),
                                      ctx.layer_kv[n]["spatial"],
                                      ctx.masks["query_mask"], beam)
                x = (x + t) + (x + s)   # ref: in_x = sublayer_t(x) + sublayer_s(x)
                i += 2
                continue
            x = x + _mha_cross_cached(lp[name]["attn"], cfg.att_h,
                                      layer_norm(lp[name]["norm"], x),
                                      ctx.layer_kv[n][name],
                                      ctx.masks[mask_key], beam)
            i += 1
        x = x + ffn(lp["ff"]["ff"], layer_norm(lp["ff"]["norm"], x), 0.0, None)

    decoded = layer_norm(dec["norm"], x)                      # (B·beam, 1, D)
    B = decoded.shape[0] // beam
    # generator head in f32: vocab logits / pointer mixing decide the beam
    # ranking, so they get full precision regardless of compute_dtype
    decoded = decoded.astype(jnp.float32)
    encoded_tgt = encoded_tgt.astype(jnp.float32)
    logp = apply_generator_step(
        params["gen"], cfg, params["embed"]["lut"],
        decoded.reshape(B, beam, -1), encoded_tgt.reshape(B, beam, -1),
        ctx.ptr_src)                                          # (B, beam, V)
    if isinstance(cache.k, tuple):         # split layout: no re-stack
        new_cache = DecodeCache(k=tuple(new_k), v=tuple(new_v))
    else:
        new_cache = DecodeCache(k=jnp.stack(new_k), v=jnp.stack(new_v))
    return logp.reshape(B * beam, -1), new_cache
