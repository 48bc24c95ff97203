"""BiST factorized bi-directional spatio-temporal reasoning + multimodal decoder.

Reference semantics (model/encoder.py:95-235, model/decoder.py:11-186) with a
TPU-first formulation:

  * The reference materialises expanded copies of the query for every spatial
    region / temporal step before projecting (encoder.py:114-119, 145-147) —
    an S× (resp. T×) redundant matmul and a huge HBM intermediate.  Here the
    q/k/v projections run once on the unbroadcast tensors and only the
    attention einsum sees broadcast shapes; XLA maps it onto batched MXU
    matmuls directly.
  * The video feature grid lives under its own key 'video_grid' and is never
    overwritten by layer outputs.  (The reference reuses 'spatiotemporal_ft'
    for both the (B,T,S,D) grid and the fused (B,Lq,D) features, which crashes
    for enc_st_combine ∈ {sum,dyn,early_*} with >1 decoder layer —
    decoder.py:117-129 vs encoder.py:110.  We define the obviously intended
    semantics: the grid is layer-invariant.)
  * Attention/sublayer parameters are named (t2s_self, t2s_hop1, ...) instead
    of the reference's index-counter lists (encoder.py:172-199), with the same
    wiring order.

Factorisation recap, per layer, query x (B, Lq, D), grid V (B, T, S, D):
  t2s: self-attn(x) → attend along T per spatial region (temporal_mask)
       → attend along S per query token → FFN              (encoder.py:109-139)
  s2t: self-attn(x) → attend along S per temporal step
       → attend along T per query token (temporal_mask) → FFN (encoder.py:141-170)
This is O(Lq·T·S + Lq·S + Lq·T) attention work instead of O(Lq·(T·S)) over the
flattened grid — the reference's structural answer to long video token grids.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig
from bist_tpu.models.layers import (
    Params, RngGen, dropout, ffn, ffn_init, layer_norm, layer_norm_init,
    linear, linear_init, mha, mha_init, sublayer,
)

Masks = Dict[str, Optional[jnp.ndarray]]
FT = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Video reasoning layer (VidEncoderLayer4, encoder.py:95-201)


def vid_layer_init(key: jax.Array, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, 12)
    d, h, d_ff = cfg.d_model, cfg.att_h, cfg.d_ff
    p: Params = {}
    if cfg.t2s:
        p["t2s_self"] = {"attn": mha_init(keys[0], h, d), "norm": layer_norm_init(d)}
        p["t2s_hop1"] = {"attn": mha_init(keys[1], h, d), "norm": layer_norm_init(d)}
        p["t2s_hop2"] = {"attn": mha_init(keys[2], h, d), "norm": layer_norm_init(d)}
        p["t2s_ff"] = {"ff": ffn_init(keys[3], d, d_ff), "norm": layer_norm_init(d)}
    if cfg.s2t:
        p["s2t_self"] = {"attn": mha_init(keys[4], h, d), "norm": layer_norm_init(d)}
        p["s2t_hop1"] = {"attn": mha_init(keys[5], h, d), "norm": layer_norm_init(d)}
        p["s2t_hop2"] = {"attn": mha_init(keys[6], h, d), "norm": layer_norm_init(d)}
        p["s2t_ff"] = {"ff": ffn_init(keys[7], d, d_ff), "norm": layer_norm_init(d)}
    if cfg.enc_st_combine in ("early_sum", "early_dyn") and cfg.both_directions:
        p["out_norm"] = layer_norm_init(d)
        if cfg.enc_st_combine == "early_dyn":
            p["st_combine_W"] = linear_init(keys[8], d * 3, 1)
    return p


def _attn_sublayer(p: Params, h: int, x: jnp.ndarray, kv: jnp.ndarray,
                   mask, drop: float, adrop: float, rngs) -> jnp.ndarray:
    """Cross-attention sublayer: x + dropout(MHA(LN(x), kv, kv, mask)).
    Keys/values are the raw memory (the reference norms only the query in
    sublayer lambdas over external memories, e.g. decoder.py:22-24).
    `drop` is the residual/sublayer rate (args.dropout); `adrop` the
    attention-probability rate (fixed 0.1 in the reference, mtn.py:77)."""
    return x + dropout(
        mha(p["attn"], h, layer_norm(p["norm"], x), kv, kv, mask,
            drop_rate=adrop, rngs=rngs), drop, rngs)


def _self_attn_sublayer(p: Params, h: int, x: jnp.ndarray, mask, drop: float,
                        adrop: float, rngs) -> jnp.ndarray:
    """Self-attention sublayer: the NORMED x feeds q, k, AND v — the
    reference's `sublayer(x, lambda x: attn(x, x, x, mask))` pattern passes
    the normed tensor for all three (modules.py:41-44 + encoder.py:176)."""
    normed = layer_norm(p["norm"], x)
    return x + dropout(
        mha(p["attn"], h, normed, normed, normed, mask,
            drop_rate=adrop, rngs=rngs), drop, rngs)


# grid size at which the fully-fused hop-1 Pallas kernel (K/V projection +
# attention + out projection streamed through VMEM, ops/bist_kernels.py)
# takes over from XLA — a MEMORY-capacity frontier, not a latency crossover
# (measured: XLA is at the latency floor below it; ops/dispatch.py)
from bist_tpu.ops.dispatch import HOP1_FUSED_MIN_GRID_BYTES


def _hop1(p_hop: Params, h: int, drop: float, adrop: float, rngs,
          x: jnp.ndarray, kv_groups: jnp.ndarray, mask) -> jnp.ndarray:
    """Hop-1 with dispatch: x (B,Lq,D), kv_groups (B,G,Lk,D), mask (B,1,Lk)
    → x[:,None] + MHA(LN(x), kv, kv) of shape (B,G,Lq,D)."""
    normed = layer_norm(p_hop["norm"], x)
    if rngs is None and (kv_groups.size * kv_groups.dtype.itemsize
                         >= HOP1_FUSED_MIN_GRID_BYTES):
        from bist_tpu.models.layers import linear
        from bist_tpu.ops.bist_kernels import hop1_trainable

        # hop1_trainable = fused forward + streaming Pallas backward (custom
        # VJP), so this path is safe under value_and_grad — dropout-0
        # training at the long-video capacity frontier is exactly where the
        # kernel engages (the raw bist_hop1_fused is not differentiable)
        a = p_hop["attn"]
        return hop1_trainable(x, linear(a["wq"], normed), kv_groups,
                              a["wk"]["w"], a["wk"]["b"],
                              a["wv"]["w"], a["wv"]["b"],
                              a["wo"]["w"], a["wo"]["b"], h, mask)
    attn_out = mha(p_hop["attn"], h, normed[:, None], kv_groups, kv_groups,
                   mask=None if mask is None else mask[:, None],
                   drop_rate=adrop, rngs=rngs)
    return x[:, None] + dropout(attn_out, drop, rngs)


def temporal2spatial(p: Params, cfg: ModelConfig, x: jnp.ndarray,
                     grid: jnp.ndarray, temporal_mask: jnp.ndarray,
                     rngs: Optional[RngGen]) -> jnp.ndarray:
    """Two-hop temporal→spatial attention (encoder.py:109-139).

    x: (B, Lq, D) query-conditioned state; grid: (B, T, S, D);
    temporal_mask: (B, 1, T)."""
    h, drop, adrop = cfg.att_h, cfg.dropout, cfg.attn_dropout
    B, T, S, D = grid.shape

    # Hop 1: per spatial region, attend the query along the T axis.
    # Reference: reshape grid to (B·S, T, D) and expand the query S times;
    # here the projection runs once and broadcasting happens in the einsum
    # (or the fused Pallas kernel for long T).
    grid_s = jnp.swapaxes(grid, 1, 2)                       # (B, S, T, D)
    t_out = _hop1(p["t2s_hop1"], h, drop, adrop, rngs, x, grid_s, temporal_mask)

    # Hop 2: per query token, attend over its S per-region summaries.
    per_tok = jnp.swapaxes(t_out, 1, 2)                      # (B, Lq, S, D)
    normed2 = layer_norm(p["t2s_hop2"]["norm"], x)
    attn_out2 = mha(p["t2s_hop2"]["attn"], h,
                    normed2[:, :, None],                     # (B, Lq, 1, D)
                    per_tok, per_tok, mask=None,
                    drop_rate=adrop, rngs=rngs)              # (B, Lq, 1, D)
    ts_out = x + dropout(attn_out2[:, :, 0], drop, rngs)

    return sublayer(p["t2s_ff"]["norm"], ts_out,
                    lambda y: ffn(p["t2s_ff"]["ff"], y, drop, rngs), drop, rngs)


def spatial2temporal(p: Params, cfg: ModelConfig, x: jnp.ndarray,
                     grid: jnp.ndarray, temporal_mask: jnp.ndarray,
                     rngs: Optional[RngGen]) -> jnp.ndarray:
    """Two-hop spatial→temporal attention (encoder.py:141-170)."""
    h, drop, adrop = cfg.att_h, cfg.dropout, cfg.attn_dropout

    # Hop 1: per temporal step, attend the query along the S axis (no mask —
    # spatial positions are always valid, encoder.py:150).
    s_out = _hop1(p["s2t_hop1"], h, drop, adrop, rngs, x, grid, None)

    # Hop 2: per query token, attend over the T per-step summaries with the
    # temporal validity mask (encoder.py:155-165).
    per_tok = jnp.swapaxes(s_out, 1, 2)                      # (B, Lq, T, D)
    normed2 = layer_norm(p["s2t_hop2"]["norm"], x)
    attn_out2 = mha(p["s2t_hop2"]["attn"], h,
                    normed2[:, :, None],                     # (B, Lq, 1, D)
                    per_tok, per_tok,
                    mask=temporal_mask[:, None],             # (B, 1, 1, T)
                    drop_rate=adrop, rngs=rngs)
    st_out = x + dropout(attn_out2[:, :, 0], drop, rngs)

    return sublayer(p["s2t_ff"]["norm"], st_out,
                    lambda y: ffn(p["s2t_ff"]["ff"], y, drop, rngs), drop, rngs)


def vid_layer_apply(p: Params, cfg: ModelConfig, in_ft: FT, ft: FT,
                    masks: Masks, rngs: Optional[RngGen]) -> FT:
    """One BiST reasoning layer over in_ft['t2s'] / in_ft['s2t']
    (encoder.py:172-199)."""
    h, drop, adrop = cfg.att_h, cfg.dropout, cfg.attn_dropout
    grid = ft["video_grid"]
    in_ft = dict(in_ft)
    t2s = s2t = None
    if cfg.t2s:
        t2s = _self_attn_sublayer(p["t2s_self"], h, in_ft["t2s"],
                                  masks["query_mask"], drop, adrop, rngs)
        t2s = temporal2spatial(p, cfg, t2s, grid, masks["temporal_mask"], rngs)
        in_ft["t2s"] = t2s
    if cfg.s2t:
        s2t = _self_attn_sublayer(p["s2t_self"], h, in_ft["s2t"],
                                  masks["query_mask"], drop, adrop, rngs)
        s2t = spatial2temporal(p, cfg, s2t, grid, masks["temporal_mask"], rngs)
        in_ft["s2t"] = s2t

    if cfg.both_directions and cfg.enc_st_combine == "early_sum":
        temp = layer_norm(p["out_norm"], t2s + s2t)
        in_ft["t2s"] = in_ft["s2t"] = temp
    elif cfg.both_directions and cfg.enc_st_combine == "early_dyn":
        vec = jnp.concatenate([ft["encoded_query"], t2s, s2t], axis=-1)
        score = jax.nn.sigmoid(linear(p["st_combine_W"], vec))
        temp = layer_norm(p["out_norm"], score * t2s + (1.0 - score) * s2t)
        in_ft["t2s"] = in_ft["s2t"] = temp
    return in_ft


# ---------------------------------------------------------------------------
# Caption / audio reasoning layers (encoder.py:203-235)


def ctx_layer_init(key: jax.Array, cfg: ModelConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    d, h, d_ff = cfg.d_model, cfg.att_h, cfg.d_ff
    return {
        "self": {"attn": mha_init(k1, h, d), "norm": layer_norm_init(d)},
        "cross": {"attn": mha_init(k2, h, d), "norm": layer_norm_init(d)},
        "ff": {"ff": ffn_init(k3, d, d_ff), "norm": layer_norm_init(d)},
    }


def ctx_layer_apply(p: Params, cfg: ModelConfig, state: jnp.ndarray,
                    memory: jnp.ndarray, query_mask, memory_mask,
                    rngs: Optional[RngGen]) -> jnp.ndarray:
    """Query self-attn → cross-attn into memory → FFN (Cap/AudioEncoderLayer)."""
    h, drop, adrop = cfg.att_h, cfg.dropout, cfg.attn_dropout
    x = _self_attn_sublayer(p["self"], h, state, query_mask, drop, adrop, rngs)
    x = _attn_sublayer(p["cross"], h, x, memory, memory_mask, drop, adrop, rngs)
    return sublayer(p["ff"]["norm"], x,
                    lambda y: ffn(p["ff"]["ff"], y, drop, rngs), drop, rngs)


# ---------------------------------------------------------------------------
# Response decoder layer (MultimodalDecoderLayer12, decoder.py:11-60)


def mm_layer_cross_slots(cfg: ModelConfig):
    """Ordered list of (slot_name, ft_key, mask_key) for the modality
    cross-attentions after self/his/query, mirroring decoder.py:27-57."""
    slots = []
    if cfg.nb_venc_blocks > 0 and cfg.use_cap_layers and cfg.enc_vc_combine != "none":
        slots.append(("fused", "encoded_ft", "query_mask"))
        return slots
    if cfg.include_caption != "none":
        if cfg.use_cap_layers:
            slots.append(("cap", "cap_ft", "query_mask"))
        else:
            slots.append(("cap", "encoded_cap", "cap_mask"))
    if cfg.nb_venc_blocks > 0:
        if cfg.enc_st_combine == "none":
            if cfg.s2t:
                slots.append(("temporal", "temporal_ft", "query_mask"))
            if cfg.t2s:
                slots.append(("spatial", "spatial_ft", "query_mask"))
        else:
            slots.append(("st", "st_fused", "query_mask"))
    if cfg.nb_aenc_blocks > 0:
        slots.append(("audio", "audio_ft", "query_mask"))
    return slots


def mm_layer_init(key: jax.Array, cfg: ModelConfig) -> Params:
    d, h, d_ff = cfg.d_model, cfg.att_h, cfg.d_ff
    slots = mm_layer_cross_slots(cfg)
    keys = jax.random.split(key, 4 + len(slots))
    p: Params = {
        "self": {"attn": mha_init(keys[0], h, d), "norm": layer_norm_init(d)},
        "his": {"attn": mha_init(keys[1], h, d), "norm": layer_norm_init(d)},
        "query": {"attn": mha_init(keys[2], h, d), "norm": layer_norm_init(d)},
        "ff": {"ff": ffn_init(keys[3], d, d_ff), "norm": layer_norm_init(d)},
    }
    for i, (name, _, _) in enumerate(slots):
        p[name] = {"attn": mha_init(keys[4 + i], h, d), "norm": layer_norm_init(d)}
    return p


def mm_layer_apply(p: Params, cfg: ModelConfig, ft: FT, x: jnp.ndarray,
                   masks: Masks, rngs: Optional[RngGen]) -> jnp.ndarray:
    """Causal self-attn → history → query → modality cross-attns → FFN.

    dec_st_combine='seq' runs temporal then spatial sequentially;
    'sum' (the reference's parallel branch, decoder.py:44-51) runs both from
    the same input and adds the results."""
    h, drop, adrop = cfg.att_h, cfg.dropout, cfg.attn_dropout
    x = _self_attn_sublayer(p["self"], h, x, masks["trg_mask"], drop, adrop, rngs)
    x = _attn_sublayer(p["his"], h, x, ft["encoded_his"], masks["his_mask"],
                       drop, adrop, rngs)
    x = _attn_sublayer(p["query"], h, x, ft["encoded_query"], masks["query_mask"],
                       drop, adrop, rngs)

    slots = mm_layer_cross_slots(cfg)
    parallel_st = (cfg.nb_venc_blocks > 0 and cfg.enc_st_combine == "none"
                   and cfg.dec_st_combine != "seq" and cfg.both_directions)
    i = 0
    while i < len(slots):
        name, ft_key, mask_key = slots[i]
        if parallel_st and name == "temporal":
            # parallel-sum branch: both video attns read the same input
            t = _attn_sublayer(p["temporal"], h, x, ft["temporal_ft"],
                               masks["query_mask"], drop, adrop, rngs)
            s = _attn_sublayer(p["spatial"], h, x, ft["spatial_ft"],
                               masks["query_mask"], drop, adrop, rngs)
            x = t + s
            i += 2
            continue
        x = _attn_sublayer(p[name], h, x, ft[ft_key], masks[mask_key],
                           drop, adrop, rngs)
        i += 1
    return sublayer(p["ff"]["norm"], x,
                    lambda y: ffn(p["ff"]["ff"], y, drop, rngs), drop, rngs)


# ---------------------------------------------------------------------------
# Multimodal decoder (MultimodalDecoder8, decoder.py:62-186)


def decoder_init(key: jax.Array, cfg: ModelConfig) -> Params:
    N = cfg.nb_blocks
    d = cfg.d_model
    n_extra = 8
    keys = jax.random.split(key, 4 * N + n_extra)
    p: Params = {
        "mm_layers": [mm_layer_init(keys[i], cfg) for i in range(N)],
        "norm": layer_norm_init(d),
    }
    if cfg.nb_venc_blocks > 0:
        p["v_layers"] = [vid_layer_init(keys[N + i], cfg) for i in range(N)]
        if cfg.enc_st_combine == "none" or not cfg.both_directions:
            if cfg.s2t:
                p["temporal_out_norm"] = layer_norm_init(d)
            if cfg.t2s:
                p["spatial_out_norm"] = layer_norm_init(d)
        elif cfg.enc_st_combine in ("sum", "dyn"):
            p["out_norm"] = layer_norm_init(d)
            if cfg.enc_st_combine == "dyn":
                p["st_combine_W"] = linear_init(keys[4 * N], d * 3, 1)
    if cfg.use_cap_layers:
        p["c_layers"] = [ctx_layer_init(keys[2 * N + i], cfg) for i in range(N)]
        p["cap_out_norm"] = layer_norm_init(d)
    if cfg.nb_aenc_blocks > 0:
        p["a_layers"] = [ctx_layer_init(keys[3 * N + i], cfg) for i in range(N)]
        p["a_out_norm"] = layer_norm_init(d)
    if cfg.nb_venc_blocks > 0 and cfg.use_cap_layers and cfg.enc_vc_combine == "dyn":
        if cfg.enc_st_combine != "none" and cfg.both_directions:
            p["vc_combine_W"] = linear_init(keys[4 * N + 1], d * 3, 1)
        else:
            factor = 1 + (1 if cfg.include_caption != "none" else 0) \
                + (1 if cfg.t2s else 0) + (1 if cfg.s2t else 0) \
                + (1 if cfg.nb_aenc_blocks > 0 else 0)
            p["vc_combine_W"] = linear_init(keys[4 * N + 1], d * factor, factor - 1)
    return p


def modality_step(p: Params, cfg: ModelConfig, layer_idx: int, in_ft: FT,
                  ft: FT, masks: Masks, rngs: Optional[RngGen]) -> FT:
    """Advance the per-layer modality reasoning (v/c/a layers) and compute the
    fusion features consumed by the response layer (decoder.py:114-181).

    Depends only on the query/caption/audio/video — NOT on the target — which
    is why incremental decoding precomputes all of this once (see
    bist_tpu.models.model.precompute_decode_ctx)."""
    ft = dict(ft)
    if cfg.nb_venc_blocks > 0:
        in_ft = vid_layer_apply(p["v_layers"][layer_idx], cfg, in_ft, ft, masks, rngs)
        if cfg.both_directions and cfg.enc_st_combine == "sum":
            ft["st_fused"] = layer_norm(p["out_norm"], in_ft["s2t"] + in_ft["t2s"])
        elif cfg.both_directions and cfg.enc_st_combine == "dyn":
            vec = jnp.concatenate(
                [ft["encoded_query"], in_ft["s2t"], in_ft["t2s"]], axis=-1)
            g = jax.nn.sigmoid(linear(p["st_combine_W"], vec))
            ft["st_fused"] = layer_norm(
                p["out_norm"], g * in_ft["s2t"] + (1.0 - g) * in_ft["t2s"])
        elif cfg.both_directions and cfg.enc_st_combine in ("early_sum", "early_dyn"):
            ft["st_fused"] = in_ft["s2t"]
        else:
            if cfg.s2t:
                ft["temporal_ft"] = layer_norm(p["temporal_out_norm"], in_ft["s2t"])
            if cfg.t2s:
                ft["spatial_ft"] = layer_norm(p["spatial_out_norm"], in_ft["t2s"])
    if cfg.use_cap_layers:
        in_ft = dict(in_ft)
        in_ft["cap"] = ctx_layer_apply(p["c_layers"][layer_idx], cfg, in_ft["cap"],
                                       ft["encoded_cap"], masks["query_mask"],
                                       masks["cap_mask"], rngs)
        ft["cap_ft"] = layer_norm(p["cap_out_norm"], in_ft["cap"])
    if cfg.nb_aenc_blocks > 0:
        in_ft = dict(in_ft)
        in_ft["audio"] = ctx_layer_apply(p["a_layers"][layer_idx], cfg,
                                         in_ft["audio"], ft["encoded_audio"],
                                         masks["query_mask"], masks["audio_mask"],
                                         rngs)
        ft["audio_ft"] = layer_norm(p["a_out_norm"], in_ft["audio"])

    # visual/caption fusion (decoder.py:137-181)
    if cfg.nb_venc_blocks > 0 and cfg.use_cap_layers:
        st_combined = cfg.both_directions and cfg.enc_st_combine != "none"
        if cfg.enc_vc_combine == "sum":
            if st_combined:
                ft["encoded_ft"] = ft["st_fused"] + ft["cap_ft"]
            else:
                ft["encoded_ft"] = ft["temporal_ft"] + ft["spatial_ft"] + ft["cap_ft"]
        elif cfg.enc_vc_combine == "dyn":
            # st_combined covers sum/dyn/early_*: the reference's gate branch
            # only checks sum/dyn and KeyErrors on early_* (decoder.py:152-160
            # reads temporal_ft/spatial_ft that early fusion never produced);
            # we define the intended semantics: gate st_fused against cap_ft.
            if st_combined:
                vec = jnp.concatenate(
                    [ft["encoded_query"], ft["st_fused"], ft["cap_ft"]], axis=-1)
                g = jax.nn.sigmoid(linear(p["vc_combine_W"], vec))
                ft["encoded_ft"] = g * ft["st_fused"] + (1.0 - g) * ft["cap_ft"]
            else:
                # softmax gate; concat order (query, cap, spatial, temporal,
                # audio) with score assignment (temporal, spatial, cap, audio)
                # — faithful to decoder.py:152-181.
                parts = [ft["encoded_query"], ft["cap_ft"]]
                if cfg.t2s:
                    parts.append(ft["spatial_ft"])
                if cfg.s2t:
                    parts.append(ft["temporal_ft"])
                if cfg.nb_aenc_blocks > 0:
                    parts.append(ft["audio_ft"])
                scores = jax.nn.softmax(
                    linear(p["vc_combine_W"], jnp.concatenate(parts, axis=-1)), -1)
                if cfg.both_directions:
                    enc = (scores[..., 0:1] * ft["temporal_ft"]
                           + scores[..., 1:2] * ft["spatial_ft"]
                           + scores[..., 2:3] * ft["cap_ft"])
                elif not cfg.t2s:
                    enc = (scores[..., 0:1] * ft["temporal_ft"]
                           + scores[..., 1:2] * ft["cap_ft"])
                else:
                    enc = (scores[..., 0:1] * ft["spatial_ft"]
                           + scores[..., 1:2] * ft["cap_ft"])
                if cfg.nb_aenc_blocks > 0:
                    enc = enc + scores[..., 3:4] * ft["audio_ft"]
                ft["encoded_ft"] = enc
    return ft, in_ft


def decoder_apply(p: Params, cfg: ModelConfig, ft: FT, x: jnp.ndarray,
                  masks: Masks, rngs: Optional[RngGen]) -> FT:
    """Full training-path decoder: N rounds of modality reasoning + response
    layer (decoder.py:107-186).  Returns ft with 'decoded_text' and the
    final-round modality features (consumed by the AE losses).

    cfg.remat wraps each round in jax.checkpoint: activations of the round
    are recomputed during backprop instead of stored (dropout keys are baked
    into the jaxpr, so recomputation is bit-identical)."""
    in_ft: FT = {k: ft["encoded_query"] for k in ("t2s", "s2t", "audio", "cap")}
    for n in range(cfg.nb_blocks):
        def round_body(p, ft, in_ft, x, masks, _n=n):
            ft2, in_ft2 = modality_step(p, cfg, _n, in_ft, ft, masks, rngs)
            x2 = mm_layer_apply(p["mm_layers"][_n], cfg, ft2, x, masks, rngs)
            return ft2, in_ft2, x2

        if cfg.remat:
            round_body = jax.checkpoint(round_body)
        ft, in_ft, x = round_body(p, ft, in_ft, x, masks)
    ft = dict(ft)
    ft["decoded_text"] = layer_norm(p["norm"], x)
    return ft
