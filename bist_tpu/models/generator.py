"""Output generators: tied-projection softmax, pointer-generator, and
multi-source pointer-generator (reference model/generator.py:11-127).

TPU-first changes:
  * The copy distribution uses a one-hot matmul
    (attn (B,L,Ltext) @ onehot(text) (B,Ltext,V)) instead of `scatter_add_`
    (generator.py:66-67,113-114) — scatter is serialising on TPU; the matmul
    rides the MXU and XLA fuses the one-hot.
  * No hard-coded device placement (the reference hard-codes `.cuda()`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig
from bist_tpu.models.layers import (
    Params, attention_weights, linear, linear_init, mha_init, split_heads,
    upcast_fp8,
)

EPS_LOG = 0.0  # reference takes a bare torch.log of the mixed distribution


def generator_init(key: jax.Array, cfg: ModelConfig) -> Params:
    """Params for the response generator.

    ptr_gen with >1 source (default 'query,cap'): MultiPointerGenerator —
    per-source 1-head pointer attention + switch Linear(d*(n+2) → n+1).
    ptr_gen with 1 source: PointerGenerator — switch Linear(3d → 1).
    Otherwise: tied projection (the reference's untied path is dead code —
    `separate_out_linear` undefined, mtn.py:95)."""
    if not cfg.ptr_gen:
        return {}
    sources = cfg.ptr_ft_list
    n = len(sources)
    keys = jax.random.split(key, n + 1)
    p: Params = {"pointer_attn": [mha_init(keys[i], 1, cfg.d_model) for i in range(n)]}
    if n > 1:
        p["pointer_gen_W"] = linear_init(keys[n], cfg.d_model * (n + 2), n + 1)
    else:
        p["pointer_gen_W"] = linear_init(keys[n], cfg.d_model * 3, 1)
    return p


def vocab_log_softmax(lut: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Tied generator: log_softmax(x @ lut^T) (generator.py:21-24).
    Matmul in the activation dtype; softmax always f32."""
    logits = jnp.matmul(x, lut.astype(x.dtype).T).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)


def _source(name: str, ft, tokens):
    """Resolve a pointer source name to (text_ids, encoded_text, mask).

    Masks: (B, 1, Ltext) validity as in Batch (dataset.py:66-79)."""
    if name == "query":
        return tokens["query"], ft["encoded_query"], tokens["query_mask"]
    if name == "his":
        return tokens["his"], ft["encoded_his"], tokens["his_mask"]
    if name == "cap":
        return tokens["cap"], ft["encoded_cap"], tokens["cap_mask"]
    if name == "query+cap":
        text = jnp.concatenate([tokens["query"], tokens["cap"]], axis=1)
        enc = jnp.concatenate([ft["encoded_query"], ft["encoded_cap"]], axis=1)
        mask = jnp.concatenate([tokens["query_mask"], tokens["cap_mask"]], axis=2)
        return text, enc, mask
    raise ValueError(f"unknown ptr_ft source {name!r}")


def pointer_k(p_attn: Params, encoded_text: jnp.ndarray) -> jnp.ndarray:
    """Pre-projected pointer key tensor (B, 1, Ltext, d).  The source texts
    are target-independent, so incremental decoding computes this ONCE per
    batch (model.precompute_decode_ctx) instead of at every step."""
    return split_heads(linear(p_attn["wk"], encoded_text), 1)


def _pointer_attn(p_attn: Params, logits: jnp.ndarray, encoded_text: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """1-head pointer attention probabilities (B, Lt, Ltext).

    The reference runs a full MultiHeadedAttention(h=1, dropout=0) and reads
    `.attn` (generator.py:62-63): only the q/k projections affect the stored
    probabilities, so the value/output projections are never computed here
    (their params exist for checkpoint parity but are mathematically inert
    in the reference too — .attn is taken before they apply)."""
    Q = split_heads(linear(p_attn["wq"], logits), 1)
    k = pointer_k(p_attn, encoded_text)
    if mask is not None:
        mask = mask[..., None, :, :]
    attn = attention_weights(Q, k, mask, 0.0, None)
    return attn[:, 0]  # drop the single head axis


def _copy_dist(attn: jnp.ndarray, text: jnp.ndarray, vocab: int) -> jnp.ndarray:
    """Σ_j attn[:, :, j] · onehot(text[:, j]) as a matmul (B, Lt, V)."""
    onehot = jax.nn.one_hot(text, vocab, dtype=attn.dtype)     # (B, Ltext, V)
    return jnp.einsum("blj,bjv->blv", attn, onehot)


def apply_generator_step(p: Params, cfg: ModelConfig, lut: jnp.ndarray,
                         decoded: jnp.ndarray, encoded_tgt: jnp.ndarray,
                         ptr_src) -> jnp.ndarray:
    """Incremental-decoding generator over (B, K, D) hypothesis rows.

    Same math as `apply_generator` at Lt=1 (verified by
    tests/test_model_forward.py incremental-vs-full and tests/test_beam.py),
    restructured for the decode hot loop: the per-source pointer keys and the
    copy-scatter one-hot come precomputed at B rows (model.PtrSource) and are
    shared across the K hypotheses of each batch element — the reference (and
    rounds ≤2 here) re-projected keys and re-materialised the (rows, L, V)
    one-hot every step for every hypothesis row."""
    if not cfg.ptr_gen:
        return vocab_log_softmax(lut, decoded)
    p_vocab = jax.nn.softmax(
        jnp.matmul(decoded, lut.astype(decoded.dtype).T).astype(jnp.float32),
        axis=-1)
    gen_vec_parts = [decoded, encoded_tgt]
    copy_dists = []
    for idx, src in enumerate(ptr_src):
        Q = split_heads(linear(p["pointer_attn"][idx]["wq"], decoded), 1)
        attn = attention_weights(Q, upcast_fp8(src.k),
                                 src.mask[..., None, :, :],
                                 0.0, None)[:, 0]            # (B, K, L)
        attn32 = attn.astype(jnp.float32)
        copy_dists.append(jnp.einsum("bkl,blv->bkv", attn32,
                                     upcast_fp8(src.onehot)))
        gen_vec_parts.append(
            jnp.einsum("bkl,bld->bkd", attn.astype(decoded.dtype),
                       src.enc.astype(decoded.dtype)))
    if len(ptr_src) > 1:
        switch = jax.nn.softmax(
            linear(p["pointer_gen_W"],
                   jnp.concatenate(gen_vec_parts, axis=-1))
            .astype(jnp.float32), -1)
        p_out = switch[..., -1:] * p_vocab
        for idx in range(len(ptr_src)):
            p_out = p_out + switch[..., idx:idx + 1] * copy_dists[idx]
    else:
        gen_vec = jnp.concatenate(
            [decoded, gen_vec_parts[2], encoded_tgt], axis=-1)
        g = jax.nn.sigmoid(
            linear(p["pointer_gen_W"], gen_vec).astype(jnp.float32))
        p_out = (1.0 - g) * copy_dists[0] + g * p_vocab
    return jnp.log(p_out)


def apply_generator(p: Params, cfg: ModelConfig, lut: jnp.ndarray,
                    ft: Dict[str, jnp.ndarray], tokens: Dict[str, jnp.ndarray],
                    ft_key: str = "decoded_text") -> jnp.ndarray:
    """Log-probabilities over the vocabulary, (B, Lt, V) — the TRAINING
    path (incremental decoding uses apply_generator_step).

    tokens must hold query/his/cap ids and their (B,1,L) masks (cap entries
    may be absent when the model has no separate caption)."""
    x = ft[ft_key]
    if not cfg.ptr_gen:
        return vocab_log_softmax(lut, x)

    vocab = lut.shape[0]
    p_vocab = jax.nn.softmax(
        jnp.matmul(x, lut.astype(x.dtype).T).astype(jnp.float32), axis=-1)
    sources = cfg.ptr_ft_list
    encoded_in = ft["encoded_tgt"]
    gen_vec_parts = [x, encoded_in]
    copy_dists = []
    for idx, name in enumerate(sources):
        text, enc_text, mask = _source(name, ft, tokens)
        if cfg.mask_unk:
            mask = mask & (text != 0)[:, None, :]   # ban <unk> sources (generator.py:59-60)
        attn = _pointer_attn(p["pointer_attn"][idx], x, enc_text, mask) \
            .astype(jnp.float32)
        copy_dists.append(_copy_dist(attn, text, vocab))
        # context vector: attn-weighted sum of the (unprojected) encoded text
        text_vec = jnp.einsum("blj,bjd->bld", attn.astype(x.dtype), enc_text)
        gen_vec_parts.append(text_vec)

    if len(sources) > 1:
        # MultiPointerGenerator: softmax switch over [sources..., vocab]
        # (generator.py:118-127)
        switch = jax.nn.softmax(
            linear(p["pointer_gen_W"],
                   jnp.concatenate(gen_vec_parts, axis=-1))
            .astype(jnp.float32), -1)
        p_out = switch[..., -1:] * p_vocab
        for idx in range(len(sources)):
            p_out = p_out + switch[..., idx:idx + 1] * copy_dists[idx]
    else:
        # PointerGenerator: sigmoid switch mixing p_vocab vs p_copy
        # (generator.py:68-73); gen_vec order is (logits, text_vec, encoded_in)
        gen_vec = jnp.concatenate([x, gen_vec_parts[2], encoded_in], axis=-1)
        g = jax.nn.sigmoid(
            linear(p["pointer_gen_W"], gen_vec).astype(jnp.float32))
        p_out = (1.0 - g) * copy_dists[0] + g * p_vocab
    return jnp.log(p_out)
