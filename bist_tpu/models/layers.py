"""Transformer primitives, functional JAX style: params are nested dicts of
jnp arrays; apply functions are pure.

Numerical parity targets (reference model/modules.py):
  * LayerNorm divides by (std + eps) where std uses Bessel's correction
    (torch Tensor.std default, unbiased) — NOT the variance-based layer norm
    (modules.py:20-31).
  * SublayerConnection: x + dropout(sublayer(LN(x))) — pre-norm residual
    (modules.py:33-44).
  * Scaled-dot attention with additive -1e9 masking where mask == 0
    (modules.py:54-64).
  * MultiHeadedAttention with 4 linears (q/k/v/out), d_k = d_model / h
    (modules.py:66-100); attention-probability dropout inside.
  * PositionwiseFeedForward: W2(dropout(relu(W1 x))) (modules.py:102-113).
  * Embeddings scaled by sqrt(d_model) (modules.py:115-123).
  * Sinusoidal PositionalEncoding added then dropout (modules.py:125-144).

Init parity (reference mtn.py:163-165): xavier-uniform for every parameter
with ndim > 1 (weights AND the embedding table); biases keep the torch Linear
default U(-1/sqrt(fan_in), 1/sqrt(fan_in)); LayerNorm scale=1, bias=0.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

NEG_INF = -1e9

# Decode-memory storage dtypes (GenerateConfig.cache_dtype).  fp8 is
# STORAGE-only: v5e has no fp8 MXU, so every read site upcasts to bf16 via
# `upcast_fp8` and XLA fuses the convert into the consumer — the HBM bytes
# of the dominant per-step decode reads (self-attn KV cache, precomputed
# cross-attn K/V, pointer keys/encodings/one-hot) halve again vs bf16.
# e4m3 keeps ~2 significant digits; attention scores/softmax/generator still
# accumulate f32, but answers are NOT guaranteed identical to f32 — fp8 is
# opt-in (generate.py/serve.py --cache-dtype), never a default.
_STORAGE_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}
_FP8_DTYPES = (jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2))


def storage_dtype(name: str):
    """Map a GenerateConfig.cache_dtype string to the jnp storage dtype."""
    try:
        return _STORAGE_DTYPES[name]
    except KeyError:
        raise ValueError(
            f"cache_dtype {name!r}: expected one of {sorted(_STORAGE_DTYPES)}"
        ) from None


def upcast_fp8(x: jnp.ndarray) -> jnp.ndarray:
    """Load a decode-memory tensor for compute: fp8 storage → bf16.

    fp8 dtypes don't participate in jnp implicit promotion, so consumers
    must upcast explicitly; for f32/bf16 storage this is the identity."""
    return x.astype(jnp.bfloat16) if x.dtype in _FP8_DTYPES else x


class RngGen:
    """Deterministic per-site dropout key generator for use during tracing.

    Holds a base PRNG key; each next() yields a fresh site key.  Pass None
    instead of an RngGen to disable dropout (eval mode).

    presplit > 0 derives the first `presplit` site keys with ONE vectorized
    `jax.random.split` instead of a per-site `fold_in` chain: at the
    flagship config a train step hits ~60 dropout sites, and under the rbg
    impl each fold_in is still a software hash op — batching them into one
    split removes ~60 tiny ops from the latency-bound step (A/B in
    scripts/bench_pack_ab.py --what presplit).  Sites beyond the pool fall
    back to fold_in (same determinism, different stream than presplit=0)."""

    def __init__(self, key: jax.Array, presplit: int = 0):
        self._key = key
        self._n = 0
        self._keys = jax.random.split(key, presplit) if presplit > 0 else None

    def next(self) -> jax.Array:
        self._n += 1
        if self._keys is not None and self._n <= self._keys.shape[0]:
            return self._keys[self._n - 1]
        return jax.random.fold_in(self._key, self._n)


def dropout(x: jnp.ndarray, rate: float, rngs: Optional[RngGen]) -> jnp.ndarray:
    """Inverted dropout; identity when rngs is None or rate == 0."""
    if rngs is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rngs.next(), p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Inits


def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = shape[0], shape[1]
    if len(shape) > 2:
        receptive = int(np.prod(shape[2:]))
        fan_in, fan_out = fan_in * receptive, fan_out * receptive
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key: jax.Array, d_in: int, d_out: int) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": xavier_uniform(kw, (d_in, d_out)),
        "b": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
    }


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Matmul in the activation dtype (params stored f32; cast to bf16 at use
    under the mixed-precision policy so the MXU runs bf16 with f32 accum)."""
    w, b = p["w"], p["b"]
    if x.dtype != w.dtype:
        w = w.astype(x.dtype)
        b = b.astype(x.dtype)
    return jnp.matmul(x, w) + b


# Pack same-input q/k/v (or k/v) projections into one GEMM.  MEASURED on the
# v5e (scripts/bench_pack_ab.py, interleaved in-process A/B): train step
# 1.02x (noise), beam decode 0.91x — the packed lowering is SLOWER for
# decoding (the weight concat lives inside the scan body and XLA already
# pipelines the separate small GEMMs well), so the default is OFF.  The
# lowering is numerically identical (tests/test_pack_projections.py); flip
# BIST_PACK_QKV=1 to re-measure on other hardware/widths.  NOTE: read at
# trace time — set the env var BEFORE the first jit trace (toggling later
# does not retrace already-compiled functions); benches that flip it
# mid-process retrace explicitly (scripts/bench_pack_ab.py).
import os as _os

# Read at TRACE time: BIST_PACK_QKV must be set before the first jit of any
# function using mha — flipping the global after a program is compiled keeps
# the stale lowering in the jit cache (clear with jax.clear_caches() when
# A/B-ing in one process, as scripts/bench_pack_ab.py does).
PACK_PROJECTIONS = _os.environ.get("BIST_PACK_QKV", "0") != "0"


def linear_packed(ps, x: jnp.ndarray):
    """Apply several linears that share the same input as ONE GEMM.

    Concatenating the output columns leaves each column's contraction
    unchanged, so results are numerically identical to separate `linear`
    calls — but the MXU sees one wider matmul instead of 2-3 sequential
    small ones.  At BiST widths (d_model=128) the train/decode steps are
    latency-bound on ~60 small attention sublayers (BENCH.md round-2), so
    cutting sequential dispatches is the available win; the weight concat
    itself is a few KB."""
    w = jnp.concatenate([p["w"] for p in ps], axis=1)
    b = jnp.concatenate([p["b"] for p in ps], axis=0)
    if x.dtype != w.dtype:
        w = w.astype(x.dtype)
        b = b.astype(x.dtype)
    y = jnp.matmul(x, w) + b
    splits = np.cumsum([p["w"].shape[1] for p in ps])[:-1].tolist()
    return jnp.split(y, splits, axis=-1)


def layer_norm_init(d: int) -> Params:
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """(x - mean) / (std + eps) with Bessel-corrected std (modules.py:27-31).
    Statistics always in float32 for bf16 stability; result in x.dtype."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    d = x.shape[-1]
    var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / max(d - 1, 1)
    std = jnp.sqrt(var)
    out = p["scale"] * (xf - mean) / (std + eps) + p["bias"]
    return out.astype(dt)


def embedding_init(key: jax.Array, vocab: int, d_model: int) -> Params:
    return {"lut": xavier_uniform(key, (vocab, d_model))}


def embed(p: Params, ids: jnp.ndarray, d_model: int) -> jnp.ndarray:
    return jnp.take(p["lut"], ids, axis=0) * math.sqrt(d_model)


def positional_encoding_table(d_model: int, max_len: int = 5000) -> jnp.ndarray:
    """Sinusoidal table (max_len, d_model) (modules.py:125-144)."""
    position = np.arange(0.0, max_len)[:, None]
    div_term = np.exp(np.arange(0.0, d_model, 2) * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)


def add_positional(pe: jnp.ndarray, x: jnp.ndarray, rate: float,
                   rngs: Optional[RngGen], offset: int = 0) -> jnp.ndarray:
    """x + pe[offset:offset+L] then dropout.  `offset` supports incremental
    decoding where x is the single token at absolute position `offset`."""
    L = x.shape[-2]
    if isinstance(offset, int) and offset == 0:
        x = x + pe[:L]
    else:
        x = x + jax.lax.dynamic_slice_in_dim(pe, offset, L, axis=0)
    return dropout(x, rate, rngs)


# ---------------------------------------------------------------------------
# Multi-head attention


def mha_init(key: jax.Array, h: int, d_model: int, d_in: int = -1) -> Params:
    if d_in < 0:
        d_in = d_model
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": linear_init(kq, d_in, d_model),
        "wk": linear_init(kk, d_in, d_model),
        "wv": linear_init(kv, d_in, d_model),
        "wo": linear_init(ko, d_model, d_in),
    }


def split_heads(x: jnp.ndarray, h: int) -> jnp.ndarray:
    """(..., L, d_model) → (..., h, L, d_k)."""
    *lead, L, d = x.shape
    x = x.reshape(*lead, L, h, d // h)
    return jnp.moveaxis(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., h, L, d_k) → (..., L, h*d_k)."""
    x = jnp.moveaxis(x, -3, -2)
    *lead, L, h, dk = x.shape
    return x.reshape(*lead, L, h * dk)


def attention_weights(q: jnp.ndarray, k: jnp.ndarray,
                      mask: Optional[jnp.ndarray],
                      drop_rate: float, rngs: Optional[RngGen]) -> jnp.ndarray:
    """softmax(QK^T / sqrt(d_k)) with -1e9 masking (modules.py:54-64).

    q: (..., h, Lq, d_k); k: (..., h, Lk, d_k); leading dims broadcast.
    mask broadcastable to (..., 1, Lq, Lk); masked where == 0."""
    d_k = q.shape[-1]
    # scores + softmax in f32 regardless of activation dtype
    scores = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask == 0, NEG_INF, scores)
    p_attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return dropout(p_attn, drop_rate, rngs)


def _flash_path(Q, K, V, mask, h):
    """Flatten leading dims and run the Pallas streaming-softmax kernel
    (bist_tpu.ops.flash_attention) — taken for long kv axes where
    materialising (…, Lq, Lk) scores in HBM dominates."""
    from bist_tpu.ops.flash_attention import flash_attention

    lead = jnp.broadcast_shapes(Q.shape[:-2], K.shape[:-2])
    Lq, dk = Q.shape[-2:]
    Lk = K.shape[-2]
    Qb = jnp.broadcast_to(Q, lead + (Lq, dk)).reshape(-1, Lq, dk)
    Kb = jnp.broadcast_to(K, lead + (Lk, dk)).reshape(-1, Lk, dk)
    Vb = jnp.broadcast_to(V, lead + (Lk, dk)).reshape(-1, Lk, dk)
    mb = None
    if mask is not None:
        # mha masks are kv-validity rows broadcast over Lq/heads
        mb = jnp.broadcast_to(mask[..., 0, :], lead + (Lk,)).reshape(-1, Lk)
    # interpret mode off-TPU so the dispatch path itself is testable on the
    # CPU mesh (tests/test_bist_flash_integration.py); no-op on TPU
    import jax as _jax

    out = flash_attention(Qb, Kb, Vb, mb,
                          interpret=_jax.default_backend() == "cpu")
    return out.reshape(lead + (Lq, dk))


# single source of truth for the XLA↔Pallas frontier (measured, see
# ops/dispatch.py docstring + BENCH.md)
from bist_tpu.ops.dispatch import FLASH_MIN_KV


# Heads-LAST attention layout (BIST_HEADS_LAST, default ON — the measured
# decider winner: 1.087x alone, 1.210x combined with the split KV cache,
# v5e --iters 8 --reps 7, BENCH.md round 4; read at trace time like
# PACK_PROJECTIONS above): keep q/k/v as (..., L, h, d_k) — a FREE reshape
# of the projection output — and put the head axis in the einsum batch dims
# instead of moveaxis-ing it in front of L.  Motivation: the round-4 device
# timeline (scripts/decode_profile.py) showed the split_heads moveaxis
# materialising as real layout-change copies at ~80 GB/s (six 104 us
# (B,G,h,L,d_k) copies per decode-ctx precompute = ~6% of the beam call).
# Numerically identical contractions (same dot products, f32 accumulate);
# equality-tested in tests/test_model_forward.py.
HEADS_LAST = _os.environ.get("BIST_HEADS_LAST", "1") != "0"

# EXPERIMENTAL (round 5): keep the head axis in place through the score/attn
# tensors too — scores "...qhd,...khd->...qhk" (q, h, k) instead of
# "...qhd,...khd->...hqk" (h, q, k).  Motivation: the round-5 train-step
# device timeline (scripts/train_profile.py) shows ~2.5 ms/step of layout
# copies on the grid tensors, dominated by (B,T,S,h,dk) <-> (B,T,h,S,dk)
# transposes XLA inserts to batch the einsums over h — the qhk form never
# moves h in front of the sequence axes, so those relayouts have no reason
# to exist.  Same per-element contraction (d only), softmax still over k:
# numerically identical; equality-tested in test_model_forward.  Read at
# trace time; decider A/B decides the default (BENCH.md round 5).
SCORES_QHK = _os.environ.get("BIST_SCORES_QHK", "0") != "0"


def _mha_heads_last(p: Params, h: int, query, key, value, mask,
                    drop_rate, rngs, return_attn):
    """mha body with the head axis kept LAST-but-one end to end.

    Q/K/V stay (..., L, h, d_k) (reshape of the projection — no transpose);
    scores einsum "...qhd,...khd->...hqk" puts heads where the mask/softmax
    code expects them without ever materialising a transposed q/k/v; the
    context einsum returns (..., q, h, d) so merge is again a free reshape.
    With SCORES_QHK the score/attn tensors keep heads in place as
    (..., q, h, k) — see the flag comment; return_attn callers always get
    the (..., h, q, k) layout either way."""
    def proj_heads(w, x):
        y = linear(w, x)
        *lead, L, d = y.shape
        return y.reshape(*lead, L, h, d // h)

    Q, K, V = (proj_heads(p["wq"], query), proj_heads(p["wk"], key),
               proj_heads(p["wv"], value))
    d_k = Q.shape[-1]
    if SCORES_QHK:
        scores = jnp.einsum("...qhd,...khd->...qhk", Q, K,
                            preferred_element_type=jnp.float32) \
            / math.sqrt(d_k)
        if mask is not None:
            # mask is (..., Lq-or-1, Lk): insert the head axis BEFORE k
            scores = jnp.where(mask[..., :, None, :] == 0, NEG_INF, scores)
        attn = jax.nn.softmax(scores, axis=-1).astype(Q.dtype)
        attn = dropout(attn, drop_rate, rngs)
        x = jnp.einsum("...qhk,...khd->...qhd", attn, V)
        *lead, L, hh, dk = x.shape
        out = linear(p["wo"], x.reshape(*lead, L, hh * dk))
        if return_attn:
            return out, jnp.moveaxis(attn, -2, -3)   # (..., h, q, k)
        return out
    scores = jnp.einsum("...qhd,...khd->...hqk", Q, K,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask[..., None, :, :] == 0, NEG_INF, scores)
    attn = jax.nn.softmax(scores, axis=-1).astype(Q.dtype)
    attn = dropout(attn, drop_rate, rngs)
    x = jnp.einsum("...hqk,...khd->...qhd", attn, V)
    *lead, L, hh, dk = x.shape
    out = linear(p["wo"], x.reshape(*lead, L, hh * dk))
    if return_attn:
        return out, attn
    return out


def mha(p: Params, h: int, query: jnp.ndarray, key: jnp.ndarray,
        value: jnp.ndarray, mask: Optional[jnp.ndarray] = None, *,
        drop_rate: float = 0.1, rngs: Optional[RngGen] = None,
        return_attn: bool = False, allow_flash: bool = True):
    """Multi-head attention with arbitrary broadcastable leading batch dims.

    query (..., Lq, D), key/value (..., Lk, D).  The projections run on the
    *unbroadcast* inputs (the efficiency win over the reference, which
    materialises expanded copies before projecting, encoder.py:114-147); only
    the score einsum and the output see broadcast shapes.

    mask: broadcastable to scores' (..., 1, Lq, Lk); positions where mask == 0
    get -1e9 (modules.py:58-59).  The extra `1` head axis mirrors the
    reference's mask.unsqueeze(1) (modules.py:83-85)."""
    if HEADS_LAST:
        # same flash-dispatch predicate as below, evaluated on the logical
        # shapes (Lk = key.shape[-2], d_k from the projection width); the
        # flash path keeps the split-heads layout (it flattens anyway)
        d_k = p["wq"]["w"].shape[1] // h
        use_flash = (allow_flash and not return_attn and rngs is None
                     and key.shape[-2] >= FLASH_MIN_KV and d_k >= 64
                     and (mask is None or mask.shape[-2] == 1))
        if not use_flash:
            return _mha_heads_last(p, h, query, key, value, mask,
                                   drop_rate, rngs, return_attn)
    if PACK_PROJECTIONS and query is key and key is value:
        # self-attention: one packed QKV projection (same input object)
        q_p, k_p, v_p = linear_packed((p["wq"], p["wk"], p["wv"]), query)
        Q, K, V = split_heads(q_p, h), split_heads(k_p, h), split_heads(v_p, h)
    elif PACK_PROJECTIONS and key is value:
        # cross-attention: packed KV projection reads the memory once
        Q = split_heads(linear(p["wq"], query), h)
        k_p, v_p = linear_packed((p["wk"], p["wv"]), key)
        K, V = split_heads(k_p, h), split_heads(v_p, h)
    else:
        Q = split_heads(linear(p["wq"], query), h)
        K = split_heads(linear(p["wk"], key), h)
        V = split_heads(linear(p["wv"], value), h)
    if mask is not None:
        mask = mask[..., None, :, :]       # add head axis
    if (allow_flash and not return_attn and rngs is None
            and K.shape[-2] >= FLASH_MIN_KV
            and K.shape[-1] >= 64   # d_k < 64 pays up to 8x lane padding in
                                    # the kernel; XLA wins there (BENCH.md)
            and (mask is None or mask.shape[-2] == 1)):
        x = _flash_path(Q, K, V, mask, h)
        return linear(p["wo"], merge_heads(x))
    attn = attention_weights(Q, K, mask, drop_rate, rngs)
    x = jnp.einsum("...qk,...kd->...qd", attn, V)
    out = linear(p["wo"], merge_heads(x))
    if return_attn:
        return out, attn
    return out


# ---------------------------------------------------------------------------
# Feed-forward and sublayer


def ffn_init(key: jax.Array, d_model: int, d_ff: int, d_out: int = -1) -> Params:
    if d_out < 0:
        d_out = d_model
    k1, k2 = jax.random.split(key)
    return {"w1": linear_init(k1, d_model, d_ff), "w2": linear_init(k2, d_ff, d_out)}


def ffn(p: Params, x: jnp.ndarray, drop_rate: float,
        rngs: Optional[RngGen]) -> jnp.ndarray:
    return linear(p["w2"], dropout(jax.nn.relu(linear(p["w1"], x)), drop_rate, rngs))


def sublayer(p_norm: Params, x: jnp.ndarray, fn, drop_rate: float,
             rngs: Optional[RngGen]) -> jnp.ndarray:
    """x + dropout(fn(LN(x))) (modules.py:33-44).  `fn` sees the normed x."""
    return x + dropout(fn(layer_norm(p_norm, x)), drop_rate, rngs)


def subsequent_mask(size: int) -> jnp.ndarray:
    """(1, L, L) lower-triangular causal mask, 1 = attend (data_utils.py:14-18)."""
    return jnp.tril(jnp.ones((1, size, size), dtype=jnp.int32))
