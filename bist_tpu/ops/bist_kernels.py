"""Fused Pallas kernel for the BiST factorized-attention hop.

The hot op of the paper's reasoning block (reference encoder.py:109-170) is
"hop 1": for every group g (spatial region in t2s, temporal step in s2t),
attend the query against that group's kv sequence.  The XLA path projects
K/V for the whole grid into (B, G, h, L_kv, d_k) HBM tensors, then runs the
attention einsum.  This kernel fuses, per (batch, group) cell, streaming
kv BLOCKS through VMEM with an online softmax (flash-style):

    per kv block j:
      k = kv_j @ Wk + bk        (MXU, contraction over D=d_model)
      v = kv_j @ Wv + bv
      per head: s = q_h k_hᵀ/√d_k → mask → online-softmax update (m, l, acc)
    last block:
      concat = acc / l  (per head)
      out    = concat @ Wo + bo
      o      = x + out          (the broadcast residual, encoder.py:120)

so the projected K/V never touch HBM (2× the grid's bytes saved per hop), the
(B, G, h, Lq, L_kv) score tensor never materialises, and VMEM stays bounded
at any video length (the round-1 whole-row kernel OOMed scoped vmem at
L_kv≈8192).

The query-side projection runs ONCE outside (it is group-invariant — the
same optimisation our einsum path makes vs the reference's expand-then-
project).  `hop1_trainable` wraps it with a custom VJP whose backward is a
second streaming Pallas kernel (see below).

Layout notes (guide: pallas_guide.md):
  * D = d_model is the lane dim (multiple of 128 assumed by dispatch);
  * heads are processed as 16-wide d_k slices of the projected (L, D)
    tensors — small contractions, but they stay in VMEM/registers;
  * online-softmax carries (m, l) per head live in a (Lq_pad, h) VMEM
    scratch; acc is the head-concatenated (Lq_pad, D) scratch.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
DEFAULT_BLK_K = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hop1_kernel(x_ref, q_ref, kv_ref, mask_ref,
                 wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                 o_ref, m_scr, l_scr, acc_scr,
                 *, h: int, d_k: int, kv_len: int, blk_k: int, scale: float):
    """One (batch, group, kv-block) step of the streamed fused hop."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    kv = kv_ref[0, 0]                                   # (blk_k, D)
    q = q_ref[0]                                        # (Lq_pad, D)

    k = jnp.dot(kv, wk_ref[...], preferred_element_type=jnp.float32) \
        + bk_ref[...]                                   # (blk_k, D)
    v = jnp.dot(kv, wv_ref[...], preferred_element_type=jnp.float32) \
        + bv_ref[...]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, blk_k), 1) + j * blk_k
    valid = col < kv_len                                # (1, blk_k)
    if mask_ref is not None:
        valid = jnp.logical_and(valid, mask_ref[0, 0][None, :] != 0)

    for head in range(h):
        sl = slice(head * d_k, (head + 1) * d_k)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid, s, NEG_INF)                # (Lq_pad, blk_k)
        m_prev = m_scr[:, head:head + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:, head:head + 1] = alpha * l_scr[:, head:head + 1] \
            + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:, sl] = acc_scr[:, sl] * alpha + jnp.dot(
            p, v[:, sl], preferred_element_type=jnp.float32)
        m_scr[:, head:head + 1] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        l = jnp.maximum(l_scr[:], 1e-30)                # (Lq_pad, h)
        Lq_pad = acc_scr.shape[0]
        div = jnp.broadcast_to(l[:, :, None], (Lq_pad, h, d_k)) \
            .reshape(Lq_pad, h * d_k)
        concat = acc_scr[:] / div                       # (Lq_pad, D)
        out = jnp.dot(concat, wo_ref[...],
                      preferred_element_type=jnp.float32) + bo_ref[...]
        o_ref[0, 0] = (x_ref[0] + out).astype(o_ref.dtype)


def bist_hop1_fused(x: jnp.ndarray, q_proj: jnp.ndarray, kv: jnp.ndarray,
                    attn_params, h: int,
                    mask: Optional[jnp.ndarray] = None,
                    blk_k: int = DEFAULT_BLK_K,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused hop-1 for one direction.

    x:      (B, Lq, D)   raw query state (residual source)
    q_proj: (B, Lq, D)   LN(x) @ Wq + bq, computed once outside
    kv:     (B, G, Lk, D) grouped feature grid (G=S for t2s, G=T for s2t)
    attn_params: the mha param dict {'wk','wv','wo': {'w','b'}, ...}
    mask:   (B, 1, Lk) kv validity or None
    → (B, G, Lq, D) = x[:,None] + MHA(q, kv, kv)   (encoder.py:113-120)
    """
    B, G, Lk, D = kv.shape
    Lq = x.shape[1]
    d_k = D // h
    scale = 1.0 / math.sqrt(d_k)

    blk_k = min(blk_k, _round_up(Lk, 128))
    Lk_pad = _round_up(Lk, blk_k)
    Lq_pad = _round_up(Lq, 8)
    kv_p = jnp.pad(kv, ((0, 0), (0, 0), (0, Lk_pad - Lk), (0, 0)))
    x_p = jnp.pad(x, ((0, 0), (0, Lq_pad - Lq), (0, 0)))
    q_p = jnp.pad(q_proj, ((0, 0), (0, Lq_pad - Lq), (0, 0)))

    in_specs = [
        pl.BlockSpec((1, Lq_pad, D), lambda b, g, j: (b, 0, 0)),
        pl.BlockSpec((1, Lq_pad, D), lambda b, g, j: (b, 0, 0)),
        pl.BlockSpec((1, 1, blk_k, D), lambda b, g, j: (b, g, j, 0)),
    ]
    args = [x_p, q_p, kv_p]
    if mask is not None:
        mp = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, 0),
                                              (0, Lk_pad - Lk)))
        in_specs.append(pl.BlockSpec((1, 1, blk_k), lambda b, g, j: (b, 0, j)))
        args.append(mp)

    wspec = pl.BlockSpec((D, D), lambda b, g, j: (0, 0))
    bspec = pl.BlockSpec((D,), lambda b, g, j: (0,))
    in_specs += [wspec, bspec, wspec, bspec, wspec, bspec]
    args += [attn_params["wk"]["w"], attn_params["wk"]["b"],
             attn_params["wv"]["w"], attn_params["wv"]["b"],
             attn_params["wo"]["w"], attn_params["wo"]["b"]]

    kw = dict(h=h, d_k=d_k, kv_len=Lk, blk_k=blk_k, scale=scale)
    if mask is not None:
        def kernel(x_ref, q_ref, kv_ref, mask_ref, wk, bk, wv, bv, wo, bo,
                   o_ref, m_scr, l_scr, acc_scr):
            _hop1_kernel(x_ref, q_ref, kv_ref, mask_ref, wk, bk, wv, bv,
                         wo, bo, o_ref, m_scr, l_scr, acc_scr, **kw)
    else:
        def kernel(x_ref, q_ref, kv_ref, wk, bk, wv, bv, wo, bo,
                   o_ref, m_scr, l_scr, acc_scr):
            _hop1_kernel(x_ref, q_ref, kv_ref, None, wk, bk, wv, bv,
                         wo, bo, o_ref, m_scr, l_scr, acc_scr, **kw)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, G, Lq_pad, D), x.dtype),
        grid=(B, G, Lk_pad // blk_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Lq_pad, D), lambda b, g, j: (b, g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Lq_pad, h), jnp.float32),
            pltpu.VMEM((Lq_pad, h), jnp.float32),
            pltpu.VMEM((Lq_pad, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:, :, :Lq, :]


def hop1_reference(x, q_proj, kv, attn_params, h, mask=None):
    """Einsum reference with identical semantics (projection-once MHA with
    broadcast residual) — mirrors models.bist hop-1 math."""
    from bist_tpu.models.layers import linear, merge_heads, split_heads

    d_k = x.shape[-1] // h
    Q = split_heads(q_proj, h)                           # (B, h, Lq, dk)
    K = split_heads(linear(attn_params["wk"], kv), h)    # (B, G, h, Lk, dk)
    V = split_heads(linear(attn_params["wv"], kv), h)
    s = jnp.einsum("bhqd,bghkd->bghqk", Q, K) / math.sqrt(d_k)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :, :] != 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bghqk,bghkd->bghqd", p, V)
    return x[:, None] + linear(attn_params["wo"], merge_heads(o))


# ---------------------------------------------------------------------------
# Differentiable wrapper: fused forward, reference backward (remat-style)


def _hop1_flat(x, q_proj, kv, wk, bk, wv, bv, wo, bo, h, mask):
    p = {"wk": {"w": wk, "b": bk}, "wv": {"w": wv, "b": bv},
         "wo": {"w": wo, "b": bo}}
    return hop1_reference(x, q_proj, kv, p, h, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def hop1_trainable(x, q_proj, kv, wk, bk, wv, bv, wo, bo, h, mask=None):
    """Differentiable fused hop-1: forward runs the Pallas kernel; backward
    recomputes through the einsum reference (remat-style — one extra
    reference forward instead of a bespoke backward kernel)."""
    p = {"wk": {"w": wk, "b": bk}, "wv": {"w": wv, "b": bv},
         "wo": {"w": wo, "b": bo}}
    return bist_hop1_fused(x, q_proj, kv, p, h, mask)


def _hop1_fwd(x, q_proj, kv, wk, bk, wv, bv, wo, bo, h, mask=None):
    out = hop1_trainable(x, q_proj, kv, wk, bk, wv, bv, wo, bo, h, mask)
    return out, (x, q_proj, kv, wk, bk, wv, bv, wo, bo, mask)


def _hop1_bwd(h, res, g):
    x, q_proj, kv, wk, bk, wv, bv, wo, bo, mask = res
    _, vjp = jax.vjp(
        lambda *a: _hop1_flat(*a, h=h, mask=mask),
        x, q_proj, kv, wk, bk, wv, bv, wo, bo)
    grads = vjp(g)
    return grads + (None,)


hop1_trainable.defvjp(_hop1_fwd, _hop1_bwd)
