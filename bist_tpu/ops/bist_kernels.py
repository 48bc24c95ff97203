"""Fused Pallas kernel for the BiST factorized-attention hop.

The hot op of the paper's reasoning block (reference encoder.py:109-170) is
"hop 1": for every group g (spatial region in t2s, temporal step in s2t),
attend the query against that group's kv sequence.  The XLA path projects
K/V for the whole grid into (B, G, h, L_kv, d_k) HBM tensors, then runs the
attention einsum.  This kernel fuses, per (batch, group) grid cell, entirely
in VMEM:

    k = kv @ Wk + bk          (MXU, contraction over D=d_model)
    v = kv @ Wv + bv
    per head: scores = q_h k_hᵀ/√d_k  → mask → softmax → p_h v_h
    out = concat(heads) @ Wo + bo
    o   = x + out             (the broadcast residual, encoder.py:120)

so the projected K/V never touch HBM (2× the grid's bytes saved per hop) and
the (B, G, h, Lq, L_kv) score tensor never materialises.

The query-side projection runs ONCE outside (it is group-invariant — the
same optimisation our einsum path makes vs the reference's expand-then-
project).  Used on the no-dropout path (eval / serving); training keeps the
XLA einsum path (a custom VJP would be needed for backprop through the
kernel).

Layout notes (guide: pallas_guide.md):
  * D = d_model is the lane dim (pad to 128);
  * heads are processed by slicing 16-wide d_k chunks of the projected
    (L, D) tensors — small contractions, but they stay in VMEM/registers;
  * L_kv is padded to the sublane tile; padding is masked with -1e9.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hop1_kernel(x_ref, q_ref, kv_ref, mask_ref,
                 wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                 o_ref, *, h: int, d_k: int, kv_len: int, scale: float):
    """One (batch, group) cell: fused K/V projection + attention + out
    projection + residual."""
    kv = kv_ref[0, 0]                                   # (Lk_pad, D)
    q = q_ref[0]                                        # (Lq, D) — projected
    x = x_ref[0]                                        # (Lq, D) — residual

    k = jnp.dot(kv, wk_ref[...], preferred_element_type=jnp.float32) \
        + bk_ref[...]                                   # (Lk_pad, D)
    v = jnp.dot(kv, wv_ref[...], preferred_element_type=jnp.float32) \
        + bv_ref[...]

    Lk_pad = kv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Lk_pad), 1)
    valid = col < kv_len                                # (1, Lk_pad)
    if mask_ref is not None:
        valid = jnp.logical_and(valid, mask_ref[0, 0][None, :] != 0)

    outs = []
    for head in range(h):
        sl = slice(head * d_k, (head + 1) * d_k)
        q_h = q[:, sl]                                  # (Lq, d_k)
        k_h = k[:, sl]
        v_h = v[:, sl]
        s = jax.lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid, s, NEG_INF)                # (Lq, Lk_pad)
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.dot(p, v_h, preferred_element_type=jnp.float32))
    concat = jnp.concatenate(outs, axis=-1)             # (Lq, D)
    out = jnp.dot(concat, wo_ref[...],
                  preferred_element_type=jnp.float32) + bo_ref[...]
    o_ref[0, 0] = (x + out).astype(o_ref.dtype)


def bist_hop1_fused(x: jnp.ndarray, q_proj: jnp.ndarray, kv: jnp.ndarray,
                    attn_params, h: int,
                    mask: Optional[jnp.ndarray] = None,
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

    Lk_pad = _round_up(Lk, 128)
    Lq_pad = _round_up(Lq, 8)
    kv_p = jnp.pad(kv, ((0, 0), (0, 0), (0, Lk_pad - Lk), (0, 0)))
    x_p = jnp.pad(x, ((0, 0), (0, Lq_pad - Lq), (0, 0)))
    q_p = jnp.pad(q_proj, ((0, 0), (0, Lq_pad - Lq), (0, 0)))

    in_specs = [
        pl.BlockSpec((1, Lq_pad, D), lambda b, g: (b, 0, 0)),
        pl.BlockSpec((1, Lq_pad, D), lambda b, g: (b, 0, 0)),
        pl.BlockSpec((1, 1, Lk_pad, D), lambda b, g: (b, g, 0, 0)),
    ]
    args = [x_p, q_p, kv_p]
    if mask is not None:
        mp = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, 0),
                                              (0, Lk_pad - Lk)))
        in_specs.append(pl.BlockSpec((1, 1, Lk_pad), lambda b, g: (b, 0, 0)))
        args.append(mp)

    wspec = pl.BlockSpec((D, D), lambda b, g: (0, 0))
    bspec = pl.BlockSpec((D,), lambda b, g: (0,))
    in_specs += [wspec, bspec, wspec, bspec, wspec, bspec]
    args += [attn_params["wk"]["w"], attn_params["wk"]["b"],
             attn_params["wv"]["w"], attn_params["wv"]["b"],
             attn_params["wo"]["w"], attn_params["wo"]["b"]]

    if mask is not None:
        def kernel(x_ref, q_ref, kv_ref, mask_ref, wk, bk, wv, bv, wo, bo,
                   o_ref):
            _hop1_kernel(x_ref, q_ref, kv_ref, mask_ref, wk, bk, wv, bv,
                         wo, bo, o_ref, h=h, d_k=d_k, kv_len=Lk, scale=scale)
    else:
        def kernel(x_ref, q_ref, kv_ref, wk, bk, wv, bv, wo, bo, o_ref):
            _hop1_kernel(x_ref, q_ref, kv_ref, None, wk, bk, wv, bv,
                         wo, bo, o_ref, h=h, d_k=d_k, kv_len=Lk, scale=scale)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, G, Lq_pad, D), x.dtype),
        grid=(B, G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Lq_pad, D), lambda b, g: (b, g, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
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
