"""Fused flash attention for TPU (Pallas).

The hot attention pattern in BiST is many small-to-medium attentions over a
large flattened batch: the factorized video hops run (B·S) temporal and
(B·T) spatial attentions (bist.py temporal2spatial / spatial2temporal), and
the response decoder runs (B·beam) cached attentions.  For short kv lengths
XLA's fused einsum is already at the latency floor, so `dispatch_attention`
keeps that path; once the kv axis is long (long videos: hundreds-thousands of
clips at stride 1), materialising (G, Lq, Lk) score tensors in HBM dominates
— this kernel streams K/V blocks through VMEM with an online softmax and
never materialises scores.

Kernel structure (guide: /opt/skills/guides/boom_attention_tricks.md):
  grid = (G, num_q_blocks, num_kv_blocks)   # G = flattened batch·heads
  carry in VMEM scratch: m (row max), l (row sum), acc (unnormalised out)
  per kv block: s = q·kᵀ  → online-softmax rescale → acc += p·v
  last kv block: out = acc / l

Masking: an optional kv validity mask (G, Lk) is applied as -1e9 before the
softmax — the same semantics as models.layers.attention_weights
(reference modules.py:54-64).  Fully-masked rows degrade to uniform attention
(matching jax.nn.softmax on all -1e9 logits).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, sm_scale, blk_k, kv_len):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # (blk_q, d)
    k = k_ref[0]                                   # (blk_k, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale   # (blk_q, blk_k)

    # kv padding beyond the true length + user mask
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * blk_k
    s = jnp.where(col < kv_len, s, NEG_INF)
    if mask_ref is not None:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, s, NEG_INF)

    m_prev = m_scr[:]                              # (blk_q, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                         # (blk_q, blk_k)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)) \
            .astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None, *,
                    sm_scale: Optional[float] = None,
                    blk_q: int = 128, blk_k: int = 512,
                    interpret: bool = False) -> jnp.ndarray:
    """q: (G, Lq, d), k/v: (G, Lk, d), mask: (G, Lk) kv validity (1 = attend).

    Returns (G, Lq, d) = softmax(q kᵀ / √d  [masked]) v without materialising
    the (G, Lq, Lk) scores.  d is padded to the 128-lane width internally."""
    G, Lq, d = q.shape
    Lk = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    d_pad = _round_up(d, LANE)
    blk_q = min(blk_q, _round_up(Lq, 8))
    blk_k = min(blk_k, _round_up(Lk, LANE))
    Lq_pad = _round_up(Lq, blk_q)
    Lk_pad = _round_up(Lk, blk_k)

    qp = jnp.pad(q, ((0, 0), (0, Lq_pad - Lq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, Lk_pad - Lk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, Lk_pad - Lk), (0, d_pad - d)))

    grid = (G, Lq_pad // blk_q, Lk_pad // blk_k)
    in_specs = [
        pl.BlockSpec((1, blk_q, d_pad), lambda g, i, j: (g, i, 0)),
        pl.BlockSpec((1, blk_k, d_pad), lambda g, i, j: (g, j, 0)),
        pl.BlockSpec((1, blk_k, d_pad), lambda g, i, j: (g, j, 0)),
    ]
    args = [qp, kp, vp]
    if mask is not None:
        # (G, 1, Lk_pad): a 3-D layout so the block's trailing dims (1, blk_k)
        # satisfy the TPU tiling rule (second-to-last equals the array dim)
        mp = jnp.pad(mask.astype(jnp.int32),
                     ((0, 0), (0, Lk_pad - Lk)))[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, blk_k), lambda g, i, j: (g, 0, j)))
        args.append(mp)

        def kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr,
                   acc_scr):
            _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                          m_scr, l_scr, acc_scr, sm_scale=sm_scale,
                          blk_k=blk_k, kv_len=Lk)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            _flash_kernel(q_ref, k_ref, v_ref, None, o_ref,
                          m_scr, l_scr, acc_scr, sm_scale=sm_scale,
                          blk_k=blk_k, kv_len=Lk)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, Lq_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_q, d_pad), lambda g, i, j: (g, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:, :Lq, :d]


def attention_reference(q, k, v, mask=None, sm_scale=None):
    """Einsum reference with identical semantics (for tests + small shapes)."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("gqd,gkd->gqk", q, k) * sm_scale
    if mask is not None:
        s = jnp.where(mask[:, None, :] != 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gqk,gkd->gqd", p, v)


# single source of truth for the XLA↔Pallas frontier (ops/dispatch.py)
from bist_tpu.ops.dispatch import FLASH_MIN_KV


def dispatch_attention(q, k, v, mask=None, sm_scale=None, interpret=False):
    """Size-based dispatch: einsum under FLASH_MIN_KV, flash kernel above."""
    if k.shape[1] >= FLASH_MIN_KV:
        return flash_attention(q, k, v, mask, sm_scale=sm_scale,
                               interpret=interpret)
    return attention_reference(q, k, v, mask, sm_scale=sm_scale)
