"""Label-smoothed KL loss + multi-loss aggregation.

Parity targets:
  * LabelSmoothing (model/label_smoothing.py:9-30): target distribution has
    smoothing/(size-2) off-mass everywhere, `confidence` at the gold id, the
    PAD column zeroed, and rows whose gold id is PAD zeroed entirely;
    criterion is KLDiv with SUM reduction: Σ true·(log(true) − logp), with
    0·log0 = 0.
  * SimpleLossCompute (model/optimize.py:36-94): response loss normalised by
    ntokens; optional query auto-encoder losses — caption / audio / temporal /
    spatial (or fused spatiotemporal) features pushed through the tied AE
    generator and trained to reconstruct the *question*, each normalised by
    qntokens.  Total loss is the sum.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.generator import vocab_log_softmax
from bist_tpu.models.layers import Params
from bist_tpu.vocab import PAD


def label_smoothing_kl(logp: jnp.ndarray, target: jnp.ndarray,
                       smoothing: float) -> jnp.ndarray:
    """Σ over all positions/classes of true·(log(true) − logp).

    logp: (N, V) log-probabilities; target: (N,) int ids.  Returns a scalar
    (SUM reduction, un-normalised — caller divides by the token count)."""
    N, V = logp.shape
    off = smoothing / (V - 2)
    confidence = 1.0 - smoothing
    true = jnp.full((N, V), off, dtype=logp.dtype)
    true = true.at[jnp.arange(N), target].set(confidence)
    true = true.at[:, PAD].set(0.0)
    row_valid = (target != PAD)[:, None].astype(logp.dtype)
    true = true * row_valid
    # KLDiv(sum): true*(log(true) - logp), defining 0·log0 = 0.
    safe_log_true = jnp.where(true > 0, jnp.log(jnp.maximum(true, 1e-30)), 0.0)
    return jnp.sum(true * (safe_log_true - logp))


def compute_losses(logp: jnp.ndarray, ft: Dict[str, jnp.ndarray],
                   lut: jnp.ndarray, cfg: ModelConfig, batch: Batch,
                   smoothing: float, norm_override=None,
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total training loss + per-component unnormalised sums for logging.

    Returns (loss, metrics) where metrics['out'/'temporal_ae'/'spatial_ae'/
    'cap_ae'/'audio_ae'] are the *unnormalised* KL sums (reference logs
    loss·norm back, train.py:33-37) and metrics['ntokens'/'qntokens'] the
    normalisers.

    norm_override=(ntokens, qntokens): use externally-computed normalisers —
    gradient accumulation passes the FULL batch's counts so the sum of
    microbatch losses equals the full-batch loss exactly (train/loop.py)."""
    V = logp.shape[-1]
    if norm_override is not None:
        ntokens, qntokens = norm_override
    else:
        ntokens = jnp.sum(batch.trg_y != PAD)
        qntokens = jnp.sum(batch.query != PAD)
    n = jnp.maximum(ntokens, 1).astype(logp.dtype)
    qn = jnp.maximum(qntokens, 1).astype(logp.dtype)

    out_sum = label_smoothing_kl(logp.reshape(-1, V), batch.trg_y.reshape(-1),
                                 smoothing)
    loss = out_sum / n
    metrics = {"out": out_sum, "ntokens": ntokens, "qntokens": qntokens,
               "temporal_ae": jnp.zeros(()), "spatial_ae": jnp.zeros(()),
               "cap_ae": jnp.zeros(()), "audio_ae": jnp.zeros(())}

    if cfg.auto_encoder:
        query_flat = batch.query.reshape(-1)

        def ae(key: str) -> jnp.ndarray:
            ae_logp = vocab_log_softmax(lut, ft[key])
            return label_smoothing_kl(ae_logp.reshape(-1, V), query_flat, smoothing)

        if cfg.use_cap_layers:
            s = ae("cap_ft")
            loss = loss + s / qn
            metrics["cap_ae"] = s
        if cfg.nb_aenc_blocks > 0:
            s = ae("audio_ft")
            loss = loss + s / qn
            metrics["audio_ae"] = s
        if cfg.nb_venc_blocks > 0:
            if cfg.enc_st_combine == "none" or not cfg.both_directions:
                if cfg.s2t:
                    s = ae("temporal_ft")
                    loss = loss + s / qn
                    metrics["temporal_ae"] = s
                if cfg.t2s:
                    s = ae("spatial_ft")
                    loss = loss + s / qn
                    metrics["spatial_ae"] = s
            else:
                s = ae("st_fused")
                loss = loss + s / qn
                metrics["spatial_ae"] = s   # reference logs fused under spatial slot
    return loss, metrics
