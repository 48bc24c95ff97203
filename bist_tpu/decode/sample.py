"""Stochastic decoding: temperature / top-k / nucleus (top-p) sampling.

The reference ships beam/greedy/oracle/ensemble styles (model/decode.py —
three of them dead; all four live here).  Sampling is this framework's own
extension for serving workloads that want diverse responses: one compiled
`lax.scan` over the same cached `decode_step` as greedy/beam, with the
filtering done in-graph (static shapes, no host round-trips).

Semantics per step, applied to the model's log-probs:
  1. <unk> always banned (decode.py:80 semantics);
  2. logits /= temperature;
  3. top-k: keep the k highest-probability tokens (0 = off);
  4. top-p: keep the smallest prefix of the probability-sorted vocabulary
     whose cumulative mass reaches p, always including the argmax (0 = off);
  5. sample categorically.

top_k=1 (or temperature→0) reduces exactly to greedy argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import (
    decode_step, encode_cfg, init_cache, precompute_decode_ctx, storage_dtype,
)
from bist_tpu.vocab import PAD, SOS, UNK

NEG = -1.0e30


def filter_logits(logits: jnp.ndarray, top_k: int = 0,
                  top_p: float = 0.0) -> jnp.ndarray:
    """Mask logits outside the top-k set and/or the top-p nucleus to NEG.

    logits: (..., V).  Pure function — unit-tested directly."""
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, NEG, logits)
    if top_p and top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        # exclusive cumulative mass BEFORE each token: the argmax always has
        # 0 mass before it and thus always survives
        cum_before = jnp.cumsum(probs, axis=-1) - probs
        keep_sorted = cum_before < top_p
        # map the sorted keep-mask back through a threshold: the cut
        # position's logit is the smallest kept logit
        n_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)  # ≥ 1
        thresh = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
        logits = jnp.where(logits < thresh, NEG, logits)
    return logits


def sample_decode(params, cfg: ModelConfig, batch: Batch, maxlen: int,
                  key: jax.Array, temperature: float = 1.0, top_k: int = 0,
                  top_p: float = 0.0,
                  cache_dtype: str = "float32",
                  unroll: int = 1, row_seeds=None,
                  encode_dtype: str = "") -> jnp.ndarray:
    """Sampled decoding; returns (B, maxlen) token ids (may contain <eos>;
    caller truncates, as with greedy_decode).  `unroll` = scan-body
    replication, the same perf knob as GenerateConfig.scan_unroll
    (identical numerics).

    row_seeds: optional (B,) int32 — per-row RNG streams derived as
    fold_in(key, seed): row i's draws depend only on (key, row_seeds[i],
    step), NOT on batch composition or row position, so a serving batcher
    can coalesce arbitrary requests and still give each one a reproducible
    per-request stream (tests/test_sample.py batch-invariance)."""
    B = batch.query.shape[0]
    dt = storage_dtype(cache_dtype)
    ctx = precompute_decode_ctx(params, encode_cfg(cfg, encode_dtype),
                                batch, dtype=dt)
    cache = init_cache(cfg, B, maxlen + 1, dtype=dt)
    tok0 = jnp.full((B,), SOS, jnp.int32)
    temp = max(float(temperature), 1e-4)
    row_keys = (None if row_seeds is None
                else jax.vmap(lambda s: jax.random.fold_in(key, s))(
                    jnp.asarray(row_seeds, jnp.int32)))

    def step(carry, l):
        tok, cache = carry
        logp, cache = decode_step(params, cfg, ctx, cache, tok, l)
        # ban non-lexical specials: <unk> (decode.py:80 semantics) and
        # <pad>/<sos>, which a stochastic draw could otherwise emit
        logits = logp.at[:, UNK].set(NEG).at[:, PAD].set(NEG) \
            .at[:, SOS].set(NEG) / temp
        logits = filter_logits(logits, top_k=top_k, top_p=top_p)
        if row_keys is None:
            nxt = jax.random.categorical(
                jax.random.fold_in(key, l), logits, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.vmap(
                lambda k, lg: jax.random.categorical(
                    jax.random.fold_in(k, l), lg, axis=-1))(
                row_keys, logits).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, _), out = jax.lax.scan(step, (tok0, cache), jnp.arange(maxlen),
                               unroll=unroll)
    return jnp.moveaxis(out, 0, 1)
