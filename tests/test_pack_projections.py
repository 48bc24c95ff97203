"""Packed q/k/v projections (layers.PACK_PROJECTIONS) must be numerically
equivalent to separate projections: concatenating output columns leaves each
column's contraction untouched, so both lowerings compute the same math.
These tests pin that across the three call shapes (self-attn, cross-attn,
cached decode step)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.models import layers
from bist_tpu.models.layers import mha, mha_init


@pytest.fixture
def restore_flag():
    old = layers.PACK_PROJECTIONS
    yield
    layers.PACK_PROJECTIONS = old


def _mha_both(p, h, q, k, v, mask):
    outs = {}
    for pack in (True, False):
        layers.PACK_PROJECTIONS = pack
        outs[pack] = np.asarray(mha(p, h, q, k, v, mask, drop_rate=0.0,
                                    rngs=None))
    return outs


def test_self_attention_pack_equivalence(restore_flag):
    key = jax.random.PRNGKey(0)
    p = mha_init(key, 4, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 64))
    mask = jnp.ones((2, 1, 7), jnp.int32).at[1, 0, 5:].set(0)
    outs = _mha_both(p, 4, x, x, x, mask)
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-6)


def test_cross_attention_pack_equivalence(restore_flag):
    key = jax.random.PRNGKey(2)
    p = mha_init(key, 4, 64)
    q = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 64))
    kv = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 64))
    outs = _mha_both(p, 4, q, kv, kv, None)
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-6)


def test_decode_step_pack_equivalence(restore_flag):
    from bist_tpu.config import ModelConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.models.model import (
        decode_step, init_cache, init_model, precompute_decode_ctx,
    )

    cfg = ModelConfig(vocab_size=50, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=32, att_h=4, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(16,), enc_st_combine="none",
                      enc_vc_combine="dyn", dec_st_combine="seq")
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 2
    batch = Batch(query=rng.integers(4, 50, (B, 5)).astype(np.int32),
                  his=rng.integers(4, 50, (B, 8)).astype(np.int32),
                  trg=rng.integers(4, 50, (B, 4)).astype(np.int32),
                  trg_y=rng.integers(4, 50, (B, 4)).astype(np.int32),
                  cap=rng.integers(4, 50, (B, 6)).astype(np.int32),
                  fts=rng.standard_normal((B, 3, 4, 16)).astype(np.float32),
                  audio_fts=None)

    outs = {}
    for pack in (True, False):
        layers.PACK_PROJECTIONS = pack
        ctx = precompute_decode_ctx(params, cfg, batch)
        cache = init_cache(cfg, B, 4)
        tok = jnp.full((B,), 2, jnp.int32)
        logp, cache = decode_step(params, cfg, ctx, cache, tok, 0)
        logp2, _ = decode_step(params, cfg, ctx, cache,
                               jnp.argmax(logp, -1).astype(jnp.int32), 1)
        outs[pack] = np.asarray(logp2)
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5)
