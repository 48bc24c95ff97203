"""int8 feature-transfer path: quantisation invariants + model closeness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig
from bist_tpu.data.batching import Batch, quantize_features
from bist_tpu.models.model import build_masks, forward_logprobs, init_model


def test_quantize_roundtrip(rng):
    fts = rng.standard_normal((2, 4, 3, 16)).astype(np.float32)
    fts[:, -1] = 0.0   # padded temporal step
    q, scale = quantize_features(fts)
    assert q.dtype == np.int8 and scale.shape == (2, 4, 3, 1)
    deq = q.astype(np.float32) * scale
    err = np.abs(deq - fts).max()
    assert err <= (np.abs(fts).max() / 127.0) + 1e-7
    # exact zeros preserved (mask correctness)
    assert np.all(q[:, -1] == 0)


def test_masks_match_between_f32_and_int8(rng):
    cfg = ModelConfig(vocab_size=30, nb_blocks=1, nb_venc_blocks=1,
                      d_model=16, att_h=2, ft_sizes=(16,),
                      include_caption="none", nb_cenc_blocks=0,
                      enc_vc_combine="none", ptr_ft="query")
    fts = rng.standard_normal((2, 4, 3, 16)).astype(np.float32)
    fts[:, 2:] = 0.0
    toks = rng.integers(4, 30, size=(2, 5)).astype(np.int32)
    b32 = Batch(query=toks, his=toks, trg=toks, trg_y=toks, fts=fts)
    q, scale = quantize_features(fts)
    b8 = b32._replace(fts=q, fts_scale=scale)
    m32 = build_masks(cfg, b32)
    m8 = build_masks(cfg, b8)
    np.testing.assert_array_equal(np.asarray(m32["temporal_mask"]),
                                  np.asarray(m8["temporal_mask"]))
    np.testing.assert_array_equal(np.asarray(m32["spatial_mask"]),
                                  np.asarray(m8["spatial_mask"]))

    params = init_model(jax.random.PRNGKey(0), cfg)
    lp32, _ = forward_logprobs(params, cfg, b32)
    lp8, _ = forward_logprobs(params, cfg, b8)
    # int8 features perturb log-probs only slightly
    assert np.max(np.abs(np.asarray(lp32) - np.asarray(lp8))) < 0.1


def test_train_step_with_int8_features(rng):
    """Training through int8 features (train.py --feat-int8): the jitted
    train step runs, and loss/grad-driven update stay close to the f32-fed
    step (inputs-only quantisation noise)."""
    import jax.numpy as jnp

    from bist_tpu.config import ModelConfig, TrainConfig
    from bist_tpu.train.loop import TrainState, make_train_step
    from bist_tpu.train.schedule import make_optimizer

    cfg = ModelConfig(vocab_size=30, nb_blocks=1, nb_venc_blocks=1,
                      d_model=16, att_h=2, dropout=0.0, attn_dropout=0.0,
                      ft_sizes=(16,), include_caption="none",
                      nb_cenc_blocks=0, enc_vc_combine="none",
                      ptr_ft="query")
    tcfg = TrainConfig(warmup_steps=10)
    fts = rng.standard_normal((2, 4, 3, 16)).astype(np.float32)
    toks = rng.integers(4, 30, size=(2, 5)).astype(np.int32)
    b32 = Batch(query=toks, his=toks, trg=toks, trg_y=toks, fts=fts)
    q, scale = quantize_features(fts)
    b8 = b32._replace(fts=q, fts_scale=scale)

    params = init_model(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, tcfg, tx, donate=False)
    key = jax.random.PRNGKey(0)
    _, m32 = step(state, b32, key)
    _, m8 = step(state, b8, key)
    assert abs(float(m32["loss"]) - float(m8["loss"])) < 0.02
