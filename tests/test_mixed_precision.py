"""bf16 activation policy + remat: finiteness, closeness to f32, and
bit-identical gradients under jax.checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import forward_logprobs, init_model
from bist_tpu.train.losses import compute_losses


def cfg_with(**kw):
    base = dict(vocab_size=50, nb_blocks=2, nb_venc_blocks=2,
                nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                include_caption="summary", separate_caption=True,
                ft_sizes=(24,))
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture
def batch(rng):
    B = 2

    def toks(L):
        x = rng.integers(4, 50, size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        return x

    return Batch(query=toks(5), his=toks(7), trg=toks(6), trg_y=toks(6),
                 cap=toks(4),
                 fts=rng.standard_normal((B, 3, 4, 24)).astype(np.float32),
                 audio_fts=None)


def test_bf16_forward_close_to_f32(batch):
    params = init_model(jax.random.PRNGKey(0), cfg_with())
    lp32, _ = forward_logprobs(params, cfg_with(), batch)
    lp16, _ = forward_logprobs(params, cfg_with(dtype="bfloat16"), batch)
    assert lp16.dtype == jnp.float32          # log-probs always f32
    assert np.all(np.isfinite(np.asarray(lp16)))
    # bf16 has ~3 decimal digits; probabilities should broadly agree
    p32 = np.exp(np.asarray(lp32))
    p16 = np.exp(np.asarray(lp16))
    assert np.max(np.abs(p32 - p16)) < 0.05


def test_remat_grads_identical(batch):
    tcfg = TrainConfig()

    def loss(params, cfg):
        lp, ft = forward_logprobs(params, cfg, batch)
        l, _ = compute_losses(lp, ft, params["embed"]["lut"], cfg, batch,
                              tcfg.smoothing)
        return l

    params = init_model(jax.random.PRNGKey(0), cfg_with())
    g_plain = jax.grad(lambda p: loss(p, cfg_with()))(params)
    g_remat = jax.grad(lambda p: loss(p, cfg_with(remat=True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
