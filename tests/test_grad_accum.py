"""Gradient accumulation (make_train_step(grad_accum=N)): one accumulated
step over N microbatches must equal the single-big-batch step EXACTLY
(global loss normalisers are computed before the split), while peak
activation memory scales down by N."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import init_model
from bist_tpu.train.loop import TrainState, make_train_step
from bist_tpu.train.schedule import make_optimizer


def test_grad_accum_matches_big_batch(rng):
    cfg = ModelConfig(vocab_size=50, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      attn_dropout=0.0, include_caption="summary",
                      separate_caption=True, ft_sizes=(12,),
                      enc_st_combine="none", enc_vc_combine="dyn")
    tcfg = TrainConfig(warmup_steps=10)
    B = 8

    def toks(L):
        x = rng.integers(4, 50, size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        # make token counts UNEVEN across microbatches so local-normalisation
        # bugs would show
        x[:2, 2:] = 1
        return x

    batch = Batch(query=toks(6), his=toks(8), trg=toks(5), trg_y=toks(5),
                  cap=toks(4),
                  fts=rng.standard_normal((B, 3, 4, 12)).astype(np.float32),
                  audio_fts=None)
    params = init_model(jax.random.PRNGKey(0), cfg)
    # SGD: the update is proportional to the gradient, so param equality
    # tests gradient equality tightly.  (Adam's step-1 is sign-like,
    # g/(|g|+eps), and amplifies fp reduction-order noise on ~0 grads.)
    import optax

    tx = optax.sgd(0.1)

    def one_step(accum):
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(cfg, tcfg, tx, donate=False, grad_accum=accum)
        return step(state, batch, jax.random.PRNGKey(3))

    s1, m1 = one_step(1)
    s4, m4 = one_step(4)
    assert float(m4["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
    assert int(m4["ntokens"]) == int(m1["ntokens"])
    assert int(m4["qntokens"]) == int(m1["qntokens"])
    for k in ("out", "temporal_ae", "spatial_ae", "cap_ae"):
        assert float(m4[k]) == pytest.approx(float(m1[k]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_grad_accum_padded_tail_batch(rng):
    """The epoch's tail batch is padded by the loader to a multiple of
    grad_accum x mesh size (train.py); the accumulated step must (a) accept
    it — the round-2 regression was a reshape crash on non-divisible tails —
    and (b) produce exactly the update of the unpadded batch (pad rows are
    all-PAD tokens + zero features: zero loss contribution)."""
    cfg = ModelConfig(vocab_size=50, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      attn_dropout=0.0, include_caption="summary",
                      separate_caption=True, ft_sizes=(12,),
                      enc_st_combine="none", enc_vc_combine="dyn")
    tcfg = TrainConfig(warmup_steps=10)
    B_real, B_pad = 6, 8   # 6-row tail padded to 8 = grad_accum 4 x 2 rows

    def toks(L, B):
        x = rng.integers(4, 50, size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        return x

    real = Batch(query=toks(6, B_real), his=toks(8, B_real),
                 trg=toks(5, B_real), trg_y=toks(5, B_real),
                 cap=toks(4, B_real),
                 fts=rng.standard_normal((B_real, 3, 4, 12)).astype(np.float32),
                 audio_fts=None)

    def pad_rows(x, fill):
        pad = np.full((B_pad - B_real,) + x.shape[1:], fill, x.dtype)
        return np.concatenate([x, pad], axis=0)

    padded = Batch(query=pad_rows(real.query, 1), his=pad_rows(real.his, 1),
                   trg=pad_rows(real.trg, 1), trg_y=pad_rows(real.trg_y, 1),
                   cap=pad_rows(real.cap, 1),
                   fts=pad_rows(real.fts, 0.0), audio_fts=None)

    params = init_model(jax.random.PRNGKey(0), cfg)
    import optax

    tx = optax.sgd(0.1)

    def one_step(batch, accum):
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(cfg, tcfg, tx, donate=False, grad_accum=accum)
        return step(state, batch, jax.random.PRNGKey(3))

    s_ref, m_ref = one_step(real, 1)
    s_pad, m_pad = one_step(padded, 4)    # would crash pre-fix on 6 rows
    assert int(m_pad["ntokens"]) == int(m_ref["ntokens"])
    assert float(m_pad["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_pad.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
