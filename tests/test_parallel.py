"""Data-parallel mesh tests on the virtual 8-device CPU mesh: sharded
training must be numerically equivalent to single-device training (the global
token-count loss normalisation makes DP exact, not approximate)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch
from bist_tpu.parallel.mesh import DataParallel, make_mesh
from bist_tpu.train.loop import TrainState, create_train_state, make_train_step


def tiny_cfg():
    return ModelConfig(vocab_size=40, nb_blocks=1, nb_venc_blocks=1,
                       nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                       include_caption="summary", separate_caption=True,
                       ft_sizes=(8,))


def tiny_batch(rng, B):
    def toks(L):
        x = rng.integers(4, 40, size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        return x

    return Batch(query=toks(6), his=toks(8), trg=toks(5), trg_y=toks(5),
                 cap=toks(4),
                 fts=rng.standard_normal((B, 3, 4, 8)).astype(np.float32),
                 audio_fts=None)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_grads_match_single_device(rng):
    """Loss and gradients must agree between the unsharded and the 8-way
    sharded computation up to fp32 reduction-order noise.  (Post-Adam params
    are NOT comparable at this tolerance: for params with near-zero grads
    Adam's m/√v amplifies reduction noise to ±lr.)"""
    from bist_tpu.models.layers import RngGen
    from bist_tpu.models.model import forward_logprobs
    from bist_tpu.train.losses import compute_losses

    cfg = tiny_cfg()
    tcfg = TrainConfig(warmup_steps=10)
    batch = tiny_batch(rng, B=8)

    state, _ = create_train_state(jax.random.PRNGKey(5), cfg, tcfg)

    def loss_fn(params, batch):
        logp, ft = forward_logprobs(params, cfg, batch, rngs=None)
        loss, _ = compute_losses(logp, ft, params["embed"]["lut"], cfg,
                                 batch, tcfg.smoothing)
        return loss

    gfn = jax.jit(jax.value_and_grad(loss_fn))
    l1, g1 = gfn(state.params, batch)

    dp = DataParallel()
    params8 = dp.put_replicated(state.params)
    l8, g8 = gfn(params8, dp.shard(batch))

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    leaves1 = jax.tree_util.tree_leaves(g1)
    leaves8 = jax.tree_util.tree_leaves(g8)
    for a, b in zip(leaves1, leaves8):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        diff = float(jnp.max(jnp.abs(a - b)))
        assert diff < 1e-4 * max(scale, 1.0) + 1e-6, (diff, scale)


def test_padded_rows_contribute_nothing(rng):
    """All-PAD rows (batch padding to the mesh multiple) must not change the
    loss — their ntokens are zero and masked rows are zeroed in the KL."""
    cfg = tiny_cfg()
    tcfg = TrainConfig(warmup_steps=10)
    b4 = tiny_batch(rng, B=4)
    pad = Batch(
        query=np.full((4, 6), 1, np.int32), his=np.full((4, 8), 1, np.int32),
        trg=np.full((4, 5), 1, np.int32), trg_y=np.full((4, 5), 1, np.int32),
        cap=np.full((4, 4), 1, np.int32),
        fts=np.zeros((4, 3, 4, 8), np.float32), audio_fts=None)
    b8 = Batch(*[None if a is None else np.concatenate([a, b], 0)
                 for a, b in zip(b4, pad)])

    state, tx = create_train_state(jax.random.PRNGKey(5), cfg, tcfg)
    step = make_train_step(cfg, tcfg, tx, donate=False)
    _, m4 = step(state, b4, jax.random.PRNGKey(0))
    _, m8 = step(state, b8, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m4["loss"]), float(m8["loss"]),
                               rtol=1e-5)


def test_sharded_beam_search_matches_single_device(rng):
    """Data-parallel GENERATION (generate.py round-2 continuation): beam
    search over a batch whose rows are sharded across the 8-device mesh must
    return the same hypotheses/scores as unsharded decoding."""
    from bist_tpu.config import GenerateConfig
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.models.model import init_model

    cfg = tiny_cfg()
    gcfg = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3)
    params = init_model(jax.random.PRNGKey(0), cfg)
    batch = tiny_batch(rng, B=8)

    single = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)

    dp = DataParallel()
    sharded = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(
        dp.put_replicated(params), dp.shard(batch))

    np.testing.assert_array_equal(np.asarray(single.tokens),
                                  np.asarray(sharded.tokens))
    np.testing.assert_allclose(np.asarray(single.scores),
                               np.asarray(sharded.scores), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(single.lengths),
                                  np.asarray(sharded.lengths))
