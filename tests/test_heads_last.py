"""Heads-last attention layout (layers.HEADS_LAST) must be numerically
equivalent to the split-heads baseline: the head axis moves from an explicit
moveaxis (a materialised layout-change copy on TPU — the round-4 device
timeline measured six 104 us (B,G,h,L,d_k) copies per decode-ctx precompute,
scripts/decode_profile.py) into the einsum batch dims, leaving every dot
product and the softmax unchanged.  Contraction grouping differs, so
equality is to f32 epsilon, not bitwise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.models import layers
from bist_tpu.models.layers import mha, mha_init


@pytest.fixture
def restore_flag():
    old = layers.HEADS_LAST
    yield
    layers.HEADS_LAST = old


def _mha_both(p, h, q, k, v, mask, **kw):
    outs = {}
    for hl in (True, False):
        layers.HEADS_LAST = hl
        outs[hl] = mha(p, h, q, k, v, mask, drop_rate=0.0, rngs=None, **kw)
    return outs


def test_self_attention_heads_last(restore_flag):
    p = mha_init(jax.random.PRNGKey(0), 4, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 64))
    mask = jnp.ones((2, 1, 7), jnp.int32).at[1, 0, 5:].set(0)
    outs = _mha_both(p, 4, x, x, x, mask)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]), atol=1e-6)


def test_grouped_cross_attention_heads_last(restore_flag):
    """The hop-1 shape: query (B,1,Lq,D) broadcast against grouped
    memories (B,G,Lk,D) — the call that produced the measured copies."""
    p = mha_init(jax.random.PRNGKey(2), 8, 64)
    q = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 5, 64))
    kv = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 9, 64))
    mask = jnp.ones((2, 1, 1, 9), jnp.int32).at[1, ..., 7:].set(0)
    outs = _mha_both(p, 8, q, kv, kv, mask)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]), atol=1e-6)


def test_return_attn_heads_last(restore_flag):
    p = mha_init(jax.random.PRNGKey(5), 4, 32)
    q = jax.random.normal(jax.random.PRNGKey(6), (3, 4, 32))
    kv = jax.random.normal(jax.random.PRNGKey(7), (3, 6, 32))
    outs = _mha_both(p, 4, q, kv, kv, None, return_attn=True)
    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[True][1]),
                               np.asarray(outs[False][1]), atol=1e-6)


def test_heads_last_with_split_cache(restore_flag):
    """Both profile-motivated layout flags TOGETHER (heads-last attention +
    per-layer split KV cache) vs both off: beam tokens identical, scores to
    f32 epsilon.  Guards the combined-default flip — the two options touch
    the same decode step and must compose."""
    from tests.test_beam import tiny_batch, tiny_cfg
    from bist_tpu.config import GenerateConfig
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.models import model as model_mod
    from bist_tpu.models.model import init_model

    cfg = tiny_cfg()
    params = init_model(jax.random.PRNGKey(11), cfg)
    batch = tiny_batch(np.random.default_rng(2), B=3)
    gcfg = GenerateConfig(maxlen=6, beam=3, penalty=1.0, nbest=3,
                          cache_dtype="bfloat16")

    old_split = model_mod.SPLIT_CACHE
    try:
        outs = {}
        for on in (False, True):
            layers.HEADS_LAST = on
            model_mod.SPLIT_CACHE = on
            r = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params,
                                                                   batch)
            outs[on] = (np.asarray(r.tokens), np.asarray(r.scores),
                        np.asarray(r.lengths))
    finally:
        model_mod.SPLIT_CACHE = old_split
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_allclose(outs[False][1], outs[True][1], atol=2e-5)
    np.testing.assert_array_equal(outs[False][2], outs[True][2])


def test_full_model_beam_heads_last(restore_flag):
    """End to end: forward activations to f32 epsilon, beam tokens equal."""
    from tests.test_beam import tiny_batch, tiny_cfg
    from bist_tpu.config import GenerateConfig
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.models.model import apply_model, init_model

    cfg = tiny_cfg()
    params = init_model(jax.random.PRNGKey(3), cfg)
    batch = tiny_batch(np.random.default_rng(0), B=3)
    gcfg = GenerateConfig(maxlen=6, beam=3, penalty=1.0, nbest=3)

    outs = {}
    for hl in (False, True):
        layers.HEADS_LAST = hl
        ft = jax.jit(lambda p, b: apply_model(p, cfg, b, None))(params, batch)
        r = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
        outs[hl] = (np.asarray(ft["decoded_text"]), np.asarray(r.tokens),
                    np.asarray(r.scores))
    np.testing.assert_allclose(outs[False][0], outs[True][0], atol=2e-5)
    np.testing.assert_array_equal(outs[False][1], outs[True][1])
    np.testing.assert_allclose(outs[False][2], outs[True][2], atol=2e-5)


# ---- SCORES_QHK (round 5): score/attn tensors keep heads in place as
# (..., q, h, k) — motivated by the train-step timeline's (B,T,S,h,dk) <->
# (B,T,h,S,dk) relayout copy family (scripts/train_profile.py). ----

@pytest.fixture
def restore_qhk():
    old = layers.SCORES_QHK
    yield
    layers.SCORES_QHK = old


def _mha_qhk_both(p, h, q, k, v, mask, **kw):
    outs = {}
    layers.HEADS_LAST = True
    for flag in (True, False):
        layers.SCORES_QHK = flag
        outs[flag] = mha(p, h, q, k, v, mask, drop_rate=0.0, rngs=None, **kw)
    return outs


def test_self_attention_scores_qhk(restore_flag, restore_qhk):
    p = mha_init(jax.random.PRNGKey(0), 4, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 64))
    mask = jnp.ones((2, 1, 7), jnp.int32).at[1, 0, 5:].set(0)
    outs = _mha_qhk_both(p, 4, x, x, x, mask)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]), atol=1e-6)


def test_grid_attention_scores_qhk(restore_flag, restore_qhk):
    """The BiST grid shape that carries the copy family: leading (B, T)
    batch dims, L = S, with a causal-style (Lq, Lk) mask."""
    p = mha_init(jax.random.PRNGKey(2), 8, 128)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 9, 128))
    mask = jnp.ones((2, 1, 9, 9), jnp.int32).at[1, ..., 7:].set(0)
    outs = _mha_qhk_both(p, 8, x, x, x, mask)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]), atol=1e-6)


def test_return_attn_scores_qhk(restore_flag, restore_qhk):
    """return_attn callers get the (..., h, q, k) layout under either flag."""
    p = mha_init(jax.random.PRNGKey(5), 4, 32)
    q = jax.random.normal(jax.random.PRNGKey(6), (3, 4, 32))
    kv = jax.random.normal(jax.random.PRNGKey(7), (3, 6, 32))
    outs = _mha_qhk_both(p, 4, q, kv, kv, None, return_attn=True)
    assert outs[True][1].shape == outs[False][1].shape
    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[True][1]),
                               np.asarray(outs[False][1]), atol=1e-6)


def test_full_model_train_and_beam_scores_qhk(restore_flag, restore_qhk):
    """End to end with the flag: forward activations, one train step's loss
    AND beam tokens equal the default layout (dropout OFF: the flag shifts
    the attn-dropout bit positions, like rbg-vs-threefry does)."""
    from tests.test_beam import tiny_batch, tiny_cfg
    from bist_tpu.config import GenerateConfig
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.models.model import apply_model, init_model

    cfg = tiny_cfg()
    params = init_model(jax.random.PRNGKey(3), cfg)
    batch = tiny_batch(np.random.default_rng(0), B=3)
    gcfg = GenerateConfig(maxlen=6, beam=3, penalty=1.0, nbest=3)

    layers.HEADS_LAST = True
    outs = {}
    for flag in (False, True):
        layers.SCORES_QHK = flag
        ft = jax.jit(lambda p, b: apply_model(p, cfg, b, None))(params, batch)
        r = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
        outs[flag] = (np.asarray(ft["decoded_text"]), np.asarray(r.tokens),
                      np.asarray(r.scores))
    np.testing.assert_allclose(outs[False][0], outs[True][0], atol=2e-5)
    np.testing.assert_array_equal(outs[False][1], outs[True][1])
    np.testing.assert_allclose(outs[False][2], outs[True][2], atol=2e-5)
