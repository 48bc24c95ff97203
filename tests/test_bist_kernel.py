"""Fused BiST hop-1 kernel vs einsum reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.models.layers import layer_norm, layer_norm_init, linear, mha_init
from bist_tpu.ops.bist_kernels import bist_hop1_fused, hop1_reference


@pytest.mark.parametrize("B,G,Lq,Lk,D,h", [
    (2, 4, 5, 7, 32, 2),       # t2s-like: G=S small, unaligned everything
    (1, 3, 12, 130, 128, 8),   # s2t-like at flagship width, Lk > 128
])
def test_fused_hop1_matches_reference(B, G, Lq, Lk, D, h, rng):
    p = mha_init(jax.random.PRNGKey(0), h, D)
    x = jnp.asarray(rng.standard_normal((B, Lq, D)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B, G, Lk, D)), jnp.float32)
    mask = jnp.asarray(
        (rng.uniform(size=(B, 1, Lk)) > 0.25).astype(np.int32))
    mask = mask.at[:, :, 0].set(1)
    q_proj = linear(p["wq"], x)

    ref = hop1_reference(x, q_proj, kv, p, h, mask)
    out = bist_hop1_fused(x, q_proj, kv, p, h, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # no-mask variant
    ref2 = hop1_reference(x, q_proj, kv, p, h, None)
    out2 = bist_hop1_fused(x, q_proj, kv, p, h, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-4)


def test_fused_hop1_matches_model_path(rng):
    """The kernel must equal the actual models.bist hop-1 computation
    (normed q, raw kv, broadcast residual)."""
    from bist_tpu.config import ModelConfig
    from bist_tpu.models.bist import vid_layer_init

    cfg = ModelConfig(vocab_size=10, nb_blocks=1, nb_venc_blocks=1,
                      d_model=32, att_h=4, dropout=0.0, ft_sizes=(8,),
                      include_caption="none", enc_vc_combine="none")
    p = vid_layer_init(jax.random.PRNGKey(1), cfg)["t2s_hop1"]
    B, T, S, D = 2, 6, 4, 32
    x = jnp.asarray(rng.standard_normal((B, 5, D)), jnp.float32)
    grid = jnp.asarray(rng.standard_normal((B, T, S, D)), jnp.float32)
    tmask = jnp.ones((B, 1, T), jnp.int32).at[:, :, 4:].set(0)

    normed = layer_norm(p["norm"], x)
    q_proj = linear(p["attn"]["wq"], normed)
    grid_s = jnp.swapaxes(grid, 1, 2)               # (B, S, T, D)
    fused = bist_hop1_fused(x, q_proj, grid_s, p["attn"], cfg.att_h,
                            tmask, interpret=True)

    from bist_tpu.models.layers import mha
    attn_out = mha(p["attn"], cfg.att_h, normed[:, None], grid_s, grid_s,
                   mask=tmask[:, None], drop_rate=0.0, rngs=None)
    expected = x[:, None] + attn_out
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_hop1_trainable_grads_match_reference(rng):
    """Custom-VJP wrapper: fused forward, gradients equal to autodiff through
    the einsum reference (interpret mode)."""
    import functools
    import bist_tpu.ops.bist_kernels as BK

    h = 2
    p = mha_init(jax.random.PRNGKey(0), h, 16)
    x = jnp.asarray(rng.standard_normal((1, 3, 16)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((1, 2, 5, 16)), jnp.float32)
    q_proj = linear(p["wq"], x)
    mask = jnp.ones((1, 1, 5), jnp.int32).at[:, :, 3:].set(0)
    args = (x, q_proj, kv, p["wk"]["w"], p["wk"]["b"], p["wv"]["w"],
            p["wv"]["b"], p["wo"]["w"], p["wo"]["b"])

    # interpret mode for the forward kernel on CPU
    orig = BK.bist_hop1_fused
    BK.bist_hop1_fused = functools.partial(orig, interpret=True)
    try:
        def loss_fused(*a):
            return jnp.sum(jnp.square(BK.hop1_trainable(*a, h, mask)))

        def loss_ref(*a):
            return jnp.sum(jnp.square(BK._hop1_flat(*a, h=h, mask=mask)))

        out_f = loss_fused(*args)
        out_r = loss_ref(*args)
        np.testing.assert_allclose(float(out_f), float(out_r), rtol=1e-4)
        gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
    finally:
        BK.bist_hop1_fused = orig


def test_hop1_trainable_grads_multiblock(rng):
    """Same grad equality with Lk > blk_k: exercises the kv-block STREAMING
    in both kernels (online-softmax carry forward; (g, j)-accumulated dq and
    per-batch weight partials backward) and the no-mask path."""
    import bist_tpu.ops.bist_kernels as BK

    h = 2
    p = mha_init(jax.random.PRNGKey(1), h, 16)
    B, G, Lk = 2, 2, 600   # blk_k=512 → 2 kv blocks, with 424 padded cols
    x = jnp.asarray(rng.standard_normal((B, 3, 16)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B, G, Lk, 16)), jnp.float32)
    q_proj = linear(p["wq"], x)
    args = (x, q_proj, kv, p["wk"]["w"], p["wk"]["b"], p["wv"]["w"],
            p["wv"]["b"], p["wo"]["w"], p["wo"]["b"])

    def loss_fused(*a):
        return jnp.sum(jnp.square(BK.hop1_trainable(*a, h, None)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(BK._hop1_flat(*a, h=h, mask=None)))

    np.testing.assert_allclose(float(loss_fused(*args)),
                               float(loss_ref(*args)), rtol=1e-4)
    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_model_hop1_dispatch_differentiable(rng, monkeypatch):
    """Round-2 regression: the MODEL's hop-1 dispatch (models/bist.py _hop1)
    must be differentiable when the fused kernel engages — dropout-0 training
    at the capacity frontier runs under value_and_grad.  Pre-fix, the raw
    (non-custom-VJP) kernel was dispatched there and jax.grad crashed; now
    hop1_trainable is wired in.  Grads must also equal the XLA path."""
    import bist_tpu.models.bist as bist_mod
    from bist_tpu.config import ModelConfig, TrainConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.models.model import forward_logprobs, init_model
    from bist_tpu.train.losses import compute_losses

    cfg = ModelConfig(vocab_size=40, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=32, att_h=2, dropout=0.0,
                      attn_dropout=0.0, include_caption="summary",
                      separate_caption=True, ft_sizes=(12,),
                      enc_st_combine="none", enc_vc_combine="dyn")
    params = init_model(jax.random.PRNGKey(0), cfg)
    B = 2

    def toks(L):
        x = rng.integers(4, 40, size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        return x

    batch = Batch(query=toks(5), his=toks(7), trg=toks(4), trg_y=toks(4),
                  cap=toks(4),
                  fts=rng.standard_normal((B, 3, 4, 12)).astype(np.float32),
                  audio_fts=None)

    def loss_fn(p):
        logp, ft = forward_logprobs(p, cfg, batch, rngs=None)
        loss, _ = compute_losses(logp, ft, p["embed"]["lut"], cfg, batch, 0.1)
        return loss

    loss_xla, grads_xla = jax.value_and_grad(loss_fn)(params)

    monkeypatch.setattr(bist_mod, "HOP1_FUSED_MIN_GRID_BYTES", 0)
    loss_k, grads_k = jax.value_and_grad(loss_fn)(params)  # crashed pre-fix

    np.testing.assert_allclose(float(loss_k), float(loss_xla), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(grads_k),
                    jax.tree_util.tree_leaves(grads_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
