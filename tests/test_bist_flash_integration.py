"""Long-video path: the BiST temporal hop must route through the Pallas flash
kernel when T crosses the dispatch threshold, with unchanged outputs.

Runs in interpret mode on CPU (monkeypatched threshold + interpret flag)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bist_tpu.models.layers as L
from bist_tpu.config import ModelConfig
from bist_tpu.models import bist
from bist_tpu.models.bist import temporal2spatial, vid_layer_init
from bist_tpu.models.layers import layer_norm


def test_t2s_hop_uses_flash_at_large_T(rng, monkeypatch):
    # d_model/att_h = 64: the dispatch requires d_k >= 64 (below that the
    # kernel pays up to 8x lane padding and XLA wins, ops/dispatch.py)
    cfg = ModelConfig(vocab_size=10, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=0, d_model=128, att_h=2, dropout=0.0,
                      ft_sizes=(8,), include_caption="none",
                      enc_vc_combine="none")
    p = vid_layer_init(jax.random.PRNGKey(0), cfg)
    B, Lq, T, S = 1, 4, 64, 3
    x = jnp.asarray(rng.standard_normal((B, Lq, 128)), jnp.float32)
    grid = jnp.asarray(rng.standard_normal((B, T, S, 128)), jnp.float32)
    tmask = jnp.ones((B, 1, T), jnp.int32).at[:, :, T // 2:].set(0)

    baseline = temporal2spatial(p, cfg, x, grid, tmask, None)

    # force the flash path for the temporal hop (kv = T ≥ threshold) in
    # interpret mode (no TPU needed)
    calls = {"n": 0}
    import importlib

    # bist_tpu.ops re-exports the function under the submodule's name, so
    # plain `import bist_tpu.ops.flash_attention` resolves to the function
    fa_mod = importlib.import_module("bist_tpu.ops.flash_attention")
    real_flash = fa_mod.flash_attention

    def counting_flash(*a, **kw):
        calls["n"] += 1
        kw["interpret"] = True
        return real_flash(*a, **kw)

    monkeypatch.setattr(L, "FLASH_MIN_KV", 32)
    monkeypatch.setattr(fa_mod, "flash_attention", counting_flash)

    flashed = temporal2spatial(p, cfg, x, grid, tmask, None)
    assert calls["n"] >= 1, "flash path not taken at T >= threshold"
    np.testing.assert_allclose(np.asarray(flashed), np.asarray(baseline),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_mha_dispatches_flash_at_real_threshold(rng, monkeypatch):
    """The flash kernel's REAL production regime, no threshold patching: the
    reference-default width d_model=512 / h=8 gives d_k=64, and a history
    (or long-video token axis) of FLASH_MIN_KV crosses the measured capacity
    frontier (ops/dispatch.py) — a configuration family train.py supports
    (--d-model 512 --att-h 8, --max-history-length unbounded).  Asserts
    `mha`'s own dispatch takes the kernel there and that outputs equal the
    materialising XLA path.  (At the d_model=128 flagship d_k=16 never
    dispatches the kernel — by measurement, not omission: BENCH.md round 2.)"""
    from bist_tpu.ops.dispatch import FLASH_MIN_KV

    d_model, h = 512, 8           # reference configs/train_configs.py default
    assert d_model // h >= 64
    p = L.mha_init(jax.random.PRNGKey(0), h, d_model)
    B, Lq, Lk = 1, 4, FLASH_MIN_KV
    q = jnp.asarray(rng.standard_normal((B, Lq, d_model)), jnp.float32)
    mem = jnp.asarray(
        rng.standard_normal((B, Lk, d_model)), jnp.float32)
    mask = jnp.ones((B, 1, Lk), jnp.int32).at[:, :, Lk // 2:].set(0)

    import importlib

    fa_mod = importlib.import_module("bist_tpu.ops.flash_attention")
    real_flash = fa_mod.flash_attention
    calls = {"n": 0}

    def counting_flash(*a, **kw):
        calls["n"] += 1
        return real_flash(*a, **kw)

    monkeypatch.setattr(fa_mod, "flash_attention", counting_flash)

    out = L.mha(p, h, q, mem, mem, mask, drop_rate=0.0, rngs=None)
    assert calls["n"] == 1, "mha did not dispatch the flash kernel at " \
        f"d_k=64, kv={Lk}"
    baseline = L.mha(p, h, q, mem, mem, mask, drop_rate=0.0, rngs=None,
                     allow_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(baseline),
                               rtol=2e-4, atol=2e-4)
