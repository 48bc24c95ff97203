"""Numerical parity of the loss/optimizer stack against independent torch
implementations (torch-cpu is in the image): label-smoothed KLDiv semantics
(label_smoothing.py:20-30) and the Noam learning-rate curve (optimize.py:28-34)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bist_tpu.train.losses import label_smoothing_kl
from bist_tpu.train.schedule import noam_schedule
from bist_tpu.vocab import PAD


def torch_label_smoothing(logp, target, smoothing):
    """Independent torch implementation of the documented semantics."""
    import torch

    x = torch.from_numpy(logp)
    t = torch.from_numpy(target)
    N, V = x.shape
    true = torch.full((N, V), smoothing / (V - 2), dtype=x.dtype)
    true.scatter_(1, t.unsqueeze(1), 1.0 - smoothing)
    true[:, PAD] = 0
    true[t == PAD] = 0
    crit = torch.nn.KLDivLoss(reduction="sum")
    return float(crit(x, true))


def test_label_smoothing_matches_torch(rng):
    pytest.importorskip("torch")
    N, V = 37, 50
    logits = rng.standard_normal((N, V)).astype(np.float64)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    target = rng.integers(0, V, size=N).astype(np.int64)
    target[5:9] = PAD
    for smoothing in (0.0, 0.1, 0.3):
        ours = float(label_smoothing_kl(jnp.asarray(logp),
                                        jnp.asarray(target.astype(np.int32)),
                                        smoothing))
        ref = torch_label_smoothing(logp, target, smoothing)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_noam_schedule_curve():
    d_model, warmup, factor = 128, 13000, 1.0
    sched = noam_schedule(d_model, warmup, factor)
    for step in (1, 10, 100, 13000, 20000, 100000):
        expected = factor * d_model ** -0.5 * min(step ** -0.5,
                                                  step * warmup ** -1.5)
        got = float(sched(step - 1))   # optax count is 0-based
        np.testing.assert_allclose(got, expected, rtol=1e-6)
    # monotone rise then decay with peak at warmup
    peak = float(sched(warmup - 1))
    assert float(sched(warmup // 2)) < peak
    assert float(sched(warmup * 4)) < peak


def test_layer_norm_matches_torch_std_semantics(rng):
    """Our LayerNorm divides by (Bessel std + eps) — NOT torch's
    nn.LayerNorm; verify against the torch tensor-op formula."""
    torch = pytest.importorskip("torch")
    from bist_tpu.models.layers import layer_norm, layer_norm_init

    x = rng.standard_normal((4, 7, 24)).astype(np.float32)
    scale = rng.standard_normal(24).astype(np.float32)
    bias = rng.standard_normal(24).astype(np.float32)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    ours = np.asarray(layer_norm(p, jnp.asarray(x)))

    tx = torch.from_numpy(x)
    mean = tx.mean(-1, keepdim=True)
    std = tx.std(-1, keepdim=True)   # unbiased (Bessel) by default
    ref = (torch.from_numpy(scale) * (tx - mean) / (std + 1e-6)
           + torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
    # and it differs from variance-based torch LayerNorm (sanity of the test)
    ln = torch.nn.LayerNorm(24, eps=1e-6)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale))
        ln.bias.copy_(torch.from_numpy(bias))
    assert not np.allclose(ours, ln(tx).detach().numpy(), atol=1e-3)
