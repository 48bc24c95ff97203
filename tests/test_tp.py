"""Tensor parallelism (parallel/tp.py): a full train step with Megatron
col/row param sharding on a 2-D (data=2, model=4) CPU mesh must equal the
single-device step — loss AND updated parameters — proving XLA's GSPMD
partitioning of the whole BiST model (head-group attention, row-parallel
all-reduces, pointer generator) is numerically sound."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bist_tpu.config import ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import init_model
from bist_tpu.parallel.tp import param_specs, shard_params, validate_tp_config
from bist_tpu.train.loop import TrainState, make_train_step
from bist_tpu.train.schedule import make_optimizer


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(vocab_size=80, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=32, att_h=4, dropout=0.0,
                      attn_dropout=0.0, include_caption="summary",
                      separate_caption=True, ft_sizes=(16,),
                      enc_st_combine="none", enc_vc_combine="dyn",
                      dec_st_combine="seq")
    tcfg = TrainConfig(warmup_steps=50)
    params = init_model(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(5)
    B = 4

    def toks(L):
        x = rng.integers(4, cfg.vocab_size, size=(B, L)).astype(np.int32)
        x[:, -1] = 1
        return x

    batch = Batch(query=toks(6), his=toks(10), trg=toks(5), trg_y=toks(5),
                  cap=toks(4),
                  fts=rng.standard_normal((B, 3, 4, 16)).astype(np.float32),
                  audio_fts=None)
    return cfg, tcfg, params, batch


def _one_step(cfg, tcfg, params, batch, key):
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, tcfg, tx, donate=False)
    return step(state, batch, key)


def test_param_specs_rules(setup):
    cfg, _, params, _ = setup
    specs = param_specs(params)
    mm0 = specs["decoder"]["mm_layers"][0]
    assert mm0["self"]["attn"]["wq"]["w"] == P(None, "model")
    assert mm0["self"]["attn"]["wq"]["b"] == P("model")
    assert mm0["self"]["attn"]["wo"]["w"] == P("model", None)
    assert mm0["self"]["attn"]["wo"]["b"] == P()
    assert mm0["ff"]["ff"]["w1"]["w"] == P(None, "model")
    assert mm0["ff"]["ff"]["w2"]["w"] == P("model", None)
    assert mm0["self"]["norm"]["scale"] == P()
    assert specs["embed"]["lut"] == P()
    validate_tp_config(cfg, 4)
    with pytest.raises(ValueError):
        validate_tp_config(cfg, 3)


def test_tp_step_matches_single_device(setup):
    """Loss and GRADIENTS must match the single-device oracle.  (Post-Adam
    params are not compared: Adam's first step is sign-like, g/(|g|+eps), so
    fp-reduction-order noise on near-zero gradients flips update signs — a
    property of the optimizer, not of the parallelism.)"""
    cfg, tcfg, params, batch = setup
    key = jax.random.PRNGKey(0)

    from bist_tpu.models.model import forward_logprobs
    from bist_tpu.train.losses import compute_losses

    def loss_fn(p, b):
        logp, ft = forward_logprobs(p, cfg, b, rngs=None)
        loss, _ = compute_losses(logp, ft, p["embed"]["lut"], cfg, b,
                                 tcfg.smoothing)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    ref_loss, ref_grads = grad_fn(params, batch)
    ref_loss = float(ref_loss)

    # 2-D mesh: batch on 'data', params Megatron-sharded on 'model'
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    validate_tp_config(cfg, 4)
    params_tp = shard_params(params, mesh)
    batch_tp = jax.tree_util.tree_map(
        lambda x: None if x is None else jax.device_put(
            x, NamedSharding(mesh, P("data"))),
        batch, is_leaf=lambda x: x is None)
    tp_loss, tp_grads = grad_fn(params_tp, batch_tp)

    assert float(tp_loss) == pytest.approx(ref_loss, abs=2e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_grads),
            jax.tree_util.tree_leaves_with_path(tp_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))

    # the optimizer step itself runs and stays finite under TP
    tp_state, tp_metrics = _one_step(cfg, tcfg, params_tp, batch_tp, key)
    assert np.isfinite(float(tp_metrics["loss"]))
    assert int(tp_state.step) == 1
