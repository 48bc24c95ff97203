"""Sequence parallelism (parallel/sp.py): a train-step loss/grad computation
with the history token axis and video temporal axis sharded over a 'seq'
mesh axis must equal the single-device oracle — proving GSPMD's partitioning
of the encoder stack, the BiST temporal/spatial hops and decoder
cross-attention into sequence-sharded memories is numerically sound.

Also proves the full dp×tp×sp COMPOSITION on a 3-D mesh (the
`dryrun_multichip` production recipe): Megatron param sharding and sequence
activation sharding compose without hand-written collectives."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bist_tpu.config import ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import forward_logprobs, init_model
from bist_tpu.parallel.sp import batch_specs, shard_batch, validate_sp_batch
from bist_tpu.parallel.tp import shard_params
from bist_tpu.train.losses import compute_losses


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

    # his L=8 and fts T=4 divide the seq axis sizes used below
    batch = Batch(query=toks(6), his=toks(8), trg=toks(5), trg_y=toks(5),
                  cap=toks(4),
                  fts=rng.standard_normal((B, 4, 4, 16)).astype(np.float32),
                  audio_fts=None)

    def loss_fn(p, b):
        logp, ft = forward_logprobs(p, cfg, b, rngs=None)
        loss, _ = compute_losses(logp, ft, p["embed"]["lut"], cfg, b,
                                 tcfg.smoothing)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    ref_loss, ref_grads = grad_fn(params, batch)
    return cfg, params, batch, grad_fn, float(ref_loss), ref_grads


def _assert_grads_close(ref_grads, got_grads):
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_grads),
            jax.tree_util.tree_leaves_with_path(got_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_specs_and_validation(setup):
    _, _, batch, _, _, _ = setup
    specs = batch_specs()
    assert specs.his == P("data", "seq")
    assert specs.fts == P("data", "seq")
    assert specs.query == P("data")
    validate_sp_batch(batch, 4)
    with pytest.raises(ValueError):
        validate_sp_batch(batch, 3)


def test_sp_matches_single_device(setup):
    cfg, params, batch, grad_fn, ref_loss, ref_grads = setup
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    validate_sp_batch(batch, 4)
    params_sp = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    batch_sp = shard_batch(batch, mesh)
    sp_loss, sp_grads = grad_fn(params_sp, batch_sp)
    assert float(sp_loss) == pytest.approx(ref_loss, abs=2e-5)
    _assert_grads_close(ref_grads, sp_grads)


def test_shard_batch_with_int8_scale(setup):
    """fts_scale (the int8 feature path) must shard WITH fts — its T axis
    on 'seq' (round-3 review finding: it was missing from batch_specs)."""
    from bist_tpu.data.batching import quantize_features

    _, _, batch, _, _, _ = setup
    q, scale = quantize_features(batch.fts)
    qbatch = batch._replace(fts=q, fts_scale=scale)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    sharded = shard_batch(qbatch, mesh)
    assert sharded.fts_scale.sharding.spec == P("data", "seq")
    assert sharded.fts.sharding.spec == P("data", "seq")


def test_dp_tp_sp_composition(setup):
    """3-D (data=2, model=2, seq=2) mesh: Megatron param sharding + sequence
    activation sharding + batch rows sharded, all at once."""
    cfg, params, batch, grad_fn, ref_loss, ref_grads = setup
    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "model", "seq"))
    params_3d = shard_params(params, mesh)          # 'model' axis (tp.py)
    batch_3d = shard_batch(batch, mesh)             # 'data' + 'seq'
    loss3, grads3 = grad_fn(params_3d, batch_3d)
    assert float(loss3) == pytest.approx(ref_loss, abs=2e-5)
    _assert_grads_close(ref_grads, grads3)
