"""Shared fixture code between test_multihost.py (single-process oracle) and
multihost_worker.py (2-process jax.distributed run): a tiny deterministic
text-only model + batch + train step."""

import numpy as np

GLOBAL_BATCH = 4
_SEED = 123


def make_cfgs():
    from bist_tpu.config import ModelConfig, TrainConfig

    cfg = ModelConfig(vocab_size=40, nb_blocks=1, nb_venc_blocks=0,
                      nb_cenc_blocks=0, d_model=16, att_h=2, dropout=0.0,
                      attn_dropout=0.0, include_caption="none",
                      ft_sizes=(), ptr_gen=True, ptr_ft="query")
    tcfg = TrainConfig(warmup_steps=10)
    return cfg, tcfg


def make_state_and_step(cfg, tcfg):
    """Deterministic (state, jitted step_fn, global numpy Batch, key)."""
    import jax
    import jax.numpy as jnp

    from bist_tpu.data.batching import Batch
    from bist_tpu.models.model import init_model
    from bist_tpu.train.loop import TrainState, make_train_step
    from bist_tpu.train.schedule import make_optimizer

    params = init_model(jax.random.PRNGKey(_SEED), cfg)
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)

    rng = np.random.default_rng(_SEED)

    def toks(L):
        x = rng.integers(4, cfg.vocab_size, size=(GLOBAL_BATCH, L))
        x[:, -1] = 1  # PAD
        return x.astype(np.int32)

    batch = Batch(query=toks(6), his=toks(8), trg=toks(5), trg_y=toks(5),
                  cap=None, fts=None, audio_fts=None)
    key = np.asarray(jax.random.PRNGKey(0))
    return state, step_fn, batch, key
