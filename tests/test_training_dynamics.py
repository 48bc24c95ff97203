"""Training-DYNAMICS parity against the actual reference PyTorch stack.

Runs 20 optimizer steps of the reference NoamOpt + SimpleLossCompute
(reference model/optimize.py:9-94, instantiated as in train.py:129-135) and of
our jitted `make_train_step` on identical initial weights and identical
batches (dropout 0), asserting (a) the per-step loss trajectories agree and
(b) the final parameters agree *functionally* — a post-training eval forward
produces matching log-probabilities.

This closes the last link in the quality-parity chain: forward parity
(test_torch_parity), loss-formula parity (test_losses_parity) and the Noam
curve were each proven separately; this proves them *composed* — Adam
beta/epsilon ordering and bias correction, the backward through the
multi-pointer generator and the AE heads, and lr scheduling across the
warmup knee (warmup=10, steps=20 exercises both branches of the min()).

No reference code is copied — it is imported in place as a test oracle."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                                reason="reference tree not available")

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import forward_logprobs, init_model
from bist_tpu.train.loop import TrainState, make_train_step
from bist_tpu.train.schedule import make_optimizer
from bist_tpu.vocab import PAD

from test_torch_parity import build_ref_model_with_our_params, _t

STEPS = 20
WARMUP = 10  # knee inside the run: lr ramps steps 1-10, decays 11-20
V = 60


@pytest.fixture(scope="module")
def ref_train_modules():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # generator.py:66,113
    torch.manual_seed(0)
    sys.path.insert(0, REF)
    try:
        import model.mtn as ref_mtn
        import data.dataset as ref_dataset
        import model.optimize as ref_optimize
        import model.label_smoothing as ref_ls
    finally:
        sys.path.remove(REF)
    return ref_mtn, ref_dataset, ref_optimize, ref_ls


def _make_batches(rng, n, cfg):
    """n aligned (ref_batch_args, our_batch) pairs with fixed static shapes."""
    B, Lq, Lh, Lc, Lt, T, S, Ta = 2, 5, 7, 4, 6, 3, 4, 5
    pairs = []
    for _ in range(n):
        def toks(L):
            x = rng.integers(4, V, size=(B, L)).astype(np.int64)
            x[:, -1] = PAD
            return x

        q, h_, c, t, ty = toks(Lq), toks(Lh), toks(Lc), toks(Lt), toks(Lt)
        fts = rng.standard_normal((B, T, S, cfg.ft_sizes[0])).astype(np.float32)
        fts[:, -1] = 0.0
        audio = None
        if cfg.has_audio:
            audio = rng.standard_normal((B, Ta, cfg.ft_sizes[1])) \
                .astype(np.float32)
            audio[:, -1] = 0.0
        ours = Batch(query=q.astype(np.int32), his=h_.astype(np.int32),
                     trg=t.astype(np.int32), trg_y=ty.astype(np.int32),
                     cap=c.astype(np.int32), fts=fts, audio_fts=audio)
        pairs.append(((q, h_, fts, c, t, ty, audio), ours))
    return pairs


_VARIANTS = {
    # the flagship-shaped visual config (pointer gen, dyn vc fusion)
    "visual": dict(ft_sizes=(24,), nb_aenc_blocks=0),
    # + VGGish-style audio: exercises the audio AE loss backward, the 4-way
    # dyn fusion and the audio cross-attention under the optimizer
    "audio": dict(ft_sizes=(24, 12), nb_aenc_blocks=2),
}


@pytest.mark.parametrize("variant", sorted(_VARIANTS))
def test_training_dynamics_match_reference(ref_train_modules, rng, variant):
    import torch

    ref_mtn, ref_dataset, ref_optimize, ref_ls = ref_train_modules
    cfg = ModelConfig(vocab_size=V, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                      attn_dropout=0.0,  # see model.eval() note below
                      include_caption="summary", separate_caption=True,
                      enc_st_combine="none",
                      enc_vc_combine="dyn", dec_st_combine="seq",
                      **_VARIANTS[variant])
    tcfg = TrainConfig(warmup_steps=WARMUP, smoothing=0.1, noam_factor=1.0)
    params = init_model(jax.random.PRNGKey(7), cfg)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params)

    pairs = _make_batches(rng, 4, cfg)
    eval_pair = _make_batches(rng, 1, cfg)[0]

    # --- reference: NoamOpt(Adam) + SimpleLossCompute (train.py:129-135) ---
    # Kept in eval() mode: the reference's MHAs hardcode attention-prob
    # dropout p=0.1 (mtn.py:77 keeps the modules.py:67 default), so train()
    # would be stochastic even at --dropout 0.  eval() + our attn_dropout=0.0
    # makes both sides deterministic; the optimizer path is unaffected.
    model.eval()
    criterion = ref_ls.LabelSmoothing(size=V, padding_idx=PAD, smoothing=0.1)
    opt = ref_optimize.NoamOpt(
        cfg.d_model, 1, WARMUP,
        torch.optim.Adam(model.parameters(), lr=0, betas=(0.9, 0.98),
                         eps=1e-9))
    loss_compute = ref_optimize.SimpleLossCompute(
        model.generator, model.ae_generator, criterion, opt=opt, args=args)
    ref_traj = []
    for i in range(STEPS):
        (q, h_, fts, c, t, ty, audio), _ = pairs[i % len(pairs)]
        rb = ref_dataset.Batch(_t(q), _t(h_), [fts], _t(c), _t(t), _t(ty),
                               PAD, ["v0", "v1"], [0, 1],
                               audio_fts=None if audio is None else [audio])
        ft = model.forward(rb)
        losses = loss_compute(ft, rb)  # backward + opt.step inside
        ref_traj.append([float(losses["out"]),
                         float(losses["temporal_ae"]),
                         float(losses["spatial_ae"])])

    # --- ours: jitted train step over the same batches ---
    tx = make_optimizer(cfg.d_model, WARMUP, tcfg.noam_factor,
                        tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)
    key = jax.random.PRNGKey(0)  # unused: dropout=0
    our_traj = []
    for i in range(STEPS):
        state, metrics = step_fn(state, pairs[i % len(pairs)][1], key)
        our_traj.append([float(metrics["out"]),
                         float(metrics["temporal_ae"]),
                         float(metrics["spatial_ae"])])

    # (a) loss trajectories (unnormalised sums, as the reference logs them)
    np.testing.assert_allclose(np.asarray(our_traj), np.asarray(ref_traj),
                               rtol=1e-3, atol=1e-4)

    # (b) final params agree functionally: eval forward on held-out batch
    model.eval()
    (q, h_, fts, c, t, ty, audio), our_eval = eval_pair
    rb = ref_dataset.Batch(_t(q), _t(h_), [fts], _t(c), _t(t), _t(ty),
                           PAD, ["v0", "v1"], [0, 1],
                           audio_fts=None if audio is None else [audio])
    with torch.no_grad():
        ref_logp = model.generator(model.forward(rb), rb, args).numpy()
    our_logp, _ = forward_logprobs(state.params, cfg, our_eval, rngs=None)
    np.testing.assert_allclose(np.asarray(our_logp), ref_logp,
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_dropout_active_dynamics_statistical(ref_train_modules, rng):
    """DROPOUT-ACTIVE long-horizon parity, statistical: N seeds × 100 steps
    of ours (our dropout RNG) vs the reference torch stack (its own dropout
    RNG), same initial weights, same batch cycle, reference dropout rates
    active (dropout=0.2, the modules.py:67 attention-dropout default 0.1).

    Both implementations are unbiased estimators of the same expected
    training trajectory, so the across-seed mean of the late-phase response
    loss must agree within the seed noise band.  This fails if dropout
    PLACEMENT (which sublayers/activations are masked — modules.py:33-113)
    or SCALING (inverted-dropout 1/keep) diverges: a missing or extra
    dropout site shifts the expected loss by far more than the band.
    Deterministic (fixed seeds) — not flaky."""
    import torch

    ref_mtn, ref_dataset, ref_optimize, ref_ls = ref_train_modules
    SEEDS, N_STEPS, TAIL = 3, 100, 30
    cfg = ModelConfig(vocab_size=V, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.2,
                      attn_dropout=0.1,   # the reference's hardcoded default
                      include_caption="summary", separate_caption=True,
                      enc_st_combine="none", enc_vc_combine="dyn",
                      dec_st_combine="seq", ft_sizes=(24,), nb_aenc_blocks=0)
    tcfg = TrainConfig(warmup_steps=WARMUP, smoothing=0.1, noam_factor=1.0)
    params0 = init_model(jax.random.PRNGKey(7), cfg)
    pairs = _make_batches(rng, 4, cfg)

    def ref_run(seed):
        torch.manual_seed(1000 + seed)
        model, args = build_ref_model_with_our_params(ref_mtn, cfg, params0)
        model.train()                     # dropout ACTIVE
        criterion = ref_ls.LabelSmoothing(size=V, padding_idx=PAD,
                                          smoothing=0.1)
        opt = ref_optimize.NoamOpt(
            cfg.d_model, 1, WARMUP,
            torch.optim.Adam(model.parameters(), lr=0, betas=(0.9, 0.98),
                             eps=1e-9))
        loss_compute = ref_optimize.SimpleLossCompute(
            model.generator, model.ae_generator, criterion, opt=opt,
            args=args)
        traj = []
        for i in range(N_STEPS):
            (q, h_, fts, c, t, ty, audio), _ = pairs[i % len(pairs)]
            rb = ref_dataset.Batch(_t(q), _t(h_), [fts], _t(c), _t(t), _t(ty),
                                   PAD, ["v0", "v1"], [0, 1], audio_fts=None)
            losses = loss_compute(model.forward(rb), rb)
            traj.append(float(losses["out"]))
        return traj

    tx = make_optimizer(cfg.d_model, WARMUP, tcfg.noam_factor,
                        tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)

    def our_run(seed):
        state = TrainState(params=params0, opt_state=tx.init(params0),
                           step=jnp.zeros((), jnp.int32))
        key = jax.random.PRNGKey(2000 + seed)
        traj = []
        for i in range(N_STEPS):
            state, metrics = step_fn(state, pairs[i % len(pairs)][1],
                                     jax.random.fold_in(key, i))
            traj.append(float(metrics["out"]))
        return traj

    ref_tails = np.array([np.mean(ref_run(s)[-TAIL:]) for s in range(SEEDS)])
    our_tails = np.array([np.mean(our_run(s)[-TAIL:]) for s in range(SEEDS)])

    # mean/band overlap: the across-seed means must agree within the pooled
    # seed-noise band (+ a small absolute floor for N=3 variance estimates).
    band = 4.0 * np.sqrt(ref_tails.var(ddof=1) / SEEDS
                         + our_tails.var(ddof=1) / SEEDS) + 0.02 * abs(
        ref_tails.mean())
    assert abs(our_tails.mean() - ref_tails.mean()) < band, (
        our_tails, ref_tails, band)
