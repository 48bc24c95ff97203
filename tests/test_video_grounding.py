"""END-TO-END video-grounded quality parity (VERDICT r4 #4): both stacks
trained to convergence on a task whose answer is decodable ONLY from the
feature grid, from identical init — outcome-level evidence that the BiST
t2s/s2t reasoning path (reference model/encoder.py:95-201) LEARNS in this
framework, closing the gap caption-copy leaves (test_quality_parity trains a
task solvable by the pointer generator over caption text alone).

Task: grid-content retrieval.  Every text field (query/history/caption) is
the SAME fixed token sequence across all examples — the feature grid is the
only varying input.  Each example injects one of N_SIG fixed random
directions E[c] into a single random (t*, s*) cell of the (T, S, Dv) grid;
the answer is the token indexed by c.  The model must attend over the video
grid, pick up the injected direction through the projection + t2s/s2t
layers, and map it to the token through the tied-softmax generator (the
pointer generator is OFF — text contains no answer tokens, so the vocab
softmax over the video-derived context is the only path).

Design notes (prototyped, round 5):
  * index-style answers ("which spatial region") are information-
    theoretically UNDECODABLE here: the reference wires no positional
    encoding on the video S/T axes (`--vid-pos` unwired, mtn.py:108), so
    attention over the grid is permutation-equivariant — content retrieval
    is the strongest grid-grounded task this architecture admits.
  * with per-example random text the task stalls at chance for 3k+ steps
    (the varying text is pure nuisance variance drowning the video
    gradient); constant text makes it learnable.  An overfit probe (one
    fixed batch) reaches exact-match 1.0, confirming the video path carries
    gradients and information.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                                reason="reference tree not available")

import jax
import jax.numpy as jnp

from bist_tpu.config import GenerateConfig, ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch
from bist_tpu.decode.beam import beam_search
from bist_tpu.models.model import init_model
from bist_tpu.train.loop import TrainState, make_train_step
from bist_tpu.train.schedule import make_optimizer
from bist_tpu.vocab import EOS, PAD, SOS, UNK

from test_torch_parity import build_ref_model_with_our_params, _t
from test_training_dynamics import ref_train_modules  # fixture  # noqa: F401

V = 60
B, LQ, LH, LC, T, S, DV = 8, 5, 7, 4, 3, 4, 24
N_SIG = 8
SIG0 = 4                 # answer tokens 4..11; text samples from 12..V
STEPS = 6000             # past the retrieval phase transition (prototype:
                         # loss flat ~1.1 to ~1.5k steps, drops through ~4k,
                         # 0.005 / held-out 1.0 by ~5k at B=8, grid noise
                         # sigma=0.5; see module docstring)
WARMUP = 10
N_EVAL = 16


def _fixed_text(L, seed=7):
    x = np.random.default_rng(seed).integers(
        SIG0 + N_SIG, V, size=(1, L)).astype(np.int64)
    x[:, -1] = PAD
    return x


_E = np.random.default_rng(42).standard_normal((N_SIG, DV)) \
    .astype(np.float32) * 3.0


def _grid_batches(rng, n):
    """Retrieval batches: constant text, answer token injected into one
    random grid cell as a fixed direction."""
    pairs = []
    q0, h0, c0 = _fixed_text(LQ, 7), _fixed_text(LH, 8), _fixed_text(LC, 9)
    for _ in range(n):
        c_star = rng.integers(0, N_SIG, size=B)
        s_star = rng.integers(0, S, size=B)
        t_star = rng.integers(0, T - 1, size=B)   # last clip stays zero (pad)
        fts = 0.5 * rng.standard_normal((B, T, S, DV)).astype(np.float32)
        for b in range(B):
            fts[b, t_star[b], s_star[b], :] += _E[c_star[b]]
        fts[:, -1] = 0.0
        ans = (SIG0 + c_star).astype(np.int64)[:, None]
        trg = np.concatenate([np.full((B, 1), SOS, np.int64), ans], 1)
        trg_y = np.concatenate([ans, np.full((B, 1), EOS, np.int64)], 1)
        q, h, c = (np.repeat(t, B, 0) for t in (q0, h0, c0))
        ours = Batch(query=q.astype(np.int32), his=h.astype(np.int32),
                     trg=trg.astype(np.int32), trg_y=trg_y.astype(np.int32),
                     cap=c.astype(np.int32), fts=fts, audio_fts=None)
        pairs.append(((q, h, fts, c, trg, trg_y, ans), ours))
    return pairs


def _cfg():
    return ModelConfig(vocab_size=V, nb_blocks=2, nb_venc_blocks=2,
                       nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                       attn_dropout=0.0, include_caption="summary",
                       separate_caption=True, enc_st_combine="none",
                       enc_vc_combine="dyn", dec_st_combine="seq",
                       ft_sizes=(DV,), nb_aenc_blocks=0, ptr_gen=False,
                       t2s=True, s2t=True)


@pytest.mark.slow
def test_video_grounded_quality_parity(ref_train_modules, rng):  # noqa: F811
    import torch

    ref_mtn, ref_dataset, ref_optimize, ref_ls = ref_train_modules
    sys.path.insert(0, REF)
    try:
        import model.decode as ref_decode
    finally:
        sys.path.remove(REF)

    # the reference's ptr_gen=False branch reads an undefined module global
    # `separate_out_linear` (mtn.py:95, upstream bug — its untied-Generator
    # path is dead code); inject the intended False so the tied-weight
    # Generator branch (generator.py:21-25, matching our
    # vocab_log_softmax) is taken
    ref_mtn.separate_out_linear = False

    cfg = _cfg()
    tcfg = TrainConfig(warmup_steps=WARMUP, smoothing=0.1, noam_factor=1.0)
    params0 = init_model(jax.random.PRNGKey(7), cfg)
    train_pairs = _grid_batches(rng, STEPS)       # fresh grids every step
    eval_pairs = _grid_batches(rng, (N_EVAL + B - 1) // B)

    # --- reference: train with ITS loop, decode with ITS beam search ---
    torch.manual_seed(0)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params0)
    model.eval()  # determinism: reference MHA hardcodes attn dropout p=0.1
    criterion = ref_ls.LabelSmoothing(size=V, padding_idx=PAD, smoothing=0.1)
    opt = ref_optimize.NoamOpt(
        cfg.d_model, 1, WARMUP,
        torch.optim.Adam(model.parameters(), lr=0, betas=(0.9, 0.98),
                         eps=1e-9))
    loss_compute = ref_optimize.SimpleLossCompute(
        model.generator, model.ae_generator, criterion, opt=opt, args=args)
    for i in range(STEPS):
        (q, h, fts, cap, trg, trg_y, _), _ = train_pairs[i]
        rb = ref_dataset.Batch(_t(q), _t(h), [fts], _t(cap), _t(trg),
                               _t(trg_y), PAD, ["v%d" % r for r in range(B)],
                               list(range(B)))
        loss_compute(model.forward(rb), rb)

    def ref_answer(q1, h1, f1, c1):
        dummy = np.full((1, 1), SOS, np.int64)
        rb = ref_dataset.Batch(_t(q1), _t(h1), [f1], _t(c1), _t(dummy),
                               _t(dummy), PAD, ["v0"], [0])
        with torch.no_grad():
            hyps, _ = ref_decode.beam_search_decode(
                model, rb, 3, start_symbol=SOS, unk_symbol=UNK,
                end_symbol=EOS, pad_symbol=PAD, beam=3, penalty=1.0,
                nbest=1, min_len=1, train_args=args)
        return [int(t) for t in hyps[0][0]]

    # --- ours: train with OUR jitted loop, decode with OUR beam search ---
    tx = make_optimizer(cfg.d_model, WARMUP, tcfg.noam_factor,
                        tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
    state = TrainState(params=params0, opt_state=tx.init(params0),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)
    key = jax.random.PRNGKey(0)  # unused: dropout=0
    for i in range(STEPS):
        state, _ = step_fn(state, train_pairs[i][1], key)

    gcfg = GenerateConfig(maxlen=3, beam=3, penalty=1.0, nbest=1)

    ref_acc = our_acc = agree = n = 0
    for (q, h, fts, cap, trg, trg_y, ans), ours in eval_pairs:
        res = beam_search(state.params, cfg, ours, gcfg)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        for r in range(B):
            if n >= N_EVAL:
                break
            expected = [int(ans[r, 0])]
            got_ref = ref_answer(q[r:r + 1], h[r:r + 1], fts[r:r + 1],
                                 cap[r:r + 1])
            got_our = [int(t) for t in toks[r, 0, :lens[r, 0]]]
            ref_acc += got_ref == expected
            our_acc += got_our == expected
            agree += got_ref == got_our
            n += 1
    ref_acc, our_acc, agree = ref_acc / n, our_acc / n, agree / n

    # Both frameworks must LEARN the grid-retrieval task well above the
    # 1/N_SIG = 0.125 chance floor, and to the same level.  The bands are
    # wider than caption-copy's: independently-trained converged runs on a
    # retrieval task with a late phase transition diverge more in where
    # they land.
    assert our_acc >= 0.75, (our_acc, ref_acc, agree)
    assert ref_acc >= 0.75, (our_acc, ref_acc, agree)
    assert abs(our_acc - ref_acc) <= 0.25, (our_acc, ref_acc, agree)
