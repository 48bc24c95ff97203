"""END-TO-END quality parity: train BOTH frameworks, decode BOTH, same task.

The headline quality claim ("CIDEr within 0.5%" of the reference's published
AVSD results, reference README.md:89-94) cannot be fully reproduced in this
environment (the AVSD training set is not vendored — scripts/reproduce_avsd.sh
is the download-day path).  This test is the strongest in-environment proxy:
it runs the reference PyTorch stack END TO END (its real model.forward,
NoamOpt/SimpleLossCompute training loop AND its real `beam_search_decode`,
model/decode.py:53-104) and our stack end to end (make_train_step +
decode.beam.beam_search) on the SAME learnable task from the SAME initial
weights, then asserts both frameworks learn it to the SAME quality.

Task: caption copy — the answer is the caption token sequence.  The pointer
generator (ptr_ft includes 'cap') makes this cleanly learnable at tiny scale;
it exercises encoder, BiST reasoning, decoder, pointer generator, optimizer,
schedule and beam search jointly.  The quality metric is exact-sequence
accuracy on HELD-OUT captions.

Unlike the trajectory-parity tests (test_training_dynamics caps at 100 steps
because fp noise amplifies chaotically), training here runs long enough for
both frameworks to CONVERGE — outcome parity is the assertion, mirroring the
real "train AVSD → equal CIDEr" claim in miniature.

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
B, LQ, LH, LC, T, S = 4, 5, 7, 4, 3, 4
LT = LC + 1              # trg = [sos, c1..c4]; trg_y = [c1..c4, eos]
STEPS = 1500             # fresh captions EVERY step: with a small cycled set
                         # both frameworks memorize instead of learning the
                         # copy rule (held-out acc 0.06); with fresh data the
                         # copy circuit is the only solution.  1500 steps is
                         # past BOTH frameworks' convergence knee (at 1000 the
                         # torch side still made one-token near-misses on 3/16)
WARMUP = 10
N_EVAL = 16              # held-out captions


def _copy_batches(rng, n, cfg):
    """Caption-copy batches: answer == caption (held fixed per batch)."""
    pairs = []
    for _ in range(n):
        def toks(L):
            x = rng.integers(4, V, size=(B, L)).astype(np.int64)
            x[:, -1] = PAD
            return x

        cap = rng.integers(4, V, size=(B, LC)).astype(np.int64)
        trg = np.concatenate(
            [np.full((B, 1), SOS, np.int64), cap], axis=1)
        trg_y = np.concatenate(
            [cap, np.full((B, 1), EOS, np.int64)], axis=1)
        q, h = toks(LQ), toks(LH)
        fts = rng.standard_normal((B, T, S, cfg.ft_sizes[0])) \
            .astype(np.float32)
        fts[:, -1] = 0.0
        ours = Batch(query=q.astype(np.int32), his=h.astype(np.int32),
                     trg=trg.astype(np.int32), trg_y=trg_y.astype(np.int32),
                     cap=cap.astype(np.int32), fts=fts, audio_fts=None)
        pairs.append(((q, h, fts, cap, trg, trg_y), ours))
    return pairs


@pytest.mark.slow
def test_train_to_quality_parity(ref_train_modules, rng):  # noqa: F811
    import torch

    ref_mtn, ref_dataset, ref_optimize, ref_ls = ref_train_modules
    sys.path.insert(0, REF)
    try:
        import model.decode as ref_decode
    finally:
        sys.path.remove(REF)

    cfg = ModelConfig(vocab_size=V, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                      attn_dropout=0.0, include_caption="summary",
                      separate_caption=True, enc_st_combine="none",
                      enc_vc_combine="dyn", dec_st_combine="seq",
                      ft_sizes=(24,), nb_aenc_blocks=0)
    tcfg = TrainConfig(warmup_steps=WARMUP, smoothing=0.1, noam_factor=1.0)
    params0 = init_model(jax.random.PRNGKey(7), cfg)
    train_pairs = _copy_batches(rng, STEPS, cfg)   # fresh batch per step
    eval_pairs = _copy_batches(rng, (N_EVAL + B - 1) // B, cfg)

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
        (q, h, fts, cap, trg, trg_y), _ = train_pairs[i]
        rb = ref_dataset.Batch(_t(q), _t(h), [fts], _t(cap), _t(trg),
                               _t(trg_y), PAD, ["v%d" % r for r in range(B)],
                               list(range(B)))
        loss_compute(model.forward(rb), rb)

    def ref_answer(q1, h1, f1, c1):
        """Decode ONE example through the reference's live beam path."""
        dummy = np.full((1, 1), SOS, np.int64)
        rb = ref_dataset.Batch(_t(q1), _t(h1), [f1], _t(c1), _t(dummy),
                               _t(dummy), PAD, ["v0"], [0])
        with torch.no_grad():
            hyps, _ = ref_decode.beam_search_decode(
                model, rb, LT + 1, start_symbol=SOS, unk_symbol=UNK,
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

    gcfg = GenerateConfig(maxlen=LT + 1, beam=3, penalty=1.0, nbest=1)

    ref_acc = our_acc = agree = n = 0
    for (q, h, fts, cap, trg, trg_y), ours in eval_pairs:
        res = beam_search(state.params, cfg, ours, gcfg)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        for r in range(B):
            if n >= N_EVAL:
                break
            expected = [int(t) for t in cap[r]]
            got_ref = ref_answer(q[r:r + 1], h[r:r + 1], fts[r:r + 1],
                                 cap[r:r + 1])
            got_our = [int(t) for t in toks[r, 0, :lens[r, 0]]]
            ref_acc += got_ref == expected
            our_acc += got_our == expected
            agree += got_ref == got_our
            n += 1
    ref_acc, our_acc, agree = ref_acc / n, our_acc / n, agree / n

    # Both frameworks must LEARN the task (quality high) and to the SAME
    # level (outcome parity).  Converged runs from identical init on this
    # deterministic task should agree almost everywhere; the bands absorb
    # fp-divergence between independently trained weights.
    assert our_acc >= 0.85, (our_acc, ref_acc, agree)
    assert ref_acc >= 0.85, (our_acc, ref_acc, agree)
    assert abs(our_acc - ref_acc) <= 0.15, (our_acc, ref_acc, agree)
    assert agree >= 0.8, (our_acc, ref_acc, agree)
