"""End-to-end learning signal: the full model must overfit a tiny dataset —
training loss collapses and beam search reproduces the memorised answers.
This is the strongest cheap evidence that model/losses/decoding compose
correctly (gradients flow everywhere, caching matches training semantics)."""

import numpy as np
import pytest

import jax

from bist_tpu.config import GenerateConfig, ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch, pad_to
from bist_tpu.decode.beam import beam_search, extract_hyps
from bist_tpu.train.loop import create_train_state, make_train_step
from bist_tpu.vocab import EOS, PAD, SOS, make_id2word


def test_overfit_and_reproduce(rng):
    words = ["w%d" % i for i in range(16)]
    vocab = {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3}
    for w in words:
        vocab[w] = len(vocab)
    id2word = make_id2word(vocab)
    V = len(vocab)

    cfg = ModelConfig(vocab_size=V, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=32, att_h=4, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,), auto_encoder=False)
    tcfg = TrainConfig(warmup_steps=30, smoothing=0.0)

    # 4 fixed QA pairs with distinct deterministic answers
    B = 4
    questions = [np.array([SOS, 4 + i, 5 + i, EOS], np.int32) for i in range(B)]
    answers = [np.array([SOS, 8 + i, 9 + i, 10 + i, EOS], np.int32)
               for i in range(B)]
    fts = rng.standard_normal((B, 3, 4, 8)).astype(np.float32)
    his = np.full((B, 1), PAD, np.int32)
    cap = pad_to([np.array([SOS, 6, EOS], np.int32)] * B, 4)
    batch = Batch(query=pad_to(questions, 4), his=his,
                  trg=pad_to([a[:-1] for a in answers], 4),
                  trg_y=pad_to([a[1:] for a in answers], 4),
                  cap=cap, fts=fts, audio_fts=None)

    state, tx = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg, tx, donate=False)
    key = jax.random.PRNGKey(1)
    first = last = None
    for i in range(150):
        state, m = step(state, batch, key)
        loss = float(m["loss"])
        if first is None:
            first = loss
        last = loss
    assert last < 0.35 * first, (first, last)

    gcfg = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=1)
    result = beam_search(state.params, cfg, batch, gcfg)
    reproduced = 0
    for row in range(B):
        hyps = extract_hyps(result, id2word, row, 1)
        got = hyps[0][0] if hyps else []
        want = [id2word[t] for t in answers[row][1:-1]]
        reproduced += int(got == want)
    assert reproduced >= 3, f"only {reproduced}/4 answers memorised"
