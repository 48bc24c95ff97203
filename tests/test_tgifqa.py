"""TGIF-QA adaptation: TSV parsing, all four task heads train (loss
decreases, metrics computed), candidate expansion for multiple choice."""

import numpy as np
import pytest

import jax
import optax

from bist_tpu.config import ModelConfig
from bist_tpu.tasks.tgifqa import (
    TGIFTask, TgifBatch, build_answer_vocab, expand_candidates,
    init_tgif_model, load_tgif_tsv, make_tgif_train_step, tgif_forward,
    tgif_loss)
from bist_tpu.vocab import SPECIALS


def tiny_cfg():
    return ModelConfig(vocab_size=40, nb_blocks=2, nb_venc_blocks=2,
                       d_model=16, att_h=2, dropout=0.0, ft_sizes=(12,),
                       include_caption="none", nb_cenc_blocks=0)


@pytest.fixture
def vocab():
    v = dict(SPECIALS)
    for w in ("what color is the cat dog doing how many times does man "
              "jump red blue two three before after").split():
        v[w] = len(v)
    return v


@pytest.fixture
def tsv_files(tmp_path):
    frameqa = tmp_path / "frameqa.tsv"
    frameqa.write_text(
        "gif_name\tquestion\tanswer\n"
        "g1\twhat color is the cat\tred\n"
        "g2\twhat color is the dog\tblue\n"
        "g3\twhat color is the cat\tred\n")
    count = tmp_path / "count.tsv"
    count.write_text(
        "gif_name\tquestion\tanswer\n"
        "g1\thow many times does man jump\t3\n"
        "g2\thow many times does man jump\t5\n")
    action = tmp_path / "action.tsv"
    action.write_text(
        "gif_name\tquestion\ta1\ta2\ta3\ta4\ta5\tanswer\n"
        "g1\twhat does man do\tjump\tred\tblue\tcat\tdog\t0\n"
        "g2\twhat does man do before\tdog\tjump\tcat\tred\tblue\t1\n")
    return {"frameqa": str(frameqa), "count": str(count),
            "action": str(action)}


def test_tsv_parsing(tsv_files, vocab):
    av = build_answer_vocab(tsv_files["frameqa"])
    assert av["red"] == 0 and av["blue"] == 1   # frequency order
    exs = load_tgif_tsv(tsv_files["frameqa"], TGIFTask.FRAMEQA, vocab, av)
    assert len(exs) == 3 and exs[0].label == 0 and exs[1].label == 1
    cexs = load_tgif_tsv(tsv_files["count"], TGIFTask.COUNT, vocab)
    assert cexs[1].label == 5
    aexs = load_tgif_tsv(tsv_files["action"], TGIFTask.ACTION, vocab)
    assert len(aexs[0].candidates) == 5 and aexs[1].label == 1


def test_candidate_expansion(tsv_files, vocab, rng):
    aexs = load_tgif_tsv(tsv_files["action"], TGIFTask.ACTION, vocab)
    fts = {g: rng.standard_normal((4, 3, 12)).astype(np.float32)
           for g in ("g1", "g2")}
    batch = expand_candidates(aexs, fts.__getitem__, max_len=16)
    assert batch.query.shape == (10, 16)
    assert batch.fts.shape == (10, 4, 3, 12)
    assert list(batch.label) == [0, 1]


@pytest.mark.parametrize("task", [TGIFTask.FRAMEQA, TGIFTask.COUNT,
                                  TGIFTask.ACTION])
def test_heads_train(task, rng):
    cfg = tiny_cfg()
    params = init_tgif_model(jax.random.PRNGKey(0), cfg, task, n_answers=10)
    B = 4
    rows = B * 5 if task == TGIFTask.ACTION else B
    query = rng.integers(4, 40, size=(rows, 6)).astype(np.int32)
    fts = rng.standard_normal((rows, 3, 4, 12)).astype(np.float32)
    if task == TGIFTask.FRAMEQA:
        label = rng.integers(0, 10, size=B).astype(np.int32)
    elif task == TGIFTask.COUNT:
        label = rng.integers(1, 10, size=B).astype(np.int32)
    else:
        label = rng.integers(0, 5, size=B).astype(np.int32)
    batch = TgifBatch(query=query, fts=fts, label=label)

    tx = optax.adam(1e-2)
    state = {"params": params, "opt_state": tx.init(params), "step": 0}
    step = make_tgif_train_step(cfg, task, tx)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses[-1])
    _, m = tgif_loss(state["params"], cfg, batch, task)
    key = "mae" if task == TGIFTask.COUNT else "acc"
    assert key in m
