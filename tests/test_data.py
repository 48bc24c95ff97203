"""Data-layer parity tests: vocabulary semantics, example flattening,
batching/bucketing, masks, cut_a."""

import json

import numpy as np
import pytest

from bist_tpu.data.avsd import cut_answer, load_avsd
from bist_tpu.data.batching import Batch, bucket_len, make_batch, pad_to
from bist_tpu.vocab import EOS, PAD, SOS, UNK, get_vocabulary, words2ids


@pytest.fixture
def avsd_json(tmp_path):
    data = {
        "dialogs": [
            {"image_id": "vidA",
             "caption": "a man walks", "summary": "man walking around",
             "dialog": [
                 {"question": "what is he doing", "answer": "he is walking"},
                 {"question": "is he alone", "answer": "yes he is alone"},
             ]},
            {"image_id": "vidB",
             "caption": "a dog", "summary": "a dog barks",
             "dialog": [
                 {"question": "what animal is it", "answer": "it is a dog"},
             ]},
        ],
        "type": "t", "version": "1",
    }
    p = tmp_path / "train_x.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_vocab_semantics(avsd_json):
    # cutoff=0 → freq > 0, every word kept, ids in first-occurrence order
    # (questions before answers within a dialog; reference data_handler.py:38-43)
    v = get_vocabulary(avsd_json, cutoff=0)
    assert v["<unk>"] == UNK and v["<blank>"] == PAD
    assert v["<sos>"] == SOS and v["<eos>"] == EOS
    # first dialog: questions scanned before answers
    assert v["what"] < v["he"] or "what" in ("he",)  # 'what' is first question word
    assert v["what"] == 4
    # cutoff filters: freq > 1 keeps only repeated words
    v2 = get_vocabulary(avsd_json, cutoff=1)
    assert "what" in v2 and "animal" not in v2   # 'animal' occurs once
    # captions counted when include_caption set
    v3 = get_vocabulary(avsd_json, cutoff=0, include_caption="summary")
    assert "barks" in v3
    assert "barks" not in v


def test_words2ids():
    v = {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3, "hi": 4}
    ids = words2ids("hi there", v)
    assert list(ids) == [SOS, 4, UNK, EOS]
    assert ids.dtype == np.int32


def test_load_avsd_history_construction(avsd_json):
    v = get_vocabulary(avsd_json, cutoff=0, include_caption="summary")
    data = load_avsd(avsd_json, v, include_caption="summary",
                     separate_caption=True)
    assert len(data.examples) == 3
    ex0, ex1 = data.examples[0], data.examples[1]
    # separate caption → history turn 0 is just [<blank>]
    assert list(ex0.history) == [PAD]
    assert ex0.caption is not None
    # turn 1 history = [<blank>] + q0 + a0
    q0 = words2ids("what is he doing", v)
    a0 = words2ids("he is walking", v)
    assert list(ex1.history) == [PAD] + list(q0) + list(a0)
    # answer_in/out shifted
    a1 = words2ids("yes he is alone", v)
    assert list(ex1.answer_in) == list(a1[:-1])
    assert list(ex1.answer_out) == list(a1[1:])
    # caption in history when separate_caption=False
    data2 = load_avsd(avsd_json, v, include_caption="summary",
                      separate_caption=False)
    cap = words2ids("man walking around", v)
    assert list(data2.examples[0].history) == list(cap)
    assert data2.examples[0].caption is None


def test_load_avsd_merge_and_window(avsd_json):
    v = get_vocabulary(avsd_json, cutoff=0)
    d = load_avsd(avsd_json, v, max_history_length=0)
    # max_history_length<=0 → full history
    assert len(d.examples[1].history) > 1
    d2 = load_avsd(avsd_json, v, merge_source=True)
    # merged question = caption([PAD]) + history + question
    ex1 = d2.examples[1]
    assert len(ex1.question) == 1 + len(ex1.history) + \
        len(words2ids("is he alone", v))


def test_bucketing_and_padding():
    assert bucket_len(5, (8, 16)) == 8
    assert bucket_len(9, (8, 16)) == 16
    assert bucket_len(40, (8, 16)) == 48  # next multiple of 16
    out = pad_to([np.array([5, 6], np.int32), np.array([7], np.int32)], 4)
    assert out.shape == (2, 4)
    assert list(out[1]) == [7, PAD, PAD, PAD]


def test_make_batch_shapes_and_row_padding():
    qs = [np.array([2, 5, 3], np.int32)] * 3
    batch = make_batch(qs, qs, qs, qs,
                       fts=[np.ones((5, 4, 8), np.float32)] * 3,
                       len_buckets=(4, 8), time_buckets=(8,),
                       pad_batch_to=8)
    assert batch.query.shape == (8, 4)
    assert batch.fts.shape == (8, 8, 4, 8)
    # padded rows are all-PAD / zero
    assert np.all(batch.query[3:] == PAD)
    assert np.all(batch.fts[3:] == 0)


def test_cut_answer_distribution():
    rng = np.random.default_rng(0)
    a_in = np.arange(10, 16, dtype=np.int32)   # [10..15] (sos + 5 tokens)
    a_out = np.arange(11, 17, dtype=np.int32)
    cut = 0
    for _ in range(200):
        ci, co = cut_answer(a_in, a_out, rng)
        assert len(ci) == len(co)
        if len(ci) < len(a_in):
            cut += 1
            # truncation semantics: out ends with the next unseen token
            e = len(ci)
            assert list(co) == list(a_in[1:e]) + [a_in[e]]
    assert 60 <= cut <= 140  # p=0.5


def test_test_mode_cap(tmp_path):
    dialogs = [{"image_id": f"v{i}", "caption": "c", "summary": "s",
                "dialog": [{"question": "q q", "answer": "a a"}] * 10}
               for i in range(30)]
    p = tmp_path / "train_test.json"
    p.write_text(json.dumps({"dialogs": dialogs}))
    v = get_vocabulary(str(p), cutoff=0)
    d = load_avsd(str(p), v)
    # cap: stops after the dialog that crosses 100 qa pairs (data_handler.py:108)
    assert len(d.examples) == 110


def test_vocab_ptr_gen_keeps_all_words(avsd_json):
    v_cut = get_vocabulary(avsd_json, cutoff=5)
    v_all = get_vocabulary(avsd_json, cutoff=5, ptr_gen=True)
    # ptr_gen ignores the cutoff entirely (data_handler.py:44-48)
    assert len(v_all) > len(v_cut)
    assert "animal" in v_all and "animal" not in v_cut
