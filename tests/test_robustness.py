"""Edge-input robustness: empty strings, zero-turn dialogs, unicode,
missing/corrupt feature files."""

import json

import numpy as np
import pytest

from bist_tpu.evalkit.ptb_tokenizer import ptb_tokenize_sentence
from bist_tpu.evalkit.rouge import rouge_l_single
from bist_tpu.evalkit.meteor import meteor_single
from bist_tpu.vocab import EOS, SOS, get_vocabulary, words2ids


def test_empty_and_unicode_text():
    v = {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3}
    assert list(words2ids("", v)) == [SOS, EOS]
    assert ptb_tokenize_sentence("") == []
    assert ptb_tokenize_sentence("...") == []
    # unicode survives tokenization
    toks = ptb_tokenize_sentence("café naïve 中文 !")
    assert "café" in toks and "中文" in toks


def test_empty_hypothesis_metrics():
    assert rouge_l_single([], [["a", "b"]]) == 0.0
    assert meteor_single([], [["a"]]) == 0.0
    assert meteor_single(["a"], [[]]) == 0.0
    from bist_tpu.evalkit.bleu import BleuScorer
    s = BleuScorer()
    s.append([], [["a", "b"]])
    corpus, _ = s.compute()
    assert all(np.isfinite(corpus))


def test_zero_turn_dialog(tmp_path):
    data = {"dialogs": [
        {"image_id": "v0", "caption": "c", "summary": "s", "dialog": []},
        {"image_id": "v1", "caption": "c", "summary": "s",
         "dialog": [{"question": "q", "answer": "a"}]},
    ]}
    p = tmp_path / "d.json"
    p.write_text(json.dumps(data))
    v = get_vocabulary(str(p), cutoff=0)
    from bist_tpu.data.avsd import load_avsd
    d = load_avsd(str(p), v)
    assert len(d.examples) == 1      # zero-turn dialog contributes nothing
    assert d.examples[0].vid == "v1"


def test_corrupt_npy_falls_back(tmp_path):
    """Non-f32 files route through the python fallback with identical
    semantics (native parser rejects, no crash)."""
    from bist_tpu.native.loader import assemble_feature_batch

    a = np.arange(24, dtype=np.float64).reshape(2, 3, 4)   # f64, not f32
    p = tmp_path / "x.npy"
    np.save(p, a)
    out = assemble_feature_batch([str(p)], t_pad=4, tail_shape=(3, 4))
    assert out.shape == (1, 4, 3, 4)
    np.testing.assert_array_equal(out[0, :2], a.astype(np.float32))
    np.testing.assert_array_equal(out[0, 2:], 0.0)


def test_missing_feature_file_raises(tmp_path):
    from bist_tpu.data.features import FeatureStore

    s = FeatureStore("resnext_st", str(tmp_path / "<FeaType>/<ImageID>.npy"))
    s.register(["nope"])
    with pytest.raises(Exception):
        s.get("nope")
