"""Reference-checkpoint importer round-trip: build the reference torch model,
torch.save it like the reference does, import via bist_tpu.convert, and
assert the JAX forward equals the torch forward."""

import os
import pickle
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                                reason="reference tree not available")


def test_import_reference_checkpoint(tmp_path, rng):
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        import model.mtn as ref_mtn
        import data.dataset as ref_dataset
    finally:
        sys.path.remove(REF)

    from tests.test_torch_parity import make_ref_args
    from bist_tpu.config import ModelConfig

    cfg0 = ModelConfig(vocab_size=60, nb_blocks=2, nb_venc_blocks=2,
                       nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                       include_caption="summary", separate_caption=True,
                       ft_sizes=(24,))
    args = make_ref_args(cfg0)
    # reference .conf stores (vocab, args); args needs dropout>0 fields etc.
    vocab = {f"w{i}": i for i in range(60)}
    torch_model = ref_mtn.make_model(60, 60, args, ft_sizes=[24])
    torch_model.eval()

    pth = tmp_path / "mtn_best.pth.tar"
    conf = tmp_path / "mtn.conf"
    torch.save(torch_model, str(pth))
    with open(conf, "wb") as f:
        pickle.dump((vocab, args), f, -1)

    from bist_tpu.convert import import_reference_checkpoint

    params, cfg, vocab2 = import_reference_checkpoint(
        str(pth), str(conf), reference_root=REF)
    assert cfg.d_model == 16 and cfg.ft_sizes == (24,)
    assert vocab2 == vocab

    # forward parity with the imported weights
    from bist_tpu.data.batching import Batch
    from bist_tpu.models.model import forward_logprobs
    from bist_tpu.vocab import PAD

    B = 2

    def toks(L):
        x = rng.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, c, t = toks(5), toks(7), toks(4), toks(6)
    fts = rng.standard_normal((B, 3, 4, 24)).astype(np.float32)
    ref_batch = ref_dataset.Batch(
        torch.from_numpy(q), torch.from_numpy(h_), [fts],
        torch.from_numpy(c), torch.from_numpy(t), torch.from_numpy(t),
        PAD, ["v0", "v1"], [0, 1])
    with torch.no_grad():
        ft = torch_model.forward(ref_batch)
        ref_logp = torch_model.generator(ft, ref_batch, args).numpy()

    our_batch = Batch(query=q.astype(np.int32), his=h_.astype(np.int32),
                      trg=t.astype(np.int32), trg_y=t.astype(np.int32),
                      cap=c.astype(np.int32), fts=fts, audio_fts=None)
    our_logp, _ = forward_logprobs(params, cfg, our_batch, rngs=None)
    np.testing.assert_allclose(np.asarray(our_logp), ref_logp,
                               rtol=5e-4, atol=5e-4)


def test_export_reference_checkpoint_roundtrip(tmp_path, rng):
    """Reverse migration (round 4): our trained params → a reference-format
    checkpoint pair (`<prefix>_best.pth.tar` + `<prefix>.conf`) that loads
    through BOTH consumers — our own import_reference_checkpoint (params
    identical leaf-for-leaf) and a plain torch.load the way the reference's
    generate.py:89-93 does (forward equality vs our JAX forward)."""
    import torch

    from bist_tpu.config import ModelConfig
    from bist_tpu.convert import (export_reference_checkpoint,
                                  import_reference_checkpoint)
    from bist_tpu.models.model import forward_logprobs, init_model
    from bist_tpu.data.batching import Batch
    from bist_tpu.vocab import PAD
    import jax

    cfg = ModelConfig(vocab_size=60, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(24,), enc_st_combine="none",
                      enc_vc_combine="dyn", dec_st_combine="seq")
    params = init_model(jax.random.PRNGKey(3), cfg)
    vocab = {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3}
    vocab.update({f"w{i}": i for i in range(4, 60)})

    pth, conf = export_reference_checkpoint(
        params, cfg, vocab, str(tmp_path / "mtn"), reference_root=REF)
    assert pth.endswith("_best.pth.tar") and conf.endswith(".conf")

    # consumer 1: our importer — exact round trip
    params2, cfg2, vocab2 = import_reference_checkpoint(
        pth, conf, reference_root=REF)
    assert cfg2 == cfg and vocab2 == vocab
    leaves1 = jax.tree_util.tree_leaves_with_path(params)
    leaves2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    assert len(leaves1) == len(leaves2)
    for path, leaf in leaves1:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(leaves2[path]),
                                      err_msg=str(path))

    # consumer 2: the reference's own load path (generate.py:89-93) —
    # torch.load of the whole module + pickled (vocab, args), then forward
    sys.path.insert(0, REF)
    try:
        import data.dataset as ref_dataset
        model = torch.load(pth, map_location="cpu", weights_only=False)
    finally:
        sys.path.remove(REF)
    with open(conf, "rb") as f:
        vocab3, args = pickle.load(f)
    assert vocab3 == vocab and args.fea_type == ["resnext_st"]
    model.eval()

    B = 2

    def toks(L):
        x = rng.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, c, t = toks(5), toks(7), toks(4), toks(6)
    fts = rng.standard_normal((B, 3, 4, 24)).astype(np.float32)
    ref_batch = ref_dataset.Batch(
        torch.from_numpy(q), torch.from_numpy(h_), [fts],
        torch.from_numpy(c), torch.from_numpy(t), torch.from_numpy(t),
        PAD, ["v0", "v1"], [0, 1])
    with torch.no_grad():
        ft = model.forward(ref_batch)
        ref_logp = model.generator(ft, ref_batch, args).numpy()
    our_batch = Batch(query=q.astype(np.int32), his=h_.astype(np.int32),
                      trg=t.astype(np.int32), trg_y=t.astype(np.int32),
                      cap=c.astype(np.int32), fts=fts, audio_fts=None)
    our_logp, _ = forward_logprobs(params, cfg, our_batch, rngs=None)
    np.testing.assert_allclose(np.asarray(our_logp), ref_logp,
                               rtol=5e-4, atol=5e-4)


def test_convert_cli_both_directions(tmp_path):
    """python -m bist_tpu.convert: native → reference → native round trip
    through the CLI entry, params leaf-identical at the end."""
    import types as _types

    import jax
    import jax.numpy as jnp

    from bist_tpu.config import ModelConfig, TrainConfig, save_conf
    from bist_tpu.convert import _main
    from bist_tpu.models.model import init_model
    from bist_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from bist_tpu.train.schedule import make_optimizer

    cfg = ModelConfig(vocab_size=60, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(24,))
    tcfg = TrainConfig()
    params = init_model(jax.random.PRNGKey(5), cfg)
    vocab = {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3}
    vocab.update({f"w{i}": i for i in range(4, 60)})

    native = str(tmp_path / "a" / "mtn")
    os.makedirs(os.path.dirname(native))
    save_conf(native + ".conf", vocab, cfg, tcfg,
              {"fea_type": ["resnext_st"]})
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps, tcfg.noam_factor,
                        tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
    save_checkpoint(native + "_best", _types.SimpleNamespace(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32)))

    # no pre-created output dir: to-reference must mkdir it (round-4 review)
    ref = str(tmp_path / "b" / "mtn")
    _main(["to-reference", native, ref, "--reference-root", REF])
    assert os.path.exists(ref + "_best.pth.tar")

    back = str(tmp_path / "c" / "mtn")
    _main(["to-native", ref + "_best", back, "--reference-root", REF])
    payload = load_checkpoint(back + "_best")

    import numpy as np

    l1 = jax.tree_util.tree_leaves_with_path(params)
    l2 = dict(jax.tree_util.tree_leaves_with_path(payload["params"]))
    assert len(l1) == len(l2)
    for path, leaf in l1:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(l2[path]), err_msg=str(path))


def test_default_conf_for_every_model_form():
    """Every advertised --model form resolves to <prefix>.conf — the CLIs
    (generate/serve/train --init-from-ref) derive their default conf path
    from this helper, so `--model exps/mtn_best` must not look for
    exps/mtn_best.conf (round-4 review finding)."""
    from bist_tpu.convert import default_conf_for

    assert default_conf_for("exps/mtn") == "exps/mtn.conf"
    assert default_conf_for("exps/mtn_best") == "exps/mtn.conf"
    assert default_conf_for("exps/mtn_best.pth.tar") == "exps/mtn.conf"
    assert default_conf_for("exps/mtn.pth.tar") == "exps/mtn.conf"
