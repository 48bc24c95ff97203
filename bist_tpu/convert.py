"""Import reference PyTorch checkpoints into bist_tpu.

The reference saves a whole pickled nn.Module per best epoch
(<model>_best.pth.tar, train.py:161) plus a pickled (vocab, argparse-args)
companion (<model>.conf, train.py:105-107).  This module converts both into
our formats so a user of the reference can carry trained models over:

    params, cfg, vocab = import_reference_checkpoint(
        "exps/mtn_best.pth.tar", "exps/mtn.conf",
        reference_root="/path/to/BiST")   # makes the pickled classes importable

Mapping is the exact inverse of the layout documented in
tests/test_torch_parity.py: torch Linear weights transpose to (in, out);
LayerNorm a_2/b_2 → scale/bias; the reference's index-counter sublayer lists
map to our named slots in wiring order (encoder.py:172-199, decoder.py:20-58).
"""

from __future__ import annotations

import pickle
import sys
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from bist_tpu.config import ModelConfig


def _np(x) -> np.ndarray:
    return x.detach().cpu().numpy()


def _linear(tl) -> Dict[str, np.ndarray]:
    return {"w": _np(tl.weight).T.copy(), "b": _np(tl.bias).copy()}


def _norm(tn) -> Dict[str, np.ndarray]:
    return {"scale": _np(tn.a_2).copy(), "bias": _np(tn.b_2).copy()}


def _mha(tm) -> Dict[str, Any]:
    keys = ("wq", "wk", "wv", "wo")
    return {k: _linear(tl) for k, tl in zip(keys, tm.linears)}


def _ffn(tf) -> Dict[str, Any]:
    return {"w1": _linear(tf.w_1), "w2": _linear(tf.w_2)}


def _vid_layer(tv, cfg: ModelConfig) -> Dict[str, Any]:
    attn_names: List[str] = []
    if cfg.t2s:
        attn_names += ["t2s_self", "t2s_hop1", "t2s_hop2"]
    if cfg.s2t:
        attn_names += ["s2t_self", "s2t_hop1", "s2t_hop2"]
    ff_names = (["t2s_ff"] if cfg.t2s else []) + (["s2t_ff"] if cfg.s2t else [])
    sub_names: List[str] = []
    if cfg.t2s:
        sub_names += ["t2s_self", "t2s_hop1", "t2s_hop2", "t2s_ff"]
    if cfg.s2t:
        sub_names += ["s2t_self", "s2t_hop1", "s2t_hop2", "s2t_ff"]
    p: Dict[str, Any] = {n: {} for n in set(attn_names + ff_names + sub_names)}
    for tm, n in zip(tv.attn, attn_names):
        p[n]["attn"] = _mha(tm)
    for tf, n in zip(tv.ff, ff_names):
        p[n]["ff"] = _ffn(tf)
    for ts, n in zip(tv.sublayer, sub_names):
        p[n]["norm"] = _norm(ts.norm)
    if hasattr(tv, "out_norm"):
        p["out_norm"] = _norm(tv.out_norm)
    if hasattr(tv, "st_combine_W"):
        p["st_combine_W"] = _linear(tv.st_combine_W)
    return p


def _ctx_layer(tc) -> Dict[str, Any]:
    return {
        "self": {"attn": _mha(tc.attn[0]), "norm": _norm(tc.sublayer[0].norm)},
        "cross": {"attn": _mha(tc.attn[1]), "norm": _norm(tc.sublayer[1].norm)},
        "ff": {"ff": _ffn(tc.ff), "norm": _norm(tc.sublayer[2].norm)},
    }


def _mm_layer(tm, cfg: ModelConfig) -> Dict[str, Any]:
    from bist_tpu.models.bist import mm_layer_cross_slots

    names = ["self", "his", "query"] + [s[0] for s in mm_layer_cross_slots(cfg)]
    p: Dict[str, Any] = {}
    for t, n in zip(tm.attn, names):
        p[n] = {"attn": _mha(t)}
    for ts, n in zip(tm.sublayer, names + ["ff"]):
        p.setdefault(n, {})["norm"] = _norm(ts.norm)
    p["ff"]["ff"] = _ffn(tm.ff)
    return p


def config_from_ref_args(args, vocab_size: int,
                         ft_sizes: Tuple[int, ...]) -> ModelConfig:
    """Reference argparse namespace → ModelConfig (with the reference's
    hasattr-guard defaults for older checkpoints, e.g. decoder.py:27)."""
    g = lambda k, d: getattr(args, k, d)
    return ModelConfig(
        vocab_size=vocab_size,
        nb_blocks=g("nb_blocks", 6),
        nb_venc_blocks=g("nb_venc_blocks", 0),
        nb_cenc_blocks=g("nb_cenc_blocks", 0),
        nb_aenc_blocks=g("nb_aenc_blocks", 0),
        d_model=g("d_model", 512),
        att_h=g("att_h", 8),
        dropout=g("dropout", 0.1),
        ptr_gen=bool(g("ptr_gen", 1)),
        ptr_ft=g("ptr_ft", "query,cap"),
        mask_unk=bool(g("mask_unk", 1)),
        dec_st_combine=g("dec_st_combine", "seq"),
        enc_st_combine=g("enc_st_combine", "none"),
        enc_vc_combine=g("enc_vc_combine", "dyn"),
        auto_encoder=bool(g("auto_encoder", 1)),
        t2s=bool(g("t2s", 1)),
        s2t=bool(g("s2t", 1)),
        include_caption=g("include_caption", "none"),
        separate_caption=bool(g("separate_caption", 1)),
        ft_sizes=ft_sizes)


def params_from_torch_model(model, cfg: ModelConfig) -> Dict[str, Any]:
    """Walk a reference MTN module → our params pytree."""
    params: Dict[str, Any] = {
        "embed": {"lut": _np(model.query_embed[0].lut.weight).copy()},
        "text_enc": {"norms": [_norm(model.text_encoder.norm[i])
                               for i in range(3)]},
    }
    vid_enc: Dict[str, Any] = {}
    if cfg.has_video and getattr(model.vid_encoder, "v_N", 0) > 0:
        vid_enc["W"] = _linear(model.vid_encoder.W)
        vid_enc["in_norm"] = _norm(model.vid_encoder.in_norm)
    if cfg.has_audio and getattr(model.vid_encoder, "a_N", 0) > 0:
        vid_enc["a_W"] = _linear(model.vid_encoder.a_W)
        vid_enc["a_in_norm"] = _norm(model.vid_encoder.a_in_norm)
    params["vid_enc"] = vid_enc

    tdec = model.mutlimodal_decoder
    dec: Dict[str, Any] = {
        "mm_layers": [_mm_layer(l, cfg) for l in tdec.layers],
        "norm": _norm(tdec.norm),
    }
    if cfg.nb_venc_blocks > 0:
        dec["v_layers"] = [_vid_layer(l, cfg) for l in tdec.v_layers]
        if hasattr(tdec, "temporal_out_norm"):
            dec["temporal_out_norm"] = _norm(tdec.temporal_out_norm)
        if hasattr(tdec, "spatial_out_norm"):
            dec["spatial_out_norm"] = _norm(tdec.spatial_out_norm)
        if hasattr(tdec, "out_norm"):
            dec["out_norm"] = _norm(tdec.out_norm)
        if hasattr(tdec, "st_combine_W"):
            dec["st_combine_W"] = _linear(tdec.st_combine_W)
    if cfg.use_cap_layers:
        dec["c_layers"] = [_ctx_layer(l) for l in tdec.c_layers]
        dec["cap_out_norm"] = _norm(tdec.cap_out_norm)
    if cfg.nb_aenc_blocks > 0:
        dec["a_layers"] = [_ctx_layer(l) for l in tdec.a_layers]
        dec["a_out_norm"] = _norm(tdec.a_out_norm)
    if hasattr(tdec, "vc_combine_W"):
        dec["vc_combine_W"] = _linear(tdec.vc_combine_W)
    params["decoder"] = dec

    gen: Dict[str, Any] = {}
    if cfg.ptr_gen:
        gen["pointer_attn"] = [_mha(a) for a in model.generator.pointer_attn] \
            if len(cfg.ptr_ft_list) > 1 else [_mha(model.generator.pointer_attn)]
        gen["pointer_gen_W"] = _linear(model.generator.pointer_gen_W)
    params["gen"] = gen

    import jax.numpy as jnp

    return __import__("jax").tree_util.tree_map(jnp.asarray, params)


def import_reference_checkpoint(pth_path: str, conf_path: str,
                                reference_root: Optional[str] = None):
    """(params, ModelConfig, vocab) from a reference .pth.tar + .conf.

    `reference_root` must point at a checkout of the reference repo so the
    pickled module classes resolve (torch.save stored the whole module)."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # reference hard-codes .cuda()
    with open(conf_path, "rb") as f:
        vocab, train_args = pickle.load(f)
    if reference_root:
        sys.path.insert(0, reference_root)
    try:
        model = torch.load(pth_path, map_location="cpu", weights_only=False)
    finally:
        if reference_root:
            sys.path.remove(reference_root)
    model = getattr(model, "module", model)   # unwrap DataParallel
    model.eval()

    ft_sizes = []
    if getattr(model.vid_encoder, "v_N", 0) > 0 and model.vid_encoder.W is not None:
        ft_sizes.append(model.vid_encoder.W.in_features)
    if getattr(model.vid_encoder, "a_N", 0) > 0 and \
            getattr(model.vid_encoder, "a_W", None) is not None:
        ft_sizes.append(model.vid_encoder.a_W.in_features)
    cfg = config_from_ref_args(train_args, len(vocab), tuple(ft_sizes))
    params = params_from_torch_model(model, cfg)
    return params, cfg, vocab
