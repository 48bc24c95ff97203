"""Forward-pass parity against the ACTUAL reference PyTorch model.

Imports the reference implementation from /root/reference (read-only), builds
it at a small test configuration, copies OUR initialised parameters into it,
and asserts the full forward + generator log-probabilities agree to fp32
tolerance.  This is the end-to-end numerical-parity oracle for the "CIDEr
within 0.5%" target: identical weights ⇒ identical predictions.

Skipped when the reference tree is unavailable.  No reference code is copied —
it is imported in place purely as a test oracle."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                                reason="reference tree not available")

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import forward_logprobs, init_model
from bist_tpu.vocab import PAD


def make_ref_args(cfg: ModelConfig):
    a = types.SimpleNamespace()
    a.nb_blocks = cfg.nb_blocks
    a.nb_venc_blocks = cfg.nb_venc_blocks
    a.nb_cenc_blocks = cfg.nb_cenc_blocks
    a.nb_aenc_blocks = cfg.nb_aenc_blocks
    a.d_model = cfg.d_model
    a.att_h = cfg.att_h
    a.dropout = cfg.dropout
    a.ptr_gen = cfg.ptr_gen
    a.ptr_ft = cfg.ptr_ft
    a.mask_unk = cfg.mask_unk
    a.dec_st_combine = cfg.dec_st_combine
    a.enc_st_combine = cfg.enc_st_combine
    a.enc_vc_combine = cfg.enc_vc_combine
    a.auto_encoder = cfg.auto_encoder
    a.t2s = 1 if cfg.t2s else 0
    a.s2t = 1 if cfg.s2t else 0
    a.include_caption = cfg.include_caption
    a.separate_caption = cfg.separate_caption
    # encoder.py:84 reads the UNDEFINED args.noW_venc on the audio path (a
    # latent AttributeError in the reference, SURVEY §2.1 #9) — define the
    # only value under which the reference runs at all
    a.noW_venc = False
    return a


@pytest.fixture(scope="module")
def ref_modules():
    import torch

    # the reference generator hard-codes .cuda() (generator.py:66,113)
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        import model.mtn as ref_mtn
        import data.dataset as ref_dataset
    finally:
        sys.path.remove(REF)
    return ref_mtn, ref_dataset


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x))


def copy_linear(tl, p):
    import torch

    with torch.no_grad():
        tl.weight.copy_(_t(p["w"]).T)
        tl.bias.copy_(_t(p["b"]))


def copy_norm(tn, p):
    import torch

    with torch.no_grad():
        tn.a_2.copy_(_t(p["scale"]))
        tn.b_2.copy_(_t(p["bias"]))


def copy_mha(tm, p):
    for tl, key in zip(tm.linears, ("wq", "wk", "wv", "wo")):
        copy_linear(tl, p[key])


def copy_ffn(tf, p):
    copy_linear(tf.w_1, p["w1"])
    copy_linear(tf.w_2, p["w2"])


def copy_vid_layer(tv, p, cfg):
    # attn order [t2s_self, t2s_hop1, t2s_hop2, s2t_self, s2t_hop1, s2t_hop2],
    # ff [t2s_ff, s2t_ff], sublayer norms interleaved (encoder.py:172-199)
    names = []
    if cfg.t2s:
        names += ["t2s_self", "t2s_hop1", "t2s_hop2"]
    if cfg.s2t:
        names += ["s2t_self", "s2t_hop1", "s2t_hop2"]
    for tm, n in zip(tv.attn, names):
        copy_mha(tm, p[n]["attn"])
    ffs = (["t2s_ff"] if cfg.t2s else []) + (["s2t_ff"] if cfg.s2t else [])
    for tf, n in zip(tv.ff, ffs):
        copy_ffn(tf, p[n]["ff"])
    subs = []
    if cfg.t2s:
        subs += ["t2s_self", "t2s_hop1", "t2s_hop2", "t2s_ff"]
    if cfg.s2t:
        subs += ["s2t_self", "s2t_hop1", "s2t_hop2", "s2t_ff"]
    for ts, n in zip(tv.sublayer, subs):
        copy_norm(ts.norm, p[n]["norm"])
    if cfg.enc_st_combine in ("early_sum", "early_dyn") and cfg.both_directions:
        copy_norm(tv.out_norm, p["out_norm"])
        if cfg.enc_st_combine == "early_dyn":
            copy_linear(tv.st_combine_W, p["st_combine_W"])


def copy_ctx_layer(tc, p):
    copy_mha(tc.attn[0], p["self"]["attn"])
    copy_mha(tc.attn[1], p["cross"]["attn"])
    copy_ffn(tc.ff, p["ff"]["ff"])
    for ts, n in zip(tc.sublayer, ("self", "cross", "ff")):
        copy_norm(ts.norm, p[n]["norm"])


def copy_mm_layer(tm, p, cfg):
    from bist_tpu.models.bist import mm_layer_cross_slots

    slot_names = [s[0] for s in mm_layer_cross_slots(cfg)]
    names = ["self", "his", "query"] + slot_names
    for t, n in zip(tm.attn, names):
        copy_mha(t, p[n]["attn"])
    copy_ffn(tm.ff, p["ff"]["ff"])
    for ts, n in zip(tm.sublayer, names + ["ff"]):
        copy_norm(ts.norm, p[n]["norm"])


def build_ref_model_with_our_params(ref_mtn, cfg, params):
    import torch

    args = make_ref_args(cfg)
    model = ref_mtn.make_model(cfg.vocab_size, cfg.vocab_size, args,
                               ft_sizes=list(cfg.ft_sizes))
    model.eval()
    with torch.no_grad():
        model.query_embed[0].lut.weight.copy_(_t(params["embed"]["lut"]))
    # text encoder norms (index advance over non-None: query, cap, his)
    norms = params["text_enc"]["norms"]
    for i in range(3):
        copy_norm(model.text_encoder.norm[i], norms[i])
    if cfg.has_video:
        copy_linear(model.vid_encoder.W, params["vid_enc"]["W"])
        copy_norm(model.vid_encoder.in_norm, params["vid_enc"]["in_norm"])
    if cfg.has_audio:
        copy_linear(model.vid_encoder.a_W, params["vid_enc"]["a_W"])
        copy_norm(model.vid_encoder.a_in_norm, params["vid_enc"]["a_in_norm"])
    dec = params["decoder"]
    tdec = model.mutlimodal_decoder
    for n in range(cfg.nb_blocks):
        copy_mm_layer(tdec.layers[n], dec["mm_layers"][n], cfg)
        if cfg.nb_venc_blocks > 0:
            copy_vid_layer(tdec.v_layers[n], dec["v_layers"][n], cfg)
        if cfg.use_cap_layers:
            copy_ctx_layer(tdec.c_layers[n], dec["c_layers"][n])
        if cfg.nb_aenc_blocks > 0:
            copy_ctx_layer(tdec.a_layers[n], dec["a_layers"][n])
    copy_norm(tdec.norm, dec["norm"])
    if cfg.nb_venc_blocks > 0 and (cfg.enc_st_combine == "none"
                                   or not cfg.both_directions):
        if cfg.s2t:
            copy_norm(tdec.temporal_out_norm, dec["temporal_out_norm"])
        if cfg.t2s:
            copy_norm(tdec.spatial_out_norm, dec["spatial_out_norm"])
    if cfg.use_cap_layers:
        copy_norm(tdec.cap_out_norm, dec["cap_out_norm"])
    if cfg.nb_aenc_blocks > 0:
        copy_norm(tdec.a_out_norm, dec["a_out_norm"])
    if cfg.nb_venc_blocks > 0 and cfg.use_cap_layers \
            and cfg.enc_vc_combine == "dyn":
        copy_linear(tdec.vc_combine_W, dec["vc_combine_W"])
    # generator (MultiPointerGenerator)
    if cfg.ptr_gen and len(cfg.ptr_ft_list) > 1:
        for i in range(len(cfg.ptr_ft_list)):
            copy_mha(model.generator.pointer_attn[i],
                     params["gen"]["pointer_attn"][i])
        copy_linear(model.generator.pointer_gen_W,
                    params["gen"]["pointer_gen_W"])
    return model, args


def test_forward_matches_reference(ref_modules, rng):
    import torch

    ref_mtn, ref_dataset = ref_modules
    cfg = ModelConfig(vocab_size=60, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(24,), enc_st_combine="none",
                      enc_vc_combine="dyn", dec_st_combine="seq")
    params = init_model(jax.random.PRNGKey(7), cfg)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params)

    B, Lq, Lh, Lc, Lt, T, S = 2, 5, 7, 4, 6, 3, 4

    def toks(L):
        x = rng.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, c, t = toks(Lq), toks(Lh), toks(Lc), toks(Lt)
    ty = toks(Lt)
    fts = rng.standard_normal((B, T, S, 24)).astype(np.float32)
    fts[:, -1] = 0.0

    ref_batch = ref_dataset.Batch(
        _t(q), _t(h_), [fts], _t(c), _t(t), _t(ty), PAD,
        ["v0", "v1"], [0, 1])
    with torch.no_grad():
        ft = model.forward(ref_batch)
        ref_logp = model.generator(ft, ref_batch, args).numpy()

    our_batch = Batch(query=q.astype(np.int32), his=h_.astype(np.int32),
                      trg=t.astype(np.int32), trg_y=ty.astype(np.int32),
                      cap=c.astype(np.int32), fts=fts, audio_fts=None)
    our_logp, _ = forward_logprobs(params, cfg, our_batch, rngs=None)

    np.testing.assert_allclose(np.asarray(our_logp), ref_logp,
                               rtol=5e-4, atol=5e-4)


def test_forward_matches_reference_fusion_variants(ref_modules, rng):
    """Same parity at enc_st_combine=sum (single layer — the reference
    crashes with >1 layer there, SURVEY §7 quirks) and ptr single-source."""
    import torch

    ref_mtn, ref_dataset = ref_modules
    cfg = ModelConfig(vocab_size=60, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(24,), enc_st_combine="sum",
                      enc_vc_combine="dyn", dec_st_combine="seq")
    params = init_model(jax.random.PRNGKey(9), cfg)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params)
    import torch

    dec = params["decoder"]
    tdec = model.mutlimodal_decoder
    copy_norm(tdec.out_norm, dec["out_norm"])
    copy_linear(tdec.vc_combine_W, dec["vc_combine_W"])

    B = 2
    rngl = rng

    def toks(L):
        x = rngl.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, c, t = toks(5), toks(7), toks(4), toks(6)
    fts = rngl.standard_normal((B, 3, 4, 24)).astype(np.float32)
    ref_batch = ref_dataset.Batch(_t(q), _t(h_), [fts], _t(c), _t(t), _t(t),
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


def test_forward_matches_reference_with_audio(ref_modules, rng):
    """Audio path parity: VGGish projection (a_W/a_in_norm), AudioEncoderLayer
    stack, the 4-way dyn fusion (temporal/spatial/cap/audio, decoder.py:167)
    and the audio cross-attention in the response layer — vs the actual
    reference model.  (The reference only runs here with noW_venc injected;
    encoder.py:84 reads that undefined flag.)"""
    import torch

    ref_mtn, ref_dataset = ref_modules
    cfg = ModelConfig(vocab_size=60, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, nb_aenc_blocks=2, d_model=16,
                      att_h=2, dropout=0.0, include_caption="summary",
                      separate_caption=True, ft_sizes=(24, 12),
                      enc_st_combine="none", enc_vc_combine="dyn",
                      dec_st_combine="seq")
    params = init_model(jax.random.PRNGKey(11), cfg)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params)

    B, Lq, Lh, Lc, Lt, T, S, Ta = 2, 5, 7, 4, 6, 3, 4, 5

    def toks(L):
        x = rng.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, c, t, ty = toks(Lq), toks(Lh), toks(Lc), toks(Lt), toks(Lt)
    fts = rng.standard_normal((B, T, S, 24)).astype(np.float32)
    audio = rng.standard_normal((B, Ta, 12)).astype(np.float32)
    audio[:, -1] = 0.0   # padded audio step → audio_mask coverage

    # ref Batch wants audio as a LIST of numpy arrays (dataset.py:86)
    ref_batch = ref_dataset.Batch(_t(q), _t(h_), [fts], _t(c), _t(t), _t(ty),
                                  PAD, ["v0", "v1"], [0, 1],
                                  audio_fts=[audio])
    with torch.no_grad():
        ft = model.forward(ref_batch)
        ref_logp = model.generator(ft, ref_batch, args).numpy()

    our_batch = Batch(query=q.astype(np.int32), his=h_.astype(np.int32),
                      trg=t.astype(np.int32), trg_y=ty.astype(np.int32),
                      cap=c.astype(np.int32), fts=fts, audio_fts=audio)
    our_logp, _ = forward_logprobs(params, cfg, our_batch, rngs=None)
    np.testing.assert_allclose(np.asarray(our_logp), ref_logp,
                               rtol=5e-4, atol=5e-4)


def test_forward_matches_reference_parallel_sum(ref_modules, rng):
    """dec_st_combine='sum' parity: the response layer's parallel-sum video
    branch (both temporal and spatial cross-attentions read the same input
    and add, decoder.py:44-51) vs the actual reference model."""
    import torch

    ref_mtn, ref_dataset = ref_modules
    cfg = ModelConfig(vocab_size=60, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(24,), enc_st_combine="none",
                      enc_vc_combine="none", dec_st_combine="sum")
    params = init_model(jax.random.PRNGKey(13), cfg)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params)

    B = 2

    def toks(L):
        x = rng.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, c, t, ty = toks(5), toks(7), toks(4), toks(6), toks(6)
    fts = rng.standard_normal((B, 3, 4, 24)).astype(np.float32)
    ref_batch = ref_dataset.Batch(_t(q), _t(h_), [fts], _t(c), _t(t), _t(ty),
                                  PAD, ["v0", "v1"], [0, 1])
    with torch.no_grad():
        ft = model.forward(ref_batch)
        ref_logp = model.generator(ft, ref_batch, args).numpy()
    our_batch = Batch(query=q.astype(np.int32), his=h_.astype(np.int32),
                      trg=t.astype(np.int32), trg_y=ty.astype(np.int32),
                      cap=c.astype(np.int32), fts=fts, audio_fts=None)
    our_logp, _ = forward_logprobs(params, cfg, our_batch, rngs=None)
    np.testing.assert_allclose(np.asarray(our_logp), ref_logp,
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("combine", ["early_sum", "early_dyn"])
def test_forward_matches_reference_early_fusion(ref_modules, rng, combine):
    """early_sum / early_dyn in-layer fusion parity (encoder.py:190-199):
    the learned sigmoid gate weights t2s first — vs the actual reference at
    ONE block (the reference overwrites its own (B,T,S,D) grid with the
    fused (B,Lq,D) features under early_*, decoder.py:123-124, so >1 block
    crashes there; we define the grid as layer-invariant)."""
    import torch

    ref_mtn, ref_dataset = ref_modules
    cfg = ModelConfig(vocab_size=60, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(24,), enc_st_combine=combine,
                      enc_vc_combine="none", dec_st_combine="seq")
    params = init_model(jax.random.PRNGKey(17), cfg)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params)

    B = 2

    def toks(L):
        x = rng.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, c, t, ty = toks(5), toks(7), toks(4), toks(6), toks(6)
    fts = rng.standard_normal((B, 3, 4, 24)).astype(np.float32)
    ref_batch = ref_dataset.Batch(_t(q), _t(h_), [fts], _t(c), _t(t), _t(ty),
                                  PAD, ["v0", "v1"], [0, 1])
    with torch.no_grad():
        ft = model.forward(ref_batch)
        ref_logp = model.generator(ft, ref_batch, args).numpy()
    our_batch = Batch(query=q.astype(np.int32), his=h_.astype(np.int32),
                      trg=t.astype(np.int32), trg_y=ty.astype(np.int32),
                      cap=c.astype(np.int32), fts=fts, audio_fts=None)
    our_logp, _ = forward_logprobs(params, cfg, our_batch, rngs=None)
    np.testing.assert_allclose(np.asarray(our_logp), ref_logp,
                               rtol=5e-4, atol=5e-4)
