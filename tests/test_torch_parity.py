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

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                                reason="reference tree not available")

import jax
import jax.numpy as jnp

from bist_tpu.config import ModelConfig
from bist_tpu.convert import build_reference_model, ref_args_from_config
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import forward_logprobs, init_model
from bist_tpu.vocab import PAD


# the reverse-migration walkers moved into the library proper (round 4:
# bist_tpu/convert.py export_reference_checkpoint); this file keeps its
# historical names as aliases — the forward-equality assertions below remain
# the oracle that proves the shared walkers correct
make_ref_args = ref_args_from_config


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


def build_ref_model_with_our_params(ref_mtn, cfg, params):
    args = make_ref_args(cfg)
    model = build_reference_model(params, cfg, ref_mtn=ref_mtn, args=args)
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


# ---------------------------------------------------------------------------
# Fusion-mode parity matrix (round 4): every combine-mode combination the
# REFERENCE can actually run, forward-compared at 5e-4.  Modes where the
# reference crashes are documented in SURVEY §7 / bist.py:12-17 and covered
# by our own self-consistency tests instead (test_model_forward).
# nb=1 where the reference's grid-clobbering bug forbids deeper stacks
# (decoder.py:117-129 writes the fused grid back over ft, so a second
# v-layer reads a (B,L,D) tensor where it expects (B,T,S,D)).
# ---------------------------------------------------------------------------

FUSION_MATRIX = [
    # (enc_st, enc_vc, dec_st, t2s, s2t, nb_blocks)
    ("dyn", "dyn", "seq", True, True, 1),
    # early_* fuse INSIDE the vid layer; the reference's vc fusion paths
    # read temporal_ft/spatial_ft which early_* never sets (decoder.py:
    # 123 vs 146-152 — a latent KeyError), so the only reference-runnable
    # vc mode there is 'none' (mm layer reads spatiotemporal_ft directly,
    # decoder.py:53-55).  early_* + vc dyn is OUR clean-semantics
    # extension (2-way sigmoid like sum/dyn), self-tested only.  nb=1:
    # like sum/dyn, early_* seeds the next vid layer's in_ft with the
    # 3-D fused tensor, so layer 2's temporal2spatial permute crashes
    # (encoder.py:111, the same clobbering family).
    ("early_sum", "none", "seq", True, True, 1),
    ("early_dyn", "none", "seq", True, True, 1),
    ("none", "none", "seq", True, True, 2),
    ("none", "sum", "seq", True, True, 2),
    ("none", "dyn", "sum", True, True, 2),     # parallel-sum mm combine
    ("none", "dyn", "seq", True, False, 2),    # t2s only
    ("none", "dyn", "seq", False, True, 2),    # s2t only
]


@pytest.mark.parametrize("enc_st,enc_vc,dec_st,t2s,s2t,nb", FUSION_MATRIX)
def test_forward_parity_fusion_matrix(ref_modules, rng, enc_st, enc_vc,
                                      dec_st, t2s, s2t, nb):
    import torch

    ref_mtn, ref_dataset = ref_modules
    cfg = ModelConfig(vocab_size=60, nb_blocks=nb, nb_venc_blocks=nb,
                      nb_cenc_blocks=nb, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(24,), enc_st_combine=enc_st,
                      enc_vc_combine=enc_vc, dec_st_combine=dec_st,
                      t2s=t2s, s2t=s2t)
    params = init_model(jax.random.PRNGKey(13), cfg)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params)

    B = 2

    def toks(L):
        x = rng.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, c, t = toks(5), toks(7), toks(4), toks(6)
    fts = rng.standard_normal((B, 3, 4, 24)).astype(np.float32)
    fts[:, -1] = 0.0
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


AUDIO_MATRIX = [
    # (include_caption, nb_cenc, enc_vc, ptr_ft)
    # vc 'sum' with audio: the reference SUMS only temporal+spatial+cap
    # (decoder.py:140) — audio_ft feeds the AE loss but not encoded_ft;
    # parity here proves we reproduce that quirk rather than "fixing" it
    ("summary", 2, "sum", "query,cap"),
    # no caption at all: vid+audio through the v>0,c==0 dyn gate
    # (decoder.py:168-181); needs ptr_ft=query — the reference's
    # MultiPointerGenerator crashes pointing at an absent caption
    ("none", 0, "dyn", "query"),
]


@pytest.mark.parametrize("inc_cap,nb_cenc,enc_vc,ptr_ft", AUDIO_MATRIX)
def test_forward_parity_audio_matrix(ref_modules, rng, inc_cap, nb_cenc,
                                     enc_vc, ptr_ft):
    import torch

    ref_mtn, ref_dataset = ref_modules
    cfg = ModelConfig(vocab_size=60, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=nb_cenc, nb_aenc_blocks=2, d_model=16,
                      att_h=2, dropout=0.0, include_caption=inc_cap,
                      separate_caption=(inc_cap != "none"),
                      ft_sizes=(24, 12), enc_st_combine="none",
                      enc_vc_combine=enc_vc, dec_st_combine="seq",
                      ptr_ft=ptr_ft)
    params = init_model(jax.random.PRNGKey(17), cfg)
    model, args = build_ref_model_with_our_params(ref_mtn, cfg, params)

    B = 2

    def toks(L):
        x = rng.integers(4, 60, size=(B, L)).astype(np.int64)
        x[:, -1] = PAD
        return x

    q, h_, t, ty = toks(5), toks(7), toks(6), toks(6)
    c = toks(4) if inc_cap != "none" else None
    fts = rng.standard_normal((B, 3, 4, 24)).astype(np.float32)
    audio = rng.standard_normal((B, 5, 12)).astype(np.float32)
    audio[:, -1] = 0.0
    ref_batch = ref_dataset.Batch(_t(q), _t(h_), [fts],
                                  _t(c) if c is not None else None,
                                  _t(t), _t(ty), PAD, ["v0", "v1"], [0, 1],
                                  audio_fts=[audio])
    with torch.no_grad():
        ft = model.forward(ref_batch)
        ref_logp = model.generator(ft, ref_batch, args).numpy()
    our_batch = Batch(query=q.astype(np.int32), his=h_.astype(np.int32),
                      trg=t.astype(np.int32), trg_y=ty.astype(np.int32),
                      cap=(c.astype(np.int32) if c is not None else None),
                      fts=fts, audio_fts=audio)
    our_logp, _ = forward_logprobs(params, cfg, our_batch, rngs=None)
    np.testing.assert_allclose(np.asarray(our_logp), ref_logp,
                               rtol=5e-4, atol=5e-4)
