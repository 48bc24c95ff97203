"""Shape/finiteness tests for the full model forward + incremental decode
consistency (cached decode_step must match the full training forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bist_tpu.config import ModelConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.model import (
    apply_model, build_masks, decode_step, forward_logprobs, init_cache,
    init_model, precompute_decode_ctx,
)
from bist_tpu.vocab import PAD


def tiny_cfg(**kw):
    base = dict(vocab_size=50, nb_blocks=2, nb_venc_blocks=2, nb_cenc_blocks=2,
                nb_aenc_blocks=0, d_model=16, att_h=2, dropout=0.1,
                include_caption="summary", separate_caption=True,
                ft_sizes=(24,), enc_st_combine="none", enc_vc_combine="dyn",
                dec_st_combine="seq")
    base.update(kw)
    return ModelConfig(**base)


def tiny_batch(rng, B=2, Lq=5, Lh=7, Lc=4, Lt=6, T=3, S=4, Dv=24, Da=12,
               with_cap=True, with_fts=True, with_audio=False):
    def toks(L):
        x = rng.integers(4, 50, size=(B, L)).astype(np.int32)
        x[:, -1] = PAD  # some padding
        return x

    fts = None
    if with_fts:
        fts = rng.standard_normal((B, T, S, Dv)).astype(np.float32)
        fts[:, -1] = 0.0  # padded temporal step
    audio = rng.standard_normal((B, T, Da)).astype(np.float32) if with_audio else None
    return Batch(query=toks(Lq), his=toks(Lh), trg=toks(Lt), trg_y=toks(Lt),
                 cap=toks(Lc) if with_cap else None, fts=fts, audio_fts=audio)


CFG_VARIANTS = [
    {},                                                   # default: none/dyn/seq
    {"enc_st_combine": "sum"},
    {"enc_st_combine": "dyn"},
    {"enc_st_combine": "early_sum"},
    {"enc_st_combine": "early_dyn"},
    {"enc_vc_combine": "sum"},
    {"enc_vc_combine": "none"},
    {"dec_st_combine": "sum"},
    {"t2s": False},
    {"s2t": False},
    {"nb_venc_blocks": 0, "ft_sizes": ()},                # no video
    {"nb_cenc_blocks": 0, "enc_vc_combine": "none"},      # no caption layers
    {"ptr_gen": False},
    {"ptr_ft": "query"},
    {"ptr_ft": "query+cap"},               # single concat source (generator.py:52-56)
    {"ptr_ft": "his"},                     # history pointer source
    {"ptr_ft": "query,cap,his"},           # triple multi-pointer
    {"include_caption": "summary", "separate_caption": False,
     "nb_cenc_blocks": 0, "enc_vc_combine": "none", "ptr_ft": "query"},
    {"nb_aenc_blocks": 2, "ft_sizes": (24, 12)},          # with audio
]


@pytest.mark.parametrize("kw", CFG_VARIANTS)
def test_forward_shapes(kw, rng):
    cfg = tiny_cfg(**kw)
    with_audio = cfg.nb_aenc_blocks > 0
    batch = tiny_batch(rng, with_audio=with_audio,
                       with_fts=cfg.nb_venc_blocks > 0)
    params = init_model(jax.random.PRNGKey(0), cfg)
    logp, ft = forward_logprobs(params, cfg, batch, rngs=None)
    assert logp.shape == (2, 6, 50)
    assert np.all(np.isfinite(np.asarray(logp)))
    # log-probs: logsumexp ≈ 0 for every position
    lse = jax.nn.logsumexp(logp, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=5e-3)
    assert ft["decoded_text"].shape == (2, 6, 16)


@pytest.mark.parametrize("kw", CFG_VARIANTS)
def test_incremental_decode_matches_full_forward(kw, rng):
    """decode_step over positions must reproduce the training-path forward
    (eval mode) on the same prefix — across EVERY fusion/pointer/audio
    variant, since the cached decode path re-implements the decoder
    incrementally (any variant it mishandles would silently corrupt
    generation for that configuration only)."""
    cfg = tiny_cfg(**kw)
    B, Lt = 2, 6
    batch = tiny_batch(rng, B=B, Lt=Lt, with_fts=cfg.nb_venc_blocks > 0,
                       with_audio=cfg.nb_aenc_blocks > 0)
    # use a fully valid target so causal positions match
    trg = rng.integers(4, 50, size=(B, Lt)).astype(np.int32)
    batch = batch._replace(trg=trg, trg_y=trg)
    params = init_model(jax.random.PRNGKey(1), cfg)

    full_logp, _ = forward_logprobs(params, cfg, batch, rngs=None)

    ctx = precompute_decode_ctx(params, cfg, batch)
    cache = init_cache(cfg, B, Lt)
    step_logps = []
    for pos in range(Lt):
        logp, cache = decode_step(params, cfg, ctx, cache,
                                  jnp.asarray(trg[:, pos]), pos)
        step_logps.append(np.asarray(logp))
    step_logps = np.stack(step_logps, axis=1)  # (B, Lt, V)
    np.testing.assert_allclose(step_logps, np.asarray(full_logp),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kw", [{}, {"ptr_gen": False},
                                {"ptr_ft": "query+cap"},
                                {"nb_aenc_blocks": 2, "ft_sizes": (24, 12)}])
def test_decode_step_beam_fold_equivalence(kw, rng):
    """decode_step(beam=K) folds K hypothesis rows per batch element into
    the cross-attention query axis against a SHARED context.  Feeding K
    DISTINCT tokens per batch element must produce exactly what K separate
    beam=1 contexts would — the folding is a layout change, not a math
    change (the beam-search parity test covers this e2e; this isolates the
    fold across generator/fusion variants)."""
    cfg = tiny_cfg(**kw)
    B, K, Lmax = 2, 3, 4
    batch = tiny_batch(rng, B=B, with_fts=cfg.nb_venc_blocks > 0,
                       with_audio=cfg.nb_aenc_blocks > 0)
    params = init_model(jax.random.PRNGKey(2), cfg)
    ctx = precompute_decode_ctx(params, cfg, batch)

    toks = rng.integers(4, 50, size=(2, B, K)).astype(np.int32)  # 2 steps
    # folded: B·K rows against the B-row ctx
    cache = init_cache(cfg, B * K, Lmax)
    folded = []
    for pos in range(2):
        logp, cache = decode_step(params, cfg, ctx, cache,
                                  jnp.asarray(toks[pos].reshape(B * K)),
                                  pos, beam=K)
        folded.append(np.asarray(logp).reshape(B, K, -1))

    # reference: each (b, k) hypothesis decoded alone (beam=1, batch of 1)
    for b in range(B):
        one = Batch(*[None if x is None else x[b:b + 1] for x in batch])
        ctx1 = precompute_decode_ctx(params, cfg, one)
        for k in range(K):
            cache1 = init_cache(cfg, 1, Lmax)
            for pos in range(2):
                lp1, cache1 = decode_step(
                    params, cfg, ctx1, cache1,
                    jnp.asarray(toks[pos, b, k:k + 1]), pos)
                np.testing.assert_allclose(folded[pos][b, k],
                                           np.asarray(lp1[0]),
                                           rtol=2e-4, atol=2e-5)


def test_config_rejects_modality_layers_without_inputs():
    """Round-4: the reference crashes on ft['encoded_cap']/['encoded_audio']
    when caption/audio reasoning blocks are enabled without the matching
    input stream (reference decoder.py:130-135); we reject the config
    explicitly instead."""
    import pytest

    from bist_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="caption stream"):
        ModelConfig(vocab_size=8, nb_blocks=1, nb_cenc_blocks=1,
                    d_model=16, att_h=2, include_caption="none")
    with pytest.raises(ValueError, match="separate caption"):
        ModelConfig(vocab_size=8, nb_blocks=1, nb_cenc_blocks=1,
                    d_model=16, att_h=2, include_caption="summary",
                    separate_caption=False)
    with pytest.raises(ValueError, match="audio feature size"):
        ModelConfig(vocab_size=8, nb_blocks=1, nb_aenc_blocks=1,
                    d_model=16, att_h=2, ft_sizes=(8,))
    # pointer sources filter to existing streams (defined semantics for the
    # reference's ptr_ft='query,cap' default in caption-less configs)
    capless = ModelConfig(vocab_size=8, nb_blocks=1, d_model=16, att_h=2,
                          include_caption="none")
    assert capless.ptr_ft == "query,cap"          # .conf round-trip intact
    assert capless.ptr_ft_list == ("query",)
    withcap = ModelConfig(vocab_size=8, nb_blocks=1, d_model=16, att_h=2,
                          include_caption="summary", separate_caption=True)
    assert withcap.ptr_ft_list == ("query", "cap")
