"""Beam-search parity: the jitted scan beam must match an independent
step-by-step host reference implementing the documented scoring rules
(decode.py:53-104 semantics: cumulative logp, completion bonus
lp[eos]+penalty·(len+1) from min_len, unk always banned, eos banned unless
dec_eos, top-beam expansion, nbest ranking)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bist_tpu.config import GenerateConfig, ModelConfig
from bist_tpu.data.batching import Batch
from bist_tpu.decode.beam import beam_search, greedy_decode
from bist_tpu.models.model import (
    decode_step, init_cache, init_model, precompute_decode_ctx,
)
from bist_tpu.vocab import EOS, PAD, SOS, UNK


def tiny_cfg():
    return ModelConfig(vocab_size=30, nb_blocks=2, nb_venc_blocks=2,
                       nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                       include_caption="summary", separate_caption=True,
                       ft_sizes=(8,))


def tiny_batch(rng, B=2):
    def toks(L):
        return rng.integers(4, 30, size=(B, L)).astype(np.int32)

    fts = rng.standard_normal((B, 3, 4, 8)).astype(np.float32)
    dummy_trg = np.full((B, 1), SOS, np.int32)
    return Batch(query=toks(5), his=toks(7), trg=dummy_trg, trg_y=dummy_trg,
                 cap=toks(4), fts=fts, audio_fts=None)


def host_beam_reference(params, cfg, batch, gcfg, row):
    """Independent beam search for one batch row, eager, list-based.

    Built from the documented scoring rules; hypotheses are (tokens, score).
    Uses the same cached decode_step as the compiled path for the raw
    log-probs (the model itself is tested against the full forward
    elsewhere), but all search logic is plain Python."""
    one = Batch(*[None if x is None else x[row:row + 1] for x in batch])
    ctx = precompute_decode_ctx(params, cfg, one)
    step_jit = jax.jit(lambda cache, tok, pos: decode_step(
        params, cfg, ctx, cache, tok, pos))

    def logprobs(prefix):
        cache = init_cache(cfg, 1, gcfg.maxlen + 1)
        lp = None
        for pos, t in enumerate(prefix):
            lp, cache = step_jit(cache, jnp.asarray([t], jnp.int32),
                                 jnp.asarray(pos))
        return np.asarray(lp[0])

    hyps = [([SOS], 0.0)]
    completions = []
    for l in range(gcfg.maxlen):
        new_hyps = []
        for prefix, score in hyps:
            lp = logprobs(prefix) + score
            if l >= gcfg.min_len:
                completions.append(
                    (prefix[1:], lp[EOS] + gcfg.penalty * (l + 1)))
            banned = {UNK} if gcfg.dec_eos else {UNK, EOS}
            for tok in np.argsort(lp)[::-1]:
                if int(tok) in banned:
                    continue
                new_hyps.append((prefix + [int(tok)], float(lp[tok])))
        new_hyps.sort(key=lambda h: -h[1])
        hyps = new_hyps[: gcfg.beam]
    completions.sort(key=lambda h: -h[1])
    return completions[: gcfg.nbest]


@pytest.mark.parametrize("dec_eos", [False, True])
def test_beam_matches_host_reference(rng, dec_eos):
    cfg = tiny_cfg()
    gcfg = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=4,
                          dec_eos=dec_eos)
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)

    result = beam_search(params, cfg, batch, gcfg)
    for row in range(batch.query.shape[0]):
        expected = host_beam_reference(params, cfg, batch, gcfg, row)
        got_scores = np.asarray(result.scores[row])
        got_tokens = np.asarray(result.tokens[row])
        got_lens = np.asarray(result.lengths[row])
        assert len(expected) >= 1
        for n, (exp_toks, exp_score) in enumerate(expected):
            assert got_lens[n] == len(exp_toks)
            assert list(got_tokens[n, : got_lens[n]]) == exp_toks
            # batched vs single-row fp32 fusion causes ~1e-3 drift
            np.testing.assert_allclose(got_scores[n], exp_score, rtol=2e-3,
                                       atol=2e-3)


def test_bf16_cache_close_to_f32(rng):
    """cache_dtype='bfloat16' stores the decode KV cache in bf16 (half the
    regroup/attention traffic); scores still accumulate f32.  On a tiny
    model the hypotheses must match f32 and scores stay close."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    g32 = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3)
    gbf = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3,
                         cache_dtype="bfloat16")
    r32 = beam_search(params, cfg, batch, g32)
    rbf = beam_search(params, cfg, batch, gbf)
    np.testing.assert_array_equal(np.asarray(r32.tokens),
                                  np.asarray(rbf.tokens))
    np.testing.assert_allclose(np.asarray(r32.scores),
                               np.asarray(rbf.scores), rtol=0.05, atol=0.05)


@pytest.mark.parametrize("cd", ["float8_e4m3fn", "float8_e5m2"])
def test_fp8_cache_decodes_and_tracks_f32(rng, cd):
    """cache_dtype='float8_*' stores ALL decode memory at 1 byte/elem
    (upcast to bf16 at read — layers.upcast_fp8).  fp8 keeps only ~2
    significant digits, so token-level agreement with f32 is NOT guaranteed
    on a random-init model (ties flip); the contract is: valid hypotheses,
    finite ranked scores that track f32 closely, and unroll-identity."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    g32 = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3)
    g8 = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3,
                        cache_dtype=cd)
    r32 = beam_search(params, cfg, batch, g32)
    r8 = beam_search(params, cfg, batch, g8)
    toks, scores = np.asarray(r8.tokens), np.asarray(r8.scores)
    assert np.isfinite(scores).all()
    assert (toks >= 0).all() and (toks < cfg.vocab_size).all()
    assert (np.diff(scores, axis=1) <= 1e-6).all()       # nbest stays ranked
    np.testing.assert_allclose(scores, np.asarray(r32.scores),
                               rtol=0.25, atol=0.25)
    g1 = greedy_decode(params, cfg, batch, 6, cache_dtype=cd, unroll=1)
    g4 = greedy_decode(params, cfg, batch, 6, cache_dtype=cd, unroll=4)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g4))


def test_bad_cache_dtype_raises(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    gc = GenerateConfig(maxlen=3, beam=2, nbest=1, cache_dtype="float16")
    with pytest.raises(ValueError, match="cache_dtype"):
        beam_search(params, cfg, batch, gc)


def test_bf16_compute_close_to_f32(rng):
    """compute_dtype='bfloat16' runs the per-step decoder activations in bf16
    (scores/softmax/generator stay f32).  On a tiny model the hypotheses must
    match f32 and scores stay close."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    g32 = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3)
    gbf = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3,
                         cache_dtype="bfloat16", compute_dtype="bfloat16")
    r32 = beam_search(params, cfg, batch, g32)
    rbf = beam_search(params, cfg, batch, gbf)
    np.testing.assert_array_equal(np.asarray(r32.tokens),
                                  np.asarray(rbf.tokens))
    np.testing.assert_allclose(np.asarray(r32.scores),
                               np.asarray(rbf.scores), rtol=0.05, atol=0.05)


def test_bf16_encode_close_to_f32(rng):
    """encode_dtype='bfloat16' runs the ctx PRECOMPUTE (encoder + modality
    stack, once per batch) in bf16 while the step loop stays at its own
    compute_dtype.  On a tiny model hypotheses must match f32 and scores
    stay close; '' (the default) must be bit-identical to the f32 path."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    g32 = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3)
    ginh = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3,
                          encode_dtype="float32")
    gbf = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3,
                         encode_dtype="bfloat16")
    r32 = beam_search(params, cfg, batch, g32)
    rinh = beam_search(params, cfg, batch, ginh)
    rbf = beam_search(params, cfg, batch, gbf)
    # explicit f32 == default-inherit (cfg.dtype is f32): bit-identical
    np.testing.assert_array_equal(np.asarray(r32.tokens),
                                  np.asarray(rinh.tokens))
    np.testing.assert_array_equal(np.asarray(r32.scores),
                                  np.asarray(rinh.scores))
    np.testing.assert_array_equal(np.asarray(r32.tokens),
                                  np.asarray(rbf.tokens))
    np.testing.assert_allclose(np.asarray(r32.scores),
                               np.asarray(rbf.scores), rtol=0.05, atol=0.05)
    # greedy + sample take the knob as a plain kwarg
    g1 = greedy_decode(params, cfg, batch, 6, encode_dtype="bfloat16")
    assert np.asarray(g1).shape == (batch.query.shape[0], 6)
    with pytest.raises(ValueError, match="encode_dtype"):
        beam_search(params, cfg, batch,
                    GenerateConfig(maxlen=3, beam=2, nbest=1,
                                   encode_dtype="float16"))


def test_bf16_encode_f32_cache_storage_contract(rng):
    """The mixed case generate.py ships by default with --encode-dtype
    bfloat16: ctx ACTIVATIONS bf16, STORAGE f32 (cache_dtype default).  The
    precomputed decode memory must land in the requested storage dtype even
    though the projections come out of a bf16 encoder, and the beam must
    still run (hypotheses match the all-f32 path on a tiny model)."""
    from bist_tpu.models.model import encode_cfg, precompute_decode_ctx

    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    ctx = precompute_decode_ctx(params, encode_cfg(cfg, "bfloat16"),
                                batch, dtype=jnp.float32)
    for kv in ctx.layer_kv:
        for name, (k, v) in kv.items():
            assert k.dtype == jnp.float32, (name, k.dtype)
            assert v.dtype == jnp.float32, (name, v.dtype)
    for src in ctx.ptr_src:
        assert src.enc.dtype == jnp.float32
        assert src.k.dtype == jnp.float32
        assert src.onehot.dtype == jnp.float32
    r32 = beam_search(params, cfg, batch,
                      GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3))
    rmix = beam_search(params, cfg, batch,
                       GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3,
                                      encode_dtype="bfloat16",
                                      cache_dtype="float32"))
    np.testing.assert_array_equal(np.asarray(r32.tokens),
                                  np.asarray(rmix.tokens))


@pytest.mark.parametrize("unroll", [4, 6])
def test_scan_unroll_identical(rng, unroll):
    """scan_unroll replicates the lax.scan body (the bench/serving perf knob;
    4 is the decider-precision optimum on the v5e, round 4 session 6, and 6
    the round-3 default) — it must be bit-identical to the plain loop.
    maxlen=5 is not a multiple of either unroll, exercising lax.scan's
    remainder handling."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    g1 = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3)
    gu = GenerateConfig(maxlen=5, beam=3, penalty=1.0, nbest=3,
                        scan_unroll=unroll)
    r1 = beam_search(params, cfg, batch, g1)
    ru = beam_search(params, cfg, batch, gu)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(ru.tokens))
    np.testing.assert_array_equal(np.asarray(r1.scores), np.asarray(ru.scores))
    np.testing.assert_array_equal(np.asarray(r1.lengths),
                                  np.asarray(ru.lengths))


@pytest.mark.parametrize("penalty,dec_eos,unroll,cache", [
    (1.0, False, 1, "float32"),
    (1.0, True, 3, "float32"),     # maxlen 12 % 3 == 0, strided loop only
    (2.0, False, 4, "bfloat16"),   # 12 % 4 == 0; serving dtype
    (0.0, False, 5, "float32"),    # 12 % 5 != 0: stride-1 tail runs
    (-0.5, False, 1, "float32"),   # negative penalty: the OTHER bonus branch
])
def test_early_exit_identical(rng, penalty, dec_eos, unroll, cache):
    """gcfg.early_exit replaces the fixed-maxlen lax.scan with a
    lax.while_loop that stops once no future completion candidate can beat
    the kept n-best (exact bound: log-softmax terms are ≤ 0, so
    max-beam-score is non-increasing and a future candidate scores at most
    max_score + penalty·(l'+1)).  The result must be BIT-IDENTICAL to the
    full scan for every penalty sign, unroll stride and cache dtype.
    maxlen=12 on a tiny random model leaves plenty of post-convergence steps
    to (not) run."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng, B=3)
    params = init_model(jax.random.PRNGKey(3), cfg)
    g = GenerateConfig(maxlen=12, beam=3, penalty=penalty, nbest=3,
                       dec_eos=dec_eos, scan_unroll=unroll,
                       cache_dtype=cache)
    ge = GenerateConfig(maxlen=12, beam=3, penalty=penalty, nbest=3,
                        dec_eos=dec_eos, scan_unroll=unroll,
                        cache_dtype=cache, early_exit=True)
    r = beam_search(params, cfg, batch, g)
    re = beam_search(params, cfg, batch, ge)
    np.testing.assert_array_equal(np.asarray(r.tokens), np.asarray(re.tokens))
    np.testing.assert_array_equal(np.asarray(r.scores), np.asarray(re.scores))
    np.testing.assert_array_equal(np.asarray(r.lengths),
                                  np.asarray(re.lengths))


def test_early_exit_guards(rng):
    """Fail-fast guards: unroll < 1 would compile an infinite while_loop
    (l never advances) and _return_exit_step is meaningless on the
    fixed-maxlen scan — both must raise, not hang/silently change arity."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    ge = GenerateConfig(maxlen=6, beam=2, nbest=2, early_exit=True,
                        scan_unroll=0)
    with pytest.raises(ValueError, match="scan_unroll"):
        beam_search(params, cfg, batch, ge)
    g = GenerateConfig(maxlen=6, beam=2, nbest=2)
    with pytest.raises(ValueError, match="early_exit"):
        beam_search(params, cfg, batch, g, _return_exit_step=True)


def test_early_exit_min_len_and_ensemble(rng):
    """Early exit with a min_len gate (candidates banned below it — the
    bound must still hold) and with a 2-model ensemble (summed log-probs
    are still ≤ 0 per step)."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    p1 = init_model(jax.random.PRNGKey(3), cfg)
    p2 = init_model(jax.random.PRNGKey(4), cfg)
    g = GenerateConfig(maxlen=10, beam=3, penalty=1.0, nbest=4, min_len=3)
    ge = GenerateConfig(maxlen=10, beam=3, penalty=1.0, nbest=4, min_len=3,
                        early_exit=True)
    for ps in (p1, [p1, p2]):
        r = beam_search(ps, cfg, batch, g)
        re = beam_search(ps, cfg, batch, ge)
        np.testing.assert_array_equal(np.asarray(r.tokens),
                                      np.asarray(re.tokens))
        np.testing.assert_array_equal(np.asarray(r.scores),
                                      np.asarray(re.scores))
        np.testing.assert_array_equal(np.asarray(r.lengths),
                                      np.asarray(re.lengths))


def test_greedy_decode_runs(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    out = greedy_decode(params, cfg, batch, maxlen=6)
    assert out.shape == (2, 6)
    assert np.all(np.asarray(out) >= 0)


def test_ensemble_reduces_to_single(rng):
    """An ensemble of the same model twice sums per-model log-probs
    (ref decode.py:149-151 semantics).  With penalty=0 every score doubles,
    so hypotheses are identical and scores exactly 2×.  (With penalty>0 the
    un-doubled length bonus legitimately reorders completions.)"""
    cfg = tiny_cfg()
    gcfg = GenerateConfig(maxlen=4, beam=3, penalty=0.0, nbest=3)
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    single = beam_search(params, cfg, batch, gcfg)
    double = beam_search([params, params], cfg, batch, gcfg)
    np.testing.assert_array_equal(np.asarray(single.tokens),
                                  np.asarray(double.tokens))
    np.testing.assert_array_equal(np.asarray(single.lengths),
                                  np.asarray(double.lengths))
    np.testing.assert_allclose(np.asarray(double.scores),
                               2.0 * np.asarray(single.scores),
                               rtol=2e-3, atol=2e-3)


def test_ensemble_distinct_models_runs(rng):
    cfg = tiny_cfg()
    gcfg = GenerateConfig(maxlen=4, beam=2, penalty=1.0, nbest=2)
    batch = tiny_batch(rng)
    p1 = init_model(jax.random.PRNGKey(3), cfg)
    p2 = init_model(jax.random.PRNGKey(4), cfg)
    res = beam_search([p1, p2], cfg, batch, gcfg)
    assert res.tokens.shape == (2, 2, 4)
    assert np.all(np.isfinite(np.asarray(res.scores)))


def test_regroup_mm_identical(rng, monkeypatch):
    """The one-hot-matmul cache regroup (BIST_REGROUP_MM) must return
    bit-identical results to the take_along_axis baseline."""
    import bist_tpu.decode.beam as beam_mod

    cfg = tiny_cfg()
    params = init_model(jax.random.PRNGKey(3), cfg)
    batch = tiny_batch(rng, B=3)
    gcfg = GenerateConfig(maxlen=6, beam=3, penalty=1.0, nbest=3)

    base = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
    monkeypatch.setattr(beam_mod, "REGROUP_MM", True)
    alt = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(alt.tokens))
    np.testing.assert_array_equal(np.asarray(base.scores),
                                  np.asarray(alt.scores))
    np.testing.assert_array_equal(np.asarray(base.lengths),
                                  np.asarray(alt.lengths))

    # and under the serving defaults (bf16 cache): regroup matmul copies
    # rows bit-exactly in any dtype
    g2 = GenerateConfig(maxlen=6, beam=3, penalty=1.0, nbest=3,
                        cache_dtype="bfloat16")
    alt16 = jax.jit(lambda p, b: beam_search(p, cfg, b, g2))(params, batch)
    monkeypatch.setattr(beam_mod, "REGROUP_MM", False)
    base16 = jax.jit(lambda p, b: beam_search(p, cfg, b, g2))(params, batch)
    np.testing.assert_array_equal(np.asarray(base16.tokens),
                                  np.asarray(alt16.tokens))
    np.testing.assert_array_equal(np.asarray(base16.scores),
                                  np.asarray(alt16.scores))


def test_bd_cross_attention_matches(rng, monkeypatch):
    """Block-diagonal decode cross-attention (BIST_BD_CROSS) must reproduce
    the per-head path: same beam tokens/lengths, scores equal to f32
    summation-order tolerance (the zero blocks contribute exact zeros)."""
    import bist_tpu.models.model as model_mod

    cfg = tiny_cfg()
    params = init_model(jax.random.PRNGKey(5), cfg)
    batch = tiny_batch(rng, B=3)
    gcfg = GenerateConfig(maxlen=6, beam=3, penalty=1.0, nbest=3)

    base = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
    monkeypatch.setattr(model_mod, "BD_CROSS", True)
    monkeypatch.setattr(model_mod, "BD_MAX_LK", 64)   # all tiny slots qualify
    bd = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(bd.tokens))
    np.testing.assert_array_equal(np.asarray(base.lengths),
                                  np.asarray(bd.lengths))
    np.testing.assert_allclose(np.asarray(base.scores),
                               np.asarray(bd.scores), rtol=0, atol=1e-4)

    # with a max-Lk threshold of 0 every slot keeps the per-head layout —
    # bitwise identical to base (guards the dispatch-on-ndim plumbing)
    monkeypatch.setattr(model_mod, "BD_MAX_LK", 0)
    same = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
    np.testing.assert_array_equal(np.asarray(base.scores),
                                  np.asarray(same.scores))

    # greedy path too (beam=1 rows)
    monkeypatch.setattr(model_mod, "BD_MAX_LK", 64)
    from bist_tpu.decode.beam import greedy_decode as gd

    g_bd = jax.jit(lambda p, b: gd(p, cfg, b, 6))(params, batch)
    monkeypatch.setattr(model_mod, "BD_CROSS", False)
    g_base = jax.jit(lambda p, b: gd(p, cfg, b, 6))(params, batch)
    np.testing.assert_array_equal(np.asarray(g_base), np.asarray(g_bd))


@pytest.mark.parametrize("cache_dtype", ["float32", "bfloat16"])
def test_split_cache_identical(rng, monkeypatch, cache_dtype):
    """The per-layer (split) KV-cache layout must be BIT-identical to the
    stacked (layers, B, h, L, d_k) layout on beam, greedy and sampling
    decodes — same per-layer arithmetic, different carry pytree only
    (models/model.py SPLIT_CACHE; profile-motivated, BENCH.md round 4)."""
    import bist_tpu.models.model as model_mod
    from bist_tpu.decode.sample import sample_decode

    cfg = tiny_cfg()
    params = init_model(jax.random.PRNGKey(7), cfg)
    batch = tiny_batch(rng, B=3)
    gcfg = GenerateConfig(maxlen=6, beam=3, penalty=1.0, nbest=3,
                          cache_dtype=cache_dtype)

    outs = {}
    for split in (False, True):
        monkeypatch.setattr(model_mod, "SPLIT_CACHE", split)
        r = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
        g = jax.jit(lambda p, b: greedy_decode(p, cfg, b, 6))(params, batch)
        s = sample_decode(params, cfg, batch, 6, key=jax.random.PRNGKey(1),
                          top_k=5)
        outs[split] = (np.asarray(r.tokens), np.asarray(r.scores),
                       np.asarray(r.lengths), np.asarray(g), np.asarray(s))
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)
