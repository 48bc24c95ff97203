"""Sampling decoder: filter semantics (top-k / nucleus), greedy reduction,
determinism per key."""

import jax
import jax.numpy as jnp
import numpy as np

from bist_tpu.decode.sample import NEG, filter_logits, sample_decode
from test_beam import tiny_batch, tiny_cfg
from bist_tpu.models.model import init_model


def test_filter_top_k():
    logits = jnp.asarray([[0.0, 3.0, 1.0, 2.0, -1.0]])
    out = np.asarray(filter_logits(logits, top_k=2))
    assert (out[0] > NEG / 2).tolist() == [False, True, False, True, False]
    # k larger than V keeps everything
    out = np.asarray(filter_logits(logits, top_k=10))
    assert (out > NEG / 2).all()


def test_filter_top_p():
    # probs ~ [0.643, 0.237, 0.087, 0.032] for logits [3, 2, 1, 0]
    logits = jnp.log(jnp.asarray([[0.643, 0.237, 0.087, 0.032]]))
    out = np.asarray(filter_logits(logits, top_p=0.5))
    assert (out[0] > NEG / 2).tolist() == [True, False, False, False]
    out = np.asarray(filter_logits(logits, top_p=0.7))
    assert (out[0] > NEG / 2).tolist() == [True, True, False, False]
    # p → 0 always keeps the argmax
    out = np.asarray(filter_logits(logits, top_p=1e-9))
    assert (out[0] > NEG / 2).tolist() == [True, False, False, False]
    # order-independence: same nucleus when logits are permuted
    perm = jnp.asarray([[0.087, 0.643, 0.032, 0.237]])
    out = np.asarray(filter_logits(jnp.log(perm), top_p=0.7))
    assert (out[0] > NEG / 2).tolist() == [False, True, False, True]


def test_top_k1_is_greedy_and_key_independent(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    a = np.asarray(sample_decode(params, cfg, batch, 5, jax.random.PRNGKey(0),
                                 top_k=1))
    b = np.asarray(sample_decode(params, cfg, batch, 5, jax.random.PRNGKey(9),
                                 top_k=1))
    np.testing.assert_array_equal(a, b)       # argmax: key cannot matter
    assert a.shape == (2, 5) and (a >= 0).all()


def test_bf16_cache_matches_f32_tokens(rng):
    """cache_dtype='bfloat16' (the serving default) must not change the
    decoded tokens on a tiny model — greedy via top_k=1 and a hot sampled
    trajectory both compare against their f32-cache counterparts."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    key = jax.random.PRNGKey(7)
    for kwargs in ({"top_k": 1}, {"temperature": 1.5}):
        f32 = np.asarray(sample_decode(params, cfg, batch, 5, key,
                                       cache_dtype="float32", **kwargs))
        bf16 = np.asarray(sample_decode(params, cfg, batch, 5, key,
                                        cache_dtype="bfloat16", **kwargs))
        np.testing.assert_array_equal(f32, bf16)


def test_encode_dtype_kwarg_sample(rng):
    """sample_decode's encode_dtype wiring (used by the serving sample jit):
    bf16 ctx precompute must produce the same greedy-equivalent (top_k=1)
    tokens as f32 on a tiny model, and '' must inherit bit-identically."""
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    key = jax.random.PRNGKey(7)
    f32 = np.asarray(sample_decode(params, cfg, batch, 5, key, top_k=1))
    inh = np.asarray(sample_decode(params, cfg, batch, 5, key, top_k=1,
                                   encode_dtype="float32"))
    bf16 = np.asarray(sample_decode(params, cfg, batch, 5, key, top_k=1,
                                    encode_dtype="bfloat16"))
    np.testing.assert_array_equal(f32, inh)
    np.testing.assert_array_equal(f32, bf16)


def test_sampling_deterministic_per_key(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    params = init_model(jax.random.PRNGKey(3), cfg)
    a1 = np.asarray(sample_decode(params, cfg, batch, 6,
                                  jax.random.PRNGKey(1), temperature=1.5))
    a2 = np.asarray(sample_decode(params, cfg, batch, 6,
                                  jax.random.PRNGKey(1), temperature=1.5))
    np.testing.assert_array_equal(a1, a2)
    # a hot temperature with a different key gives a different trajectory
    # (random init → near-uniform logits; collision chance ~ V^-12)
    b = np.asarray(sample_decode(params, cfg, batch, 6,
                                 jax.random.PRNGKey(2), temperature=1.5))
    assert not np.array_equal(a1, b)


def test_row_seeds_batch_invariance(rng):
    """row_seeds gives each row a stream keyed by (base, seed) alone: the
    same example with the same seed draws the same tokens whether it is
    row 0 of a batch of 1 (padded) or row 2 of a full batch."""
    import jax
    import numpy as np

    from bist_tpu.config import ModelConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.decode.sample import sample_decode
    from bist_tpu.models.model import init_model
    from bist_tpu.vocab import PAD

    cfg = ModelConfig(vocab_size=40, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    B = 4

    def toks(L, seed):
        r = np.random.default_rng(seed)
        x = r.integers(4, 40, size=(B, L)).astype(np.int32)
        x[:, -1] = PAD
        return x

    fts = np.random.default_rng(3).standard_normal((B, 3, 4, 8)) \
        .astype(np.float32)
    batch = Batch(query=toks(5, 0), his=toks(7, 1), trg=toks(2, 2),
                  trg_y=toks(2, 2), cap=toks(4, 4), fts=fts, audio_fts=None)
    key = jax.random.PRNGKey(11)
    seeds_full = np.array([5, 6, 7, 8], np.int32)
    out_full = np.asarray(sample_decode(params, cfg, batch, 6, key,
                                        temperature=2.0,
                                        row_seeds=seeds_full))

    # the SAME example as row 0, different neighbours and row position:
    perm = np.array([2, 0, 1, 3])
    batch_p = Batch(*[None if x is None else np.asarray(x)[perm]
                      for x in batch])
    out_p = np.asarray(sample_decode(params, cfg, batch_p, 6, key,
                                     temperature=2.0,
                                     row_seeds=seeds_full[perm]))
    np.testing.assert_array_equal(out_p, out_full[perm])
