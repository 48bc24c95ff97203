"""AOT serving bundles (bist_tpu/export.py): jax.export round-trip equality
with the live jit path, params-as-arguments semantics, geometry dispatch,
and the bundle-backed Responder end to end."""

import numpy as np
import pytest

import jax

from bist_tpu.config import GenerateConfig, ModelConfig
from bist_tpu.data.batching import Batch
from bist_tpu.decode.beam import beam_search
from bist_tpu.export import (Bundle, default_serving_geometries,
                             flatten_params, geometry_key, geometry_of,
                             load_bundle, save_bundle, unflatten_params)
from bist_tpu.models.model import init_model
from bist_tpu.vocab import EOS, PAD, SOS, SPECIALS


@pytest.fixture(scope="module")
def setup():
    vocab = dict(SPECIALS)
    for w in ("a the man is walking what doing he yes no couch dog").split():
        vocab[w] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=4, beam=2, penalty=1.0, nbest=2)
    return vocab, cfg, params, gcfg


def concrete_batch(geom, cfg, seed=0):
    rng = np.random.default_rng(seed)

    def tok(L):
        x = rng.integers(4, cfg.vocab_size, size=(geom["B"], L))
        x = x.astype(np.int32)
        x[:, 0] = SOS
        if L > 2:
            x[:, -2] = EOS
            x[:, -1] = PAD
        return x

    fts = rng.standard_normal(
        (geom["B"], geom["T"], geom["S"], geom["Dv"])).astype(np.float32) \
        if "T" in geom else None
    return Batch(query=tok(geom["Lq"]), his=tok(geom["Lh"]),
                 trg=tok(geom["Lt"]), trg_y=tok(geom["Lt"]),
                 cap=tok(geom["Lc"]) if "Lc" in geom else None,
                 fts=fts, audio_fts=None)


def test_params_npz_roundtrip(setup):
    _, cfg, params, _ = setup
    back = unflatten_params(flatten_params(params), cfg)
    a = jax.tree_util.tree_leaves_with_path(params)
    b = jax.tree_util.tree_leaves_with_path(back)
    assert len(a) == len(b)
    for (pa, la), (pb, lb) in zip(a, b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_bundle_roundtrip_equals_jit(setup, tmp_path):
    """The deserialized program must produce BIT-IDENTICAL beam results to
    the live jit path on the same inputs (same lowering, AOT-serialized)."""
    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8, Lh=8,
                                       Lc=8, T=4, S=4)
    save_bundle(str(tmp_path / "b"), params, cfg, gcfg, vocab, geoms)
    bundle = load_bundle(str(tmp_path / "b"))
    assert isinstance(bundle, Bundle)
    assert bundle.cfg == cfg and bundle.gcfg == gcfg and bundle.vocab == vocab

    batch = concrete_batch(geoms[0], cfg)
    live = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
    aot = bundle.beam_fn()(bundle.params, batch)
    np.testing.assert_array_equal(np.asarray(live.tokens),
                                  np.asarray(aot.tokens))
    np.testing.assert_array_equal(np.asarray(live.lengths),
                                  np.asarray(aot.lengths))
    np.testing.assert_allclose(np.asarray(live.scores),
                               np.asarray(aot.scores), rtol=0, atol=0)


def test_unknown_geometry_raises(setup, tmp_path):
    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8, Lh=8,
                                       Lc=8, T=4, S=4)
    save_bundle(str(tmp_path / "b"), params, cfg, gcfg, vocab, geoms)
    bundle = load_bundle(str(tmp_path / "b"))
    other = dict(geoms[0], B=4)     # batch bucket the bundle doesn't carry
    with pytest.raises(KeyError, match="no exported program"):
        bundle.beam_fn()(bundle.params, concrete_batch(other, cfg))


def test_weight_swap_without_reexport(setup, tmp_path):
    """Params are ARGUMENTS of the exported program: fresh weights through
    the same artifact change the result (no baked-in constants)."""
    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8, Lh=8,
                                       Lc=8, T=4, S=4)
    save_bundle(str(tmp_path / "b"), params, cfg, gcfg, vocab, geoms)
    bundle = load_bundle(str(tmp_path / "b"))
    batch = concrete_batch(geoms[0], cfg)
    beam = bundle.beam_fn()
    base = beam(bundle.params, batch)
    swapped = beam(init_model(jax.random.PRNGKey(7), cfg), batch)
    assert not np.array_equal(np.asarray(base.scores),
                              np.asarray(swapped.scores))
    # and the swapped result equals a live jit run of the swapped weights
    live = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(
        init_model(jax.random.PRNGKey(7), cfg), batch)
    np.testing.assert_array_equal(np.asarray(live.tokens),
                                  np.asarray(swapped.tokens))


def test_bundle_responder_end_to_end(setup, tmp_path):
    """Bundle.make_responder serves real requests through the exported
    programs only (buckets derived from the geometry table)."""
    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2, 4), Lq=8,
                                       Lh=8, Lc=8, T=8, S=4)
    save_bundle(str(tmp_path / "b"), params, cfg, gcfg, vocab, geoms)
    bundle = load_bundle(str(tmp_path / "b"))
    responder = bundle.make_responder()
    assert responder.batch_buckets == (2, 4)
    responder.warmup(feature_shape=(4, cfg.ft_sizes[0]), t_clips=8, lens=(8,))

    from bist_tpu.serving import Request

    rng = np.random.default_rng(0)
    reqs = [Request(question=responder.tokenize("what is he doing"),
                    history=responder.tokenize("a man is walking"),
                    caption=responder.tokenize("the dog"),
                    features=rng.standard_normal((6, 4, 8)).astype(np.float32))
            for _ in range(3)]
    responder.respond(reqs)
    for r in reqs:
        assert r._event.is_set()
        assert isinstance(r._answer, str)


def test_geometry_key_of_batch(setup):
    _, cfg, _, _ = setup
    geom = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8, Lh=8,
                                      Lc=8, T=4, S=4)[0]
    batch = concrete_batch(geom, cfg)
    assert geometry_key(geometry_of(batch)) == geometry_key(geom)


def test_greedy_bundle(setup, tmp_path):
    """Greedy-style bundles export greedy_decode; the loaded program returns
    ids identical to the live jit greedy path, and the bundle Responder
    serves through it."""
    from bist_tpu.decode.beam import greedy_decode
    from bist_tpu.serving import Request

    vocab, cfg, params, _ = setup
    gcfg = GenerateConfig(maxlen=4, decode_style="greedy")
    geoms = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8, Lh=8,
                                       Lc=8, T=4, S=4)
    save_bundle(str(tmp_path / "g"), params, cfg, gcfg, vocab, geoms)
    bundle = load_bundle(str(tmp_path / "g"))
    batch = concrete_batch(geoms[0], cfg)
    aot = np.asarray(bundle.beam_fn()(bundle.params, batch))
    live = np.asarray(jax.jit(lambda p, b: greedy_decode(p, cfg, b, 4))(
        params, batch))
    np.testing.assert_array_equal(aot, live)

    responder = bundle.make_responder()
    responder.warmup(feature_shape=(4, cfg.ft_sizes[0]), t_clips=4, lens=(8,))
    rng = np.random.default_rng(0)
    req = Request(question=responder.tokenize("what is he doing"),
                  history=responder.tokenize("a man is walking"),
                  caption=responder.tokenize("the dog"),
                  features=rng.standard_normal((4, 4, 8)).astype(np.float32))
    responder.respond([req])
    assert isinstance(req._answer, str)


def test_unsupported_style_bundle_raises(setup, tmp_path):
    vocab, cfg, params, _ = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8, Lh=8,
                                       Lc=8, T=4, S=4)
    with pytest.raises(ValueError, match="decode_style"):
        save_bundle(str(tmp_path / "x"), params, cfg,
                    GenerateConfig(decode_style="oracle"), vocab, geoms)


def test_multiplatform_export(setup, tmp_path):
    """platforms=('cpu','tpu') bakes both lowerings into one artifact —
    lowering is host-side, so the TPU variant builds without TPU hardware,
    and the CPU variant still runs here bit-identically."""
    from bist_tpu.decode.beam import beam_search

    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8, Lh=8,
                                       Lc=8, T=4, S=4)
    save_bundle(str(tmp_path / "mp"), params, cfg, gcfg, vocab, geoms,
                platforms=("cpu", "tpu"))
    bundle = load_bundle(str(tmp_path / "mp"))
    exp = next(iter(bundle.programs.values()))
    assert set(exp.platforms) == {"cpu", "tpu"}
    batch = concrete_batch(geoms[0], cfg)
    aot = bundle.beam_fn()(bundle.params, batch)
    live = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(params, batch)
    np.testing.assert_array_equal(np.asarray(live.tokens),
                                  np.asarray(aot.tokens))


def test_serve_cli_export_bundle(setup, tmp_path):
    """serve.py --export-bundle end to end at the CLI surface: checkpoint +
    .conf on disk -> bundle directory with loadable programs."""
    import os
    import sys

    from bist_tpu.config import TrainConfig, save_conf
    from bist_tpu.train.checkpoint import save_checkpoint

    vocab, cfg, params, _ = setup

    class S:
        pass

    s = S()
    s.params, s.opt_state, s.step = params, (), 0
    prefix = str(tmp_path / "m")
    save_checkpoint(prefix + "_best", s, epoch=0)
    save_conf(prefix + ".conf", vocab, cfg, TrainConfig())

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from serve import main as serve_main

    out = str(tmp_path / "bundle")
    serve_main(["--model", prefix, "--export-bundle", out,
                "--max-batch", "2", "--maxlen", "4", "--beam", "2",
                "--scan-unroll", "1", "--device", "cpu"])
    bundle = load_bundle(out)
    assert bundle.programs and bundle.vocab == vocab


def test_dp_sharded_bundle(setup, tmp_path):
    """dp=2 bundles bake the DataParallel layout (rows on a ('data',) mesh,
    params replicated): tokens equal the single-device jit bitwise, scores
    to ulp tolerance (the AOT CPU compile targets different machine
    features than the live jit, so fused-FMA grouping can differ by 1 ulp
    under the heads-last einsums), and the bundle Responder serves over 2
    devices."""
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.serving import Request

    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2, 4), Lq=8,
                                       Lh=8, Lc=8, T=4, S=4)
    save_bundle(str(tmp_path / "dp"), params, cfg, gcfg, vocab, geoms, dp=2)
    bundle = load_bundle(str(tmp_path / "dp"))
    assert bundle.dp == 2

    responder = bundle.make_responder()
    assert responder._dp.n == 2
    # direct sharded call: place inputs the DataParallel way
    batch = responder._dp.shard(concrete_batch(geoms[0], cfg))
    rparams = responder.params       # replicated over the 2-device mesh
    aot = bundle.beam_fn()(rparams, batch)
    live = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))(
        params, concrete_batch(geoms[0], cfg))
    np.testing.assert_array_equal(np.asarray(live.tokens),
                                  np.asarray(aot.tokens))
    np.testing.assert_allclose(np.asarray(live.scores),
                               np.asarray(aot.scores), rtol=1e-6, atol=2e-6)

    # end to end through the Responder (pad + shard + dispatch + detok)
    responder.warmup(feature_shape=(4, cfg.ft_sizes[0]), t_clips=4, lens=(8,))
    rng = np.random.default_rng(0)
    reqs = [Request(question=responder.tokenize("what is he doing"),
                    history=responder.tokenize("a man is walking"),
                    caption=responder.tokenize("the dog"),
                    features=rng.standard_normal((4, 4, 8)).astype(np.float32))
            for _ in range(3)]
    responder.respond(reqs)
    assert all(isinstance(r._answer, str) for r in reqs)


def test_dp_bundle_rejects_odd_buckets(setup, tmp_path):
    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(3,), Lq=8, Lh=8,
                                       Lc=8, T=4, S=4)
    with pytest.raises(ValueError, match="not divisible by dp"):
        save_bundle(str(tmp_path / "x"), params, cfg, gcfg, vocab, geoms,
                    dp=2)


def test_multibucket_bundle_covers_long_fields(setup, tmp_path):
    """ADVICE r3 (medium): a bundle must carry the cross product of the
    per-field buckets its serving host can produce — a multi-turn history
    over the smallest bucket must land on an exported program, and one over
    the LARGEST bucket must be clamped at submit() (most recent tokens
    kept), never raise a geometry KeyError mid-batch."""
    from bist_tpu.serving import DynamicBatcher

    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2,), Lq=(8,),
                                       Lh=(8, 16), Lc=(8,), T=(4,), S=4)
    assert len(geoms) == 2                      # cross product over Lh
    save_bundle(str(tmp_path / "mb"), params, cfg, gcfg, vocab, geoms)
    bundle = load_bundle(str(tmp_path / "mb"))
    responder = bundle.make_responder()
    assert responder.q_buckets == (8,)
    assert responder.h_buckets == (8, 16)
    assert responder.feat_tail == (4, 8)

    server = DynamicBatcher(responder, max_batch=2, max_wait_ms=5)
    server.start()
    try:
        rng = np.random.default_rng(0)
        fts = rng.standard_normal((4, 4, 8)).astype(np.float32)
        long_hist = "a man is walking " * 3        # 12 tokens -> bucket 16
        ans = server.submit("what is he doing", history=long_hist,
                            caption="the dog", features=fts)
        assert isinstance(ans, str)
        over_hist = "a man is walking " * 10       # 40 tokens -> clamp to 16
        ans = server.submit("what is he doing", history=over_hist,
                            caption="the dog", features=fts)
        assert isinstance(ans, str)
        # over-long video grids clamp to the largest exported T bucket
        ans = server.submit("what is he doing", history="a man",
                            caption="the dog",
                            features=rng.standard_normal(
                                (9, 4, 8)).astype(np.float32))
        assert isinstance(ans, str)
        # wrong spatial grid is rejected per-request at submit, from the
        # bundle's geometry table (never poisons a coalesced batch)
        with pytest.raises(ValueError, match="served grid"):
            server.submit("what is he doing", history="a man",
                          caption="the dog",
                          features=np.zeros((4, 5, 8), np.float32))
        assert server.stats["errors"] == 0
    finally:
        server.stop()


def test_warmup_geometries_covers_table(setup, tmp_path):
    """Responder.warmup_geometries must execute every program in a
    cross-product bundle (serve.py --bundle warms with it — no serve-time
    compiles, no geometry KeyError)."""
    vocab, cfg, params, gcfg = setup
    geoms = default_serving_geometries(cfg, batch_buckets=(2, 4), Lq=(8,),
                                       Lh=(8, 16), Lc=(8,), T=(4,), S=4)
    assert len(geoms) == 4
    save_bundle(str(tmp_path / "wg"), params, cfg, gcfg, vocab, geoms)
    bundle = load_bundle(str(tmp_path / "wg"))
    responder = bundle.make_responder()
    responder.warmup_geometries(bundle.geometries.values())   # must not raise


def test_audio_geometries_cross_time_buckets():
    """Round-4 review: serving buckets video T and audio Ta INDEPENDENTLY
    (Responder.make_batch), so an audio bundle must carry the full T x Ta
    cross product — a batch with 8-clip video but 4-frame audio needs the
    T8/Ta4 program or the whole coalesced group KeyErrors."""
    cfg = ModelConfig(vocab_size=8, nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, nb_aenc_blocks=1, d_model=16,
                      att_h=2, include_caption="summary",
                      separate_caption=True, ft_sizes=(8, 4))
    geoms = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8, Lh=8,
                                       Lc=8, T=(4, 8))
    assert {(g["T"], g["Ta"]) for g in geoms} == {
        (4, 4), (4, 8), (8, 4), (8, 8)}
    # a single-int Ta opts back into one audio length (count linear in T)
    geoms1 = default_serving_geometries(cfg, batch_buckets=(2,), Lq=8,
                                        Lh=8, Lc=8, T=(4, 8), Ta=4)
    assert {(g["T"], g["Ta"]) for g in geoms1} == {(4, 4), (8, 4)}
