"""Serving runtime: dynamic batching correctness + concurrency + the
serve.py HTTP layer."""

import os
import threading

import numpy as np
import pytest

import jax

from bist_tpu.config import GenerateConfig, ModelConfig
from bist_tpu.models.model import init_model
from bist_tpu.serving import DynamicBatcher, Responder
from bist_tpu.vocab import SPECIALS


@pytest.fixture(scope="module")
def served():
    vocab = dict(SPECIALS)
    for w in ("a the man is walking sitting what doing he yes no couch "
              "dog cat room").split():
        vocab[w] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=4, beam=2, penalty=1.0, nbest=2)
    responder = Responder(params, cfg, vocab, gcfg, max_batch=4,
                          len_buckets=(8, 16), time_buckets=(8,))
    responder.warmup(feature_shape=(4, 8), t_clips=8)
    server = DynamicBatcher(responder, max_batch=4, max_wait_ms=20)
    server.start()
    yield server
    server.stop()


def test_single_request(served, rng):
    fts = rng.standard_normal((5, 4, 8)).astype(np.float32)
    ans = served.submit("what is he doing", history="a man is walking",
                        caption="the man", features=fts)
    assert isinstance(ans, str)


def test_concurrent_requests_batched(served, rng):
    answers = {}
    errs = []

    def worker(i):
        try:
            fts = rng.standard_normal((4 + i % 3, 4, 8)).astype(np.float32)
            answers[i] = served.submit("what is he doing",
                                       history="a man is walking",
                                       caption="the dog", features=fts)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs
    assert len(answers) == 8
    assert served.stats["batches"] < 8   # coalescing happened


def test_http_round_trip(served, rng):
    """Drive serve.py's actual HTTP layer (handler + ThreadingHTTPServer)
    over the in-process batcher: healthz, /respond with features (nested
    lists AND base64 .npy), 400 on missing features, 404 on bad path."""
    import base64
    import io
    import json as _json
    import sys
    import threading as _threading
    import urllib.error
    import urllib.request

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from serve import make_http_server

    httpd = make_http_server("127.0.0.1", 0, served, requires_features=True)
    port = httpd.server_address[1]
    t = _threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = _json.load(r)
        assert health["ok"] is True and "batches" in health["stats"]

        fts = rng.standard_normal((5, 4, 8)).astype(np.float32)

        def post(path, obj):
            req = urllib.request.Request(
                f"{base}{path}", data=_json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, _json.load(r)

        code, resp = post("/respond", {
            "question": "what is he doing", "history": "a man is walking",
            "caption": "the man", "features": fts.tolist()})
        assert code == 200 and isinstance(resp["answer"], str)
        assert resp["latency_ms"] > 0

        buf = io.BytesIO()
        np.save(buf, fts)
        code, resp = post("/respond", {
            "question": "what is he doing",
            "features_b64": base64.b64encode(buf.getvalue()).decode()})
        assert code == 200 and isinstance(resp["answer"], str)

        # client-side int8 upload: int8 grid + per-position scale (4x fewer
        # NIC bytes), dequantised host-side
        from bist_tpu.data.batching import quantize_features

        q8, scale = quantize_features(fts[None])
        b1, b2 = io.BytesIO(), io.BytesIO()
        np.save(b1, q8[0])
        np.save(b2, scale[0])
        code, resp = post("/respond", {
            "question": "what is he doing",
            "features_b64": base64.b64encode(b1.getvalue()).decode(),
            "features_scale_b64": base64.b64encode(b2.getvalue()).decode()})
        assert code == 200 and isinstance(resp["answer"], str)

        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/respond", {"question": "no features"})
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/nope", {})
        assert ei.value.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_feat_int8_responder(rng):
    """Server-side int8 feature transfer: a feat_int8 Responder answers and
    its batches carry int8 grids + scales (Batch.fts_scale)."""
    vocab = dict(SPECIALS)
    for w in "a man is walking what doing".split():
        vocab[w] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=3, beam=2, penalty=1.0, nbest=1)
    r = Responder(params, cfg, vocab, gcfg, max_batch=4,
                  len_buckets=(8,), time_buckets=(8,), feat_int8=True)
    from bist_tpu.serving import Request
    from bist_tpu.vocab import PAD as _PAD

    req = Request(question=r.tokenize("what is he doing"),
                  history=r.tokenize("a man is walking"),
                  caption=r.tokenize("a man"),
                  features=rng.standard_normal((5, 4, 8)).astype(np.float32))
    batch = r.make_batch([req])
    assert batch.fts.dtype == np.int8 and batch.fts_scale is not None
    r.respond([req])
    assert isinstance(req._answer, str)


def test_step_timer():
    import time as _time

    from bist_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(3):
        with t.step(items=4):
            _time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 2 and s["mean_s"] >= 0.01
    assert s["items_per_s"] > 0


def test_greedy_decode_style(rng):
    """decode_style='greedy' serves one hypothesis row per request through
    the cached greedy_decode; answers must equal the offline greedy path."""
    from bist_tpu.decode.beam import greedy_decode
    from bist_tpu.serving import Request
    from bist_tpu.vocab import ids2words, make_id2word

    vocab = dict(SPECIALS)
    for w in "a the man is walking what doing he".split():
        vocab[w] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=4, decode_style="greedy")
    r = Responder(params, cfg, vocab, gcfg, max_batch=2,
                  len_buckets=(8,), time_buckets=(8,))
    reqs = [Request(question=r.tokenize("what is he doing"),
                    history=r.tokenize("a man is walking"),
                    caption=r.tokenize("the man"),
                    features=rng.standard_normal((5, 4, 8)).astype(np.float32))
            for _ in range(2)]
    r.respond(reqs)
    batch = r.make_batch(reqs)
    ids = np.asarray(jax.jit(lambda p, b: greedy_decode(p, cfg, b, 4))(
        params, batch))
    id2word = make_id2word(vocab)
    for i, req in enumerate(reqs):
        assert req._answer == " ".join(ids2words(ids[i], id2word))
        assert req._nbest == [(ids2words(ids[i], id2word), 0.0)]


def test_unsupported_decode_style_raises():
    vocab = dict(SPECIALS)
    vocab["a"] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="decode_style"):
        Responder(params, cfg, vocab,
                  GenerateConfig(decode_style="oracle"), max_batch=2)


def test_pipelined_batcher_under_backlog(served, rng):
    """pipeline_depth=2: dispatch of batch N+1 overlaps decode of batch N.
    Correctness contract: every request completes with the same answer the
    synchronous path gives (same compiled program, same rows)."""
    from bist_tpu.serving import DynamicBatcher, Request

    responder = served.responder
    pipelined = DynamicBatcher(responder, max_batch=2, max_wait_ms=5,
                               pipeline_depth=2)
    pipelined.start()
    try:
        answers = {}
        errs = []

        def worker(i):
            try:
                fts = (np.zeros((4, 4, 8), np.float32) + i % 3)
                answers[i] = pipelined.submit(
                    "what is he doing", history="a man is walking",
                    caption="the dog", features=fts)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs and len(answers) == 10
        assert pipelined.stats["batches"] >= 5    # max_batch=2 over 10 reqs
        assert pipelined.stats["errors"] == 0
        # determinism cross-check: a direct synchronous respond() of one of
        # the same rows yields the same answer
        req = Request(question=responder.tokenize("what is he doing"),
                      history=responder.tokenize("a man is walking"),
                      caption=responder.tokenize("the dog"),
                      features=np.zeros((4, 4, 8), np.float32))
        responder.respond([req])
        assert answers[0] == req._answer   # i%3==0 row
    finally:
        pipelined.stop()


def test_batch_error_propagates_and_thread_survives(served, rng):
    """Malformed requests fail fast at submit() (before they can poison a
    coalesced batch); a request that still breaks batch ASSEMBLY fails its
    own callers without hanging or killing the batcher thread, and
    subsequent good requests work."""
    from bist_tpu.serving import Request

    # layer 1: submit-time validation (never reaches the queue)
    with pytest.raises(ValueError, match="requires video features"):
        served.submit("what is he doing", features=None, timeout=60)
    with pytest.raises(ValueError, match=r"\(T, S, Dv\)"):
        served.submit("what is he doing",
                      features=np.zeros((4, 8), np.float32), timeout=60)

    # layer 2: a Request that breaks make_batch in the batcher thread
    # (injected directly — bypasses submit validation)
    bad = Request(question=served.responder.tokenize("what"),
                  history=np.array([0], np.int32), caption=None,
                  features=np.zeros((4, 4), np.float32))  # wrong rank
    served._q.put(bad)
    assert bad._event.wait(60)
    assert bad._error is not None
    assert served.stats["errors"] >= 1

    # the thread survived: a good request still completes
    fts = rng.standard_normal((5, 4, 8)).astype(np.float32)
    ans = served.submit("what is he doing", history="a man is walking",
                        caption="the dog", features=fts)
    assert isinstance(ans, str)


def test_metrics_endpoint(served, rng):
    """DynamicBatcher.metrics(): latency percentiles over completed
    requests, queue depth, mean batch rows — and the serve.py GET /metrics
    route exposes it."""
    fts = rng.standard_normal((5, 4, 8)).astype(np.float32)
    for _ in range(3):
        served.submit("what is he doing", history="a man is walking",
                      caption="the man", features=fts)
    m = served.metrics()
    assert m["requests"] >= 3 and m["batches"] >= 1
    assert m["latency_ms"]["count"] >= 3
    assert m["latency_ms"]["p50"] > 0 and m["latency_ms"]["p99"] > 0
    assert m["latency_ms"]["p50"] <= m["latency_ms"]["p99"]
    assert m["mean_batch_rows"] >= 1 and m["queue_depth"] == 0

    import json as _json
    import os
    import sys
    import threading as _threading
    import urllib.request

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from serve import make_http_server

    httpd = make_http_server("127.0.0.1", 0, served, requires_features=True)
    t = _threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/metrics"
        with urllib.request.urlopen(url, timeout=30) as r:
            remote = _json.load(r)
        assert remote["latency_ms"]["count"] == m["latency_ms"]["count"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_error_rate_counts_requests_not_batches():
    """ADVICE r3: a failed BATCH counts every request it carried, so
    /metrics error_rate = requests-failed / requests-submitted."""
    from bist_tpu.serving import DynamicBatcher, Request

    b = DynamicBatcher.__new__(DynamicBatcher)   # no responder needed
    b.stats = {"requests": 8, "batches": 2, "errors": 0}
    b._lat = []
    b._q = __import__("queue").Queue()
    reqs = [Request(question=np.zeros(1, np.int32),
                    history=np.zeros(1, np.int32), caption=None,
                    features=None) for _ in range(4)]
    b._fail(reqs, RuntimeError("boom"))
    assert b.stats["errors"] == 4
    assert b.metrics()["error_rate"] == 0.5
    assert all(r._event.is_set() and r._error is not None for r in reqs)


def test_clamp_preserves_boundary_tokens():
    """Round-4 review: submit-time length clamping must keep SOS/EOS —
    words2ids wraps text as [SOS, w.., EOS]; a plain head slice dropped the
    EOS from over-long questions and a tail slice dropped the SOS from
    over-long histories."""
    from bist_tpu.serving import _clamp_head, _clamp_tail
    from bist_tpu.vocab import EOS, SOS

    ids = np.array([SOS, 5, 6, 7, 8, 9, EOS], np.int32)
    h = _clamp_head(ids, 4)
    assert len(h) == 4 and list(h[:3]) == [SOS, 5, 6] and h[-1] == EOS
    t = _clamp_tail(ids, 4)
    assert t[0] == SOS and list(t[1:]) == [8, 9, EOS]
    # within-bucket sequences pass through untouched
    assert _clamp_head(ids, 7) is ids
    assert _clamp_tail(ids, 8) is ids


def test_submit_rejects_malformed_audio():
    """Round-4 review: audio gets the same fast-fail validation as video —
    a malformed audio grid must be rejected at submit(), not poison its
    coalesced neighbours in make_batch."""
    from bist_tpu.models.model import init_model as _init

    vocab = dict(SPECIALS)
    vocab["what"] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=0, nb_aenc_blocks=1, d_model=16,
                      att_h=2, dropout=0.0, include_caption="none",
                      separate_caption=False, ft_sizes=(8, 4))
    params = _init(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=2, beam=2, penalty=1.0, nbest=1)
    r = Responder(params, cfg, vocab, gcfg, max_batch=2, len_buckets=(8,),
                  time_buckets=(4,))
    server = DynamicBatcher(r, max_batch=2)   # no start(): raises pre-queue
    fts = np.zeros((4, 4, 8), np.float32)
    with pytest.raises(ValueError, match="audio must be"):
        server.submit("what", features=fts,
                      audio=np.zeros((4,), np.float32))
    with pytest.raises(ValueError, match="audio dim"):
        server.submit("what", features=fts,
                      audio=np.zeros((4, 99), np.float32))


def test_jit_responder_serves_unpinned_grid(rng):
    """Round-4 review: warmup() without an explicit feature_shape must NOT
    pin the served grid to (16, Dv) — a JIT host keeps compiling for
    whatever grid the deployed extractor produces, and one batcher serves
    two different spatial grids concurrently (per-tail dispatch groups)."""
    vocab = dict(SPECIALS)
    for w in "what is he doing".split():
        vocab[w] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=0, d_model=16, att_h=2, dropout=0.0,
                      include_caption="none", separate_caption=False,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=2, beam=2, penalty=1.0, nbest=1)
    responder = Responder(params, cfg, vocab, gcfg, max_batch=2,
                          len_buckets=(8,), time_buckets=(4,))
    responder.warmup(t_clips=4, all_batch_buckets=False)
    assert responder.feat_tail is None
    server = DynamicBatcher(responder, max_batch=2, max_wait_ms=100)
    server.start()
    try:
        results = {}

        def ask(name, S):
            results[name] = server.submit(
                "what is he doing",
                features=rng.standard_normal((4, S, 8)).astype(np.float32),
                timeout=300.0)

        ts = [threading.Thread(target=ask, args=("s4", 4)),
              threading.Thread(target=ask, args=("s8", 8))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert set(results) == {"s4", "s8"}
        assert all(isinstance(v, str) for v in results.values())
    finally:
        server.stop()


@pytest.mark.slow
def test_batcher_multidevice_flagship_geometry(rng):
    """VERDICT r3 #3: the full serving path (DynamicBatcher → Responder →
    dp-sharded beam decode) over a >1-device mesh at the FLAGSHIP model
    geometry — d_model=128, att_h=8, 3/3/3 blocks, (S=16, Dv=2048) ResNeXt
    grid (reference scripts/exec.sh:24-37), the configuration the
    throughput claims cite.  Runs on the 8-device CPU mesh (conftest)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_cfg

    vocab = dict(SPECIALS)
    for w in ("a the man is walking sitting what doing he yes no couch "
              "dog cat room").split():
        vocab[w] = len(vocab)
    cfg = _flagship_cfg(vocab_size=len(vocab), dv=2048)
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=4, beam=5, penalty=1.0, nbest=2)
    responder = Responder(params, cfg, vocab, gcfg, max_batch=4,
                          len_buckets={"q": (16,), "h": (64,), "c": (16,)},
                          time_buckets=(16,))
    assert responder._dp.n == 4, "flagship serving test must be multi-device"
    responder.warmup(feature_shape=(16, 2048), t_clips=16,
                     all_batch_buckets=False)
    server = DynamicBatcher(responder, max_batch=4, max_wait_ms=50)
    server.start()
    try:
        results = {}

        def ask(i):
            results[i] = server.submit(
                "what is he doing", history="a man is walking",
                caption="the dog",
                features=rng.standard_normal(
                    (16, 16, 2048)).astype(np.float32),
                timeout=600.0)

        ts = [threading.Thread(target=ask, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert set(results) == {0, 1, 2, 3}
        assert all(isinstance(v, str) for v in results.values())
        assert server.stats["requests"] >= 4
    finally:
        server.stop()


def test_sample_decode_style_serving(rng):
    """Sampling in serving (round 4): per-request reproducible RNG streams.

    The properties that make sampling servable at all: (a) the same
    (base_seed, request_seed) gives the same answer REGARDLESS of which
    other requests the batcher coalesced it with or which row it landed in
    (row streams fold the request seed, not the row index); (b) omitted
    seeds auto-draw distinct streams."""
    vocab = dict(SPECIALS)
    for w in ("a the man is walking sitting what doing he yes no couch "
              "dog cat room").split():
        vocab[w] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=6, decode_style="sample", temperature=2.0,
                          sample_seed=7)
    responder = Responder(params, cfg, vocab, gcfg, max_batch=4,
                          len_buckets=(8, 16), time_buckets=(8,))
    responder.warmup(feature_shape=(4, 8), t_clips=8)
    server = DynamicBatcher(responder, max_batch=4, max_wait_ms=20)
    server.start()
    try:
        fts = np.random.default_rng(0).standard_normal((8, 4, 8)) \
            .astype(np.float32)
        ask = lambda seed: server.submit(
            "what is he doing", history="a man is walking",
            caption="the man", features=fts, seed=seed, timeout=120)

        alone = ask(42)
        # coalesce the same seeded request with three neighbours
        answers = {}

        def work(i, seed):
            answers[i] = ask(seed)

        ts = [threading.Thread(target=work, args=(i, s))
              for i, s in enumerate([42, None, 99, None])]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert answers[0] == alone            # batch-composition invariant
        assert ask(99) == answers[2]          # reproducible per seed
        assert ask(42) == alone

        # malformed seeds fail fast at submit() — they would otherwise
        # poison the whole coalesced batch inside dispatch() (round-4
        # review); negative values are reserved for the auto-seed stream
        for bad in ("abc", 2 ** 40, -3, 1.5, True):
            with pytest.raises(ValueError):
                ask(bad)
        assert ask(42) == alone               # server still healthy after
    finally:
        server.stop()


def test_seed_rejected_on_deterministic_server(served, rng):
    """Round-4 review: a 'seed' on a beam_search/greedy server is a client
    misconfiguration (they expect seeded sampling) — reject at submit()
    instead of silently returning deterministic output."""
    fts = rng.standard_normal((5, 4, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="only meaningful"):
        served.submit("what is he doing", features=fts, seed=42)


def test_bundle_style_validated_at_construction():
    """Round-4 review: a Responder built around an AOT program (beam_fn)
    must validate decode_style at LOAD time — a bogus or 'sample' style in
    a bundle's gcfg used to explode on the first request instead."""
    vocab = dict(SPECIALS)
    vocab["a"] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=0, d_model=16, att_h=2, dropout=0.0,
                      include_caption="none", ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    fake_fn = lambda p, b: None  # noqa: E731 — never called
    with pytest.raises(ValueError, match="sample"):
        Responder(params, cfg, vocab,
                  GenerateConfig(maxlen=4, decode_style="sample"),
                  beam_fn=fake_fn)
    with pytest.raises(ValueError, match="decode_style"):
        Responder(params, cfg, vocab,
                  GenerateConfig(maxlen=4, decode_style="bogus"),
                  beam_fn=fake_fn)


def test_warmup_lens_warms_length_buckets(rng):
    """Round-4 review: warmup(lens=...) actually compiles those token-length
    geometries (the param was accepted but dead, so a first request longer
    than the default bucket hit a serve-time compile)."""
    vocab = dict(SPECIALS)
    for w in "a the man is walking what doing he".split():
        vocab[w] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=1, d_model=16, att_h=2, dropout=0.0,
                      include_caption="summary", separate_caption=True,
                      ft_sizes=(8,))
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=3, beam=2, penalty=1.0, nbest=1)
    responder = Responder(params, cfg, vocab, gcfg, max_batch=2,
                          len_buckets=(8, 16, 32), time_buckets=(8,))
    widths = []
    orig = responder.make_batch

    def spy(reqs):
        b = orig(reqs)
        widths.append(b.query.shape[1])
        return b

    responder.make_batch = spy
    responder.warmup(feature_shape=(4, 8), t_clips=8, lens=(8, 32),
                     all_batch_buckets=False)
    assert sorted(set(widths)) == [8, 32]


def test_http_audio_model_round_trip(rng):
    """Round-4 review: audio-visual checkpoints are serveable over HTTP —
    the protocol carries 'audio' / 'audio_b64' alongside features (every
    request to a has_audio model used to 400 at submit); missing 'question'
    and missing int8 scale are client errors (400), not 500s."""
    import base64
    import io
    import json as _json
    import sys
    import threading as _threading
    import urllib.error
    import urllib.request

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from serve import make_http_server

    vocab = dict(SPECIALS)
    for w in "a the man is walking what doing he".split():
        vocab[w] = len(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=1, nb_venc_blocks=1,
                      nb_cenc_blocks=0, nb_aenc_blocks=1, d_model=16,
                      att_h=2, dropout=0.0, include_caption="none",
                      ft_sizes=(8, 6))
    assert cfg.has_audio
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=3, beam=2, penalty=1.0, nbest=1)
    responder = Responder(params, cfg, vocab, gcfg, max_batch=2,
                          len_buckets=(8, 16), time_buckets=(8,))
    responder.warmup(feature_shape=(4, 8), t_clips=8,
                     all_batch_buckets=False)
    server = DynamicBatcher(responder, max_batch=2, max_wait_ms=5)
    server.start()
    httpd = make_http_server("127.0.0.1", 0, server, requires_features=True)
    port = httpd.server_address[1]
    t = _threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    fts = rng.standard_normal((5, 4, 8)).astype(np.float32)
    aud = rng.standard_normal((4, 6)).astype(np.float32)

    def post(obj):
        req = urllib.request.Request(
            f"{base}/respond", data=_json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, _json.load(r)

    try:
        code, resp = post({"question": "what is he doing",
                           "features": fts.tolist(),
                           "audio": aud.tolist()})
        assert code == 200 and isinstance(resp["answer"], str)

        buf = io.BytesIO()
        np.save(buf, aud)
        code, resp = post({"question": "what is he doing",
                           "features": fts.tolist(),
                           "audio_b64": base64.b64encode(
                               buf.getvalue()).decode()})
        assert code == 200 and isinstance(resp["answer"], str)

        # audio omitted on an audio model: submit()'s validation -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"question": "what", "features": fts.tolist()})
        assert ei.value.code == 400

        # missing 'question' is a client error, not a 500
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"features": fts.tolist(), "audio": aud.tolist()})
        assert ei.value.code == 400

        # int8 features upload without the scale field: 400
        q8 = np.zeros((5, 4, 8), np.int8)
        b1 = io.BytesIO()
        np.save(b1, q8)
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"question": "what",
                  "features_b64": base64.b64encode(b1.getvalue()).decode(),
                  "audio": aud.tolist()})
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()
        server.stop()


def test_component_seconds_accumulate(served, rng):
    """metrics()['component_seconds'] (VERDICT r4 #2 attribution): the four
    responder components + the batcher coalesce window all accumulate across
    served requests — the load-sweep attribution contract."""
    m0 = served.metrics()["component_seconds"]
    fts = rng.standard_normal((5, 4, 8)).astype(np.float32)
    for _ in range(3):
        served.submit("what is he doing", history="a man is walking",
                      caption="the man", features=fts)
    m1 = served.metrics()["component_seconds"]
    for key in ("coalesce_s", "assemble_s", "ship_s", "device_wait_s",
                "extract_s"):
        assert key in m1, key
        assert m1[key] >= m0.get(key, 0.0)
    # real work happened on the device path, so the dominant components
    # must have advanced
    assert m1["device_wait_s"] > m0.get("device_wait_s", 0.0)
    assert m1["assemble_s"] > m0.get("assemble_s", 0.0)
