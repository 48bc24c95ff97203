#!/usr/bin/env python
"""HTTP serving entry point: a JSON API over the dynamic-batching responder.

    python serve.py --model exps/mtn --port 8000 [--device cpu]

    POST /respond   {"question": "...", "history": "...", "caption": "...",
                     "features": [[...]] optional (T, S, Dv) nested lists
                     or "features_b64": base64 of float32 .npy bytes;
                     "audio" / "audio_b64": (Ta, Da) likewise, for
                     audio-visual checkpoints; "seed": int, sampling only}
    → {"answer": "...", "latency_ms": ...}

    GET /healthz    → {"ok": true, "stats": {...}}

Concurrent requests are coalesced into one compiled beam-search batch
(bist_tpu.serving.DynamicBatcher)."""

import argparse
import base64
import io
import json
import logging
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="",
                   help="model prefix (required unless --bundle)")
    p.add_argument("--model-conf", default="")
    p.add_argument("--bundle", default="",
                   help="serve from an AOT bundle directory "
                        "(bist_tpu.export): weights + vocab + serialized "
                        "decode programs; no model tracing on this host")
    p.add_argument("--export-bundle", default="",
                   help="write an AOT bundle for the serving geometry to "
                        "this directory and exit (load it with --bundle)")
    p.add_argument("--export-platforms", default="",
                   help="comma-separated lowering targets for "
                        "--export-bundle (e.g. cpu,tpu); default: current "
                        "backend only")
    p.add_argument("--export-lq", default="32",
                   help="comma list of question length buckets baked into "
                        "--export-bundle programs")
    p.add_argument("--export-lh", default="64,256",
                   help="comma list of history length buckets for "
                        "--export-bundle (histories grow with dialogue "
                        "turns; the largest is also the serve-time clamp)")
    p.add_argument("--export-lc", default="64",
                   help="comma list of caption length buckets for "
                        "--export-bundle")
    p.add_argument("--export-t", default="",
                   help="comma list of video clip-count buckets for "
                        "--export-bundle (default: the responder's time "
                        "buckets)")
    p.add_argument("--export-dp", type=int, default=1,
                   help="data-parallel width baked into --export-bundle "
                        "programs (batch rows sharded over a dp-chip mesh, "
                        "params replicated); the serving host must have dp "
                        "devices.  Requires every batch bucket divisible "
                        "by dp")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--max-wait-ms", type=float, default=10.0)
    p.add_argument("--pipeline-depth", type=int, default=4,
                   help="batches kept in flight under backlog: batch N+1's "
                        "host assembly + H2D overlaps batch N's decode; 1 "
                        "restores strictly serial dispatch")
    p.add_argument("--feat-int8", type=int, default=0,
                   help="quantize assembled feature grids to int8 host-side "
                        "(4x fewer host->device bytes, dequant on device) — "
                        "the serving analogue of train.py --feat-int8")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--decode-style", default="beam_search",
                   choices=["beam_search", "greedy", "sample"],
                   help="greedy serves one hypothesis row per request "
                        "(~beam x lower per-step decode cost) at a quality "
                        "cost; sample draws per-request reproducible "
                        "streams (request JSON may carry a 'seed'); "
                        "beam_search is the eval-parity default")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="sampling temperature (decode-style sample)")
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=0.0)
    p.add_argument("--sample-seed", type=int, default=1,
                   help="base RNG key; per-request 'seed' fields fold into "
                        "it, so answers are reproducible per (base, seed)")
    p.add_argument("--cache-dtype", default="bfloat16",
                   choices=["float32", "bfloat16", "float8_e4m3fn",
                            "float8_e5m2"],
                   help="decode KV-cache storage; bf16 measured 1.68x beam "
                        "throughput (BENCH.md round 3) and is the serving "
                        "default; float32 restores bit-parity with "
                        "generate.py; float8_* (1 byte/elem, bf16 compute) "
                        "is experimental — answers may shift")
    p.add_argument("--encode-dtype", default="",
                   choices=["", "float32", "bfloat16"],
                   help="ctx-precompute activation dtype ('' inherits the "
                        "model's training dtype; bfloat16 speeds the "
                        "MXU-bound per-batch precompute slice — answers may "
                        "differ from f32 in ties)")
    p.add_argument("--maxlen", type=int, default=12)
    p.add_argument("--penalty", type=float, default=1.0)
    p.add_argument("--scan-unroll", type=int, default=4,
                   help="beam-scan body replication (identical numerics); "
                        "the decider-precision ladder (round 4 session 6) "
                        "put 4 at the optimum — 1.041x over 6, which was "
                        "itself 1.13x over the plain loop (round 3) — at "
                        "~4x warmup compile time; 1 restores the plain loop")
    p.add_argument("--feat-s", type=int, default=0,
                   help="spatial grid size S of the deployed extractor's "
                        "(T, S, Dv) features: pins the served grid at "
                        "warmup (requests with other grids are rejected "
                        "at submit) and sets the bundle-export S.  0 = "
                        "unpinned on the jit path (grids compile on "
                        "demand), 16 for bundle export (the ResNeXt "
                        "default)")
    p.add_argument("--reference-root", default="",
                   help="salesforce/BiST checkout for serving reference-"
                        "format checkpoints (--model mtn_best + pickled "
                        ".conf; auto-detected)")
    p.add_argument("--device", default="")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s: %(message)s")
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bist_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import os

    from bist_tpu.config import GenerateConfig, load_conf
    from bist_tpu.serving import DynamicBatcher, Responder
    from bist_tpu.train.checkpoint import load_checkpoint

    if args.bundle:
        # AOT path: deserialize the exported decode programs — no model
        # tracing, no jit warmup on this host (bist_tpu/export.py)
        from bist_tpu.export import load_bundle

        # the decode config is BAKED into the bundle's programs; CLI decode
        # flags cannot apply — warn on any the operator set explicitly
        ignored = [f for f in ("decode_style", "beam", "maxlen", "penalty",
                               "cache_dtype", "encode_dtype", "scan_unroll",
                               "temperature",
                               "top_k", "top_p", "sample_seed", "feat_int8",
                               "feat_s")
                   if getattr(args, f) != p.get_default(f)]
        if ignored:
            logging.warning(
                "--bundle serves the bundle's baked decode config; ignoring "
                "CLI flag(s): %s",
                ", ".join("--" + f.replace("_", "-") for f in ignored))
        bundle = load_bundle(args.bundle)
        vocab, cfg = bundle.vocab, bundle.cfg
        responder = bundle.make_responder()
        logging.info("bundle loaded: %d program(s), geometries %s",
                     len(bundle.programs), sorted(bundle.geometries))
    else:
        if not args.model:
            p.error("--model is required unless --bundle is given")
        from bist_tpu.convert import (default_conf_for, is_reference_conf,
                                      load_reference_checkpoint_cli)

        # default conf strips checkpoint suffixes so --model exps/mtn,
        # exps/mtn_best and exps/mtn_best.pth.tar all resolve exps/mtn.conf
        conf = args.model_conf or default_conf_for(args.model)

        if is_reference_conf(conf):
            # drop-in serving of a reference-format checkpoint (same
            # detection as generate.py; see MIGRATING.md)
            logging.info("reference-format checkpoint detected; importing")
            params, cfg, _, vocab, _ = load_reference_checkpoint_cli(
                args.model, conf, reference_root=args.reference_root or None)
        else:
            vocab, cfg, tcfg, _ = load_conf(conf)
            ckpt = args.model + "_best" if os.path.isdir(args.model + "_best") \
                else args.model
            payload = load_checkpoint(ckpt)
            params = payload["params"]
        params = jax.tree_util.tree_map(jnp.asarray, params)

        gcfg = GenerateConfig(maxlen=args.maxlen, beam=args.beam,
                              penalty=args.penalty, nbest=1,
                              cache_dtype=args.cache_dtype,
                              encode_dtype=args.encode_dtype,
                              scan_unroll=args.scan_unroll,
                              decode_style=args.decode_style,
                              temperature=args.temperature,
                              top_k=args.top_k, top_p=args.top_p,
                              sample_seed=args.sample_seed)
        if args.export_bundle and args.decode_style == "sample":
            p.error("--export-bundle supports beam_search/greedy only "
                    "(sampling keys are a live-server policy; serve the "
                    "model with --decode-style sample instead)")
        if args.export_bundle:
            from bist_tpu.export import (default_serving_geometries,
                                         save_bundle)
            from bist_tpu.serving import (DEFAULT_TIME_BUCKETS,
                                          default_batch_buckets)

            # cross product of batch buckets × per-field length buckets ×
            # time buckets: the bundle must carry EVERY shape its serving
            # host's batcher can produce (multi-turn histories routinely
            # exceed one bucket; a missing geometry fails the whole batch).
            # Bucket defaults are pure Python — no Responder (and thus no
            # params H2D over the slow tunnel) is built just to export.
            def buckets(s):
                return tuple(int(x) for x in s.split(",") if x.strip())

            t_buckets = buckets(args.export_t) or DEFAULT_TIME_BUCKETS
            geoms = default_serving_geometries(
                cfg, batch_buckets=default_batch_buckets(args.max_batch),
                Lq=buckets(args.export_lq), Lh=buckets(args.export_lh),
                Lc=buckets(args.export_lc), T=t_buckets,
                S=(args.feat_s or 16),
                Ta=(t_buckets[-1] if cfg.has_audio else None),
                feat_int8=bool(args.feat_int8))
            platforms = tuple(
                s.strip() for s in args.export_platforms.split(",")
                if s.strip()) or None
            save_bundle(args.export_bundle, params, cfg, gcfg, vocab,
                        geoms, platforms=platforms, dp=args.export_dp)
            logging.info("bundle written to %s (%d geometries)",
                         args.export_bundle, len(geoms))
            return
        responder = Responder(params, cfg, vocab, gcfg,
                              max_batch=args.max_batch,
                              feat_int8=bool(args.feat_int8))
    logging.info("warmup compile...")
    if args.bundle:
        # compile every exported geometry — a bundle host must never
        # compile (or KeyError) at serve time
        responder.warmup_geometries(bundle.geometries.values())
    else:
        responder.warmup(
            feature_shape=((args.feat_s, cfg.ft_sizes[0])
                           if args.feat_s and cfg.has_video else None),
            all_batch_buckets=True)
    server_b = DynamicBatcher(responder, max_batch=args.max_batch,
                              max_wait_ms=args.max_wait_ms,
                              pipeline_depth=args.pipeline_depth)
    server_b.start()

    httpd = make_http_server(args.host, args.port, server_b,
                             requires_features=cfg.has_video)
    logging.info("serving on %s:%d", args.host, httpd.server_address[1])
    try:
        httpd.serve_forever()
    finally:
        server_b.stop()


def make_http_server(host, port, server_b, *, requires_features=False):
    """Build (not start) the ThreadingHTTPServer over a DynamicBatcher.
    Separated from main() so tests can drive the HTTP layer with an
    in-process Responder (tests/test_serving.py); port 0 picks a free port
    (read it back from httpd.server_address)."""

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "stats": server_b.stats})
            elif self.path == "/metrics":
                self._send(200, server_b.metrics())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/respond":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))

                def load_array(prefix):
                    # "<prefix>_b64" (base64 .npy bytes; int8 features come
                    # with "<prefix>_scale_b64" alongside) or "<prefix>"
                    # (nested lists) — shared by features and audio
                    if f"{prefix}_b64" in req:
                        raw = base64.b64decode(req[f"{prefix}_b64"])
                        arr = np.load(io.BytesIO(raw), allow_pickle=False)
                        if arr.dtype == np.int8:
                            # client-side int8 upload (4x fewer NIC bytes)
                            skey = f"{prefix}_scale_b64"
                            if skey not in req:
                                raise ValueError(
                                    f"int8 {prefix} upload requires {skey}")
                            sraw = base64.b64decode(req[skey])
                            scale = np.load(io.BytesIO(sraw),
                                            allow_pickle=False)
                            arr = arr.astype(np.float32) * scale
                        return arr
                    if req.get(prefix) is not None:
                        return np.asarray(req[prefix], np.float32)
                    return None

                features = load_array("features")
                audio = load_array("audio")
                if features is None and requires_features:
                    self._send(400, {"error": "model requires features"})
                    return
                if "question" not in req:
                    self._send(400, {"error": "missing 'question' field"})
                    return
                t0 = time.time()
                answer = server_b.submit(
                    req["question"], history=req.get("history", ""),
                    caption=req.get("caption"), features=features,
                    audio=audio, seed=req.get("seed"))
                self._send(200, {"answer": answer,
                                 "latency_ms": (time.time() - t0) * 1e3})
            except (ValueError, KeyError) as e:
                # submit()'s fail-fast validation or a malformed payload
                # (shape/seed/field errors) — a client error, not a 500
                self._send(400, {"error": str(e)})
            except Exception as e:
                self._send(500, {"error": str(e)})

        def log_message(self, fmt, *a):
            logging.debug(fmt, *a)

    return ThreadingHTTPServer((host, port), Handler)


if __name__ == "__main__":
    main()
