#!/usr/bin/env python
"""On-chip AOT bundle smoke (VERDICT r3 #4): export a ('cpu','tpu') bundle
on the CPU host, then serve it on the attached accelerator and answer one
HTTP request — closing the deployment-claim loop (the TPU half of
multi-platform bundles executing on a real TPU).

Flow (two fresh interpreters, like a real deploy):
  1. export:  python serve.py --export-bundle <dir> --export-platforms
     cpu,tpu --device cpu   (model checkpoint synthesized here)
  2. serve:   python serve.py --bundle <dir> [--device cpu]  on the target
     backend; this process POSTs /respond and reports startup + latency.

Usage: python scripts/bundle_smoke.py [--device ''|cpu] [--d-model 128]
       [--keep DIR]
"""

import argparse
import base64
import io
import json
import os
import socket
import subprocess
import sys
import tempfile
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="",
                    help="'' = default backend (the TPU on this image); "
                         "'cpu' for a CPU rehearsal")
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--t-clips", type=int, default=16)
    ap.add_argument("--dv", type=int, default=2048)
    ap.add_argument("--keep", default="", help="bundle dir (default: tmp)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")    # this process stays on CPU
    import numpy as np

    from bist_tpu.config import TrainConfig
    from bist_tpu.models.model import init_model
    from bist_tpu.train.checkpoint import save_checkpoint
    from bist_tpu.config import save_conf
    from bist_tpu.train.loop import TrainState
    from bist_tpu.vocab import get_vocabulary
    from __graft_entry__ import _flagship_cfg

    tmp = args.keep or tempfile.mkdtemp(prefix="bundle_smoke_")
    os.makedirs(tmp, exist_ok=True)
    model = os.path.join(tmp, "mtn")
    bundle = os.path.join(tmp, "bundle")

    test_json = os.path.join(HERE, "dstc7avsd_eval", "data",
                             "test_set4DSTC7-AVSD.json")
    vocab = get_vocabulary(test_json, cutoff=3, include_caption="summary")
    cfg = _flagship_cfg(vocab_size=len(vocab), dv=args.dv)
    if args.d_model != 128:
        cfg = cfg.replace(d_model=args.d_model,
                          att_h=max(2, args.d_model // 16))
    params = init_model(jax.random.PRNGKey(0), cfg)
    state = TrainState(params=params, opt_state=(), step=0)
    save_checkpoint(model + "_best", state)
    save_conf(model + ".conf", vocab, cfg, TrainConfig(),
              extra={"fea_type": ["resnext_st"]})

    # 1) export on a CPU host: one small batch bucket, one geometry each
    # for len/time (keeps the on-chip compile budget small)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "serve.py", "--model", model,
         "--export-bundle", bundle, "--export-platforms", "cpu,tpu",
         "--max-batch", "4", "--export-lq", "32", "--export-lh", "64",
         "--export-lc", "64", "--export-t", str(args.t_clips),
         "--scan-unroll", "1", "--device", "cpu"],
        cwd=HERE, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    t_export = time.time() - t0
    n_prog = len(os.listdir(os.path.join(bundle, "programs")))
    print(f"export: {t_export:.1f}s, {n_prog} program(s) "
          f"(platforms cpu,tpu)", file=sys.stderr)

    # 2) serve the bundle on the target backend in a fresh interpreter
    port = free_port()
    serve_args = [sys.executable, "serve.py", "--bundle", bundle,
                  "--port", str(port), "--scan-unroll", "1"]
    if args.device:
        serve_args += ["--device", args.device]
    t0 = time.time()
    proc = subprocess.Popen(serve_args, cwd=HERE,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    try:
        url = f"http://127.0.0.1:{port}"
        deadline = time.time() + 1500
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                out, err = proc.communicate()
                raise SystemExit(f"server died: {err[-3000:]}")
            try:
                with urllib.request.urlopen(url + "/healthz", timeout=5):
                    up = True
                    break
            except Exception:
                time.sleep(2)
        assert up, "server never came up"
        t_start = time.time() - t0
        print(f"bundle server up (deserialize + backend compile + warmup): "
              f"{t_start:.1f}s", file=sys.stderr)

        rng = np.random.default_rng(0)
        fts = rng.standard_normal(
            (args.t_clips, 16, args.dv)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, fts)
        body = json.dumps({
            "question": "what is the person doing",
            "history": "a man is in a room",
            "caption": "a man does things",
            "features_b64": base64.b64encode(buf.getvalue()).decode(),
        }).encode()
        t0 = time.time()
        req = urllib.request.Request(url + "/respond", data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            ans = json.loads(resp.read())
        t_resp = time.time() - t0
        assert "answer" in ans, ans
        print(json.dumps({
            "bundle_smoke": "ok", "device": args.device or "default(tpu)",
            "export_s": round(t_export, 1), "startup_s": round(t_start, 1),
            "first_response_s": round(t_resp, 2),
            "answer_words": len(ans["answer"].split()),
            "programs": n_prog,
        }))
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
