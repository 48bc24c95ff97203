#!/usr/bin/env python
"""Trained-weights answer-band A/B for the extractor int8 stages (VERDICT
r4 #7): does quantizing ResNeXt stages 3-4 to int8 change the ANSWERS of a
model whose output depends entirely on the features?

The caption-copy demo model (the bf16-cache 300/300 protocol's subject)
ignores features, so it cannot answer this.  This script builds the
feature-sensitive analogue end to end:

 1. synthesize N class-patterned videos (8 classes; class = a distinctive
    spatial pattern + noise) as .npy frame stacks;
 2. run the REAL extractor CLI twice on the same videos — the shipping
    bf16 path and bf16+int8 stages 3-4 (`--int8 1`);
 3. train the tiny grid-retrieval dialogue model (constant text, answer =
    class token — the test_video_grounding task shape) on the bf16
    features to convergence;
 4. beam-decode every video under BOTH feature sets and report held-out
    accuracy per set + answer agreement.

Extraction runs wherever the default backend lives (the TPU on this image);
training/decoding force CPU (tiny model, avoids tunnel exposure).

Usage: python scripts/int8_answer_band.py [--videos 64] [--steps 6000]
       [--workdir /tmp/int8_band]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CLASS = 8
FRAMES, H, W = 24, 112, 112


def make_videos(workdir, n, rng):
    """Class-patterned uint8 frame stacks: class = one of 8 oriented
    sinusoidal gratings (distinct spatial frequency + orientation + hue),
    plus per-video phase jitter and pixel noise."""
    vdir = os.path.join(workdir, "videos")
    os.makedirs(vdir, exist_ok=True)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    labels = {}
    for i in range(n):
        c = i % N_CLASS
        theta = np.pi * c / N_CLASS
        freq = 0.08 + 0.04 * (c % 4)
        phase = rng.uniform(0, 2 * np.pi)
        wave = np.sin(freq * (np.cos(theta) * xx + np.sin(theta) * yy)
                      + phase)
        frames = np.zeros((FRAMES, H, W, 3), np.float32)
        hue = np.array([(c >> 2) & 1, (c >> 1) & 1, c & 1], np.float32)
        hue = 0.5 + 0.5 * hue
        for t in range(FRAMES):
            drift = wave * np.cos(0.3 * t) * 60.0
            frames[t] = 128.0 + drift[..., None] * hue
        frames += rng.normal(0, 12.0, frames.shape)
        vid = f"vid{i:04d}"
        np.save(os.path.join(vdir, vid + ".npy"),
                np.clip(frames, 0, 255).astype(np.uint8))
        labels[vid] = c
    return vdir, labels


def extract(vdir, outdir, int8):
    cmd = [sys.executable, os.path.join(REPO, "extract_features.py"),
           "--video_root", vdir, "--output", outdir, "--mode", "feature",
           "--bf16", "1", "--batch_size", "64", "--int8", str(int(int8))]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    if r.returncode != 0:
        sys.exit(f"extract failed (int8={int8}): {r.stderr[-2000:]}")
    print(f"# extracted int8={int8} in {time.time() - t0:.0f}s",
          file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=64)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--holdout", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/int8_band")
    ap.add_argument("--skip-extract", action="store_true",
                    help="reuse an existing workdir's feature dirs")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    os.makedirs(args.workdir, exist_ok=True)
    vdir, labels = make_videos(args.workdir, args.videos, rng)
    fdir_f, fdir_q = (os.path.join(args.workdir, d)
                      for d in ("feat_bf16", "feat_int8"))
    if not args.skip_extract:
        extract(vdir, fdir_f, int8=False)
        extract(vdir, fdir_q, int8=True)

    # ---- training/decoding on CPU (tiny model; no tunnel exposure) ----
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bist_tpu.config import GenerateConfig, ModelConfig, TrainConfig
    from bist_tpu.data.batching import Batch
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.models.model import init_model
    from bist_tpu.train.loop import TrainState, make_train_step
    from bist_tpu.train.schedule import make_optimizer
    from bist_tpu.vocab import EOS, PAD, SOS

    vids = sorted(labels)
    feats = {d: {v: np.load(os.path.join(d, v + ".npy")).astype(np.float32)
                 for v in vids} for d in (fdir_f, fdir_q)}
    T_clips = max(f.shape[0] for f in feats[fdir_f].values())
    S, Dv = feats[fdir_f][vids[0]].shape[1:]
    # per-DIM z-score with train-set statistics (shared by both feature
    # sets, like a deployed normalizer): random-init ResNeXt features have
    # per-dim scales spanning orders of magnitude — a global scalar leaves
    # a few huge dims dominating the projection and the task unlearnable
    # (measured: flat at chance for 5k steps)
    train_stack = np.stack([feats[fdir_f][v] for v in vids[:-args.holdout]])
    mu = train_stack.mean(axis=(0, 1, 2))
    sd = train_stack.std(axis=(0, 1, 2)) + 1e-6
    print(f"# {len(vids)} videos, grid ({T_clips},{S},{Dv}), "
          f"per-dim sd range [{sd.min():.3g}, {sd.max():.3g}]",
          file=sys.stderr)

    V, B = 60, args.batch
    LQ, LH, LC = 5, 7, 4
    SIG0 = 4

    def fixed_text(L, seed):
        x = np.random.default_rng(seed).integers(
            SIG0 + N_CLASS, V, size=(1, L)).astype(np.int32)
        x[:, -1] = PAD
        return x

    q0, h0, c0 = fixed_text(LQ, 7), fixed_text(LH, 8), fixed_text(LC, 9)

    def batch_for(vid_rows, fdir):
        fts = np.zeros((len(vid_rows), T_clips, S, Dv), np.float32)
        ans = np.zeros((len(vid_rows), 1), np.int32)
        for r, v in enumerate(vid_rows):
            f = (feats[fdir][v] - mu) / sd
            fts[r, :f.shape[0]] = f
            ans[r, 0] = SIG0 + labels[v]
        trg = np.concatenate([np.full((len(vid_rows), 1), SOS, np.int32),
                              ans], 1)
        trg_y = np.concatenate([ans, np.full((len(vid_rows), 1), EOS,
                                             np.int32)], 1)
        rep = lambda t: np.repeat(t, len(vid_rows), 0)
        return Batch(query=rep(q0), his=rep(h0), trg=trg, trg_y=trg_y,
                     cap=rep(c0), fts=fts, audio_fts=None), ans

    train_vids = vids[:-args.holdout]
    eval_vids = vids[-args.holdout:]
    cfg = ModelConfig(vocab_size=V, nb_blocks=2, nb_venc_blocks=2,
                      nb_cenc_blocks=2, d_model=16, att_h=2, dropout=0.0,
                      attn_dropout=0.0, include_caption="summary",
                      separate_caption=True, enc_st_combine="none",
                      enc_vc_combine="dyn", dec_st_combine="seq",
                      ft_sizes=(Dv,), nb_aenc_blocks=0, ptr_gen=False,
                      t2s=True, s2t=True)
    tcfg = TrainConfig(warmup_steps=10, smoothing=0.1, noam_factor=1.0)
    params = init_model(jax.random.PRNGKey(7), cfg)
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps, tcfg.noam_factor,
                        tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(args.steps):
        rows = [train_vids[j] for j in
                rng.integers(0, len(train_vids), size=B)]
        b, _ = batch_for(rows, fdir_f)
        state, m = step_fn(state, b, key)
        if i % 1000 == 0:
            print(f"# step {i} loss {float(m['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)

    gcfg = GenerateConfig(maxlen=3, beam=3, penalty=1.0, nbest=1)
    beam_jit = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))

    def decode_all(fdir):
        out = {}
        for s0 in range(0, len(vids), B):
            rows = vids[s0:s0 + B]
            if len(rows) < B:
                rows = rows + [vids[0]] * (B - len(rows))
            b, _ = batch_for(rows, fdir)
            r = beam_jit(state.params, b)
            toks = np.asarray(r.tokens)
            lens = np.asarray(r.lengths)
            for ri, v in enumerate(rows[:len(vids) - s0]):
                out[v] = tuple(int(t) for t in toks[ri, 0, :lens[ri, 0]])
        return out

    ans_f = decode_all(fdir_f)
    ans_q = decode_all(fdir_q)

    def acc(ans, pool):
        return sum(ans[v] == (SIG0 + labels[v],) for v in pool) / len(pool)

    agree = sum(ans_f[v] == ans_q[v] for v in vids) / len(vids)
    result = {
        "train_acc_bf16": acc(ans_f, train_vids),
        "train_acc_int8": acc(ans_q, train_vids),
        "holdout_acc_bf16": acc(ans_f, eval_vids),
        "holdout_acc_int8": acc(ans_q, eval_vids),
        "answer_agreement": agree,
        "n_videos": len(vids),
        "protocol": "train on bf16 features, decode both; int8 stages 3-4",
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
