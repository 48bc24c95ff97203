#!/usr/bin/env python
"""Feature-extraction entry point — role-equivalent to the reference
video-classification-3d-cnn-pytorch/main.py (run offline before training;
SURVEY.md §2.3/§3.4).

Per video: decode frames (ffmpeg subprocess when available, else a directory
of jpgs or an .npy frame stack), build 16-frame clips with --stride, run the
JAX ResNeXt-101 3D backbone, and dump one `<output>/<vid>.npy` per video in
the (T_clips, 16, 2048) channels-last layout the data pipeline consumes
(the §2.3 layout caveat — the reference main.py:73 dumps the untransposed
grid its own loader cannot read; we emit the consumable layout directly).

Job sharding: --start_idx/--end_idx file ranges across invocations, same
contract as the reference (main.py:57, run.sh:1-2).

Usage:
  python extract_features.py --video_root <dir> --output <dir> \
      --model resnext-101-kinetics.pth --mode feature --spatio_temporal 1 \
      --sample_duration 16 --stride 4 [--start_idx 0 --end_idx 100]
"""

import argparse
import glob
import json
import os
import queue
import shutil
import subprocess
import sys
import tempfile
import threading

import numpy as np


def decode_video_ffmpeg(path: str, tmpdir: str) -> np.ndarray:
    """video file → (T, H, W, 3) uint8 via ffmpeg jpg dump
    (reference main.py:70)."""
    from PIL import Image

    subprocess.check_call(
        ["ffmpeg", "-nostdin", "-loglevel", "error", "-i", path,
         os.path.join(tmpdir, "image_%05d.jpg")])
    files = sorted(glob.glob(os.path.join(tmpdir, "image_*.jpg")))
    if not files:
        raise RuntimeError(f"no frames decoded from {path}")
    return np.stack([np.asarray(Image.open(f).convert("RGB")) for f in files])


def load_frames(path: str) -> np.ndarray:
    """Accept a video file (needs ffmpeg), a frame directory of jpg/png, or a
    .npy (T, H, W, 3) stack."""
    from PIL import Image

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.jpg"))
                       + glob.glob(os.path.join(path, "*.png")))
        if not files:
            raise RuntimeError(f"no frames in {path}")
        return np.stack([np.asarray(Image.open(f).convert("RGB"))
                         for f in files])
    if path.endswith(".npy"):
        return np.load(path)
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            "ffmpeg not available; provide frame directories or .npy stacks")
    with tempfile.TemporaryDirectory() as tmp:
        return decode_video_ffmpeg(path, tmp)


def _save_video_output(args, mode, vid, feats, windows, i, total):
    """Write one video's features (.npy) or scores (.json) — shared by the
    per-video and packed paths."""
    if mode == "score":
        top = np.argsort(-feats, axis=-1)[:, :5]
        out_json = os.path.join(args.output, vid + ".json")
        with open(out_json, "w") as f:
            json.dump({"video": vid, "clips": [
                {"top5": [int(c) for c in row],
                 "scores": [float(feats[k, c]) for c in row],
                 "segment": [windows[k][0] + 1, max(windows[k]) + 1]}
                for k, row in enumerate(top)]}, f, indent=1)
        print(f"[{i + 1}/{total}] {vid}: scored {feats.shape[0]} clips")
    else:
        np.save(os.path.join(args.output, vid + ".npy"), feats)
        print(f"[{i + 1}/{total}] {vid}: {feats.shape}")


def run_packed(entries, args, params, apply_fn, mode):
    """Cross-video clip packing: device batches are always exactly
    `--batch_size` clips, drawn across video boundaries, so short videos no
    longer pad out whole batches (the per-video path pads the tail chunk of
    EVERY video).  A producer thread decodes/preprocesses the next videos
    while the device computes — decode and compute overlap, the reference's
    DataLoader(num_workers) role (classify.py:21-22).  Outputs are
    bit-identical to the per-video path (same clips, same network)."""
    from bist_tpu.models.resnext3d import make_clip_windows, preprocess_frames

    total = len(entries)
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def producer():
        for i, path in enumerate(entries):
            vid = os.path.splitext(os.path.basename(path))[0]
            suffix = ".json" if mode == "score" else ".npy"
            if os.path.exists(os.path.join(args.output, vid + suffix)):
                print(f"[{i + 1}/{total}] {vid}: exists, skip")
                continue
            try:
                frames = load_frames(path)
                proc = preprocess_frames(frames)
                windows = make_clip_windows(len(proc), args.sample_duration,
                                            args.stride)
                if not windows:
                    raise ValueError("no frames")
                clips = np.stack([proc[w] for w in windows])
            except Exception as e:   # per-video resilience (reference main.py)
                print(f"[{i + 1}/{total}] {vid}: FAILED ({e})")
                continue
            q.put((i, vid, clips, windows))
        q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    B = args.batch_size
    buf_rows = []          # clip arrays, in arrival order
    buf_owner = []         # parallel: index into `open_videos`
    open_videos = []       # [i, vid, windows, n_clips, outputs:list]

    def flush(final=False):
        nonlocal buf_rows, buf_owner
        while len(buf_rows) >= B or (final and buf_rows):
            take = min(B, len(buf_rows))
            chunk = np.stack(buf_rows[:take])
            if take < B:
                chunk = np.concatenate(
                    [chunk, np.zeros((B - take,) + chunk.shape[1:],
                                     chunk.dtype)])
            out = np.asarray(apply_fn(params, chunk))[:take]
            for owner, row in zip(buf_owner[:take], out):
                open_videos[owner][4].append(row)
            buf_rows = buf_rows[take:]
            buf_owner = buf_owner[take:]
            # save any videos whose clips are all back (arrival order)
            for idx, v in enumerate(open_videos):
                if v is not None and len(v[4]) == v[3]:
                    i, vid, windows, _, outs = v
                    _save_video_output(args, mode, vid, np.stack(outs),
                                       windows, i, total)
                    open_videos[idx] = None

    while True:
        item = q.get()
        if item is None:
            break
        i, vid, clips, windows = item
        open_videos.append([i, vid, windows, len(clips), []])
        owner = len(open_videos) - 1
        for c in clips:
            buf_rows.append(c)
            buf_owner.append(owner)
        flush()
    flush(final=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video_root", required=True,
                   help="directory of videos / frame dirs / .npy stacks")
    p.add_argument("--output", required=True, help="output feature directory")
    p.add_argument("--model", default="",
                   help="pretrained Kinetics ResNeXt-101 .pth; empty = random "
                        "init (testing only)")
    p.add_argument("--mode", default="feature", choices=["feature", "score"])
    p.add_argument("--spatio_temporal", type=int, default=1)
    p.add_argument("--temporal_only", type=int, default=0)
    p.add_argument("--sample_duration", type=int, default=16)
    p.add_argument("--stride", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=128,
                   help="clips per device batch; 128 measured optimal on v5e bf16 (BENCH.md round 3; padding waste is gone under --pack)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel devices for the conv stage (batch "
                        "rows sharded over a ('data',) mesh, params "
                        "replicated); 0 = auto (largest count dividing "
                        "--batch_size), 1 = single device")
    p.add_argument("--pack", type=int, default=1,
                   help="pack clips ACROSS videos into full device batches "
                        "(short videos no longer pad out whole batches) and "
                        "overlap host decode with device compute via a "
                        "producer thread; 0 restores per-video batching. "
                        "Outputs identical either way.")
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=-1)
    p.add_argument("--model_name", default="resnext",
                   choices=["resnext", "resnet", "preresnet", "wideresnet",
                            "densenet"],
                   help="backbone family (reference model.py:7-120 zoo)")
    p.add_argument("--model_depth", type=int, default=101)
    p.add_argument("--resnet_shortcut", default="B", choices=["A", "B"])
    p.add_argument("--wide_resnet_k", type=int, default=2)
    p.add_argument("--bf16", type=int, default=0,
                   help="run the conv stack in bfloat16 (f32 accumulation; "
                        "~1e-2 relative feature deviation, 2x MXU rate)")
    p.add_argument("--int8", type=int, default=0,
                   help="quantize bottleneck convs to int8 (per-channel "
                        "weights; stem stays bf16) — the v5e MXU's "
                        "2x-over-bf16 path.  resnext family only; runs "
                        "single-device (--dp ignored)")
    p.add_argument("--int8-calib", default="first",
                   choices=["first", "dynamic"],
                   help="int8 activation scales: 'first' self-calibrates "
                        "static per-tensor scales on the first batch "
                        "(reduce-free fast path); 'dynamic' recomputes "
                        "abs-max per conv input every batch")
    p.add_argument("--int8-stages", default="3,4",
                   help="comma list of 1-based stages to quantize, or "
                        "'all'.  Default '3,4' is the measured v5e winner "
                        "(1.048x at decider precision, BENCH.md): compute "
                        "density is highest and requant passes cheapest "
                        "there; quantizing stages 1-2 too measured 0.974x "
                        "(the requant HBM passes outweigh the MXU win)")
    args = p.parse_args(argv)

    import jax

    from bist_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bist_tpu.models.resnext3d import (
        extract_video_features, init_resnext101, load_torch_resnext,
        resnext101_apply)

    if args.model_name == "resnext":
        from bist_tpu.models.resnext3d import DEPTH_BLOCKS

        if args.model_depth not in DEPTH_BLOCKS:
            sys.exit(f"resnext depth must be one of {sorted(DEPTH_BLOCKS)} "
                     "(reference model.py:54-64)")
        if args.model:
            params = load_torch_resnext(args.model)  # depth inferred from sd
            print(f"loaded checkpoint {args.model}")
        else:
            params = init_resnext101(jax.random.PRNGKey(0),
                                     depth=args.model_depth)
            print("WARNING: random init (no --model checkpoint)")
        backbone = lambda p, c, mode: resnext101_apply(p, c, mode=mode)
    else:
        from bist_tpu.models.backbones3d import (backbone_apply,
                                                 init_backbone,
                                                 load_torch_backbone)

        name = {"preresnet": "preact_resnet"}.get(args.model_name,
                                                  args.model_name)
        if args.model:
            import torch

            blob = torch.load(args.model, map_location="cpu",
                              weights_only=False)
            sd = blob.get("state_dict", blob)
            arch, params = load_torch_backbone(
                sd, name, args.model_depth, shortcut=args.resnet_shortcut,
                wide_k=args.wide_resnet_k)
            print(f"loaded checkpoint {args.model}")
        else:
            arch, params = init_backbone(
                jax.random.PRNGKey(0), name, args.model_depth,
                shortcut=args.resnet_shortcut, wide_k=args.wide_resnet_k)
            print("WARNING: random init (no --model checkpoint)")
        backbone = lambda p, c, mode: backbone_apply(arch, p, c, mode=mode)

    if args.mode == "score":
        mode = "score"
    else:
        mode = "spatio_temporal" if args.spatio_temporal else "temporal_only"
        if args.temporal_only:
            mode = "temporal_only"
    if args.int8:
        if args.model_name != "resnext":
            sys.exit("--int8 supports the resnext family only")
        import jax.numpy as jnp

        from bist_tpu.models.resnext3d import (collect_act_scales,
                                               quantize_resnext_int8)

        if args.int8_stages.strip().lower() == "all":
            q_stages = None
        else:
            try:
                q_stages = tuple(sorted(
                    int(s) - 1 for s in args.int8_stages.split(",")))
            except ValueError:
                sys.exit(f"--int8-stages wants a comma list of 1-based "
                         f"stage numbers or 'all', got {args.int8_stages!r}")
            if any(s < 0 or s > 3 for s in q_stages):
                sys.exit("--int8-stages values must be in 1..4")

        # stem goes bf16, bottlenecks int8 (folded bn stays f32 — it is the
        # quantization-scale carrier), input staged bf16 like --bf16
        inner_q = jax.jit(lambda p, c: backbone(
            p, c.astype(jnp.bfloat16), mode).astype(jnp.float32))
        if args.int8_calib == "dynamic":
            params = quantize_resnext_int8(params, stages=q_stages)
            apply_fn = inner_q
        else:
            # static scales self-calibrated on the first batch: one float
            # forward records per-conv-input abs-max, then every batch runs
            # the reduce-free static path (quantize fuses into the producer)
            collect = jax.jit(
                lambda p, c: collect_act_scales(p, c.astype(jnp.bfloat16)))
            state = {"fp": params, "qp": None}

            def apply_fn(p, c, _s=state):
                if _s["qp"] is None:
                    scales = jax.device_get(collect(_s["fp"], c))
                    _s["qp"] = quantize_resnext_int8(_s["fp"],
                                                     act_scales=scales,
                                                     stages=q_stages)
                    _s["fp"] = None
                    print("int8: calibrated static scales on first batch")
                return inner_q(_s["qp"], c)

            # drop main()'s reference so the float net is actually freed
            # after calibration (apply_fn manages its params via `state`;
            # the `p` argument is ignored on this path)
            params = None
    elif args.bf16:
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x,
            params)
        apply_fn = jax.jit(lambda p, c: backbone(
            p, c.astype(jnp.bfloat16), mode).astype(jnp.float32))
    else:
        apply_fn = jax.jit(lambda p, c: backbone(p, c, mode))

    # data-parallel conv stage: clip-batch rows sharded over a ('data',)
    # mesh, params replicated, XLA runs every chip (the extraction analogue
    # of training's mesh DP — rows are independent, so outputs are
    # identical to single-device).  --dp 0 auto-sizes to the largest
    # device count dividing --batch_size.
    n_avail = len(jax.devices())
    dp_n = args.dp if args.dp > 0 else max(
        n for n in range(1, n_avail + 1) if args.batch_size % n == 0)
    if args.int8:
        # the int8 path manages its own (possibly lazily-quantized) params;
        # keep it off the replicated-params mesh wrapper
        dp_n = 1
    if dp_n > 1:
        from bist_tpu.parallel.mesh import DataParallel

        if args.batch_size % dp_n:
            sys.exit(f"--batch_size {args.batch_size} not divisible by "
                     f"--dp {dp_n}")
        dpar = DataParallel(num_devices=dp_n)
        params = dpar.put_replicated(params)
        print(f"extraction mesh: {dp_n} of {n_avail} device(s)")
        inner_fn = apply_fn

        def apply_fn(p, c, _inner=inner_fn, _d=dpar):  # noqa: F811
            return _inner(p, _d.shard(c))

    entries = sorted(
        glob.glob(os.path.join(args.video_root, "*.mp4"))
        + glob.glob(os.path.join(args.video_root, "*.gif"))
        + glob.glob(os.path.join(args.video_root, "*.webm"))
        + glob.glob(os.path.join(args.video_root, "*.npy"))
        + [d for d in glob.glob(os.path.join(args.video_root, "*"))
           if os.path.isdir(d)])
    end = args.end_idx if args.end_idx >= 0 else len(entries)
    entries = entries[args.start_idx:end]
    os.makedirs(args.output, exist_ok=True)

    if args.pack:
        run_packed(entries, args, params, apply_fn, mode)
        return

    for i, path in enumerate(entries):
        vid = os.path.splitext(os.path.basename(path))[0]
        suffix = ".json" if mode == "score" else ".npy"
        if os.path.exists(os.path.join(args.output, vid + suffix)):
            print(f"[{i + 1}/{len(entries)}] {vid}: exists, skip")
            continue
        try:
            frames = load_frames(path)
            feats = extract_video_features(
                params, frames, stride=args.stride,
                batch_size=args.batch_size, mode=mode, apply_fn=apply_fn,
                sample_duration=args.sample_duration)
            # `segment` in score JSON: the clip's 1-based [first, last]
            # frame range (the generate_result_video.py contract, reference
            # generate_result_video.py:62-63)
            from bist_tpu.models.resnext3d import make_clip_windows

            windows = make_clip_windows(len(frames), args.sample_duration,
                                        args.stride)
            _save_video_output(args, mode, vid, feats, windows, i,
                               len(entries))
        except Exception as e:  # match the reference's per-video resilience
            print(f"[{i + 1}/{len(entries)}] {vid}: FAILED ({e})")


if __name__ == "__main__":
    main()
