"""extract_features.py CLI: packed (cross-video clip batching + decode
thread) vs per-video batching must produce identical .npy features and
identical score JSONs; skip-existing respects the per-mode suffix."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import extract_features


def _make_videos(root, rng, specs):
    """specs: {vid: n_frames} → .npy frame stacks (no ffmpeg needed)."""
    os.makedirs(root, exist_ok=True)
    for vid, n in specs.items():
        frames = rng.integers(0, 255, size=(n, 64, 80, 3)).astype(np.uint8)
        np.save(os.path.join(root, vid + ".npy"), frames)


@pytest.mark.slow
def test_packed_matches_pervideo(tmp_path, rng):
    vroot = tmp_path / "videos"
    # clip counts 1 / 2 / 5 at stride 8: exercises batches spanning videos
    _make_videos(str(vroot), rng, {"a": 8, "b": 12, "c": 40})
    base = ["--video_root", str(vroot), "--stride", "8", "--batch_size", "4",
            "--model_name", "resnet", "--model_depth", "10"]

    out_pv = tmp_path / "per_video"
    extract_features.main(base + ["--output", str(out_pv), "--pack", "0"])
    out_pk = tmp_path / "packed"
    extract_features.main(base + ["--output", str(out_pk), "--pack", "1"])

    for vid in ("a", "b", "c"):
        pv = np.load(out_pv / f"{vid}.npy")
        pk = np.load(out_pk / f"{vid}.npy")
        np.testing.assert_array_equal(pv, pk)
        assert pv.shape[1] == 16   # S spatial grid positions


@pytest.mark.slow
def test_packed_score_mode_and_skip(tmp_path, rng):
    vroot = tmp_path / "videos"
    _make_videos(str(vroot), rng, {"a": 8, "b": 12})
    out = tmp_path / "scores"
    args = ["--video_root", str(vroot), "--output", str(out), "--stride",
            "8", "--batch_size", "4", "--mode", "score", "--pack", "1",
            "--model_name", "resnet", "--model_depth", "10"]
    extract_features.main(args)
    for vid in ("a", "b"):
        with open(out / f"{vid}.json") as f:
            blob = json.load(f)
        assert blob["video"] == vid
        for clip in blob["clips"]:
            assert len(clip["top5"]) == 5 and len(clip["segment"]) == 2
    # second run skips via the .json suffix (regression: the per-video loop
    # used to check .npy in score mode and re-scored every time)
    mt = {v: os.path.getmtime(out / f"{v}.json") for v in ("a", "b")}
    extract_features.main(args)
    assert all(os.path.getmtime(out / f"{v}.json") == mt[v]
               for v in ("a", "b"))


@pytest.mark.slow
def test_dp_extraction_matches_single_device(tmp_path, rng):
    """--dp N shards clip-batch rows over a ('data',) mesh (round 4).  Rows
    are independent through the conv stack, so multi-device outputs equal
    single-device bit-for-bit."""
    vroot = tmp_path / "videos"
    _make_videos(str(vroot), rng, {"a": 20, "b": 12})
    base = ["--video_root", str(vroot), "--stride", "8", "--batch_size", "4",
            "--mode", "feature", "--spatio_temporal", "1"]
    out1 = str(tmp_path / "dp1")
    out4 = str(tmp_path / "dp4")
    extract_features.main(base + ["--output", out1, "--dp", "1"])
    extract_features.main(base + ["--output", out4, "--dp", "4"])
    for vid in ("a", "b"):
        x1 = np.load(os.path.join(out1, vid + ".npy"))
        x4 = np.load(os.path.join(out4, vid + ".npy"))
        np.testing.assert_array_equal(x1, x4)


@pytest.mark.slow
def test_int8_extraction_close_to_f32(tmp_path, rng):
    """--int8 (first-batch-calibrated static scales): same shapes, features
    within a small relative distance of the f32 run (opt-in speed knob for
    the v5e's 2x int8 MXU, not a parity mode).  The default --int8-stages
    '3,4' is the measured-winner config (BENCH.md); 'all' (the measured
    loser, kept for study) must also run, stay in band, and actually
    quantize the extra stages (its output differs from the '3,4' run)."""
    vroot = tmp_path / "videos"
    _make_videos(str(vroot), rng, {"a": 8})
    base = ["--video_root", str(vroot), "--stride", "8", "--batch_size", "2",
            "--model_name", "resnext", "--model_depth", "50"]
    out_f = tmp_path / "f32"
    out_q = tmp_path / "int8"
    out_qa = tmp_path / "int8all"
    extract_features.main(base + ["--output", str(out_f)])
    extract_features.main(base + ["--output", str(out_q), "--int8", "1"])
    extract_features.main(base + ["--output", str(out_qa), "--int8", "1",
                                  "--int8-stages", "all"])
    f = np.load(out_f / "a.npy")
    q = np.load(out_q / "a.npy")
    qa = np.load(out_qa / "a.npy")
    assert f.shape == q.shape == qa.shape
    rel = np.linalg.norm(q - f) / max(np.linalg.norm(f), 1e-9)
    rel_all = np.linalg.norm(qa - f) / max(np.linalg.norm(f), 1e-9)
    assert rel < 0.08, f"int8 features relative error {rel:.4f}"
    assert rel_all < 0.08, f"int8-all relative error {rel_all:.4f}"
    # 'all' must not silently degrade to the '3,4' subset: quantizing the
    # extra stages has to move the features (error monotonicity is NOT
    # asserted — rounding errors can cancel — only that the paths differ)
    assert np.linalg.norm(qa - q) > 0, "--int8-stages all matched '3,4'"
