"""generate_result_video.py: annotate score-mode results onto frames and
encode without ffmpeg (gif / frame-dir backends); score JSON contract from
extract_features.py --mode score (per-clip top5/scores/segment)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generate_result_video import annotate_frames, unit_labels, write_video


def test_unit_labels_grouping():
    clips = [
        {"top5": [3, 1, 0], "scores": [0.5, 0.3, 0.2], "segment": [1, 16]},
        {"top5": [3, 1, 0], "scores": [0.1, 0.8, 0.1], "segment": [5, 20]},
        {"top5": [2, 4, 0], "scores": [0.9, 0.05, 0.05], "segment": [9, 24]},
    ]
    names = [f"class{i}" for i in range(5)]
    # whole video as one unit: scores accumulate BY CLASS ID across clips —
    # class 1 totals 1.1 (0.3 + 0.8), the group winner
    units = unit_labels(clips, names, 0)
    assert units == [("class1", (1, 24))]
    # unit=2: clips 0-1 -> class 1 again; clip 2 alone -> class 2
    units = unit_labels(clips, names, 2)
    assert units == [("class1", (1, 20)), ("class2", (9, 24))]


def test_unit_labels_descending_producer_scores():
    """The extractor emits each clip's scores sorted DESCENDING; the vote
    must still be able to elect a class that is not clip[0]'s top-1 (a
    positionwise slot average never could — round-3 review finding)."""
    clips = [
        {"top5": [7, 2], "scores": [0.5, 0.4], "segment": [1, 16]},
        {"top5": [2, 9], "scores": [0.6, 0.3], "segment": [5, 20]},
    ]
    names = [f"class{i}" for i in range(10)]
    # class 2 totals 1.0 across the clips; class 7 only 0.5
    assert unit_labels(clips, names, 0) == [("class2", (1, 20))]


def test_annotate_and_write_gif_and_frames(tmp_path):
    frames = np.random.default_rng(0).integers(
        0, 255, size=(6, 64, 80, 3)).astype(np.uint8)
    labels = ["jump"] * 4 + [None] * 2
    images = annotate_frames(frames, labels)
    assert len(images) == 6
    # labelled frames differ from the raw frame (label box drawn)
    assert not np.array_equal(np.asarray(images[0]), frames[0])
    assert np.array_equal(np.asarray(images[5]), frames[5])

    out_gif = write_video(images, str(tmp_path / "v.mp4"), fps=5, fmt="gif")
    assert out_gif.endswith(".gif") and os.path.getsize(out_gif) > 0
    out_dir = write_video(images, str(tmp_path / "v.mp4"), fps=5,
                          fmt="frames")
    assert len(os.listdir(out_dir)) == 6


def test_cli_end_to_end_npy_input(tmp_path):
    """Full CLI drive on an .npy frame stack (no ffmpeg needed)."""
    from generate_result_video import main

    vroot = tmp_path / "videos"
    vroot.mkdir()
    frames = np.random.default_rng(1).integers(
        0, 255, size=(10, 48, 64, 3)).astype(np.uint8)
    np.save(vroot / "vidA.npy", frames)

    names_file = tmp_path / "classes.txt"
    names_file.write_text("".join(f"k{i}\n" for i in range(10)))

    score = {"video": "vidA", "clips": [
        {"top5": [7, 2, 1], "scores": [0.9, 0.05, 0.05], "segment": [1, 8]},
    ]}
    rj = tmp_path / "vidA.json"
    rj.write_text(json.dumps(score))

    dst = tmp_path / "out"
    main([str(rj), str(vroot), str(dst), str(names_file), "0",
          "--output_format", "gif"])
    assert (dst / "vidA.gif").exists()
