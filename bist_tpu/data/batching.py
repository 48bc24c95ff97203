"""Static-shape batch assembly for jit stability.

The reference pads ragged sequences to the per-batch max (data/dataset.py:133-195
collate_fn) — fine for eager PyTorch, hostile to XLA (every new max shape is a
recompile).  Here every sequence axis is padded up to a small set of bucket
sizes so the jitted train/decode steps compile a handful of times and then
reuse.  Loss/metric normalisation by true token counts (ntokens/qntokens,
data/dataset.py:98-99) makes padding semantically neutral.

Masks are NOT stored in the batch: they are recomputed inside jit from the
padded tokens/features (see bist_tpu.models.model.build_masks), which XLA fuses
for free and which keeps the host→device transfer minimal.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Sequence

import numpy as np

from bist_tpu.vocab import PAD


class Batch(NamedTuple):
    """Device-side batch pytree.  All arrays are fixed-shape, padded with PAD
    (tokens) or zeros (features).  Optional modalities are None (pytree leaves
    absent → no transfer, no compute).

    Equivalent content to the reference Batch (data/dataset.py:59-105) minus
    the precomputed masks and host metadata."""

    query: np.ndarray            # (B, Lq) int32
    his: np.ndarray              # (B, Lh) int32
    trg: np.ndarray              # (B, Lt) int32   — answer_in
    trg_y: np.ndarray            # (B, Lt) int32   — answer_out
    cap: Optional[np.ndarray] = None        # (B, Lc) int32
    fts: Optional[np.ndarray] = None        # (B, T, S, Dv) float (or int8
                                            #  with fts_scale set)
    audio_fts: Optional[np.ndarray] = None  # (B, Ta, Da) float
    fts_scale: Optional[np.ndarray] = None  # (B, T, S, 1) f32 — per-position
                                            #  dequant scale for int8 fts


def quantize_features(fts: np.ndarray):
    """Symmetric per-position int8 quantisation of a (B, T, S, D) grid.

    4× less host→device traffic for serving/generation; the model
    dequantises on device (models.model.encode).  Returns (int8, scale)
    where scale is (B, T, S, 1) f32 and zero rows stay exactly zero (the
    temporal/spatial validity masks still see true zeros)."""
    amax = np.max(np.abs(fts), axis=-1, keepdims=True)
    scale = (amax / 127.0).astype(np.float32)
    safe = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.round(fts / safe), -127, 127).astype(np.int8)
    return q, scale


class BatchMeta(NamedTuple):
    """Host-side metadata travelling alongside a Batch (never on device)."""
    vids: List[str]
    qa_ids: List[int]
    real_count: int              # rows < real_count are genuine examples


def bucket_len(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ n; falls back to next multiple of the largest bucket."""
    for b in buckets:
        if n <= b:
            return b
    top = buckets[-1]
    return ((n + top - 1) // top) * top


def pad_to(seqs: Sequence[np.ndarray], length: int, pad_value: int = PAD,
           dtype=np.int32) -> np.ndarray:
    """Stack 1-D int sequences into (B, length), right-padded.

    Sequences longer than `length` are truncated (never happens when `length`
    comes from bucket_len of the batch max)."""
    out = np.full((len(seqs), length), pad_value, dtype=dtype)
    for i, s in enumerate(seqs):
        k = min(len(s), length)
        out[i, :k] = s[:k]
    return out


def pad_features(fts: Sequence[np.ndarray], t_len: int, tail=None,
                 pad_rows: int = 0) -> np.ndarray:
    """Stack (Ti, ...) feature arrays into (B + pad_rows, t_len, ...),
    zero-padded on T; extra rows (batch padding to a compiled bucket) are
    all-zero.  `tail` pins the per-step shape (serving's pinned grid);
    default: taken from the first array."""
    tail = tuple(tail) if tail is not None else fts[0].shape[1:]
    out = np.zeros((len(fts) + pad_rows, t_len) + tail, dtype=np.float32)
    for i, f in enumerate(fts):
        k = min(f.shape[0], t_len)
        out[i, :k] = f[:k]
    return out


def pad_tokens(seqs: Sequence[np.ndarray], buckets: Sequence[int],
               n_rows: int = 0, empty_len: int = 1) -> np.ndarray:
    """Bucket + pad 1-D token sequences into (max(len(seqs), n_rows), L):
    L is the smallest bucket covering the longest sequence; rows beyond
    len(seqs) are all-PAD (batch padding — masked everywhere downstream).
    The single tokenized-field assembly used by both the training collate
    (make_batch) and the serving path (Responder.make_batch)."""
    L = bucket_len(max((len(s) for s in seqs), default=empty_len), buckets)
    arr = pad_to(seqs, L)
    if n_rows > len(seqs):
        arr = np.concatenate(
            [arr, np.full((n_rows - len(seqs), L), PAD, dtype=np.int32)],
            axis=0)
    return arr


def make_batch(histories: Sequence[np.ndarray],
               questions: Sequence[np.ndarray],
               answers_in: Sequence[np.ndarray],
               answers_out: Sequence[np.ndarray],
               captions: Optional[Sequence[np.ndarray]] = None,
               fts: Optional[Sequence[np.ndarray]] = None,
               audio_fts: Optional[Sequence[np.ndarray]] = None,
               len_buckets: Sequence[int] = (16, 32, 64, 128, 256),
               time_buckets: Sequence[int] = (16, 32, 48, 64),
               pad_batch_to: int = 0) -> Batch:
    """Assemble a static-shape Batch from ragged per-example arrays.

    pad_batch_to > len(histories) adds all-PAD rows (their ntokens are 0, so
    they contribute nothing to the loss — used to keep B constant for jit and
    divisible by the data-parallel mesh)."""
    B = len(histories)
    n_rows = max(B, pad_batch_to) if pad_batch_to else B

    def _tok(seqs, empty_len=1):
        return pad_tokens(seqs, len_buckets, n_rows=n_rows,
                          empty_len=empty_len)

    query = _tok(questions)
    his = _tok(histories)
    trg = _tok(answers_in)
    trg_y_raw = pad_to(answers_out, trg.shape[1])
    if n_rows > B:
        trg_y_raw = np.concatenate(
            [trg_y_raw, np.full((n_rows - B, trg.shape[1]), PAD, dtype=np.int32)], 0)
    cap = _tok(captions) if captions is not None else None

    f = None
    if fts is not None:
        T = bucket_len(max(x.shape[0] for x in fts), time_buckets)
        f = pad_features(fts, T)
        if n_rows > B:
            f = np.concatenate([f, np.zeros((n_rows - B,) + f.shape[1:], np.float32)], 0)
    a = None
    if audio_fts is not None:
        Ta = bucket_len(max(x.shape[0] for x in audio_fts), time_buckets)
        a = pad_features(audio_fts, Ta)
        if n_rows > B:
            a = np.concatenate([a, np.zeros((n_rows - B,) + a.shape[1:], np.float32)], 0)

    return Batch(query=query, his=his, trg=trg, trg_y=trg_y_raw,
                 cap=cap, fts=f, audio_fts=a)
