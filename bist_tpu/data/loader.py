"""Epoch iterator: AVSD examples + feature stores → static-shape Batches.

Replaces the reference's torch DataLoader + collate_fn (data/dataset.py:133-195,
data_handler.py:135-166) with a host-side iterator designed for XLA:

  * length-grouped batching: examples are ordered by history length within
    shuffled chunks, so batches are shape-homogeneous and bucket-padding waste
    stays low while retaining stochasticity (batch order is shuffled);
  * every array is padded to bucket sizes (see batching.bucket_len) — a small,
    closed set of compiled shapes instead of one compile per ragged max;
  * feature .npy reads are prefetched for the next batch while the device
    computes the current one (features.FeatureStore.prefetch);
  * `cut_a` random answer truncation is re-drawn per epoch per example
    (reference Dataset.__getitem__, dataset.py:33-38).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from bist_tpu.data.avsd import AVSDData, Example, cut_answer
from bist_tpu.data.batching import Batch, BatchMeta, make_batch
from bist_tpu.data.features import FeatureStore


class AVSDLoader:
    def __init__(self, data: AVSDData,
                 visual_stores: Sequence[FeatureStore] = (),
                 audio_stores: Sequence[FeatureStore] = (),
                 batch_size: int = 32, shuffle: bool = True,
                 cut_a: bool = False, seed: int = 1,
                 len_buckets: Sequence[int] = (16, 32, 64, 128, 256),
                 time_buckets: Sequence[int] = (16, 32, 48, 64),
                 pad_batch_multiple: int = 1,
                 group_chunk: int = 16):
        self.data = data
        self.visual_stores = list(visual_stores)
        self.audio_stores = list(audio_stores)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.cut_a = cut_a
        self.rng = np.random.default_rng(seed)
        self.len_buckets = tuple(len_buckets)
        self.time_buckets = tuple(time_buckets)
        self.pad_batch_multiple = max(1, pad_batch_multiple)
        self.group_chunk = group_chunk

    def __len__(self) -> int:
        n = len(self.data.examples)
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self) -> np.ndarray:
        n = len(self.data.examples)
        idx = np.arange(n)
        if not self.shuffle:
            return idx
        # length-grouped shuffle: shuffle → stable-sort by history length in
        # chunks of (group_chunk · batch_size) → batch → shuffle batch order.
        self.rng.shuffle(idx)
        chunk = self.group_chunk * self.batch_size
        out = []
        lens = np.array([len(self.data.examples[i].history) for i in idx])
        for s in range(0, n, chunk):
            sl = idx[s:s + chunk]
            sl_lens = lens[s:s + chunk]
            out.append(sl[np.argsort(sl_lens, kind="stable")])
        idx = np.concatenate(out)
        batches = [idx[s:s + self.batch_size] for s in range(0, n, self.batch_size)]
        self.rng.shuffle(batches)
        return np.concatenate(batches)

    def _pad_rows(self, k: int) -> int:
        m = self.pad_batch_multiple
        return ((k + m - 1) // m) * m

    def __iter__(self) -> Iterator[Tuple[Batch, BatchMeta]]:
        order = self._epoch_order()
        bs = self.batch_size
        n = len(order)
        for s in range(0, n, bs):
            sel = order[s:s + bs]
            nxt = order[s + bs:s + 2 * bs]
            # prefetch next batch's features while we assemble this one
            nxt_vids = [self.data.examples[i].vid for i in nxt]
            for store in self.visual_stores + self.audio_stores:
                store.prefetch(nxt_vids)
            yield self._assemble([self.data.examples[i] for i in sel])

    def _assemble(self, exs: List[Example]) -> Tuple[Batch, BatchMeta]:
        histories = [e.history for e in exs]
        questions = [e.question for e in exs]
        ans_in, ans_out = [], []
        for e in exs:
            ai, ao = (cut_answer(e.answer_in, e.answer_out, self.rng)
                      if self.cut_a else (e.answer_in, e.answer_out))
            ans_in.append(ai)
            ans_out.append(ao)
        captions = ([e.caption for e in exs]
                    if exs[0].caption is not None else None)
        from bist_tpu.data.batching import bucket_len

        vids = [e.vid for e in exs]
        n_rows = self._pad_rows(len(exs))

        def _batched(store):
            """Native header probe → bucketed T → C++ thread-pool assembly
            (falls back to python inside get_batch)."""
            t_pad = bucket_len(store.max_t(vids), self.time_buckets)
            arr = store.get_batch(vids, t_pad)
            if n_rows > len(exs):
                arr = np.concatenate(
                    [arr, np.zeros((n_rows - len(exs),) + arr.shape[1:],
                                   np.float32)], axis=0)
            return arr

        fts_arr = _batched(self.visual_stores[0]) if self.visual_stores else None
        audio_arr = _batched(self.audio_stores[0]) if self.audio_stores else None
        batch = make_batch(histories, questions, ans_in, ans_out,
                           captions=captions, fts=None, audio_fts=None,
                           len_buckets=self.len_buckets,
                           time_buckets=self.time_buckets,
                           pad_batch_to=n_rows)
        batch = batch._replace(fts=fts_arr, audio_fts=audio_arr)
        meta = BatchMeta(vids=[e.vid for e in exs],
                         qa_ids=[e.qa_id for e in exs],
                         real_count=len(exs))
        return batch, meta


def device_prefetch(iterator, prepare=None, size: int = 2):
    """Background-thread prefetch: runs `prepare(batch)` (e.g. int8 quantize +
    jax.device_put) for upcoming batches while the device computes the
    current one, overlapping host collate/disk IO AND the H2D transfer with
    device compute.  Yields (prepared_batch, meta).

    Used by both the training epoch loop (train/loop.py run_epoch) and
    generation (generate.py); the round-1 main-thread async-dispatch
    prefetch serialised host IO between steps."""
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(size, 1))
    err = []
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone; a plain
        q.put would block forever if the consuming loop exits early (error,
        KeyboardInterrupt), leaking the thread + device-resident batches."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def producer():
        try:
            for batch, meta in iterator:
                if prepare is not None:
                    batch = prepare(batch)
                if not _put((batch, meta)):
                    return
        except BaseException as e:  # surface loader errors in the consumer
            err.append(e)
        finally:
            _put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        while True:                      # unblock a producer stuck in _put
            try:
                q.get_nowait()
            except _queue.Empty:
                break
        t.join()
    if err:
        raise err[0]
