"""Per-video .npy feature store with async host-side prefetch.

Reference behaviour being reproduced (data/data_handler.py:111-133, 168-176;
data/dataset.py:146-151):
  * path template "<FeaType>/<ImageID>.npy" under a base dir,
  * 'rgb'-type features loaded eagerly with temporal subsampling [::skip],
  * 'st'-type (spatio-temporal) features loaded lazily per batch,
  * 3-D+ features reshaped to (T, S, D) = (shape[0], -1, shape[-1]),
  * features whose path contains 'vggish' are audio,
  * feature_shape() reports the trailing dim per feature type.

TPU-first changes: a bounded LRU cache plus a ThreadPoolExecutor prefetcher so
the next batch's .npy reads overlap device compute (replaces the reference's
DataLoader worker processes doing blocking np.load inside collate)."""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_npy_tsd(filepath: str) -> np.ndarray:
    """np.load + (T, S, D) canonicalisation (reference dataset.py:146-151)."""
    feature = np.load(filepath, allow_pickle=True)
    if feature.ndim == 2:
        return feature
    return feature.reshape((feature.shape[0], -1, feature.shape[-1]))


class FeatureStore:
    """Lazy feature registry for one feature type.

    Maps vid → filepath; loads on demand with caching and optional prefetch."""

    def __init__(self, fea_type: str, fea_path_template: str,
                 skip: int = 1, cache_items: int = 512, workers: int = 4):
        self.fea_type = fea_type
        self.template = fea_path_template.replace("<FeaType>", fea_type)
        self.skip = skip
        self.eager = "rgb" in fea_type          # data_handler.py:122-125
        self.is_audio = "vggish" in fea_type    # dataset.py:175-179 routes by path
        self._cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._shape_cache: Dict[str, tuple] = {}
        self._cache_items = cache_items
        self._lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=workers) if workers > 0 else None
        self._paths: Dict[str, str] = {}

    def register(self, vids: Sequence[str]) -> None:
        for vid in vids:
            self._paths[vid] = self.template.replace("<ImageID>", vid)

    def path(self, vid: str) -> str:
        return self._paths.get(vid) or self.template.replace("<ImageID>", vid)

    def _load(self, vid: str) -> np.ndarray:
        arr = load_npy_tsd(self.path(vid))
        if self.eager and self.skip > 1:
            arr = arr[:: self.skip]
        return np.asarray(arr, dtype=np.float32)

    def get(self, vid: str) -> np.ndarray:
        with self._lock:
            if vid in self._cache:
                self._cache.move_to_end(vid)
                return self._cache[vid]
        arr = self._load(vid)
        with self._lock:
            self._cache[vid] = arr
            self._cache.move_to_end(vid)
            while len(self._cache) > self._cache_items:
                self._cache.popitem(last=False)
        return arr

    def prefetch(self, vids: Sequence[str]) -> None:
        if self._pool is None:
            return
        for vid in vids:
            with self._lock:
                if vid in self._cache:
                    continue
            self._pool.submit(self.get, vid)

    def dim(self) -> int:
        """Trailing feature dim, from the first registered file's header
        (reference feature_shape, data_handler.py:168-176)."""
        vid = next(iter(self._paths))
        return int(np.load(self.path(vid), allow_pickle=True, mmap_mode="r").shape[-1])

    # -- native batched path ------------------------------------------------

    def shape_of(self, vid: str) -> tuple:
        """(T, S, D) / (T, D) from the npy header, cached (native header
        probe when available — no payload read)."""
        s = self._shape_cache.get(vid)
        if s is None:
            from bist_tpu.native.loader import probe_npy_shape

            raw = probe_npy_shape(self.path(vid))
            # canonicalise like load_npy_tsd: (T, ..., D) → (T, prod(mid), D)
            if len(raw) > 2:
                s = (raw[0], int(np.prod(raw[1:-1])), raw[-1])
            else:
                s = raw
            self._shape_cache[vid] = s
        return s

    def get_batch(self, vids: Sequence[str], t_pad: int) -> np.ndarray:
        """Assemble a zero-padded (B, t_pad, *tail) batch.

        Uses the C++ thread-pool assembler (bist_tpu.native) when available —
        payloads stream straight into the batch buffer; falls back to the
        per-item python path (identical semantics)."""
        from bist_tpu.native.loader import assemble_feature_batch

        tail = self.shape_of(vids[0])[1:]
        if self.eager and self.skip > 1:
            # subsampled eager features must go through the python path
            fts = [self.get(v) for v in vids]
            out = np.zeros((len(vids), t_pad) + tuple(tail), np.float32)
            for i, f in enumerate(fts):
                k = min(f.shape[0], t_pad)
                out[i, :k] = f.reshape(f.shape[0], *tail)[:k]
            return out
        return assemble_feature_batch([self.path(v) for v in vids], t_pad,
                                      tuple(tail))

    def max_t(self, vids: Sequence[str]) -> int:
        return max(self.shape_of(v)[0] for v in vids)


def build_stores(fea_types: Optional[Sequence[str]], fea_path_template: str,
                 vids: Sequence[str], skip: int = 1, workers: int = 4,
                 ) -> Tuple[List[FeatureStore], List[FeatureStore]]:
    """Returns (visual_stores, audio_stores).  fea_types of None / ['none']
    yields no stores (text-only, data_handler.py:112-114).  `workers` sizes
    the per-store prefetch pool (the --num-workers CLI flag; the native
    batch assembler uses its own C++ thread pool)."""
    visual: List[FeatureStore] = []
    audio: List[FeatureStore] = []
    if not fea_types or fea_types[0] == "none":
        return visual, audio
    for ftype in fea_types:
        if ftype == "none":
            continue
        store = FeatureStore(ftype, fea_path_template, skip=skip,
                             workers=max(workers, 1))
        store.register(vids)
        (audio if store.is_audio else visual).append(store)
    return visual, audio


def feature_shape(stores: Sequence[FeatureStore]) -> List[int]:
    return [s.dim() for s in stores]
