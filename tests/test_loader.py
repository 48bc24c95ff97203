"""AVSDLoader integration: feature stores (native batched path), bucketed
shapes, epoch coverage, prefetch."""

import json
import os

import numpy as np
import pytest

from bist_tpu.data.avsd import load_avsd
from bist_tpu.data.features import FeatureStore, build_stores
from bist_tpu.data.loader import AVSDLoader
from bist_tpu.vocab import PAD, get_vocabulary


@pytest.fixture
def dataset(tmp_path, rng):
    dialogs = []
    for d in range(5):
        dialogs.append({
            "image_id": f"vid{d}",
            "caption": "a cat", "summary": "cat sits",
            "dialog": [{"question": "what is it", "answer": "a cat"}] * 2,
        })
    p = tmp_path / "train.json"
    p.write_text(json.dumps({"dialogs": dialogs}))
    ftdir = tmp_path / "resnext_st"
    ftdir.mkdir()
    adir = tmp_path / "vggish"
    adir.mkdir()
    for d in range(5):
        np.save(ftdir / f"vid{d}.npy",
                rng.standard_normal((3 + d, 4, 16)).astype(np.float32))
        np.save(adir / f"vid{d}.npy",
                rng.standard_normal((2 + d, 8)).astype(np.float32))
    v = get_vocabulary(str(p), cutoff=0, include_caption="summary")
    data = load_avsd(str(p), v, include_caption="summary",
                     separate_caption=True)
    template = str(tmp_path / "<FeaType>/<ImageID>.npy")
    return data, template


def test_loader_batches_with_native_features(dataset):
    data, template = dataset
    vis, aud = build_stores(["resnext_st", "vggish"], template, data.vid_set)
    assert len(vis) == 1 and len(aud) == 1   # vggish routed to audio
    loader = AVSDLoader(data, visual_stores=vis, audio_stores=aud,
                        batch_size=4, shuffle=False,
                        len_buckets=(8, 16), time_buckets=(8, 16),
                        pad_batch_multiple=4)
    seen = 0
    for batch, meta in loader:
        assert batch.query.shape[0] % 4 == 0
        assert batch.fts is not None and batch.fts.shape[2:] == (4, 16)
        assert batch.audio_fts is not None and batch.audio_fts.shape[2:] == (8,)
        assert batch.fts.shape[1] in (8, 16)
        # feature content matches the store for the first row
        ref = vis[0].get(meta.vids[0])
        np.testing.assert_array_equal(
            batch.fts[0, :ref.shape[0]], ref)
        seen += meta.real_count
    assert seen == len(data.examples) == 10


def test_loader_epoch_coverage_shuffled(dataset):
    data, template = dataset
    loader = AVSDLoader(data, batch_size=3, shuffle=True, seed=3)
    ids = []
    for batch, meta in loader:
        ids.extend(meta.qa_ids)
    assert sorted(ids) == list(range(10))
    ids2 = []
    for batch, meta in loader:
        ids2.extend(meta.qa_ids)
    assert sorted(ids2) == list(range(10))
    assert ids != ids2   # reshuffled across epochs


def test_rgb_eager_skip(tmp_path, rng):
    """'rgb'-type features load eagerly with [::skip] subsampling
    (reference data_handler.py:122-125)."""
    ftdir = tmp_path / "i3d_rgb"
    ftdir.mkdir()
    arr = rng.standard_normal((10, 16)).astype(np.float32)
    np.save(ftdir / "v0.npy", arr)
    s = FeatureStore("i3d_rgb", str(tmp_path / "<FeaType>/<ImageID>.npy"),
                     skip=2)
    s.register(["v0"])
    assert s.eager and not s.is_audio
    got = s.get("v0")
    np.testing.assert_array_equal(got, arr[::2])
    # batched path honors the subsampling too
    batch = s.get_batch(["v0"], t_pad=8)
    assert batch.shape == (1, 8, 16)
    np.testing.assert_array_equal(batch[0, :5], arr[::2])
    np.testing.assert_array_equal(batch[0, 5:], 0.0)


def test_device_prefetch_order_and_errors():
    """device_prefetch preserves order, applies prepare(), and surfaces
    producer exceptions in the consumer."""
    from bist_tpu.data.loader import device_prefetch

    items = [(i, {"i": i}) for i in range(7)]
    out = list(device_prefetch(iter(items), prepare=lambda b: b * 10, size=2))
    assert [b for b, _ in out] == [i * 10 for i in range(7)]
    assert [m["i"] for _, m in out] == list(range(7))

    def boom():
        yield (1, {})
        raise RuntimeError("loader exploded")

    import pytest

    gen = device_prefetch(boom(), size=2)
    assert next(gen)[0] == 1
    with pytest.raises(RuntimeError, match="loader exploded"):
        list(gen)


def test_device_prefetch_early_exit_releases_producer():
    """Round-2 regression: if the consumer abandons the iterator early (error
    in the train loop, KeyboardInterrupt), the producer thread must not stay
    blocked on the bounded queue holding device-resident batches."""
    import threading
    import time

    from bist_tpu.data.loader import device_prefetch

    before = set(threading.enumerate())
    it = device_prefetch(iter([(i, {}) for i in range(100)]), size=1)
    assert next(it)[0] == 0          # producer now blocked filling the queue

    done = threading.Event()

    def close():
        it.close()                   # triggers the generator's finally
        done.set()

    t = threading.Thread(target=close, daemon=True)
    t.start()
    assert done.wait(timeout=10), "device_prefetch close() hung (leak)"
    deadline = time.time() + 10
    while time.time() < deadline:
        leaked = [th for th in threading.enumerate()
                  if th not in before and th.is_alive() and th is not t]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer thread leaked: {leaked}"
