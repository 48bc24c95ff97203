"""AsyncSaver (train/checkpoint.py): non-blocking checkpoint writes must be
(a) bit-identical to the synchronous writer on restore, (b) safe against the
caller mutating/donating the arrays immediately after save() returns (orbax
snapshots device arrays to host during save), and (c) serialized — a second
save joins the first, so a directory is complete once wait() returns."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bist_tpu.train.checkpoint import (AsyncSaver, load_checkpoint,
                                       restore_train_state, save_checkpoint)
from bist_tpu.train.loop import TrainState


@pytest.fixture()
def state():
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (8, 8)),
              "b": jnp.arange(8, dtype=jnp.float32)}
    opt_state = {"mu": jax.tree_util.tree_map(jnp.zeros_like, params)}
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.asarray(3, jnp.int32))


def test_async_roundtrip_matches_sync(tmp_path, state):
    sync_dir = str(tmp_path / "sync")
    async_dir = str(tmp_path / "async")
    save_checkpoint(sync_dir, state, epoch=2, best_valid_loss=1.5)
    with AsyncSaver() as saver:
        saver.save(async_dir, state, epoch=2, best_valid_loss=1.5)
    a = load_checkpoint(async_dir)
    s = load_checkpoint(sync_dir)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        a["params"], s["params"])
    assert a["meta"]["epoch"] == 2
    assert a["meta"]["best_valid_loss"] == 1.5

    got, meta = restore_train_state(async_dir, TrainState, state)
    np.testing.assert_array_equal(np.asarray(got.params["w"]),
                                  np.asarray(state.params["w"]))
    assert int(got.step) == 3


def test_mutation_after_save_does_not_corrupt(tmp_path, state):
    """The train loop donates/overwrites params right after save() returns
    (train.py epoch loop) — the checkpoint must hold the PRE-mutation
    values."""
    snap = np.asarray(state.params["w"]).copy()
    path = str(tmp_path / "ck")
    with AsyncSaver() as saver:
        saver.save(path, state, epoch=0, best_valid_loss=0.0)
        # simulate the next epoch's donated update racing the write
        state.params["w"].delete()
    payload = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(payload["params"]["w"]), snap)


def test_find_latest_checkpoint(tmp_path, state):
    """--resume auto semantics: newest complete save wins; tmp/incomplete
    dirs and non-checkpoint artifacts are ignored; None when nothing
    exists."""
    import os
    import time

    from bist_tpu.train.checkpoint import find_latest_checkpoint

    prefix = str(tmp_path / "exp" / "mtn")
    assert find_latest_checkpoint(prefix) is None

    save_checkpoint(prefix + "_1", state, epoch=0)
    time.sleep(0.05)
    save_checkpoint(prefix + "_best", state, epoch=1)
    # decoys: conf file, tmp write, empty dir, unrelated suffix
    open(prefix + ".conf", "w").write("{}")
    os.makedirs(prefix + "_2.orbax-checkpoint-tmp-123")
    os.makedirs(prefix + "_empty_dir")  # non-numeric suffix → ignored
    assert find_latest_checkpoint(prefix) == prefix + "_best"

    time.sleep(0.05)
    save_checkpoint(prefix + "_2", state, epoch=2)
    assert find_latest_checkpoint(prefix) == prefix + "_2"

    # model names CONTAINING 'tmp' must still resume (round-3 review: a bare
    # 'tmp' substring check rejected them); only orbax's actual in-flight
    # suffix is skipped
    tprefix = str(tmp_path / "exp" / "tmp_run1")
    save_checkpoint(tprefix + "_best", state, epoch=0)
    os.makedirs(tprefix + "_best.orbax-checkpoint-tmp-99")
    assert find_latest_checkpoint(tprefix) == tprefix + "_best"


def test_back_to_back_saves_serialize(tmp_path, state):
    """save() joins the previous in-flight write: both directories restore
    their own epoch metadata."""
    with AsyncSaver() as saver:
        for e in range(3):
            saver.save(str(tmp_path / f"ep{e}"), state, epoch=e,
                       best_valid_loss=float(e))
    for e in range(3):
        meta = load_checkpoint(str(tmp_path / f"ep{e}"))["meta"]
        assert meta["epoch"] == e and meta["best_valid_loss"] == float(e)
