"""Orbax checkpointing with true resume.

The reference pickles the whole nn.Module per best epoch with no optimizer
state and no resume path (train.py:156-177, SURVEY.md §5).  Here a checkpoint
carries params + optimizer state + step + epoch + best-valid-loss, and the
`.conf` JSON (config.save_conf) carries vocab + configs — together they fully
restore a run.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, *, epoch: int = 0,
                    best_valid_loss: float = float("inf"),
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a checkpoint directory at `path` (overwrites)."""
    path = os.path.abspath(path)
    payload = {
        "params": _np_tree(state.params),
        "opt_state": _np_tree(state.opt_state),
        "step": np.asarray(state.step),
        "meta": {"epoch": epoch, "best_valid_loss": float(best_valid_loss),
                 **(extra or {})},
    }
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
    else:  # pragma: no cover — orbax is in the image
        import pickle
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".pkl", "wb") as f:
            pickle.dump(payload, f)


def find_latest_checkpoint(model_prefix: str) -> Optional[str]:
    """Newest complete checkpoint directory for a model prefix, or None.

    Candidates are `<prefix>_best` and `<prefix>_<N>` (the two layouts
    train.py writes); 'newest' is filesystem mtime — the last completed
    write is by construction the latest training state, whichever layout it
    used.  In-flight/aborted orbax writes (tmp-suffixed dirs) are skipped,
    so an auto-resume after SIGKILL picks the last COMPLETE save.  Used by
    train.py `--resume auto` (restart-safe production launch: same command
    line works for the first start and every restart)."""
    import glob

    cands = []
    for p in glob.glob(model_prefix + "_*"):
        # skip orbax in-flight writes by their actual tmp suffix — NOT a bare
        # "tmp" substring, which would reject model names like exps/tmp_run1
        if not os.path.isdir(p) or "orbax-checkpoint-tmp" in os.path.basename(p):
            continue
        suffix = os.path.basename(p)[len(os.path.basename(model_prefix)) + 1:]
        if suffix != "best" and not suffix.isdigit():
            continue
        if not os.listdir(p):
            continue
        cands.append(p)
    return max(cands, key=os.path.getmtime) if cands else None


class AsyncSaver:
    """Non-blocking checkpoint writes (production path).

    The reference saves by pickling the whole nn.Module on the main thread
    (train.py:156-177) — a full stall.  Orbax's AsyncCheckpointer snapshots
    device arrays to host memory DURING save() (so the caller may donate or
    overwrite them immediately after it returns) and serializes to disk on a
    background thread; `wait()` joins the in-flight write.  At most one
    write is in flight — save() joins the previous one first — so a
    checkpoint directory is always complete once the next save starts or
    wait() returns.  Falls back to the synchronous writer without orbax.
    """

    def __init__(self):
        self._ckptr = (ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                       if _HAVE_ORBAX else None)

    def save(self, path: str, state, *, epoch: int = 0,
             best_valid_loss: float = float("inf"),
             extra: Optional[Dict[str, Any]] = None) -> None:
        if self._ckptr is None:  # pragma: no cover — orbax is in the image
            return save_checkpoint(path, state, epoch=epoch,
                                   best_valid_loss=best_valid_loss,
                                   extra=extra)
        self.wait()
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "meta": {"epoch": epoch,
                     "best_valid_loss": float(best_valid_loss),
                     **(extra or {})},
        }
        self._ckptr.save(os.path.abspath(path), payload, force=True)

    def wait(self) -> None:
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    # context-manager sugar: `with AsyncSaver() as saver: ...` guarantees the
    # last write is joined on exit (incl. exceptions)
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        return False


def load_checkpoint(path: str, template_state=None):
    """Returns (payload dict).  If template_state is given, arrays are
    restored into its treedef (safer across orbax versions)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if template_state is not None:
            template = {
                "params": _np_tree(template_state.params),
                "opt_state": _np_tree(template_state.opt_state),
                "step": np.asarray(template_state.step),
                "meta": {"epoch": 0, "best_valid_loss": 0.0},
            }
            try:
                return ckptr.restore(path, item=template)
            except TypeError:
                return ckptr.restore(path)
        return ckptr.restore(path)
    import pickle  # pragma: no cover
    with open(path + ".pkl", "rb") as f:
        return pickle.load(f)


def restore_train_state(path: str, state_cls, template_state):
    payload = load_checkpoint(path, template_state)
    import jax.numpy as jnp
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    opt_state = jax.tree_util.tree_map(jnp.asarray, payload["opt_state"])
    # restore opt_state structure from the template (orbax may return dicts)
    opt_state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template_state.opt_state),
        jax.tree_util.tree_leaves(opt_state))
    step = jnp.asarray(payload["step"])
    meta = payload.get("meta", {})
    return state_cls(params=params, opt_state=opt_state, step=step), meta
