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
