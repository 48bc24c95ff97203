"""Tensor parallelism: Megatron-style parameter sharding over the 'model'
axis of a 2-D (data, model) mesh.

The reference has no TP (SURVEY §2.4 — nn.DataParallel only); this is the
TPU-native scaling path beyond data parallelism for wide configurations.
Design is GSPMD-first: we annotate PARAMETER shardings only —

  * attention wq/wk/wv: column-parallel (output dim, i.e. heads, sharded;
    bias sharded alike), so each device computes its own head group;
  * attention wo: row-parallel (input dim sharded) — XLA inserts the
    all-reduce that sums the per-device partial outputs;
  * FFN w1: column-parallel; FFN w2: row-parallel (same all-reduce);
  * everything else (LayerNorms, embeddings, fusion gates, pointer switch)
    is replicated — they are O(d_model) or vocab-bound, not worth sharding
    at BiST scale;

and let XLA's sharding propagation derive every activation sharding and
collective.  There is no hand-written collective here, matching how the DP
path leaves the gradient all-reduce to XLA (parallel/mesh.py).

Constraints: att_h and d_ff must divide by the model-axis size (head-group
parallelism).  The Pallas kernels are not engaged under TP (their dispatch
thresholds target long-video single-chip shapes; TP jits take the einsum
paths, which GSPMD partitions).

Correctness is proven by tests/test_tp.py: one full train step on a
(2 data × 4 model) CPU mesh equals the single-device step to fp32 tolerance.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-name → (w spec, b spec) rules, keyed by the leaf-dict name
_COL = object()   # column-parallel: shard output dim
_ROW = object()   # row-parallel: shard input dim
_RULES = {"wq": _COL, "wk": _COL, "wv": _COL, "w1": _COL,
          "wo": _ROW, "w2": _ROW}


def _spec_for(path, leaf, axis: str):
    """PartitionSpec for one param leaf based on its pytree path."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    # the linear-param dicts are {'w': (in,out), 'b': (out,)} hanging under a
    # name like wq/wk/wv/wo/w1/w2
    for k in keys:
        rule = _RULES.get(k)
        if rule is None:
            continue
        leaf_name = keys[-1]
        if rule is _COL:
            return P(None, axis) if leaf_name == "w" else P(axis)
        return P(axis, None) if leaf_name == "w" else P()
    return P()  # replicated


def param_specs(params: Any, axis: str = "model"):
    """PartitionSpec pytree mirroring `params` (Megatron col/row rules)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, leaf, axis), params)


def shard_params(params: Any, mesh: Mesh, axis: str = "model"):
    """device_put the param tree with TP shardings over `mesh`."""
    specs = param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def validate_tp_config(cfg, model_parallel: int) -> None:
    if cfg.att_h % model_parallel:
        raise ValueError(
            f"att_h={cfg.att_h} not divisible by model axis {model_parallel}")
    if cfg.d_ff % model_parallel:
        raise ValueError(
            f"d_ff={cfg.d_ff} not divisible by model axis {model_parallel}")
