"""Sequence parallelism: activation sharding of the LONG axes over a 'seq'
mesh axis.

The reference has no sequence/context parallelism (SURVEY §2.4 —
nn.DataParallel over the batch only).  This is the TPU-native long-input
scaling path: the dialogue history (B, Lh) and the video grid's temporal
axis (B, T, S, Dv) are the axes that grow with input length, and their
ACTIVATIONS (embeddings, LayerNorms, FFNs, per-position projections —
O(L·d) memory each) dominate encoder HBM at long context.  Sharding those
axes over a mesh axis divides that memory by the axis size.

Design is GSPMD-first, mirroring parallel/tp.py: we annotate only the INPUT
batch arrays —

  * his:        P(data, seq)       — history token axis sharded
  * fts:        P(data, seq)       — video TEMPORAL axis sharded (the axis
                                     that grows with clip count; S is fixed)
  * audio_fts:  P(data, seq)       — audio frame axis sharded
  * query/cap/trg: P(data)         — short axes, replicated over 'seq'

and let XLA propagate: per-position ops stay sequence-sharded; wherever
attention needs a FULL key/value axis (self-attention over history, the
BiST temporal hop, decoder cross-attention into sharded memories) GSPMD
inserts the all-gather / distributed-softmax collectives itself.  Params
stay replicated over 'seq' (shard them over a 'model' axis with
parallel/tp.py to compose TP×SP on a 3-D mesh — tests/test_sp.py proves the
dp×tp×sp composition grad-exact).

Constraints: the sharded lengths must divide by the seq-axis size; the
bucketed batching (data/batching.py len_buckets/time_buckets) already pads
to powers of two, so pick a power-of-two seq axis.  Gradients w.r.t.
replicated params are reduced by XLA across 'seq' exactly like across
'data' — no hand-written collectives anywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bist_tpu.data.batching import Batch


def batch_specs(dp_axis: Optional[str] = "data",
                sp_axis: str = "seq") -> Batch:
    """PartitionSpec per batch field: long axes on `sp_axis`, rows on
    `dp_axis` (None = no data-parallel axis)."""
    row = P(dp_axis)
    long = P(dp_axis, sp_axis)
    # fts_scale (int8 feature path, batching.quantize_features) is
    # (B, T, S, 1) — its T axis must shard WITH fts
    return Batch(query=row, his=long, trg=row, trg_y=row, cap=row,
                 fts=long, audio_fts=long, fts_scale=long)


def shard_batch(batch: Batch, mesh: Mesh, dp_axis: Optional[str] = "data",
                sp_axis: str = "seq") -> Batch:
    """device_put the batch with sequence-parallel shardings over `mesh`."""
    specs = batch_specs(dp_axis, sp_axis)
    return jax.tree_util.tree_map(
        lambda x, s: None if x is None else jax.device_put(
            x, NamedSharding(mesh, s)),
        batch, specs, is_leaf=lambda x: x is None)


def validate_sp_batch(batch: Batch, seq_parallel: int) -> None:
    """The sharded axes must divide by the seq-axis size (bucketed padding
    guarantees this for power-of-two buckets and axes)."""
    checks = {"his L": batch.his.shape[1]}
    if batch.fts is not None:
        checks["fts T"] = batch.fts.shape[1]
    if batch.audio_fts is not None:
        checks["audio T"] = batch.audio_fts.shape[1]
    for name, dim in checks.items():
        if dim % seq_parallel:
            raise ValueError(
                f"{name}={dim} not divisible by seq axis {seq_parallel}; "
                "pad to a multiple (len_buckets/time_buckets)")
