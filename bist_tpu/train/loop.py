"""Jit-compiled data-parallel training step + epoch driver.

Reference counterpart: train.py (epoch loop, run_epoch, CSV artifacts,
best-checkpoint logic).  TPU-native differences:

  * one jitted `train_step` holds the whole forward/backward/update; gradient
    all-reduce across the data mesh is emitted by XLA (no DataParallel,
    no NCCL — SURVEY.md §2.4);
  * loss normalisation happens on the GLOBAL batch token counts, so the
    sharded computation is bit-equivalent to the reference's single-process
    batch semantics;
  * checkpoints (orbax) carry params + optimizer state + step — the reference
    saves only the module and cannot resume (train.py:156-177);
  * CSV artifacts keep the reference's file names and column layout
    (train.py:121-128,151-155) for drop-in comparability.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from bist_tpu.config import ModelConfig, TrainConfig
from bist_tpu.data.batching import Batch
from bist_tpu.models.layers import RngGen
from bist_tpu.models.model import forward_logprobs, init_model
from bist_tpu.train.losses import compute_losses
from bist_tpu.train.schedule import make_optimizer

log = logging.getLogger(__name__)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(key: jax.Array, cfg: ModelConfig, tcfg: TrainConfig,
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    params = init_model(key, cfg)
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps, tcfg.noam_factor,
                        tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def make_train_step(cfg: ModelConfig, tcfg: TrainConfig,
                    tx: optax.GradientTransformation, donate: bool = True,
                    jit_compile: bool = True, grad_accum: int = 1,
                    rng_presplit: int = 0):
    """Returns jitted (state, batch, rng_key) → (state, metrics).

    rng_presplit > 0 derives that many dropout site keys with one vectorized
    split instead of per-site fold_in chains (see layers.RngGen; changes the
    dropout bit stream, like the rbg/threefry choice does).

    jit_compile=False returns the raw step for callers that compose it into
    a larger program (e.g. scan-chained benchmarking).

    grad_accum > 1 splits the batch into `grad_accum` microbatches, scans
    them accumulating gradients (peak activation memory shrinks by the same
    factor — combine with cfg.remat for long videos), and applies ONE
    optimizer update.  Loss normalisers (ntokens/qntokens) are computed on
    the FULL batch before the split, so accumulated gradients and metrics
    are exactly the single-big-batch values (tests/test_grad_accum.py)."""

    def loss_fn(params, batch: Batch, key, norm_override=None):
        # attn_dropout is active in the reference's train mode even when
        # --dropout 0 (mtn.py:77 hardcodes the MHA default 0.1)
        rngs = (RngGen(key, presplit=rng_presplit)
                if (cfg.dropout > 0 or cfg.attn_dropout > 0) else None)
        logp, ft = forward_logprobs(params, cfg, batch, rngs=rngs)
        loss, metrics = compute_losses(logp, ft, params["embed"]["lut"], cfg,
                                       batch, tcfg.smoothing,
                                       norm_override=norm_override)
        return loss, metrics

    def step_fn(state: TrainState, batch: Batch, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return TrainState(params, opt_state, state.step + 1), metrics

    def accum_step_fn(state: TrainState, batch: Batch, key):
        from bist_tpu.vocab import PAD

        norm = (jnp.sum(batch.trg_y != PAD), jnp.sum(batch.query != PAD))
        micro = jax.tree_util.tree_map(
            lambda x: None if x is None
            else x.reshape((grad_accum, -1) + x.shape[1:]), batch,
            is_leaf=lambda x: x is None)

        def body(carry, inp):
            grads_acc, loss_acc, metrics_acc = carry
            mb, i = inp
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, mb,
                                       jax.random.fold_in(key, i),
                                       norm_override=norm)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc, metrics)
            return (grads_acc, loss_acc + loss, metrics_acc), None

        zeros_like = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        g0 = zeros_like(state.params)
        # carry structure derived from the loss function itself (a hardcoded
        # key list would silently drop metrics added to compute_losses)
        micro0 = jax.tree_util.tree_map(
            lambda x: None if x is None else x[0], micro,
            is_leaf=lambda x: x is None)
        m0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda p, b: loss_fn(p, b, key,
                                                norm_override=norm)[1],
                           state.params, micro0))
        (grads, loss, metrics), _ = jax.lax.scan(
            body, (g0, jnp.zeros(()), m0), (micro, jnp.arange(grad_accum)))
        # each microbatch reported the GLOBAL counts (norm_override), so the
        # scan summed them grad_accum times — undo that
        metrics = dict(metrics)
        metrics["ntokens"] = metrics["ntokens"] // grad_accum
        metrics["qntokens"] = metrics["qntokens"] // grad_accum
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return TrainState(params, opt_state, state.step + 1), metrics

    fn = accum_step_fn if grad_accum > 1 else step_fn
    if not jit_compile:
        return fn
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: ModelConfig, tcfg: TrainConfig):
    def step_fn(params, batch: Batch):
        logp, ft = forward_logprobs(params, cfg, batch, rngs=None)
        loss, metrics = compute_losses(logp, ft, params["embed"]["lut"], cfg,
                                       batch, tcfg.smoothing)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    return jax.jit(step_fn)


def _finite(x) -> bool:
    import math

    return math.isfinite(float(x))


class EpochStats:
    """Accumulates the reference's run_epoch totals (train.py:21-52).

    Accumulation stays ON DEVICE (lazy jnp adds) so the step dispatch
    pipeline is never forced to sync; host conversion happens once in
    summary() (and at report intervals in the caller)."""

    def __init__(self):
        self.loss = 0.0
        self.temporal_ae = 0.0
        self.spatial_ae = 0.0
        self.tokens = 0
        self.qtokens = 0

    def update(self, m: Dict[str, Any]):
        self.loss = self.loss + m["out"]
        self.temporal_ae = self.temporal_ae + m["temporal_ae"]
        self.spatial_ae = self.spatial_ae + m["spatial_ae"]
        self.tokens = self.tokens + m["ntokens"]
        self.qtokens = self.qtokens + m["qntokens"]

    def summary(self) -> Dict[str, float]:
        t = max(int(self.tokens), 1)
        q = max(int(self.qtokens), 1)
        return {"out": float(self.loss) / t,
                "temporal_ae": float(self.temporal_ae) / q,
                "spatial_ae": float(self.spatial_ae) / q}


def run_epoch(loader, state_or_params, step_fn, epoch: int, *,
              train: bool, rng_key=None, report_interval: int = 100,
              train_log_path: Optional[str] = None, shard=None,
              state_holder: Optional[list] = None) -> Dict[str, float]:
    """One pass over the loader.  For train=True, state_holder is a 1-element
    list holding TrainState (mutated in place so the caller sees updates)."""
    from bist_tpu.utils.profiling import StepTimer

    stats = EpochStats()
    timer = StepTimer(warmup=1)
    it = loader
    if shard is not None:
        # background-thread prefetch: the NEXT batch's disk reads, collate
        # and H2D transfer all overlap the current step's device compute
        # (the round-1 prefetch_to_device only overlapped via async dispatch
        # on the main thread, serialising host IO between steps)
        from bist_tpu.data.loader import device_prefetch

        it = device_prefetch(iter(loader), prepare=shard, size=2)
    # host-side step counter for dropout keys: folding in int(state.step)
    # would sync on the previous step's device output and stall the pipeline
    py_step = int(state_holder[0].step) if train else 0
    for j, (batch, meta) in enumerate(it):
        with timer.step(items=meta.real_count):
            if train:
                state = state_holder[0]
                key = jax.random.fold_in(rng_key, py_step)
                py_step += 1
                state, metrics = step_fn(state, batch, key)
                state_holder[0] = state
            else:
                metrics = step_fn(state_or_params, batch)
        stats.update(metrics)
        # The report block below is the only per-interval host sync; the
        # non-finite guard rides it (detection latency ≤ report_interval).
        if train and (j + 1) % report_interval == 0:
            if not _finite(metrics["loss"]):
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch + 1} step "
                    f"{j + 1}; resume the last good checkpoint with --resume")
            nt = max(int(metrics["ntokens"]), 1)
            qt = max(int(metrics["qntokens"]), 1)
            line = (f"Epoch: {epoch + 1} Step: {j + 1} "
                    f"Loss: {float(metrics['out']) / nt:f} "
                    f"AETemporalLoss: {float(metrics['temporal_ae']) / qt:f} "
                    f"AESpatialLoss: {float(metrics['spatial_ae']) / qt:f}")
            print(line)
            if train_log_path:
                with open(train_log_path, "a") as f:
                    f.write("{},{},{:e},{:e},{:e}\n".format(
                        epoch + 1, j + 1,
                        float(metrics["out"]) / nt,
                        float(metrics["temporal_ae"]) / qt,
                        float(metrics["spatial_ae"]) / qt))
    t = timer.summary()
    if t["steps"] > 0:
        log.info("%s throughput: %.0f examples/s (%.1f ms/step over %d steps)",
                 "train" if train else "eval", t["items_per_s"],
                 t["mean_s"] * 1e3, t["steps"])
    return stats.summary()


def init_csv_logs(model_prefix: str, resume: bool = False,
                  start_epoch: int = 0) -> Tuple[str, str]:
    """Create <model>_train.csv / <model>_trace.csv with reference headers.

    With resume=True, existing logs are KEPT and appended to (the resumed
    epochs continue the same files) — a fresh run truncates, matching the
    reference's behaviour of one csv per run (train.py:121-128).  Rows for
    epochs the resumed run will re-train (> start_epoch — e.g. resuming
    model_1 out of 4 completed epochs) are dropped first, so no epoch ever
    carries two conflicting rows."""
    import os

    trace_log_path = model_prefix + "_trace.csv"
    train_log_path = model_prefix + "_train.csv"
    for path, header in (
            (trace_log_path, "epoch,split,loss,ae_temporal_loss,ae_spatial_loss\n"),
            (train_log_path, "epoch,step,loss,ae_temporal_loss,ae_spatial_loss\n")):
        if resume and os.path.exists(path):
            with open(path) as f:
                lines = f.readlines()
            kept = [ln for ln in lines[1:]
                    if ln.split(",", 1)[0].isdigit()
                    and int(ln.split(",", 1)[0]) <= start_epoch]
            with open(path, "w") as f:
                f.write(header)
                f.writelines(kept)
            continue
        with open(path, "w") as f:
            f.write(header)
    return train_log_path, trace_log_path


def append_trace(trace_log_path: str, epoch: int, split: str,
                 losses: Dict[str, float]) -> None:
    with open(trace_log_path, "a") as f:
        f.write("{},{},{:e},{:e},{:e}\n".format(
            epoch + 1, split, losses["out"], losses["temporal_ae"],
            losses["spatial_ae"]))
