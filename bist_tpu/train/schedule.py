"""Noam learning-rate schedule + optax optimizer.

Parity: NoamOpt (model/optimize.py:9-34) — lr(step) = factor · d_model^-0.5 ·
min(step^-0.5, step · warmup^-1.5), step counting from 1, driving
Adam(lr, betas=(0.9, 0.98), eps=1e-9) (train.py:129-130)."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup: int, factor: float = 1.0):
    scale = factor * (d_model ** -0.5)
    inv_warmup = warmup ** -1.5

    def sched(count):
        step = jnp.asarray(count, jnp.float32) + 1.0  # NoamOpt._step starts at 1
        return scale * jnp.minimum(step ** -0.5, step * inv_warmup)

    return sched


def make_optimizer(d_model: int, warmup: int, factor: float = 1.0,
                   b1: float = 0.9, b2: float = 0.98, eps: float = 1e-9):
    return optax.adam(noam_schedule(d_model, warmup, factor), b1=b1, b2=b2, eps=eps)
