"""TGIF-QA VideoQA adaptation (BASELINE.json config 5).

Adapts the BiST reasoning backbone to the four TGIF-QA tasks over the same
(B, T, S, D) spatio-temporal feature grids:

  * FrameQA    — open-ended: classify over the answer vocabulary;
  * Count      — regression head, rounded/clipped to [1, 10] at eval;
  * Action / Transition — 5-way multiple choice: each candidate answer is
    appended to the question, all 5 candidates run through the shared
    backbone, and a scalar scoring head picks the best.

Architecture: the question (+ candidate) plays the reference's "query" role;
the BiST video-reasoning stack (models/bist.py vid_layer_apply — the paper's
factorized t2s/s2t attention) runs exactly as in the dialogue model; the
fused final-layer features are mean-pooled under the query mask into a task
head.  There is no dialogue history / caption / response decoder here — this
is the VideoQA re-use of the backbone, not a port of any reference code
(the reference repo has no TGIF-QA support; this widens the framework).

Data format: the public TGIF-QA TSV splits —
  frameqa:  gif_name, question, answer, ...
  count:    gif_name, question, answer(int)
  action / transition:  gif_name, question, a1..a5, answer(index)
"""

from __future__ import annotations

import csv
import enum
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bist_tpu.config import ModelConfig
from bist_tpu.models import bist
from bist_tpu.models.layers import (
    RngGen, embed, embedding_init, layer_norm, layer_norm_init, linear,
    linear_init, positional_encoding_table, add_positional,
)
from bist_tpu.vocab import PAD, words2ids


class TGIFTask(str, enum.Enum):
    FRAMEQA = "frameqa"
    COUNT = "count"
    ACTION = "action"
    TRANSITION = "transition"


@dataclass
class TgifExample:
    gif_name: str
    question: np.ndarray                 # token ids
    # frameqa: answer class id; count: integer; action/transition: 0-4
    label: int
    candidates: Optional[List[np.ndarray]] = None   # 5 tokenised options


def load_tgif_tsv(path: str, task: TGIFTask, vocab: Dict[str, int],
                  answer_vocab: Optional[Dict[str, int]] = None
                  ) -> List[TgifExample]:
    """Parse a TGIF-QA TSV split.  For frameqa, `answer_vocab` maps answer
    strings to class ids (built from the train split's most frequent
    answers); unseen answers map to class 0."""
    out: List[TgifExample] = []
    with open(path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            q = words2ids(row["question"].lower(), vocab)
            if task == TGIFTask.FRAMEQA:
                label = (answer_vocab or {}).get(row["answer"].lower(), 0)
                out.append(TgifExample(row["gif_name"], q, label))
            elif task == TGIFTask.COUNT:
                out.append(TgifExample(row["gif_name"], q,
                                       int(float(row["answer"]))))
            else:
                cands = [words2ids(row[f"a{i}"].lower(), vocab)
                         for i in range(1, 6)]
                out.append(TgifExample(row["gif_name"], q,
                                       int(row["answer"]), cands))
    return out


def build_answer_vocab(path: str, top_k: int = 1000) -> Dict[str, int]:
    from collections import Counter

    freq: Counter = Counter()
    with open(path) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            freq[row["answer"].lower()] += 1
    return {a: i for i, (a, _) in enumerate(freq.most_common(top_k))}


class TgifBatch(NamedTuple):
    query: np.ndarray           # (B, Lq) — or (B·5, Lq) for multiple choice
    fts: np.ndarray             # (B, T, S, Dv) — tiled to (B·5, ...) for MC
    label: np.ndarray           # (B,)


# ---------------------------------------------------------------------------
# Model


def init_tgif_model(key: jax.Array, cfg: ModelConfig, task: TGIFTask,
                    n_answers: int = 1000):
    """Backbone = embeddings + query norm + video projection + BiST layers;
    head per task."""
    ks = jax.random.split(key, 8)
    params = {
        "embed": embedding_init(ks[0], cfg.vocab_size, cfg.d_model),
        "q_norm": layer_norm_init(cfg.d_model),
        "vid_enc": {"W": linear_init(ks[1], cfg.ft_sizes[0], cfg.d_model),
                    "in_norm": layer_norm_init(cfg.d_model)},
        "v_layers": [bist.vid_layer_init(k, cfg)
                     for k in jax.random.split(ks[2], cfg.nb_venc_blocks)],
        "out_norm_t": layer_norm_init(cfg.d_model),
        "out_norm_s": layer_norm_init(cfg.d_model),
    }
    head_in = cfg.d_model * (2 if cfg.both_directions else 1)
    if task == TGIFTask.FRAMEQA:
        params["head"] = linear_init(ks[3], head_in, n_answers)
    elif task == TGIFTask.COUNT:
        params["head"] = linear_init(ks[3], head_in, 1)
    else:
        params["head"] = linear_init(ks[3], head_in, 1)   # per-candidate score
    return params


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L, D) × (B, L) → (B, D)."""
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def tgif_forward(params, cfg: ModelConfig, query: jnp.ndarray,
                 fts: jnp.ndarray, task: TGIFTask,
                 rngs: Optional[RngGen] = None) -> jnp.ndarray:
    """Returns logits: (B, n_answers) for frameqa, (B,) for count,
    (B,) per-row candidate score for action/transition (caller reshapes to
    (B, 5))."""
    pe = positional_encoding_table(cfg.d_model, cfg.max_pos)
    q_emb = add_positional(pe, embed(params["embed"], query, cfg.d_model),
                           cfg.dropout, rngs)
    q = layer_norm(params["q_norm"], q_emb)
    query_mask = (query != PAD)[:, None, :].astype(jnp.int32)

    v = jax.nn.relu(linear(params["vid_enc"]["W"], fts))
    # temporal positional encoding on the video grid (broadcast over the
    # spatial axis).  The DIALOGUE model deliberately omits video PE for
    # reference parity (--vid-pos is parsed but unwired there, mtn.py:108);
    # TGIF-QA is this framework's own extension and its Transition task
    # (before/after questions) is architecturally unsolvable without
    # temporal order — tests/test_tgifqa.py::test_mc_heads_learn_heldout
    # plateaus at the 0.5 ignore-the-cue ceiling with PE removed.
    v = v + pe[: v.shape[1]][None, :, None, :]
    grid = layer_norm(params["vid_enc"]["in_norm"], v)
    temporal_mask = (jnp.sum(fts, axis=(2, 3)) != 0)[:, None, :] \
        .astype(jnp.int32)

    masks = {"query_mask": query_mask, "temporal_mask": temporal_mask}
    ft = {"video_grid": grid, "encoded_query": q}
    in_ft = {"t2s": q, "s2t": q}
    for lp in params["v_layers"]:
        in_ft = bist.vid_layer_apply(lp, cfg, in_ft, ft, masks, rngs)

    pooled = []
    if cfg.s2t:
        pooled.append(_masked_mean(layer_norm(params["out_norm_t"],
                                              in_ft["s2t"]),
                                   query_mask[:, 0]))
    if cfg.t2s:
        pooled.append(_masked_mean(layer_norm(params["out_norm_s"],
                                              in_ft["t2s"]),
                                   query_mask[:, 0]))
    rep = jnp.concatenate(pooled, axis=-1)
    logits = linear(params["head"], rep)
    if task == TGIFTask.FRAMEQA:
        return logits
    return logits[..., 0]


def tgif_loss(params, cfg: ModelConfig, batch: TgifBatch, task: TGIFTask,
              rngs: Optional[RngGen] = None):
    """(loss, metrics) per task: CE for frameqa, MSE for count, 5-way CE for
    action/transition (query/fts rows are B·5 candidate-expanded)."""
    if task in (TGIFTask.ACTION, TGIFTask.TRANSITION):
        scores = tgif_forward(params, cfg, batch.query, batch.fts, task, rngs)
        scores = scores.reshape(-1, 5)                       # (B, 5)
        logp = jax.nn.log_softmax(scores, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(
            logp, batch.label[:, None], axis=1))
        acc = jnp.mean((jnp.argmax(scores, -1) == batch.label)
                       .astype(jnp.float32))
        return loss, {"acc": acc}
    logits = tgif_forward(params, cfg, batch.query, batch.fts, task, rngs)
    if task == TGIFTask.COUNT:
        pred = logits
        loss = jnp.mean(jnp.square(pred - batch.label.astype(jnp.float32)))
        rounded = jnp.clip(jnp.round(pred), 1, 10)
        mae = jnp.mean(jnp.abs(rounded - batch.label.astype(jnp.float32)))
        return loss, {"mae": mae}
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, batch.label[:, None], axis=1))
    acc = jnp.mean((jnp.argmax(logits, -1) == batch.label)
                   .astype(jnp.float32))
    return loss, {"acc": acc}


def make_tgif_train_step(cfg: ModelConfig, task: TGIFTask, tx):
    def step(state, batch: TgifBatch, key):
        def loss_fn(params):
            rngs = RngGen(key) if cfg.dropout > 0 else None
            return tgif_loss(params, cfg, batch, task, rngs)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        import optax

        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return {"params": params, "opt_state": opt_state,
                "step": state["step"] + 1}, metrics

    return jax.jit(step)


def expand_candidates(examples: Sequence[TgifExample], fts_lookup,
                      max_len: int = 32) -> TgifBatch:
    """Action/Transition batch: append each candidate to the question →
    (B·5, L) rows sharing the video features."""
    from bist_tpu.data.batching import pad_to

    rows = []
    fts = []
    labels = []
    for e in examples:
        for cand in e.candidates:
            rows.append(np.concatenate([e.question, cand])[:max_len])
        video = fts_lookup(e.gif_name)
        fts.extend([video] * 5)
        labels.append(e.label)
    query = pad_to(rows, max_len)
    return TgifBatch(query=query, fts=np.stack(fts),
                     label=np.asarray(labels, np.int32))
