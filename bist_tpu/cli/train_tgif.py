#!/usr/bin/env python
"""TGIF-QA training entry point (framework extension; BASELINE.json config 5).

Trains one of the four TGIF-QA tasks (frameqa / count / action / transition)
on the shared BiST video-reasoning backbone over (T, S, D) feature grids.

    python train_tgif.py --task frameqa \
        --train-tsv Train_frameqa_question.tsv --test-tsv Test_frameqa_question.tsv \
        --feature-path '<dir>/<ImageID>.npy' --model exps/tgif_frameqa \
        --num-epochs 10 [--device cpu]

Features: one .npy per gif (T, S, D) — produced by extract_features.py."""

import argparse
import logging
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", required=True,
                   choices=["frameqa", "count", "action", "transition"])
    p.add_argument("--train-tsv", required=True)
    p.add_argument("--test-tsv", default="")
    p.add_argument("--feature-path", required=True,
                   help="template <ImageID>.npy (or <FeaType>/<ImageID>.npy)")
    p.add_argument("--model", required=True)
    p.add_argument("--num-epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--d-model", type=int, default=128)
    p.add_argument("--att-h", type=int, default=8)
    p.add_argument("--nb-venc-blocks", type=int, default=2)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n-answers", type=int, default=1000)
    p.add_argument("--max-len", type=int, default=32)
    p.add_argument("--rand-seed", type=int, default=1)
    p.add_argument("--device", default="")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s: %(message)s")
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import optax

    from bist_tpu.config import ModelConfig
    from bist_tpu.data.batching import bucket_len, pad_to
    from bist_tpu.data.features import FeatureStore
    from bist_tpu.tasks.tgifqa import (TGIFTask, TgifBatch,
                                       build_answer_vocab, expand_candidates,
                                       init_tgif_model, load_tgif_tsv,
                                       make_tgif_train_step, tgif_loss)
    from bist_tpu.utils.cache import enable_compilation_cache
    from bist_tpu.vocab import SPECIALS

    enable_compilation_cache()
    task = TGIFTask(args.task)
    rng = np.random.default_rng(args.rand_seed)

    # vocabulary over question (+ candidate) words, freq > 1
    import csv
    from collections import Counter

    freq = Counter()
    with open(args.train_tsv) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            freq.update(row["question"].lower().split())
            for i in range(1, 6):
                if f"a{i}" in row:
                    freq.update(row[f"a{i}"].lower().split())
    vocab = dict(SPECIALS)
    for w, c in freq.items():
        if c > 1:
            vocab[w] = len(vocab)
    logging.info("#vocab = %d", len(vocab))

    answer_vocab = None
    if task == TGIFTask.FRAMEQA:
        answer_vocab = build_answer_vocab(args.train_tsv, args.n_answers)
        logging.info("#answers = %d", len(answer_vocab))

    train = load_tgif_tsv(args.train_tsv, task, vocab, answer_vocab)
    logging.info("#train = %d", len(train))

    template = args.feature_path if "<ImageID>" in args.feature_path \
        else os.path.join(args.feature_path, "<ImageID>.npy")
    store = FeatureStore("tgif", template.replace("<FeaType>", "tgif"))
    store.register(sorted({e.gif_name for e in train}))
    dv = store.dim()

    cfg = ModelConfig(vocab_size=len(vocab), nb_blocks=args.nb_venc_blocks,
                      nb_venc_blocks=args.nb_venc_blocks, nb_cenc_blocks=0,
                      d_model=args.d_model, att_h=args.att_h,
                      dropout=args.dropout, include_caption="none",
                      enc_vc_combine="none", ft_sizes=(dv,), ptr_ft="query")
    params = init_tgif_model(jax.random.PRNGKey(args.rand_seed), cfg, task,
                             n_answers=args.n_answers)
    tx = optax.adam(args.lr)
    state = {"params": params, "opt_state": tx.init(params), "step": 0}
    step = make_tgif_train_step(cfg, task, tx)

    def batches(examples, shuffle=True, drop_last=True):
        """drop_last=True for training (stable compiled shapes); eval keeps
        the tail batch so every example is scored (one extra compile)."""
        idx = np.arange(len(examples))
        if shuffle:
            rng.shuffle(idx)
        end = len(idx) - args.batch_size + 1 if drop_last else len(idx)
        for s in range(0, max(end, 0), args.batch_size):
            exs = [examples[i] for i in idx[s:s + args.batch_size]]
            t_pad = bucket_len(max(store.shape_of(e.gif_name)[0]
                                   for e in exs), (16, 32, 48, 64))
            if task in (TGIFTask.ACTION, TGIFTask.TRANSITION):
                batch = expand_candidates(
                    exs, store.get, max_len=args.max_len)
                fts = np.zeros((len(batch.fts), t_pad) + batch.fts[0].shape[1:],
                               np.float32)
                for i, f in enumerate(batch.fts):
                    fts[i, :min(len(f), t_pad)] = f[:t_pad]
                yield TgifBatch(query=batch.query, fts=fts, label=batch.label)
            else:
                q = pad_to([e.question[:args.max_len] for e in exs],
                           bucket_len(max(len(e.question) for e in exs),
                                      (16, 32)))
                fts = store.get_batch([e.gif_name for e in exs], t_pad)
                yield TgifBatch(query=q, fts=fts,
                                label=np.asarray([e.label for e in exs],
                                                 np.int32))

    metric_key = "mae" if task == TGIFTask.COUNT else "acc"
    for epoch in range(args.num_epochs):
        t0 = time.time()
        tot = {metric_key: 0.0, "loss": 0.0}
        n = 0
        for batch in batches(train):
            # rbg: TPU hardware RNG for the dropout sites (see train.py --prng)
            state, m = step(state, batch,
                            jax.random.key(epoch * 131 + n, impl="rbg"))
            tot["loss"] += float(m["loss"])
            tot[metric_key] += float(m[metric_key])
            n += 1
        logging.info("epoch %d: loss %.4f %s %.4f (%.1fs)", epoch + 1,
                     tot["loss"] / max(n, 1), metric_key,
                     tot[metric_key] / max(n, 1), time.time() - t0)

    if args.test_tsv:
        test = load_tgif_tsv(args.test_tsv, task, vocab, answer_vocab)
        tot = 0.0
        n = 0
        for batch in batches(test, shuffle=False, drop_last=False):
            _, m = tgif_loss(state["params"], cfg, batch, task)
            k = len(batch.label)        # example-weighted aggregate
            tot += float(m[metric_key]) * k
            n += k
        logging.info("TEST %s: %.4f over %d examples", metric_key,
                     tot / max(n, 1), n)

    os.makedirs(os.path.dirname(os.path.abspath(args.model)), exist_ok=True)
    from bist_tpu.train.checkpoint import save_checkpoint

    class _S:
        def __init__(self, d):
            self.params = d["params"]
            self.opt_state = d["opt_state"]
            self.step = np.asarray(d["step"])

    save_checkpoint(args.model + "_best", _S(state))
    logging.info("saved %s_best", args.model)


if __name__ == "__main__":
    main()
