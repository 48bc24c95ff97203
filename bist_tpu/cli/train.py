#!/usr/bin/env python
"""Training entry point — drop-in flag-compatible with the reference train.py
(reference: train.py + configs/train_configs.py:7-57).

Same artifacts: <model>.conf (vocab+configs), <model>_params.txt,
<model>_train.csv / <model>_trace.csv (same columns), best checkpoint at
<model>_best (orbax directory instead of a pickled torch module) — plus true
resume (--resume), which the reference lacks (SURVEY.md §5).

TPU-native: jitted data-parallel train step over a jax.sharding.Mesh
(replaces nn.DataParallel, reference train.py:96-99)."""

import argparse
import logging
import os
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="bist_tpu training")
    # Data (reference flag names)
    p.add_argument("--gpu", "-g", default=0, type=int, help="unused; kept for CLI parity")
    p.add_argument("--fea-type", nargs="+", type=str, default=None,
                   help="feature types, e.g. resnext_st vggish; 'none' = text-only")
    p.add_argument("--train-path", default="", type=str,
                   help="feature path template <FeaType>/<ImageID>.npy")
    p.add_argument("--train-set", default="", type=str)
    p.add_argument("--valid-path", default="", type=str)
    p.add_argument("--valid-set", default="", type=str)
    p.add_argument("--test-set", default="", type=str)
    p.add_argument("--include-caption", default="none", type=str)
    p.add_argument("--separate-caption", default=1, type=int)
    p.add_argument("--cut-a", default=1, type=int)
    p.add_argument("--merge-source", default=0, type=int)
    p.add_argument("--model", default=None, type=str)
    p.add_argument("--cutoff", default=5, type=int)
    p.add_argument("--skip", default=1, type=int)
    p.add_argument("--num-workers", default=0, type=int)
    p.add_argument("--device", default="", type=str,
                   help="'' = default platform (TPU); 'cpu' forces CPU")
    # Model
    p.add_argument("--nb-blocks", default=6, type=int)
    p.add_argument("--nb-venc-blocks", default=0, type=int)
    p.add_argument("--nb-cenc-blocks", default=0, type=int)
    p.add_argument("--nb-aenc-blocks", default=0, type=int)
    p.add_argument("--d-model", default=512, type=int)
    p.add_argument("--d-ff", default=2048, type=int,
                   help="parsed for parity; d_ff is always d_model*4 (mtn.py:70)")
    p.add_argument("--att-h", default=8, type=int)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--grad-accum", default=1, type=int,
                   help="accumulate gradients over N microbatches per "
                        "optimizer step (exact big-batch equivalence; peak "
                        "activation memory /N — combine with --remat)")
    p.add_argument("--feat-int8", default=0, type=int,
                   help="ship video features to device as int8 + per-position"
                        " scale (4x less H2D; dequantised on device; opt-in —"
                        " adds ~0.4%% input quantisation noise)")
    p.add_argument("--attn-dropout", default=0.1, type=float,
                   help="attention-probability dropout; the reference "
                        "hardcodes 0.1 regardless of --dropout (mtn.py:77)")
    p.add_argument("--ptr-gen", default=1, type=int)
    p.add_argument("--ptr-ft", default="query,cap", type=str)
    p.add_argument("--mask-unk", default=1, type=int)
    p.add_argument("--vid-pos", default=0, type=int,
                   help="parsed for parity; never wired in the reference (mtn.py:108)")
    p.add_argument("--dec-st-combine", default="seq", type=str)
    p.add_argument("--enc-st-combine", default="none", type=str)
    p.add_argument("--enc-vc-combine", default="dyn", type=str)
    p.add_argument("--vid-enc-mode", default=22, type=int, help="parity no-op")
    p.add_argument("--auto-encoder", default=1, type=int)
    p.add_argument("--t2s", default=1, type=int)
    p.add_argument("--s2t", default=1, type=int)
    # Training
    p.add_argument("--num-epochs", "-e", default=15, type=int)
    p.add_argument("--rand-seed", "-s", default=1, type=int)
    p.add_argument("--prng", default="rbg", choices=["rbg", "threefry"],
                   help="dropout RNG impl: rbg uses the TPU hardware RNG "
                        "(measured 1.15x faster train step at the flagship "
                        "width — the ~60 dropout sites dominate the "
                        "latency-bound step, BENCH.md); threefry is the "
                        "jax default software hash (bit-reproducible with "
                        "older runs).  rbg is deterministic per seed only on "
                        "a fixed backend + XLA version (its bit streams are "
                        "not stable across versions/backends); use threefry "
                        "for cross-version bit-reproducibility.")
    p.add_argument("--batch-size", "-b", default=32, type=int)
    p.add_argument("--max-length", default=256, type=int)
    p.add_argument("--max-history-length", default=-1, type=int)
    p.add_argument("--report-interval", default=100, type=int)
    p.add_argument("--warmup-steps", default=4000, type=int)
    p.add_argument("--save-all", default=0, type=int)
    p.add_argument("--async-ckpt", default=1, type=int,
                   help="write checkpoints on a background thread (orbax "
                        "AsyncCheckpointer: device arrays snapshot to host "
                        "during save, disk serialization overlaps the next "
                        "epoch); 0 restores blocking writes")
    p.add_argument("--verbose", "-v", default=0, type=int)
    # TPU additions
    p.add_argument("--init-from-ref", default="", type=str,
                   help="initialise params from a REFERENCE-format "
                        "checkpoint (<prefix>_best.pth.tar + pickled "
                        "<prefix>.conf) and fine-tune it here: vocab and "
                        "model shape come from the checkpoint, training "
                        "hyperparameters from this CLI.  --resume, if "
                        "present, wins over this")
    p.add_argument("--reference-root", default="", type=str,
                   help="salesforce/BiST checkout for --init-from-ref "
                        "(resolves the pickled module classes)")
    p.add_argument("--resume", default="", type=str,
                   help="checkpoint dir to resume from (params+opt state+"
                        "step), or 'auto' to pick up the newest complete "
                        "checkpoint for --model (fresh start if none) — the "
                        "restart-safe production launch mode")
    p.add_argument("--num-devices", default=0, type=int,
                   help="limit the data-parallel mesh (0 = all devices)")
    p.add_argument("--bf16", default=0, type=int, help="bfloat16 activations")
    p.add_argument("--remat", default=0, type=int,
                   help="gradient checkpointing per decoder round")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose >= 1 else logging.INFO,
        format="%(asctime)s %(levelname)s: %(message)s")
    for k in vars(args):
        print(f"{k}={getattr(args, k)}")

    if args.device == "cpu":
        os.environ.setdefault("XLA_FLAGS", "")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from bist_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bist_tpu.config import (GenerateConfig, ModelConfig, TrainConfig,
                                 save_conf)
    from bist_tpu.data.avsd import load_avsd
    from bist_tpu.data.features import build_stores, feature_shape
    from bist_tpu.data.loader import AVSDLoader
    from bist_tpu.parallel.mesh import DataParallel
    from bist_tpu.train.checkpoint import (AsyncSaver, restore_train_state,
                                           save_checkpoint)
    from bist_tpu.train.loop import (TrainState, append_trace,
                                     create_train_state, init_csv_logs,
                                     make_eval_step, make_train_step,
                                     run_epoch)
    from bist_tpu.vocab import get_vocabulary

    np.random.seed(args.rand_seed)

    ref_init = None
    if args.init_from_ref:
        from bist_tpu.convert import (default_conf_for,
                                      load_reference_checkpoint_cli)

        ref_conf = (args.model_conf if getattr(args, "model_conf", "")
                    else default_conf_for(args.init_from_ref))
        ref_params, ref_cfg, _, vocab, _ = load_reference_checkpoint_cli(
            args.init_from_ref, ref_conf,
            reference_root=args.reference_root or None)
        # the checkpoint dictates caption preprocessing; the data loaders
        # below use the CLI flags, so a mismatch would feed the model
        # differently-preprocessed batches (or crash on cap=None in jit)
        if ref_cfg.include_caption != args.include_caption or \
                ref_cfg.separate_caption != bool(args.separate_caption):
            sys.exit(
                f"--init-from-ref checkpoint was trained with "
                f"--include-caption {ref_cfg.include_caption} "
                f"--separate-caption {int(ref_cfg.separate_caption)}; pass "
                f"matching flags (got --include-caption "
                f"{args.include_caption} --separate-caption "
                f"{args.separate_caption}) so the training data is "
                f"preprocessed the way the model expects")
        ref_init = (ref_params, ref_cfg)
        logging.info("--init-from-ref %s: vocab (%d words) and model shape "
                     "come from the checkpoint", args.init_from_ref,
                     len(vocab))
    else:
        logging.info("Extracting words from %s", args.train_set)
        vocab = get_vocabulary(args.train_set, cutoff=args.cutoff,
                               include_caption=args.include_caption)
    logging.info("#vocab = %d", len(vocab))

    logging.info("Loading training data from %s", args.train_set)
    train_data = load_avsd(args.train_set, vocab,
                           include_caption=args.include_caption,
                           separate_caption=bool(args.separate_caption),
                           max_history_length=args.max_history_length,
                           merge_source=bool(args.merge_source))
    logging.info("Loading validation data from %s", args.valid_set)
    valid_data = load_avsd(args.valid_set, vocab,
                           include_caption=args.include_caption,
                           separate_caption=bool(args.separate_caption),
                           max_history_length=args.max_history_length,
                           merge_source=bool(args.merge_source))

    vis_stores, aud_stores = build_stores(args.fea_type, args.train_path,
                                          train_data.vid_set, skip=args.skip,
                                          workers=max(args.num_workers, 1))
    for s in vis_stores + aud_stores:
        s.register(valid_data.vid_set)
    ft_sizes = tuple(feature_shape(vis_stores) + feature_shape(aud_stores))
    logging.info("Detected feature dims: %s", list(ft_sizes))

    cfg = ModelConfig(
        vocab_size=len(vocab), nb_blocks=args.nb_blocks,
        nb_venc_blocks=args.nb_venc_blocks, nb_cenc_blocks=args.nb_cenc_blocks,
        nb_aenc_blocks=args.nb_aenc_blocks, d_model=args.d_model,
        att_h=args.att_h, dropout=args.dropout,
        attn_dropout=args.attn_dropout, ptr_gen=bool(args.ptr_gen),
        ptr_ft=args.ptr_ft, mask_unk=bool(args.mask_unk),
        dec_st_combine=args.dec_st_combine, enc_st_combine=args.enc_st_combine,
        enc_vc_combine=args.enc_vc_combine, auto_encoder=bool(args.auto_encoder),
        t2s=bool(args.t2s), s2t=bool(args.s2t),
        include_caption=args.include_caption,
        separate_caption=bool(args.separate_caption), ft_sizes=ft_sizes,
        dtype="bfloat16" if args.bf16 else "float32",
        remat=bool(args.remat))
    if ref_init is not None:
        import dataclasses

        ref_params, ref_cfg = ref_init
        if ref_cfg.ft_sizes != ft_sizes:
            sys.exit(f"--init-from-ref feature dims {ref_cfg.ft_sizes} != "
                     f"detected {ft_sizes} (check --fea-type)")
        # structure from the checkpoint; regularisation/precision from CLI
        cfg = dataclasses.replace(
            ref_cfg, dropout=args.dropout, attn_dropout=args.attn_dropout,
            dtype=cfg.dtype, remat=cfg.remat)
    tcfg = TrainConfig(
        num_epochs=args.num_epochs, rand_seed=args.rand_seed,
        batch_size=args.batch_size, max_length=args.max_length,
        max_history_length=args.max_history_length,
        report_interval=args.report_interval, warmup_steps=args.warmup_steps,
        save_all=bool(args.save_all), cutoff=args.cutoff,
        cut_a=bool(args.cut_a), merge_source=bool(args.merge_source),
        skip=args.skip, num_devices=args.num_devices)

    dp = DataParallel(num_devices=args.num_devices)
    logging.info("data-parallel mesh: %d device(s): %s", dp.n,
                 dp.mesh.devices.ravel()[:4])

    shard_fn = dp.shard
    if args.feat_int8:
        # int8 feature transfer for training: 4x fewer host->device bytes
        # (the dominant feed cost on weak links); dequantised on device in
        # encode() — model math otherwise unchanged (inputs only, ~0.4%
        # quantisation noise; opt-in).
        from bist_tpu.data.batching import quantize_features

        def shard_fn(batch):  # noqa: F811 — runs in the prefetch thread
            if batch.fts is not None and batch.fts_scale is None:
                q8, scale = quantize_features(batch.fts)
                batch = batch._replace(fts=q8, fts_scale=scale)
            return dp.shard(batch)

    # the tail batch must stay shardable (dp.n) AND, under --grad-accum,
    # splittable into microbatches that are each still shardable — pad it to
    # a multiple of dp.n * grad_accum (padded rows are all-PAD: zero tokens,
    # zero loss contribution; real_count in BatchMeta excludes them)
    mk_loader = lambda data, shuffle, cut_a, pad_mult: AVSDLoader(
        data, visual_stores=vis_stores, audio_stores=aud_stores,
        batch_size=args.batch_size, shuffle=shuffle, cut_a=cut_a,
        seed=args.rand_seed, len_buckets=tcfg.len_buckets,
        time_buckets=tcfg.time_buckets, pad_batch_multiple=pad_mult)
    train_loader = mk_loader(train_data, True, bool(args.cut_a),
                             dp.n * max(args.grad_accum, 1))
    valid_loader = mk_loader(valid_data, False, False, dp.n)
    logging.info("#train sample = %d  #train batch = %d",
                 len(train_data.examples), len(train_loader))
    logging.info("#validation sample = %d  #validation batch = %d",
                 len(valid_data.examples), len(valid_loader))

    if ref_init is not None:
        import jax.numpy as jnp

        from bist_tpu.train.schedule import make_optimizer

        # no throwaway init_model: the checkpoint provides the params
        tx = make_optimizer(cfg.d_model, tcfg.warmup_steps, tcfg.noam_factor,
                            tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
        ref_p = jax.tree_util.tree_map(jnp.asarray, ref_init[0])
        state = TrainState(params=ref_p, opt_state=tx.init(ref_p),
                           step=jnp.zeros((), jnp.int32))
        logging.info("params initialised from the reference checkpoint "
                     "(fresh optimizer state)")
    else:
        state, tx = create_train_state(jax.random.PRNGKey(args.rand_seed),
                                       cfg, tcfg)
    start_epoch = 0
    min_valid_loss = 1.0e10
    resume_path = args.resume
    if resume_path == "auto":
        from bist_tpu.train.checkpoint import find_latest_checkpoint

        resume_path = find_latest_checkpoint(args.model) or ""
        if not resume_path:
            logging.info("--resume auto: no checkpoint for %s — fresh start",
                         args.model)
    if resume_path:
        state, meta = restore_train_state(resume_path, TrainState, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        min_valid_loss = float(meta.get("best_valid_loss", 1.0e10))
        logging.info("resumed from %s at step %d epoch %d", resume_path,
                     int(state.step), start_epoch)
    state = TrainState(dp.put_replicated(state.params),
                       dp.put_replicated(state.opt_state), state.step)

    os.makedirs(os.path.dirname(os.path.abspath(args.model)), exist_ok=True)
    save_conf(args.model + ".conf", vocab, cfg, tcfg,
              extra={"fea_type": args.fea_type})
    with open(args.model + "_params.txt", "w") as f:
        for k in vars(args):
            f.write(f"{k}={getattr(args, k)}\n")

    if args.grad_accum > 1 and args.batch_size % (args.grad_accum * dp.n):
        raise SystemExit(
            f"--batch-size {args.batch_size} must divide by --grad-accum x "
            f"device count ({args.grad_accum} x {dp.n}): each microbatch "
            f"must still shard over the data mesh")
    train_step = make_train_step(cfg, tcfg, tx, grad_accum=args.grad_accum)
    eval_step = make_eval_step(cfg, tcfg)
    train_log, trace_log = init_csv_logs(args.model,
                                         resume=bool(resume_path),
                                         start_epoch=start_epoch)
    logging.info("Saving training results to %s", train_log)

    logging.info("----------------")
    logging.info("Start training")
    logging.info("----------------")
    bestmodel_num = 0
    holder = [state]
    data_key = (jax.random.key(args.rand_seed + 777, impl="rbg")
                if args.prng == "rbg"
                else jax.random.PRNGKey(args.rand_seed + 777))
    # async checkpoint writes: disk serialization overlaps the next epoch
    # (save() snapshots device arrays to host before returning, so the
    # train loop may donate/update params immediately)
    saver = AsyncSaver() if args.async_ckpt else None
    save_fn = saver.save if saver is not None else save_checkpoint
    for epoch in range(start_epoch, args.num_epochs):
        t0 = time.time()
        train_losses = run_epoch(train_loader, None, train_step, epoch,
                                 train=True, rng_key=data_key,
                                 report_interval=args.report_interval,
                                 train_log_path=train_log, shard=shard_fn,
                                 state_holder=holder)
        logging.info(
            "epoch: %d train loss: %s aeTemporalLoss %s aeSpatialLoss %s "
            "(%.1fs)", epoch + 1, train_losses["out"],
            train_losses["temporal_ae"], train_losses["spatial_ae"],
            time.time() - t0)
        logging.info("-------validation--------")
        valid_losses = run_epoch(valid_loader, holder[0].params, eval_step,
                                 epoch, train=False, shard=shard_fn)
        logging.info("epoch: %d valid loss: %s aeTemporalLoss %s aeSpatialLoss %s",
                     epoch + 1, valid_losses["out"],
                     valid_losses["temporal_ae"], valid_losses["spatial_ae"])
        append_trace(trace_log, epoch, "train", train_losses)
        append_trace(trace_log, epoch, "val", valid_losses)

        valid_loss = (valid_losses["out"] + valid_losses["temporal_ae"]
                      + valid_losses["spatial_ae"])
        if args.save_all:
            save_fn(f"{args.model}_{epoch + 1}", holder[0],
                    epoch=epoch, best_valid_loss=min_valid_loss)
        if min_valid_loss > valid_loss:
            bestmodel_num = epoch + 1
            logging.info("validation loss reduced %.4f -> %.4f",
                         min_valid_loss, valid_loss)
            min_valid_loss = valid_loss
            save_fn(args.model + "_best", holder[0], epoch=epoch,
                    best_valid_loss=min_valid_loss)
            logging.info("writing model params to %s_best", args.model)
        logging.info("----------------")
    if saver is not None:
        saver.wait()          # join the last in-flight checkpoint write
    logging.info("the best model is epoch %d.", bestmodel_num)


if __name__ == "__main__":
    main()
