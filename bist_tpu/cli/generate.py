#!/usr/bin/env python
"""Response generation entry point — flag-compatible with the reference
generate.py + configs/test_configs.py.

Same contract: loads <model>.conf + checkpoint, iterates the test JSON in
original dialog order, decodes each (undisclosed) turn, writes a result JSON
preserving the input structure with answers replaced (generate.py:23-132),
and logs QS/REF/HYP lines.

TPU-native difference: turns are decoded in BATCHES through one compiled
beam-search program with KV caching (--gen-batch-size, default 32) instead of
the reference's batch-1 per-turn full-decoder re-runs — this is the ≥10×
throughput component (SURVEY.md §3.2)."""

import argparse
import copy
import sys
import json
import logging
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description="bist_tpu generation")
    p.add_argument("--gpu", "-g", default=0, type=int, help="CLI parity no-op")
    p.add_argument("--test-path", default="", type=str)
    p.add_argument("--test-set", default="", type=str)
    p.add_argument("--model-conf", default="", type=str)
    p.add_argument("--reference-root", default="", type=str,
                   help="path to a salesforce/BiST checkout; needed when "
                        "--model is a reference-format .pth.tar checkpoint "
                        "(the pickled module classes resolve from there)")
    p.add_argument("--model", "-m", default="", type=str)
    p.add_argument("--maxlen", default=12, type=int)
    p.add_argument("--dec-eos", default=0, type=int)
    p.add_argument("--beam", default=3, type=int)
    p.add_argument("--penalty", default=2.0, type=float)
    p.add_argument("--nbest", default=5, type=int)
    p.add_argument("--output", "-o", default="", type=str)
    p.add_argument("--verbose", "-v", default=0, type=int)
    p.add_argument("--decode-style", default="greedy", type=str,
                   help="beam_search | greedy | oracle | sample (all four "
                        "reference styles live here, three dead there; "
                        "'sample' is this framework's serving extension)")
    p.add_argument("--temperature", default=1.0, type=float)
    p.add_argument("--top-k", default=0, type=int)
    p.add_argument("--top-p", default=0.0, type=float)
    p.add_argument("--sample-seed", default=1, type=int)
    p.add_argument("--cache-dtype", default="float32",
                   choices=["float32", "bfloat16", "float8_e4m3fn",
                            "float8_e5m2"],
                   help="decode KV-cache storage; bfloat16 measured ~2x "
                        "faster beam batches on the v5e (BENCH.md round 3) "
                        "at ~98%% token agreement on a random model (ties "
                        "flip; trained models are more robust) — f32 stays "
                        "the parity default.  float8_* store the decode "
                        "memory at 1 byte/elem (upcast to bf16 at read; "
                        "~2 significant digits — experimental, answers may "
                        "shift; BENCH.md round 4)")
    p.add_argument("--encode-dtype", default="",
                   choices=["", "float32", "bfloat16"],
                   help="ctx-precompute activation dtype (the encoder + "
                        "BiST stack run once per batch before the decode "
                        "loop).  '' inherits the model's training dtype; "
                        "bfloat16 speeds the MXU-bound precompute slice "
                        "(answers may differ from f32 in ties)")
    p.add_argument("--scan-unroll", default=1, type=int,
                   help="beam-scan body replication (identical numerics); 8 "
                        "measured 1.25x decode throughput vs 1 on the v5e "
                        "(BENCH.md round 4) at ~8x compile time — worthwhile "
                        "for long runs, left at 1 for one-shot eval")
    p.add_argument("--undisclosed-only", default=0, type=int)
    p.add_argument("--labeled-test", default=None, type=str)
    p.add_argument("--num-workers", default=0, type=int)
    # TPU additions
    p.add_argument("--gen-batch-size", default=32, type=int)
    p.add_argument("--device", default="", type=str, help="'cpu' forces CPU")
    p.add_argument("--ensemble", nargs="*", default=None,
                   help="additional model checkpoint dirs to ensemble with "
                        "--model (summed log-probs; all share --model-conf)")
    p.add_argument("--feat-int8", default=0, type=int,
                   help="ship video features as int8 + per-position scale "
                        "(4x less host->device traffic; dequantised on "
                        "device; verified answer-identical on trained models)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose >= 1 else logging.INFO,
        format="%(asctime)s %(levelname)s: %(message)s")
    for k in vars(args):
        print(f"{k}={getattr(args, k)}")

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from bist_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bist_tpu.config import GenerateConfig, load_conf
    from bist_tpu.data.avsd import load_avsd
    from bist_tpu.data.features import build_stores
    from bist_tpu.data.loader import AVSDLoader
    from bist_tpu.decode.beam import (beam_search, extract_hyps, greedy_decode,
                                      oracle_decode)
    from bist_tpu.models.model import init_model
    from bist_tpu.train.checkpoint import load_checkpoint
    from bist_tpu.vocab import EOS, ids2words, make_id2word

    logging.info("Loading model params from %s", args.model)
    from bist_tpu.convert import default_conf_for, is_reference_conf

    # default conf strips checkpoint suffixes so --model exps/mtn,
    # exps/mtn_best and exps/mtn_best.pth.tar all resolve exps/mtn.conf
    conf_path = args.model_conf or default_conf_for(args.model)

    import jax.numpy as jnp

    # Drop-in migration: --model may point at a REFERENCE checkpoint (the
    # pickled-module mtn_best.pth.tar + pickled (vocab, args) .conf the
    # reference's train.py writes).  Detected by the .conf's format — the
    # reference pickles (protocol-2 magic b'\\x80'), ours is JSON.
    if is_reference_conf(conf_path):
        from bist_tpu.convert import load_reference_checkpoint_cli

        if args.ensemble:
            sys.exit("--ensemble is not supported with reference-format "
                     "checkpoints; convert them first (bist_tpu.convert)")
        logging.info("reference-format checkpoint detected; importing")
        params, cfg, tcfg, vocab, extra = load_reference_checkpoint_cli(
            args.model, conf_path, reference_root=args.reference_root or None)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        vocab, cfg, tcfg, extra = load_conf(conf_path)

        def _load(path):
            payload = load_checkpoint(
                path + "_best" if os.path.isdir(path + "_best") else path)
            return jax.tree_util.tree_map(jnp.asarray, payload["params"])

        params = _load(args.model)
        if args.ensemble:
            params = [params] + [_load(p) for p in args.ensemble]
            logging.info("ensembling %d models", len(params))
    id2word = make_id2word(vocab)
    logging.info("#vocab = %d", len(vocab))
    n_dev = jax.device_count()
    if n_dev > 1:
        logging.info("decoding data-parallel over %d devices", n_dev)

    # Feature-type override at test time (reference generate.py:101-104):
    # resnext_st (+ vggish_testset when the model was trained with vggish).
    had_vggish = any("vggish" in str(s)
                     for s in (extra.get("fea_type") or [])) or cfg.has_audio
    fea_type = ["resnext_st"] + (["vggish_testset"] if had_vggish else [])
    if not cfg.has_video:
        fea_type = None

    logging.info("Loading test data from %s", args.test_set)
    test_data = load_avsd(args.test_set, vocab,
                          include_caption=cfg.include_caption,
                          separate_caption=cfg.separate_caption,
                          max_history_length=tcfg.max_history_length,
                          merge_source=tcfg.merge_source,
                          undisclosed_only=bool(args.undisclosed_only))
    vis_stores, aud_stores = build_stores(fea_type, args.test_path,
                                          test_data.vid_set, skip=tcfg.skip,
                                          workers=max(args.num_workers, 1))
    # data-parallel decoding: batch rows sharded over ALL local devices,
    # params replicated — same mesh recipe as training (parallel/mesh.py);
    # on one device this is a no-op placement.  Tail batches pad to the
    # mesh size (pad rows are dropped via meta.real_count).
    from bist_tpu.parallel.mesh import DataParallel

    dp = DataParallel()
    loader = AVSDLoader(test_data, visual_stores=vis_stores,
                        audio_stores=aud_stores,
                        batch_size=args.gen_batch_size, shuffle=False,
                        cut_a=False, len_buckets=tcfg.len_buckets,
                        time_buckets=tcfg.time_buckets,
                        pad_batch_multiple=dp.n)
    logging.info("#test sample = %d  #test batch = %d",
                 len(test_data.examples), len(loader))

    labeled_test = None
    if args.undisclosed_only and args.labeled_test:
        with open(args.labeled_test) as f:
            labeled_test = json.load(f)

    gcfg = GenerateConfig(maxlen=args.maxlen, beam=args.beam,
                          penalty=args.penalty, nbest=args.nbest,
                          dec_eos=bool(args.dec_eos),
                          undisclosed_only=bool(args.undisclosed_only),
                          decode_style=args.decode_style,
                          gen_batch_size=args.gen_batch_size,
                          cache_dtype=args.cache_dtype,
                          scan_unroll=args.scan_unroll,
                          encode_dtype=args.encode_dtype)

    logging.info("----------------------- generate --------------------------")
    start_time = time.time()
    answers = {}     # qa_id -> (answer string, nbest log lines)
    n_done = 0
    beam_jit = jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg))
    greedy_jit = jax.jit(lambda p, b: greedy_decode(
        p, cfg, b, gcfg.maxlen, cache_dtype=gcfg.cache_dtype,
        unroll=gcfg.scan_unroll, encode_dtype=gcfg.encode_dtype))
    # oracle = teacher-forced argmax; needs labeled targets (reference's dead
    # oracle_decode path, made to work — see decode/beam.py:oracle_decode)
    oracle_jit = jax.jit(lambda p, b: oracle_decode(p, cfg, b))
    from bist_tpu.decode.sample import sample_decode

    sample_key = jax.random.PRNGKey(args.sample_seed)
    sample_jit = jax.jit(lambda p, b, k: sample_decode(
        p, cfg, b, gcfg.maxlen, k, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p, cache_dtype=gcfg.cache_dtype,
        unroll=gcfg.scan_unroll, encode_dtype=gcfg.encode_dtype))
    # fold a batch counter into the key so rows of DIFFERENT batches draw
    # independent categorical noise (sample_decode itself only folds in the
    # step index); one compile, the key is a runtime argument
    _sample_n = iter(range(1 << 30))

    def sample_batch(p, b):
        return sample_jit(p, b, jax.random.fold_in(sample_key,
                                                   next(_sample_n)))
    if gcfg.decode_style == "oracle" and args.undisclosed_only:
        raise SystemExit("--decode-style oracle requires labeled targets; "
                         "run without --undisclosed-only")
    if args.ensemble and gcfg.decode_style != "beam_search":
        raise SystemExit("--ensemble is only supported with "
                         "--decode-style beam_search")
    from bist_tpu.data.batching import quantize_features
    from bist_tpu.data.loader import device_prefetch
    from bist_tpu.decode.beam import BeamResult

    params = ([dp.put_replicated(p) for p in params]
              if isinstance(params, list) else dp.put_replicated(params))

    def prepare(batch):
        """Loader-thread work: int8-quantise and start the H2D transfer of the
        NEXT batch while the device decodes the current one (the tunnel
        transfer is the end-to-end bottleneck, BENCH.md).  Rows are placed
        sharded over the data mesh."""
        if args.feat_int8 and batch.fts is not None:
            q8, scale = quantize_features(batch.fts)
            batch = batch._replace(fts=q8, fts_scale=scale)
        return dp.shard(batch)

    def drain(pending):
        """Pull results of the previously-dispatched batch (overlaps this
        device_get + host postprocessing with the in-flight batch)."""
        nonlocal n_done
        fut, meta = pending
        if gcfg.decode_style == "beam_search":
            result = BeamResult(*jax.device_get(fut))
            for row in range(meta.real_count):
                hyps = extract_hyps(result, id2word, row, gcfg.nbest)
                best = " ".join(hyps[0][0]) if hyps else ""
                answers[meta.qa_ids[row]] = (best, hyps)
        else:
            out = np.asarray(fut)
            for row in range(meta.real_count):
                words = ids2words(out[row], id2word)
                answers[meta.qa_ids[row]] = (" ".join(words), None)
        n_done += meta.real_count
        logging.info("decoded %d/%d turns (%.1f turns/s)", n_done,
                     len(test_data.examples),
                     n_done / max(time.time() - start_time, 1e-9))

    pending = None
    for batch, meta in device_prefetch(iter(loader), prepare, size=2):
        step_jit = {"beam_search": beam_jit, "oracle": oracle_jit,
                    "sample": sample_batch}.get(gcfg.decode_style, greedy_jit)
        fut = step_jit(params, batch)
        if pending is not None:
            drain(pending)
        pending = (fut, meta)
    if pending is not None:
        drain(pending)

    # Reassemble the result JSON in original order (generate.py:30-71).
    result_dialogs = []
    qa_id = 0
    for idx, dialog in enumerate(test_data.original["dialogs"]):
        vid = dialog["image_id"]
        if args.undisclosed_only:
            out_dialog = dialog["dialog"][-1:]
            ref_dialog = None
            if labeled_test is not None:
                ref = labeled_test["dialogs"][idx]
                assert ref["image_id"] == vid
                ref_dialog = ref["dialog"][-1:]
        else:
            out_dialog = dialog["dialog"]
            ref_dialog = None
        pred_dialog = {"image_id": vid, "dialog": copy.deepcopy(out_dialog)}
        result_dialogs.append(pred_dialog)
        for t, qa in enumerate(out_dialog):
            if qa_id not in answers:
                qa_id += 1
                continue
            best, hyps = answers[qa_id]
            logging.info("%d %s_%d", qa_id, vid, t)
            logging.info("QS: %s", qa["question"])
            logging.info("REF: %s", ref_dialog[t]["answer"] if ref_dialog
                         else qa["answer"])
            if hyps:
                for n, (words, score) in enumerate(hyps):
                    logging.info("HYP[%d]: %s  ( %f )", n + 1,
                                 " ".join(words), score)
            else:
                logging.info("HYP: %s", best)
            pred_dialog["dialog"][t]["answer"] = best
            qa_id += 1
            logging.info("-----------------------")

    wall = time.time() - start_time
    logging.info("----------------")
    logging.info("wall time = %f  (%.2f responses/sec)", wall,
                 len(test_data.examples) / max(wall, 1e-9))
    result = {"dialogs": result_dialogs}
    if args.output:
        logging.info("writing results to %s", args.output)
        with open(args.output, "w") as f:
            json.dump(result, f, indent=4)
    logging.info("done")
    return result


if __name__ == "__main__":
    main()
