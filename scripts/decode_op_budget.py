#!/usr/bin/env python
"""Decode-step op-count budget from the TPU lowering (VERDICT r3 #5).

Lowers the flagship beam-search program FOR TPU via jax.export (no chip
needed — the same mechanism the AOT bundles use) and counts the StableHLO
ops inside the scan body, i.e. the per-decode-step program.  Together with
the on-chip per-op timings (bench_pack_ab --what decodeops) this is the
op-count budget that decides whether the measured per-step latency is
XLA-irreducible or worth a fused kernel.

Note this counts the pre-fusion StableHLO surface; XLA fuses elementwise
chains, so the "fusable elementwise" row overstates the final op count
while dots/gathers/scatters/top-k survive fusion roughly 1:1.

Usage: python scripts/decode_op_budget.py [--batch 64] [--bd-cross 0|1]
"""

import argparse
import collections
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--bd-cross", type=int, default=0)
    ap.add_argument("--platform", default="tpu")
    ap.add_argument("--region", default="step", choices=["step", "ctx"],
                    help="step = the scan body (per-decode-step program); "
                         "ctx = the ctx-PRECOMPUTE program "
                         "(precompute_decode_ctx lowered standalone — the "
                         "32%% pre-loop share measured by bench_pack_ab "
                         "--what ctxshare)")
    ap.add_argument("--dump", default="", help="write full StableHLO here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bist_tpu.config import GenerateConfig
    from bist_tpu.decode.beam import beam_search
    from bist_tpu.export import abstract_batch
    from bist_tpu.models import model as model_mod
    from bist_tpu.models.model import init_model
    from __graft_entry__ import _flagship_cfg

    model_mod.BD_CROSS = bool(args.bd_cross)

    cfg = _flagship_cfg(vocab_size=3000, dv=2048)
    gcfg = GenerateConfig(maxlen=12, beam=args.beam, penalty=1.0, nbest=5,
                          cache_dtype="bfloat16", scan_unroll=1)
    params = jax.eval_shape(lambda k: init_model(k, cfg),
                            jax.random.PRNGKey(0))
    # shape-only analysis: abstract avals, nothing materialized
    batch_avals = abstract_batch(
        dict(B=args.batch, Lq=32, Lh=256, Lc=64, Lt=1, T=32, S=16,
             Dv=2048), cfg)

    from jax import export as jexport

    if args.region == "ctx":
        from bist_tpu.models.model import precompute_decode_ctx

        exp = jexport.export(
            jax.jit(lambda p, b: precompute_decode_ctx(
                p, cfg, b, dtype=jnp.bfloat16)),
            platforms=[args.platform])(params, batch_avals)
    else:
        exp = jexport.export(
            jax.jit(lambda p, b: beam_search(p, cfg, b, gcfg)),
            platforms=[args.platform])(params, batch_avals)
    hlo = exp.mlir_module()
    if args.dump:
        open(args.dump, "w").write(hlo)

    # the scan body is the `do { ... }` region of the stablehlo.while; jax
    # outlines it into `func.call @closed_call`, so resolve calls
    # recursively.  Brace matching (regexes fail on the nested regions):
    def region_after(text, start):
        i = text.find("{", start)
        j, depth = i + 1, 1
        while j < len(text) and depth:
            c = text[j]
            depth += (c == "{") - (c == "}")
            j += 1
        return text[i + 1: j]

    def func_body(text, start):
        # the body brace is the LAST "{" on the (single-line) signature —
        # earlier braces are inline attr dicts like {jax.result_info = ...}
        nl = text.find("\n", start)
        brace = text.rfind("{", start, nl if nl != -1 else len(text))
        if brace == -1:
            return ""  # declaration-only func: no body to count
        return region_after(text, brace)

    funcs = {}
    for m in re.finditer(r"func\.func (?:private|public) @([\w]+)", hlo):
        funcs[m.group(1)] = func_body(hlo, m.end())

    if args.region == "ctx":
        # whole program: the ctx precompute has no loop — count its main func
        m = re.search(r"func\.func public @(\w+)", hlo)
        body = funcs[m.group(1)]
    else:
        w = hlo.find("stablehlo.while")
        body = region_after(hlo, hlo.find(" do {", w) + 3)

    def count_ops(text, counts, depth=0):
        for m in re.finditer(r"stablehlo\.(\w+)", text):
            counts[m.group(1)] += 1
        if depth > 8:
            return
        for m in re.finditer(r"func\.call @([\w]+)", text):
            count_ops(funcs.get(m.group(1), ""), counts, depth + 1)

    counts: collections.Counter = collections.Counter()
    count_ops(body, counts)
    fused_away = {"add", "subtract", "multiply", "divide", "maximum",
                  "minimum", "exponential", "negate", "compare", "select",
                  "convert", "broadcast_in_dim", "reshape", "constant",
                  "and", "or", "not", "rsqrt", "sqrt", "log", "tanh",
                  "logistic", "iota", "clamp", "floor", "sign", "abs",
                  "power", "remainder", "concatenate", "slice", "pad",
                  "reverse", "return", "is_finite", "reduce_precision"}
    survive = {k: v for k, v in counts.items() if k not in fused_away}
    n_fusable = sum(v for k, v in counts.items() if k in fused_away)

    label = f"B={args.batch} beam={args.beam} bf16-cache " \
            f"bd_cross={bool(args.bd_cross)} ({args.platform} lowering)"
    what = ("ctx-precompute" if args.region == "ctx"
            else "Per-decode-step")
    print(f"\n## {what} StableHLO op budget — {label}\n")
    print("| op (survives fusion ~1:1) | count |")
    print("|---|---|")
    for k in sorted(survive, key=lambda k: -survive[k]):
        print(f"| {k} | {survive[k]} |")
    print(f"| (fusable elementwise/layout, pre-fusion) | {n_fusable} |")
    n_dot = counts.get("dot_general", 0)
    n_gather = counts.get("gather", 0) + counts.get("dynamic_gather", 0)
    n_dus = counts.get("dynamic_update_slice", 0)
    n_transpose = counts.get("transpose", 0)
    print(f"\nsummary: {n_dot} dot_general, {n_transpose} transpose, "
          f"{n_gather} gather, {n_dus} dynamic_update_slice, "
          f"{counts.get('sort', 0) + counts.get('top_k', 0)} sort/top_k, "
          f"{counts.get('reduce', 0)} reduce, "
          f"{counts.get('dynamic_slice', 0)} dynamic_slice per "
          f"{'ctx call' if args.region == 'ctx' else 'step'}")


if __name__ == "__main__":
    main()
