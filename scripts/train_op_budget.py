#!/usr/bin/env python
"""Train-step op-count budget from the TPU lowering (VERDICT r3 weak#5,
training half — the decode half is scripts/decode_op_budget.py).

Lowers the flagship training step FOR TPU via jax.export (no chip needed)
and counts the StableHLO ops of the whole program: forward, backward,
Noam/Adam update.  Three lowerings decompose the budget:

  * full step under the shipped `--prng rbg` default,
  * full step under threefry (the delta is the RNG surface the round-2
    rbg switch removed — measured 1.2-2.2x step time back then),
  * forward-only (entry()'s loss fn, no dropout) — the inference surface.

Together with the measured batch-scaling table (BENCH.md round 3:
answer-tok/s peaks at batch 32, MFU <= 2.3%) this is the op-count budget
that says WHY the train step is op-latency-bound at the flagship geometry:
the per-step program is hundreds of fusion-surviving ops whose per-op cost
at d_model=128 sits at dispatch latency, not MXU throughput.

Usage: python scripts/train_op_budget.py [--batch 32] [--prng rbg]
"""

import argparse
import collections
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

FUSED_AWAY = {"add", "subtract", "multiply", "divide", "maximum",
              "minimum", "exponential", "negate", "compare", "select",
              "convert", "broadcast_in_dim", "reshape", "constant",
              "and", "or", "not", "rsqrt", "sqrt", "log", "tanh",
              "logistic", "iota", "clamp", "floor", "sign", "abs",
              "power", "remainder", "concatenate", "slice", "pad",
              "reverse", "return", "is_finite", "reduce_precision",
              "exponential_minus_one", "log_plus_one", "shift_left",
              "shift_right_logical", "shift_right_arithmetic", "xor",
              "bitcast_convert", "real_dynamic_slice", "round_nearest_afz",
              "round_nearest_even"}


def count_module(hlo: str) -> collections.Counter:
    """Count executed stablehlo ops starting from @main, multiplying shared
    outlined functions by their call sites (jax.export emits `func.call
    @closed_call` for repeated subcomputations — e.g. the per-site dropout
    helper is ONE func called ~60 times; a flat textual count undercounts)."""

    def region_after(text, start):
        # the BODY brace is the first "{" outside the signature parens —
        # arg-attribute dicts like {mhlo.layout_mode = "default"} appear
        # inside them and must be skipped (brace depth tracks those pairs)
        i, pdepth, bdepth = start, 0, 0
        while i < len(text):
            c = text[i]
            if c == "(":
                pdepth += 1
            elif c == ")":
                pdepth -= 1
            elif c == "{":
                if pdepth == 0 and bdepth == 0:
                    break
                bdepth += 1
            elif c == "}":
                bdepth -= 1
            i += 1
        j, depth = i + 1, 1
        while j < len(text) and depth:
            c = text[j]
            depth += (c == "{") - (c == "}")
            j += 1
        return text[i + 1: j]

    funcs = {}
    for m in re.finditer(r"func\.func (?:private |public )?@([\w]+)", hlo):
        funcs[m.group(1)] = region_after(hlo, m.end())

    counts: collections.Counter = collections.Counter()

    def count(text, depth=0):
        for m in re.finditer(r"stablehlo\.(\w+)", text):
            counts[m.group(1)] += 1
        if depth > 8:
            return
        for m in re.finditer(r"(?:func\.call|call) @([\w]+)", text):
            count(funcs.get(m.group(1), ""), depth + 1)

    count(funcs.get("main", hlo))
    return counts


def budget(counts: collections.Counter):
    survive = {k: v for k, v in counts.items() if k not in FUSED_AWAY}
    n_fusable = sum(v for k, v in counts.items() if k in FUSED_AWAY)
    return survive, n_fusable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prng", default="rbg", choices=["rbg", "threefry"])
    ap.add_argument("--platform", default="tpu")
    ap.add_argument("--dump", default="", help="write full-step StableHLO here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import export as jexport

    from bist_tpu.config import TrainConfig
    from bist_tpu.export import abstract_batch
    from bist_tpu.models.model import forward_logprobs, init_model
    from bist_tpu.train.loop import TrainState, make_train_step
    from bist_tpu.train.losses import compute_losses
    from bist_tpu.train.schedule import make_optimizer
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(vocab_size=3000, dv=2048)
    tcfg = TrainConfig()
    tx = make_optimizer(cfg.d_model, tcfg.warmup_steps, tcfg.noam_factor,
                        tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
    step = make_train_step(cfg, tcfg, tx, donate=False, jit_compile=False)

    # shape-only: abstract params/opt-state/batch, nothing materialized
    params = jax.eval_shape(lambda k: init_model(k, cfg),
                            jax.random.PRNGKey(0))
    opt_state = jax.eval_shape(tx.init, params)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jax.ShapeDtypeStruct((), jnp.int32))
    dims = dict(B=args.batch, Lq=16, Lh=64, Lc=16, Lt=16, T=16, S=16,
                Dv=cfg.ft_sizes[0])
    batch = abstract_batch(dims, cfg)

    def lower(prng_impl):
        key = jax.random.key(0, impl=prng_impl)
        exp = jexport.export(jax.jit(step),
                             platforms=[args.platform])(state, batch, key)
        return exp.mlir_module()

    impl = {"threefry": "threefry2x32"}.get(args.prng, args.prng)
    hlo_full = lower(impl)
    if args.dump:
        open(args.dump, "w").write(hlo_full)
    counts_full = count_module(hlo_full)
    other_impl = "threefry2x32" if impl == "rbg" else "rbg"
    counts_other = count_module(lower(other_impl))

    def fwd_fn(params, batch):
        logp, ft = forward_logprobs(params, cfg, batch, rngs=None)
        loss, _ = compute_losses(logp, ft, params["embed"]["lut"], cfg,
                                 batch, tcfg.smoothing)
        return loss

    exp_fwd = jexport.export(jax.jit(fwd_fn),
                             platforms=[args.platform])(params, batch)
    counts_fwd = count_module(exp_fwd.mlir_module())

    label = (f"B={args.batch} flagship d128 3/3/3 ptr-gen AE "
             f"({args.platform} lowering)")
    print(f"\n## Train-step StableHLO op budget — {label}\n")
    surv_full, fus_full = budget(counts_full)
    surv_other, fus_other = budget(counts_other)
    surv_fwd, fus_fwd = budget(counts_fwd)
    keys = sorted(set(surv_full) | set(surv_other) | set(surv_fwd),
                  key=lambda k: -surv_full.get(k, 0))
    print(f"| op (survives fusion ~1:1) | full step --prng {args.prng} | "
          f"full step --prng {other_impl} | forward only (eval) |")
    print("|---|---|---|---|")
    for k in keys:
        print(f"| {k} | {surv_full.get(k, 0)} | {surv_other.get(k, 0)} | "
              f"{surv_fwd.get(k, 0)} |")
    print(f"| (fusable elementwise/layout, pre-fusion) | {fus_full} | "
          f"{fus_other} | {fus_fwd} |")
    tot_full = sum(surv_full.values())
    tot_other = sum(surv_other.values())
    tot_fwd = sum(surv_fwd.values())
    print(f"\nsummary: {tot_full} fusion-surviving ops/step under "
          f"{args.prng} ({tot_other} under {other_impl}, "
          f"{tot_fwd} forward-only); "
          f"{counts_full.get('dot_general', 0)} dot_general "
          f"({counts_fwd.get('dot_general', 0)} forward), "
          f"{counts_full.get('reduce', 0)} reduce, "
          f"{counts_full.get('transpose', 0)} transpose, "
          f"{counts_full.get('rng_bit_generator', 0)} rng_bit_generator")


if __name__ == "__main__":
    main()
