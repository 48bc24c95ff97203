#!/usr/bin/env python
"""Per-component FLOP budget of the ResNeXt-101 3D extractor from XLA cost
analysis (backend-independent, computed from the HLO) — the quantitative
basis for the round-4 space-to-depth stem work: where the FLOPs live and
which components can/cannot use the MXU's 128 contraction lanes.

Usage: python scripts/extractor_flops.py [--batch 1]
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def flops_of(fn, *args):
    import jax

    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bist_tpu.models import resnext3d as rx

    params = rx.init_resnext101(jax.random.PRNGKey(0))
    B = args.batch
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.standard_normal((B, 16, 112, 112, 3)),
                        jnp.float32)

    rows = []

    # stem, both formulations
    for name, fn in (
            ("stem direct (7^3 s(1,2,2) C_in=3)",
             lambda p, x: rx._conv3d(x, p["stem"]["conv"], stride=(1, 2, 2))),
            ("stem s2d   (7x4x4 s1 C_in=12)",
             lambda p, x: jax.lax.conv_general_dilated(
                 rx._stem_s2d_input(x), rx._stem_s2d_kernel(p["stem"]["conv"]),
                 window_strides=(1, 1, 1),
                 padding=[(3, 3), (2, 1), (2, 1)],
                 dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))):
        rows.append((name, flops_of(fn, params, clips)))

    # stages (input shapes after stem+maxpool and per-stage strides)
    x = jax.nn.relu(rx._bn(params["stem"]["bn"],
                           rx._stem_conv(clips, params["stem"]["conv"])))
    x = rx._maxpool3d(x)
    for s, stage in enumerate(params["stages"]):
        def stage_fn(ps, xs, _s=s):
            for b, blk in enumerate(ps):
                xs = rx._block(blk, xs, rx.STAGE_STRIDES[_s] if b == 0 else 1)
            return xs
        rows.append((f"stage{s + 1} ({len(stage)} blocks)",
                     flops_of(stage_fn, stage, x)))
        x = jax.jit(stage_fn)(stage, x)

    total_s2d = rows[1][1] + sum(f for _, f in rows[2:])
    total_direct = rows[0][1] + sum(f for _, f in rows[2:])
    print(f"ResNeXt-101 3D, batch {B}, 16x112x112 clips "
          f"(XLA cost-analysis FLOPs):")
    for name, f in rows:
        base = total_s2d if "s2d" in name else total_direct
        print(f"  {name:38s} {f / 1e9:7.2f} GFLOP  ({100 * f / base:5.1f}%)")
    print(f"  {'total (direct stem)':38s} {total_direct / 1e9:7.2f} GFLOP")
    print(f"  {'total (s2d stem)':38s} {total_s2d / 1e9:7.2f} GFLOP")


if __name__ == "__main__":
    main()
