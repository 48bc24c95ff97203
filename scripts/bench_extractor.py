#!/usr/bin/env python
"""ResNeXt-101 3D feature-extraction throughput (clips/sec) on the local
accelerator — BASELINE.json config 4's measurement.  Random-init weights
(identical FLOPs to the Kinetics checkpoint), 16-frame 112x112 clips.

Usage: python scripts/bench_extractor.py [--batch 16] [--iters 5]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--device", default="")
    p.add_argument("--bf16", type=int, default=0)
    args = p.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bist_tpu.models.resnext3d import init_resnext101, resnext101_apply

    params = init_resnext101(jax.random.PRNGKey(0))
    dt_ = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.bf16:
        params = jax.tree_util.tree_map(lambda x: x.astype(dt_), params)
    fn = jax.jit(lambda p, c: resnext101_apply(p, c, mode="spatio_temporal")
                 .astype(jnp.float32))
    clips = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, 16, 112, 112, 3)), dt_)
    np.asarray(fn(params, clips))    # compile + settle
    t0 = time.time()
    for _ in range(args.iters):
        out = np.asarray(fn(params, clips))   # force full D2H drain per iter
    dt = (time.time() - t0) / args.iters
    cps = args.batch / dt
    # one clip covers 16 frames with stride 4 → 4 frames of video at ~24fps
    print(f"{cps:.1f} clips/sec (batch {args.batch}, {dt*1e3:.0f} ms/batch; "
          f"~{cps * 4 / 24:.1f}x realtime video at 24fps stride 4)")


if __name__ == "__main__":
    main()
