#!/usr/bin/env python
"""Serving-runtime benchmark: request latency percentiles + throughput of
the dynamic-batching responder under concurrent load (flagship model,
beam 5, maxlen 12).

Measures the SERVING STACK (queueing + coalescing + padded compiled beam +
detok), with per-request feature grids shipped from the host — so on this
image the tunnel is included, like a real request path would include a NIC.

Usage: python scripts/bench_serving.py [--device cpu] [--clients 32]
       [--requests 128] [--max-batch 32] [--t-clips 16]
"""

import argparse
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="")
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--pipeline-depth", type=int, default=4,
                    help="in-flight batches under backlog (1 = serial)")
    ap.add_argument("--ab", type=int, default=0,
                    help="interleaved pipeline-depth A/B: run this many "
                         "ROUNDS alternating depth 1 / --pipeline-depth on "
                         "ONE responder (shared compiled programs, same "
                         "tunnel window) and report per-depth means — "
                         "separate-process runs are drowned by tunnel "
                         "weather (round 4: 216.9 vs 65.2 req/s for the "
                         "SAME workload in adjacent minutes)")
    ap.add_argument("--t-clips", type=int, default=16)
    ap.add_argument("--feat-int8", type=int, default=0)
    ap.add_argument("--dv", type=int, default=2048)
    ap.add_argument("--load-sweep", default="",
                    help="comma list of offered loads (req/s).  OPEN-LOOP "
                         "mode: requests arrive on a fixed clock regardless "
                         "of completions (each submit on its own thread), so "
                         "latency degrades honestly past the knee instead of "
                         "the closed-loop clients self-throttling.  Reports "
                         "achieved req/s + p50/p99 per offered load.  Use "
                         "--dv 256 --t-clips 8 --feat-int8 1 to stay "
                         "decode-bound on a tunnelled harness")
    ap.add_argument("--sweep-requests", type=int, default=240,
                    help="minimum requests per offered-load point")
    ap.add_argument("--sweep-seconds", type=float, default=0.0,
                    help="scale each point to rate x seconds requests "
                         "(min --sweep-requests) so high-load points last "
                         "long enough to mean something")
    ap.add_argument("--ab-load", default="",
                    help="offered load (req/s) for an INTERLEAVED open-loop "
                         "pipeline-depth A/B: --ab rounds alternating "
                         "--ab-depths on one responder in one process "
                         "(cross-window runs are drowned by tunnel weather)")
    ap.add_argument("--ab-depths", default="2,4",
                    help="comma depths for --ab-load")
    ap.add_argument("--sweep-workers", type=int, default=256,
                    help="pre-spawned submit workers for the open-loop "
                         "generator (one-thread-per-request cannot source "
                         ">1k req/s of python threads)")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from bist_tpu.config import GenerateConfig
    from bist_tpu.models.model import init_model
    from bist_tpu.serving import DynamicBatcher, Responder
    from bist_tpu.vocab import get_vocabulary
    from __graft_entry__ import _flagship_cfg

    test_json = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "dstc7avsd_eval", "data",
        "test_set4DSTC7-AVSD.json")
    vocab = get_vocabulary(test_json, cutoff=3, include_caption="summary")
    cfg = _flagship_cfg(vocab_size=len(vocab), dv=args.dv)
    params = init_model(jax.random.PRNGKey(0), cfg)
    gcfg = GenerateConfig(maxlen=12, beam=5, penalty=1.0, nbest=1)
    responder = Responder(params, cfg, vocab, gcfg, max_batch=args.max_batch,
                          time_buckets=(args.t_clips,),
                          feat_int8=bool(args.feat_int8))
    print("warmup compile (all batch buckets)...", file=sys.stderr)
    responder.warmup(feature_shape=(16, args.dv), t_clips=args.t_clips,
                     all_batch_buckets=True)
    rng = np.random.default_rng(0)
    fts_pool = [rng.standard_normal((args.t_clips, 16, args.dv))
                .astype(np.float32) for _ in range(4)]
    qs = ["what is the person doing in the video",
          "is there any sound in the background",
          "how many people are visible", "does he sit down at the end"]

    def run_round(server):
        lat = []
        lock = threading.Lock()
        it = iter(range(args.requests))

        def client():
            while True:
                with lock:
                    i = next(it, None)
                if i is None:
                    return
                t0 = time.perf_counter()
                server.submit(qs[i % 4], history="a man is in a room",
                              caption="a man does things",
                              features=fts_pool[i % 4])
                with lock:
                    lat.append(time.perf_counter() - t0)

        threads = [threading.Thread(target=client)
                   for _ in range(args.clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.time() - t0, sorted(lat), server.stats["batches"]

    def make_server(depth):
        server = DynamicBatcher(responder, max_batch=args.max_batch,
                                max_wait_ms=args.max_wait_ms,
                                pipeline_depth=depth)
        server.start()
        return server

    def open_loop_point(server, rate):
        """One open-loop offered-load point; returns (achieved, lats,
        n_batches, n_reqs, wall, component_delta) or None if no request
        completed.  The arrival clock feeds a pre-spawned worker pool
        through a queue: latency is measured from the SCHEDULED arrival, so
        generator lag, pool queueing and the server all count against the
        server (coordinated-omission-free); with every worker busy the
        excess shows up as scheduled-arrival backlog, exactly like an
        overloaded NIC accept queue."""
        import queue as _queue

        n = max(args.sweep_requests, int(rate * args.sweep_seconds))
        period = 1.0 / rate
        lat, errs = [], []
        lock = threading.Lock()
        b0 = server.stats["batches"]
        r0 = server.stats["requests"]
        c0 = dict(server.metrics()["component_seconds"])
        work: "_queue.Queue" = _queue.Queue()

        def worker():
            while True:
                item = work.get()
                if item is None:
                    return
                i, t_sched = item
                try:
                    server.submit(qs[i % 4], history="a man is in a room",
                                  caption="a man does things",
                                  features=fts_pool[i % 4])
                except Exception as e:  # noqa: BLE001 — report, not skew
                    with lock:
                        errs.append(repr(e))
                    continue
                with lock:
                    lat.append(time.perf_counter() - t_sched)

        workers = [threading.Thread(target=worker, daemon=True)
                   for _ in range(args.sweep_workers)]
        for w in workers:
            w.start()
        t_start = time.perf_counter()
        for i in range(n):
            # fixed arrival clock: sleep to the schedule, not the work
            t_sched = t_start + i * period
            dt = t_sched - time.perf_counter()
            if dt > 0:
                time.sleep(dt)
            work.put((i, t_sched))
        for _ in workers:
            work.put(None)
        for w in workers:
            w.join()
        wall = time.perf_counter() - t_start
        lat.sort()
        if errs:
            print(f"{rate:10.1f}  {len(errs)}/{n} requests FAILED "
                  f"(first: {errs[0][:120]})", flush=True)
        if not lat:
            return None
        nb = server.stats["batches"] - b0
        nr = server.stats["requests"] - r0
        c1 = server.metrics()["component_seconds"]
        comp = {k: c1[k] - c0.get(k, 0.0) for k in c1}
        return len(lat) / wall, lat, nb, nr, wall, comp

    if args.ab_load:
        # INTERLEAVED open-loop pipeline-depth A/B: alternate depths on ONE
        # responder (shared compiled programs) within one process — the only
        # read that survives tunnel weather (cross-window runs of the SAME
        # config measured 195 vs 51 req/s in adjacent minutes, round 5).
        depths = [int(d) for d in args.ab_depths.split(",")]
        rate = float(args.ab_load)
        achieved = {d: [] for d in depths}
        for r in range(args.ab or 3):
            for d in depths:
                server = make_server(d)
                point = open_loop_point(server, rate)
                server.stop()
                if point is None:
                    continue
                achieved[d].append(point[0])
                print(f"# round {r} depth {d}: {point[0]:.1f} req/s "
                      f"(rows/batch {point[3] / max(point[2], 1):.1f})",
                      file=sys.stderr, flush=True)
        for d in depths:
            if achieved[d]:
                print(f"depth {d}: mean {statistics.mean(achieved[d]):.1f} "
                      f"req/s  min {min(achieved[d]):.1f}  "
                      f"max {max(achieved[d]):.1f}  "
                      f"({len(achieved[d])} interleaved rounds, offered "
                      f"{rate:.0f} req/s open-loop)")
        return

    if args.load_sweep:
        # open-loop latency-vs-load curve on ONE responder (same-window
        # points, like the interleaved A/Bs)
        server = make_server(args.pipeline_depth)
        print(f"offered_rps  achieved_rps  p50_ms  p90_ms  p99_ms  batches  "
              f"rows/batch  (open-loop, >= {args.sweep_requests} reqs/point, "
              f"{args.sweep_workers} workers)")
        comp_tables = []
        for rate in [float(r) for r in args.load_sweep.split(",")]:
            point = open_loop_point(server, rate)
            if point is None:
                continue
            ach, lat, nb, nr, wall, comp = point
            comp_tables.append((rate, ach, nb, nr, wall, comp))
            p = lambda q: lat[min(int(q * len(lat)), len(lat) - 1)] * 1e3
            print(f"{rate:10.1f}  {ach:11.1f}  {p(0.5):6.0f}  "
                  f"{p(0.9):6.0f}  {p(0.99):6.0f}  {nb:7d}  "
                  f"{nr / max(nb, 1):9.1f}", flush=True)
        # per-component batch wall-time attribution (the knee's WHY):
        # batcher-thread seconds per point vs wall — the batcher thread is
        # serial, so whichever component sums nearest `wall` is the binding
        # resource at that offered load
        print("\ncomponent seconds per point (batcher thread is serial; "
              "wall in col 2):")
        print("offered_rps   wall_s  coalesce  assemble  ship  device_wait"
              "  extract")
        for rate, ach, nb, nr, wall, comp in comp_tables:
            print(f"{rate:10.1f}  {wall:7.1f}  {comp.get('coalesce_s', 0):8.2f}"
                  f"  {comp.get('assemble_s', 0):8.2f}"
                  f"  {comp.get('ship_s', 0):5.2f}"
                  f"  {comp.get('device_wait_s', 0):11.2f}"
                  f"  {comp.get('extract_s', 0):7.2f}", flush=True)
        server.stop()
        return

    if args.ab > 0:
        depths = (1, max(args.pipeline_depth, 2))
        walls = {d: [] for d in depths}
        for r in range(args.ab):
            for d in depths:
                server = make_server(d)
                wall, _, _ = run_round(server)
                server.stop()
                walls[d].append(wall)
                print(f"round {r} depth {d}: "
                      f"{args.requests / wall:.1f} req/s", file=sys.stderr)
        for d in depths:
            rps = [args.requests / w for w in walls[d]]
            print(f"depth {d}: mean {statistics.mean(rps):.1f} req/s  "
                  f"min {min(rps):.1f}  max {max(rps):.1f}  "
                  f"({args.ab} interleaved rounds x {args.requests} reqs)")
        return

    server = make_server(args.pipeline_depth)
    wall, lat, n_batches = run_round(server)
    server.stop()
    p = lambda q: lat[min(int(q * len(lat)), len(lat) - 1)] * 1e3
    print(f"{args.requests} requests, {args.clients} clients, "
          f"max_batch {args.max_batch}: {args.requests / wall:.1f} req/s; "
          f"latency p50 {p(0.50):.0f} ms  p90 {p(0.90):.0f} ms  "
          f"p99 {p(0.99):.0f} ms; batches {n_batches}")


if __name__ == "__main__":
    main()
