#!/usr/bin/env python
"""Train-step throughput bench (img/s/chip), the train-side companion of
bench.py (SURVEY.md §6 north-star scaling clause).

Measures the full jitted step — fused on-device preprocess + Pallas anchor
matching + fwd/bwd + SGD update — on synthetic canvases, fetch-fenced (on
the axon TPU tunnel only a real D2H fetch is a trustworthy barrier; the
device queue is FIFO, so fetching the last step's loss fences the run).

    python scripts/bench_train.py [--batch 8] [--iters 20] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from dan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8, help="per-chip batch")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dan_tpu.config import default_config
    from dan_tpu.data.synthetic import synthetic_batch
    from dan_tpu.parallel.mesh import make_mesh, place_replicated, shard_batch
    from dan_tpu.train.loop import create_train_state, make_sharded_train_step

    cfg = default_config()
    n_chips = len(jax.devices())
    mesh = make_mesh(cfg.mesh)
    state = place_replicated(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_sharded_train_step(cfg, mesh)
    batch = shard_batch(synthetic_batch(cfg, args.batch * n_chips, seed=0), mesh)

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # fence
    print(
        f"compile+first: {time.perf_counter() - t0:.1f}s loss={loss:.3f}",
        file=sys.stderr,
    )
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # fence the FIFO queue
    dt = time.perf_counter() - t0
    ips = args.iters * args.batch / dt  # args.batch is per-chip
    print(
        f"train batch={args.batch}/chip x {n_chips} chip(s): "
        f"{ips:.2f} img/s/chip ({dt / args.iters * 1000:.2f} ms/step)"
    )


if __name__ == "__main__":
    main()
