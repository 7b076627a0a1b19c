#!/usr/bin/env python
"""Train the DAN detector on WIDER FACE (reference `train_dan.py` CLI
equivalent, SURVEY.md §3.1).

    python scripts/train.py --wider_root /data/widerface --model_dir /tmp/run
    python scripts/train.py --synthetic --steps 100 --model_dir /tmp/smoke

Flags mirror the behavior-defining reference flags (batch size, LR
boundaries, thresholds live in dan_tpu/config.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import numpy as np


def main():
    from dan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. 'cpu'); env vars are unreliable "
        "under the axon sitecustomize",
    )
    ap.add_argument("--wider_root", default=None, help="WIDER FACE root dir")
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true", help="synthetic data smoke run")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--warm_start", default=None, help="TF/orbax ckpt for backbone init")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--grad_clip", type=float, default=None)
    ap.add_argument("--warmup_steps", type=int, default=None)
    ap.add_argument("--checkpoint_every", type=int, default=None)
    ap.add_argument(
        "--debug_nans",
        action="store_true",
        help="enable jax_debug_nans (SURVEY.md §5 'sanitizers')",
    )
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--log_every", type=int, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from dan_tpu.config import default_config
    from dan_tpu.ckpt.orbax_io import (
        TrainStateSaver,
        latest_step,
        restore_train_state,
    )
    from dan_tpu.data.pipeline import TrainPipeline
    from dan_tpu.data.synthetic import synthetic_batch
    from dan_tpu.data.widerface import load_split
    from dan_tpu.parallel.mesh import make_mesh
    from dan_tpu.train.loop import create_train_state, make_sharded_train_step
    from dan_tpu.utils.logging import MetricsLogger
    from dan_tpu.utils.profiling import ThroughputMeter, maybe_trace

    cfg = default_config()
    overrides = {}
    # The reference recipe (lr 1e-3, no warmup, no clip) assumes an
    # ImageNet VGG warm-start; from RANDOM init it diverges to nan within
    # a few steps (config.py::TrainConfig.grad_clip_norm note).  The
    # --synthetic smoke path is always random-init, so give it the
    # measured stable recipe by default (same as scripts/smoke_e2e.py);
    # explicit flags still win.
    if args.synthetic and not args.warm_start:
        if args.warmup_steps is None:
            overrides["warmup_steps"] = 50
        if args.grad_clip is None:
            overrides["grad_clip_norm"] = 10.0
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.grad_clip is not None:
        overrides["grad_clip_norm"] = args.grad_clip
    if args.warmup_steps is not None:
        overrides["warmup_steps"] = args.warmup_steps
    if args.checkpoint_every is not None:
        overrides["checkpoint_every"] = args.checkpoint_every
    if overrides:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **overrides)
        )
    total_steps = args.steps or cfg.train.total_steps
    log_every = args.log_every or cfg.train.log_every

    mesh = make_mesh(cfg.mesh)
    n_chips = len(mesh.devices.flat)
    print(f"mesh: {n_chips} x {mesh.devices.flat[0].platform}", file=sys.stderr)

    state = create_train_state(cfg, jax.random.PRNGKey(args.seed))
    start_step = 0
    if args.resume and latest_step(args.model_dir) is not None:
        abstract = jax.tree_util.tree_map(np.asarray, state)
        state = restore_train_state(args.model_dir, abstract)
        start_step = int(state.step)
        print(f"resumed from step {start_step}", file=sys.stderr)
    elif args.warm_start:
        from dan_tpu.api import Detector

        det = Detector.from_checkpoint(args.warm_start, cfg)
        state = state._replace(params=det.params)
        print(f"warm-started from {args.warm_start}", file=sys.stderr)

    from dan_tpu.parallel.mesh import place_replicated

    state = place_replicated(state, mesh)
    step_fn = make_sharded_train_step(cfg, mesh)

    if args.synthetic:
        def batches():
            i = 0
            while True:
                yield synthetic_batch(cfg, cfg.train.batch_size, seed=args.seed + i)
                i += 1
        batch_iter = batches()
    else:
        records = load_split(args.wider_root, "train")
        print(f"loaded {len(records)} train images", file=sys.stderr)
        batch_iter = iter(TrainPipeline(records, cfg, seed=args.seed))

    from dan_tpu.data.pipeline import device_prefetch

    device_iter = device_prefetch(batch_iter, mesh, depth=2)
    logger = MetricsLogger(args.model_dir)
    meter = ThroughputMeter(cfg.train.batch_size, n_chips)
    saver = TrainStateSaver()  # async: writes overlap subsequent steps
    try:
        with maybe_trace(args.trace_dir):
            for step in range(start_step, total_steps):
                state, metrics = step_fn(state, next(device_iter))
                meter.tick()
                if (step + 1) % log_every == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    if not np.isfinite(metrics.get("loss", 0.0)):
                        # Abort instead of silently training on — and
                        # CHECKPOINTING — nan params for the rest of the
                        # run (caught by an r4 TPU soak: 1200 steps of nan
                        # saves at rc=0).  The state is already poisoned;
                        # there is nothing to save.
                        logger.log(step + 1, metrics)
                        print(
                            f"FATAL: non-finite loss at step {step + 1} — "
                            "training diverged.  From random init, pass "
                            "--warmup_steps 50 --grad_clip 10 (or a lower "
                            "--lr); the reference recipe assumes "
                            "--warm_start from a VGG checkpoint.  See "
                            "TrainConfig.grad_clip_norm in dan_tpu/config.py.",
                            file=sys.stderr,
                        )
                        sys.exit(6)
                    metrics["images_per_sec_per_chip"] = meter.images_per_sec_per_chip
                    logger.log(step + 1, metrics)
                    meter.reset()
                if (step + 1) % cfg.train.checkpoint_every == 0 or step + 1 == total_steps:
                    path = saver.save(args.model_dir, step + 1, state)
                    print(f"saving {path} (async)", file=sys.stderr)
    finally:
        saver.close()  # join outstanding writes before exit
        logger.close()


if __name__ == "__main__":
    main()
