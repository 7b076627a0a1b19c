#!/usr/bin/env python
"""Full-loop self-check without the (unavailable) real dataset: train the
640x640 detector on synthetic bright-square 'faces', then run the real
detection path + WIDER AP protocol on held-out synthetic images.

A healthy stack should reach AP >> 0.5 within a few hundred steps — this
exercises train step, checkpointing, Detector, NMS, and the AP harness as
one system.

    python scripts/smoke_e2e.py [--steps 300] [--batch 8] [--eval_n 24]

--int8 additionally post-training-quantizes the trained detector
(Detector.quantize_int8, calibrated on a held-out synthetic sample) and
evaluates the SAME protocol on the int8 graph — the AP-level validation
of dan_tpu/quant.py on a trained (if synthetic) checkpoint.
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
    import dataclasses

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval_n", type=int, default=24)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--int8", action="store_true",
                    help="also eval the int8-PTQ graph (AP must track bf16)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dan_tpu.api import Detector
    from dan_tpu.config import default_config
    from dan_tpu.data.synthetic import synthetic_batch, synthetic_sample
    from dan_tpu.eval.widerface_ap import evaluate_widerface
    from dan_tpu.parallel.mesh import make_mesh, place_replicated, shard_batch
    from dan_tpu.train.loop import create_train_state, make_sharded_train_step

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            batch_size=args.batch,
            learning_rate=args.lr,
            grad_clip_norm=10.0,
            warmup_steps=50,
        ),
    )
    mesh = make_mesh(cfg.mesh)
    state = place_replicated(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_sharded_train_step(cfg, mesh)

    t0 = time.time()
    loss = None
    for i in range(args.steps):
        batch = shard_batch(synthetic_batch(cfg, args.batch, seed=i), mesh)
        state, m = step(state, batch)
        if (i + 1) % 50 == 0:
            loss = float(m["loss"])
            print(
                f"step {i + 1}: loss={loss:.3f} npos={float(m['num_pos']):.0f} "
                f"({(i + 1) * args.batch / (time.time() - t0):.1f} img/s)",
                file=sys.stderr,
            )
    assert loss is not None and np.isfinite(loss), f"training diverged: {loss}"

    # -- eval on held-out synthetic images through the real stack --
    det = Detector(state.params, cfg)
    rng = np.random.default_rng(10_000)
    eval_set, gts = [], {}
    canvas = cfg.preprocess.canvas_size
    for i in range(args.eval_n):
        img, boxes, mask = synthetic_sample(rng, canvas, cfg.match.max_gt)
        eval_set.append((f"synthetic/img_{i}", img))
        gts[f"synthetic/img_{i}"] = boxes[mask].astype(np.float64)

    def run_eval(tag):
        preds = {}
        for key, img in eval_set:
            out = det.detect(img, score_threshold=0.05)
            preds[key] = np.concatenate(
                [out["bboxes"], out["scores"][:, None]], axis=-1
            ).astype(np.float64)
        aps = evaluate_widerface(preds, gts)
        print(
            f"synthetic-val AP after {args.steps} steps [{tag}]: "
            f"easy={aps['easy']:.3f} medium={aps['medium']:.3f} "
            f"hard={aps['hard']:.3f}"
        )
        return aps

    aps = run_eval("bf16")
    if aps["hard"] < 0.5:
        print("WARNING: low AP — stack may be unhealthy", file=sys.stderr)
        sys.exit(1)

    if args.int8:
        calib = [
            synthetic_sample(rng, canvas, cfg.match.max_gt)[0]
            for _ in range(8)
        ]
        det.quantize_int8(calib)
        aps_q = run_eval("int8")
        delta = aps_q["hard"] - aps["hard"]
        print(f"int8 hard-AP delta vs bf16: {delta:+.4f}")
        if aps_q["hard"] < aps["hard"] - 0.02:
            print("WARNING: int8 AP dropped > 0.02 vs bf16", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
