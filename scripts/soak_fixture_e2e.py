#!/usr/bin/env python
"""Full real-data-path soak over the committed mini-WIDER fixture
(VERDICT r1 item 8): TFRecord conversion -> read back -> file-based train
pipeline -> N sharded train steps -> checkpoint -> eval CLI with OFFICIAL
.mat ground truth.  This closes the seam 'official-.mat-driven AP on
detections the model actually produced'.

    python scripts/soak_fixture_e2e.py [--steps 300] [--platform cpu]

Run on the real TPU by default; results are recorded in BASELINE.md.
"""
import argparse
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = os.path.join(REPO, "tests", "fixtures", "mini_wider")


def main():
    from dan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--work_dir", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dan_tpu.config import default_config
    from dan_tpu.ckpt.orbax_io import TrainStateSaver
    from dan_tpu.data.pipeline import TrainPipeline, device_prefetch
    from dan_tpu.data.tfrecords import convert_to_tfrecords, read_tfrecords
    from dan_tpu.data.widerface import ImageRecord, load_split
    from dan_tpu.parallel.mesh import make_mesh, place_replicated
    from dan_tpu.train.loop import create_train_state, make_sharded_train_step

    work = args.work_dir or tempfile.mkdtemp(prefix="dan_soak_")
    os.makedirs(work, exist_ok=True)
    model_dir = os.path.join(work, "model")

    # 1. TFRecord roundtrip in the loop: fixture -> shards -> records+jpegs.
    records = load_split(FIX, "val")
    paths = convert_to_tfrecords(
        records, os.path.join(work, "tfr"), split="train", num_shards=4
    )
    rt_dir = os.path.join(work, "roundtrip")
    rt_records = []
    n_boxes_in = sum(len(r.boxes) for r in records)
    for rec, encoded in read_tfrecords(paths):
        p = os.path.join(rt_dir, rec.rel_path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(encoded)
        rt_records.append(dataclasses.replace(rec, path=p))
    n_boxes_rt = sum(len(r.boxes) for r in rt_records)
    assert len(rt_records) == len(records), (len(rt_records), len(records))
    assert n_boxes_rt == n_boxes_in, (n_boxes_rt, n_boxes_in)
    print(
        f"tfrecord roundtrip OK: {len(rt_records)} images, {n_boxes_rt} boxes",
        file=sys.stderr,
    )

    # 2. Train on the roundtripped files through the real host pipeline.
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
    step_fn = make_sharded_train_step(cfg, mesh)
    pipe = TrainPipeline(rt_records, cfg, seed=0, num_workers=4)
    it = device_prefetch(iter(pipe), mesh, depth=2)
    t0 = time.time()
    loss = None
    for i in range(args.steps):
        state, m = step_fn(state, next(it))
        if (i + 1) % 50 == 0:
            loss = float(m["loss"])
            print(
                f"step {i + 1}: loss={loss:.3f} npos={float(m['num_pos']):.0f} "
                f"({(i + 1) * args.batch / (time.time() - t0):.1f} img/s)",
                file=sys.stderr,
            )
    pipe.stop()
    assert loss is not None and np.isfinite(loss), f"diverged: {loss}"
    with TrainStateSaver() as saver:
        saver.save(model_dir, args.steps, state)
        saver.wait()
    print(f"checkpoint at {model_dir}", file=sys.stderr)

    # 3. Official-protocol AP through the eval CLI (.mat ground truth).
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "eval.py"),
        "--wider_root", FIX,
        "--ckpt", model_dir,
        "--no_tta",
        "--output_dir", os.path.join(work, "preds"),
        "--gt_mats", os.path.join(FIX, "eval_tools", "ground_truth"),
    ]
    if args.platform:
        cmd += ["--platform", args.platform]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    sys.stderr.write(proc.stderr[-2000:])
    print(proc.stdout.strip())
    assert proc.returncode == 0, proc.returncode
    assert "WIDER FACE" in proc.stdout
    print(f"soak artifacts in {work}", file=sys.stderr)


if __name__ == "__main__":
    main()
