#!/usr/bin/env python
"""Cost the host input-feed path for multi-chip training (VERDICT r4
item 3): measure the per-image host CPU-time split (file read / header +
metadata / JPEG window decode / collation), then derive how many host
cores a v5e-8 feed rate (~8 x 136 img/s) needs and verify the
multi-producer TrainPipeline removes the serial-producer ceiling.

Pure host work — no TPU/JAX involved.  Run alone on an idle box (the
1-core host makes every concurrent process part of the measurement).

    python scripts/profile_host_feed.py [--n 64] [--batch 16]

Prints a stage table + the scaling statement for BASELINE.md.
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_dataset(n, tmpdir, rng):
    """WIDER-like JPEGs: 1024 px wide, log-normal heights, a few faces."""
    import cv2

    from dan_tpu.data.widerface import ImageRecord

    records = []
    for i in range(n):
        h = int(np.clip(np.exp(rng.normal(6.5, 0.35)), 330, 1500))
        w = 1024
        img = rng.integers(0, 90, (h, w, 3), dtype=np.uint8)
        nb = int(rng.integers(1, 6))
        boxes = []
        for _ in range(nb):
            s = int(rng.integers(16, 140))
            x = int(rng.integers(0, w - s))
            y = int(rng.integers(0, h - s))
            img[y : y + s, x : x + s] = rng.integers(150, 255, 3, dtype=np.uint8)
            boxes.append([x, y, x + s, y + s])
        p = os.path.join(tmpdir, f"img{i}.jpg")
        cv2.imwrite(p, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
        records.append(
            ImageRecord(
                path=p,
                rel_path=f"e/img{i}.jpg",
                event="e",
                boxes=np.asarray(boxes, np.float32),
                attrs=np.zeros((len(boxes), 6), np.float32),
            )
        )
    return records


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8,
                    help="pipeline-level steps to time per mode")
    args = ap.parse_args()

    from dan_tpu import native
    from dan_tpu.config import default_config
    from dan_tpu.data.pipeline import (
        TrainPipeline,
        _collate,
        _finish_sample,
        _prepare_batch_native,
        _window_params,
    )

    cfg = default_config()
    c = cfg.preprocess.canvas_size
    rng = np.random.default_rng(0)
    tmpdir = tempfile.mkdtemp(prefix="hostfeed_")
    records = make_dataset(args.n, tmpdir, rng)
    n = len(records)
    print(f"dataset: {n} JPEGs, canvas {c}", file=sys.stderr)

    # --- stage 1: file read ---
    def read_all():
        for r in records:
            with open(r.path, "rb") as f:
                f.read()

    t_read = timeit(read_all) / n
    bufs = []
    for r in records:
        with open(r.path, "rb") as f:
            bufs.append(f.read())
    mb = sum(len(b) for b in bufs) / 1e6 / n

    # --- stage 2: header + metadata + crop sampling (the serial per-image
    # work _prepare_batch_native does before any pixel is touched) ---
    def metadata_all():
        for i, (r, b) in enumerate(zip(records, bufs)):
            wh = native.jpeg_dims(b)
            native.jpeg_exif_orientation(b)
            g = np.random.default_rng(1000 + i)
            off_x, off_y = _window_params(r, wh[0], wh[1], c, g)
            _finish_sample(
                r, cfg, g, off_x, off_y, min(c, wh[0] - off_x),
                min(c, wh[1] - off_y),
            )

    have_native = native.load_loader() is not None
    t_meta = timeit(metadata_all) / n if have_native else float("nan")

    # --- stage 3: decode (1 thread = cycles/img; crop vs full window) ---
    t_dec = {}
    for window in ("crop", "full"):
        def dec():
            for i in range(0, n, args.batch):
                _prepare_batch_native(
                    records[i : i + args.batch], cfg,
                    list(range(2000 + i, 2000 + i + args.batch)),
                    nthreads=1, window=window,
                )
        t_all = timeit(dec, reps=2) / n
        t_dec[window] = t_all
    # stage-3 isolated decode cost = whole-native-batch minus its own
    # serial metadata (stage 2 runs inside _prepare_batch_native too)
    t_crop_only = t_dec["crop"] - t_meta
    t_full_only = t_dec["full"] - t_meta

    # --- stage 4: collation (stack B canvases + scalars) ---
    canvases = [np.zeros((c, c, 3), np.uint8) for _ in range(args.batch)]
    samples = [
        {
            "crop_x0": np.float32(0), "crop_y0": np.float32(0),
            "crop_size": np.float32(640),
            "boxes": np.zeros((cfg.match.max_gt, 4), np.float32),
            "mask": np.zeros((cfg.match.max_gt,), bool),
            "seed": np.uint32(1),
        }
        for _ in range(args.batch)
    ]

    def coll():
        b = _collate(samples)
        b["canvas"] = np.stack(canvases)

    t_coll = timeit(coll, reps=5) / args.batch

    print("\nper-image host cost (ms, single-threaded, min of reps):")
    print(f"  file read           {t_read * 1e3:7.3f}   ({mb:.2f} MB/img)")
    print(f"  header+meta+crop    {t_meta * 1e3:7.3f}")
    print(f"  decode crop-window  {t_crop_only * 1e3:7.3f}")
    print(f"  decode full-image   {t_full_only * 1e3:7.3f}")
    print(f"  collation           {t_coll * 1e3:7.3f}")
    serial = t_read + t_meta + t_coll
    per_img = serial + t_crop_only
    print(f"  => serial (non-decode) {serial * 1e3:.3f} ms; total "
          f"{per_img * 1e3:.3f} ms/img = {1 / per_img:.0f} img/s/core")

    # --- pipeline-level: single vs multi producer ---
    ips = {}
    for n_prod in (1, 2, 4):
        pipe = TrainPipeline(
            records, cfg, batch_size=args.batch, seed=0,
            num_workers=max(1, (os.cpu_count() or 1)),
            num_producers=n_prod,
        )
        it = iter(pipe)
        next(it)  # warm: thread start + first batch
        t0 = time.perf_counter()
        for _ in range(args.steps):
            next(it)
        dt = time.perf_counter() - t0
        pipe.stop()
        it.close()
        ips[n_prod] = args.steps * args.batch / dt
        print(f"pipeline num_producers={n_prod}: {ips[n_prod]:.1f} img/s "
              f"(batch {args.batch}, {os.cpu_count()} host cores)")

    # --- the scaling statement ---
    target = 8 * 136.3  # v5e-8 at the measured b32 per-chip train rate
    cores = target * per_img
    print(
        f"\nscaling: {1 / per_img:.0f} img/s/core (crop-window) => a v5e-8 "
        f"feed at {target:.0f} img/s needs ~{cores:.1f} cores of host "
        f"decode+meta work; the serial non-decode share is "
        f"{serial / per_img:.0%}, so a single producer caps at "
        f"{1 / serial:.0f} img/s regardless of decode threads — "
        f"num_producers >= {int(np.ceil(target * serial))} removes that "
        f"ceiling (each producer parallelizes the serial share too)."
    )


if __name__ == "__main__":
    main()
