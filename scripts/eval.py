#!/usr/bin/env python
"""WIDER FACE evaluation (reference `eval_dan.py`/`widerface_eval.py`
equivalent; BASELINE.json configs 4-5): full-val TTA inference + detection
txt writing + easy/medium/hard AP.

    python scripts/eval.py --wider_root /data/widerface --ckpt /path \
        --output_dir /tmp/preds [--gt_mats /data/eval_tools/ground_truth]
    python scripts/eval.py --score_only --pred_dir /tmp/preds ...
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

    # Imported before backend init (safe: platform selection at line ~64
    # happens before any device use) so the CLI defaults are literally the
    # runner's own measured defaults — one source of truth.
    from dan_tpu.eval.tta import TTARunner

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. 'cpu'); env vars are unreliable "
        "under the axon sitecustomize",
    )
    ap.add_argument("--wider_root", required=False)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--split", default="val")
    ap.add_argument("--gt_mats", default=None, help="official eval_tools/ground_truth dir")
    ap.add_argument("--no_tta", action="store_true", help="single-scale forward only")
    ap.add_argument(
        "--tta_batch",
        type=int,
        default=TTARunner.DEFAULT_TTA_BATCH,
        help="TTA (image, variant) units per chip per launch; >1 amortizes "
        "dispatch latency (one compiled executable per bucket per value). "
        "Measured at dataset scale (r4, 300 WIDER-like images, BASELINE.md): "
        "4 -> 16 cuts launches 535 -> 148 (+39-73%% img/s); 16 -> 32 is "
        "bucket-bound (+3-8%%). Large buckets are capped per-launch by the "
        "HBM pixel budget regardless (TTARunner.bucket_chunk)",
    )
    ap.add_argument(
        "--vote_batch",
        type=int,
        default=TTARunner.DEFAULT_VOTE_BATCH,
        help="images per batched bbox-vote launch (padded to a device-count "
        "multiple). Default 128 from the r4 dataset-scale sweep: +17-34%% "
        "img/s vs 32 (fewer launch+fetch round trips on the tunnel)",
    )
    ap.add_argument(
        "--max_pending",
        type=int,
        default=32,
        help="TTA bucket launches kept un-fetched before the oldest is "
        "drained (TTARunner.run_dataset max_pending) — bounds host RSS "
        "and pending-output HBM at dataset scale (BASELINE.md r5 soak)",
    )
    ap.add_argument(
        "--int8",
        action="store_true",
        help="post-training-quantize the detect path to an int8 body "
        "(Detector.quantize_int8) before evaluating — deployment mode; "
        "requires --no_tta (the TTA path is bf16 accuracy mode by policy)",
    )
    ap.add_argument(
        "--calib",
        type=int,
        default=8,
        help="with --int8: calibrate activation scales on the first N "
        "eval images (absmax PTQ; 8-64 is typical)",
    )
    ap.add_argument("--limit", type=int, default=None, help="eval first N images")
    ap.add_argument("--score_only", action="store_true", help="skip inference, read --pred_dir")
    ap.add_argument("--pred_dir", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dan_tpu.api import Detector
    from dan_tpu.data.widerface import load_image_rgb, load_split
    from dan_tpu.eval.widerface_ap import evaluate_widerface, load_official_gt
    from dan_tpu.eval.writer import load_detection_dir, write_wider_detections

    predictions = {}
    records = []
    if args.wider_root:
        records = load_split(args.wider_root, args.split, keep_invalid=True)
        if args.limit:
            records = records[: args.limit]

    if args.score_only:
        predictions = load_detection_dir(args.pred_dir)
    else:
        if not records:
            ap.error("--wider_root is required unless --score_only")
        if args.int8 and not args.no_tta:
            ap.error("--int8 requires --no_tta (TTA is bf16 accuracy mode)")
        if args.ckpt:
            det = Detector.from_checkpoint(args.ckpt)
        else:
            print("WARNING: random weights", file=sys.stderr)
            det = Detector.from_random()
        from dan_tpu.data.pipeline import iter_prefetch

        if args.int8:
            n_cal = max(1, min(args.calib, len(records)))
            t_q = time.time()
            det.quantize_int8(
                [load_image_rgb(r.path) for r in records[:n_cal]],
                batch_size=min(n_cal, 8),
            )
            print(
                f"[int8] calibrated on {n_cal} images + quantized in "
                f"{time.time() - t_q:.1f}s",
                file=sys.stderr,
            )
        t0 = time.time()
        if args.no_tta:
            # Decode the next images on a background thread while the
            # device runs the current one (decode releases the GIL; the
            # detect call blocks on a device fetch).
            decoded = iter_prefetch(
                records, depth=4, transform=lambda r: (r, load_image_rgb(r.path))
            )
            for i, (rec, img) in enumerate(decoded):
                out = det.detect(img)
                if i == 0:
                    # Keep the graph compile/cache-load (20-60 s per fresh
                    # process on the axon tunnel) OUT of the throughput
                    # clock — with it in, the printed img/s varied 26x
                    # across identical runs (BASELINE.md r4 prefetch row).
                    print(
                        f"first detect (incl. graph load): "
                        f"{time.time() - t0:.1f}s",
                        file=sys.stderr,
                    )
                    t0 = time.time()
                stem = os.path.splitext(rec.rel_path)[0]
                predictions[stem] = np.concatenate(
                    [out["bboxes"], out["scores"][:, None]], axis=-1
                )
                if (i + 1) % 50 == 0:
                    ips = i / max(time.time() - t0, 1e-9)
                    print(
                        f"{i + 1}/{len(records)} images ({ips:.2f} img/s)",
                        file=sys.stderr,
                    )
        else:
            # Config 5 [B]: (image, variant) units batched data-parallel
            # over the mesh.
            from dan_tpu.parallel.mesh import make_mesh

            runner = TTARunner(det.params, det.config)
            mesh = make_mesh(det.config.mesh)
            # Warm every bucket executable CONCURRENTLY before streaming
            # images: sizes come from the image headers (PIL reads them
            # without decoding pixels), and the threaded warmup overlaps
            # the ~20-40 s/graph remote compile-cache roundtrips that
            # run_dataset would otherwise pay serially (~8 min for WIDER's
            # ~16 graphs on the axon tunnel).
            from PIL import Image

            def _size(path):
                with Image.open(path) as im:
                    w, h = im.size
                return h, w

            t_w = time.time()
            n_warm = runner.warmup(
                (_size(r.path) for r in records),
                mesh=mesh,
                batch_per_device=args.tta_batch,
                vote_batch=args.vote_batch,
            )
            print(
                f"[tta] warmed {n_warm} executables in "
                f"{time.time() - t_w:.0f}s",
                file=sys.stderr,
            )
            # JPEG decode overlapped with run_dataset's device launches
            # (same background-thread prefetch as the train pipeline's
            # device_prefetch; run_dataset consumes lazily per image).
            items = iter_prefetch(
                records,
                depth=4,
                transform=lambda r: (
                    os.path.splitext(r.rel_path)[0],
                    load_image_rgb(r.path),
                ),
            )
            t_run = time.time()
            results = runner.run_dataset(
                items,
                mesh=mesh,
                batch_per_device=args.tta_batch,
                progress_every=50,
                vote_batch=args.vote_batch,
                max_pending=args.max_pending,
            )
            dt = time.time() - t_run
            print(
                f"[tta] {len(results)} images in {dt:.1f}s "
                f"({len(results) / max(dt, 1e-9):.2f} img/s, "
                f"tta_batch={args.tta_batch}, vote_batch={args.vote_batch})",
                file=sys.stderr,
            )
            stats = dict(runner.last_run_stats)
            import resource

            stats["peak_host_rss_mb"] = round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
            )
            try:  # device memory_stats is backend-optional (None on some)
                ms = jax.local_devices()[0].memory_stats() or {}
                if "peak_bytes_in_use" in ms:
                    stats["peak_device_mb"] = round(
                        ms["peak_bytes_in_use"] / 1e6
                    )
            except Exception:
                pass
            print(f"[tta] stats: {stats}", file=sys.stderr)
            predictions = {
                k: np.concatenate([v["bboxes"], v["scores"][:, None]], -1)
                for k, v in results.items()
            }
        if args.output_dir:
            stem_to_rel = {
                os.path.splitext(r.rel_path)[0]: r.rel_path for r in records
            }
            for stem, p in predictions.items():
                write_wider_detections(
                    args.output_dir, stem_to_rel[stem], p[:, :4], p[:, 4]
                )
        # In the --no_tta path t0 restarts after the first detect (graph
        # load excluded), so that image is not in the numerator either.
        n_timed = max(len(records) - (1 if args.no_tta else 0), 1)
        ips = n_timed / max(time.time() - t0, 1e-9)
        print(f"inference: {ips:.2f} img/s over {len(records)}", file=sys.stderr)

    # --- AP ---
    if args.gt_mats:
        gt_boxes, keep_lists, _ = load_official_gt(args.gt_mats)
    else:
        if not records:
            ap.error("need --gt_mats or --wider_root for ground truth")
        print(
            "NOTE: no --gt_mats; using height-based difficulty approximation",
            file=sys.stderr,
        )
        gt_boxes = {
            os.path.splitext(r.rel_path)[0]: r.boxes.astype(np.float64)
            for r in records
        }
        keep_lists = None
    if args.limit:
        if not records:
            # --score_only --gt_mats --limit without --wider_root: an empty
            # record set would intersect gt down to nothing and print AP 0.0.
            ap.error("--limit needs --wider_root to know which images it keeps")
        gt_boxes = {
            k: v
            for k, v in gt_boxes.items()
            if k in {os.path.splitext(r.rel_path)[0] for r in records}
        }
    aps = evaluate_widerface(predictions, gt_boxes, keep_lists)
    print(
        f"WIDER FACE {args.split} AP  easy={aps['easy']:.4f}  "
        f"medium={aps['medium']:.4f}  hard={aps['hard']:.4f}"
    )


if __name__ == "__main__":
    main()
