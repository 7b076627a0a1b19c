#!/usr/bin/env python
"""Single-image detection demo (reference `simple_dan_demo.py` equivalent;
BASELINE.json config 1: load ckpt, one forward + NMS decode, detection dict).

    python scripts/demo.py --image face.jpg [--ckpt /path] [--out out.jpg]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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
    ap.add_argument("--image", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax dir or TF ckpt prefix")
    ap.add_argument("--out", default=None, help="write annotated image here")
    ap.add_argument("--score_threshold", type=float, default=0.5)
    ap.add_argument("--tta", action="store_true", help="full pyramid+flip TTA")
    ap.add_argument(
        "--int8",
        action="store_true",
        help="post-training-quantize the detect path to an int8 body "
        "(deployment mode); calibrates on --calib_images if given, else "
        "on the input image itself. Incompatible with --tta (bf16 policy)",
    )
    ap.add_argument(
        "--calib_images",
        nargs="*",
        default=None,
        help="with --int8: image paths to calibrate activation scales on",
    )
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.int8 and args.tta:
        ap.error("--int8 requires the non-TTA path (TTA is bf16 accuracy mode)")

    from dan_tpu.api import Detector
    from dan_tpu.data.widerface import load_image_rgb

    if args.ckpt:
        det = Detector.from_checkpoint(args.ckpt)
    else:
        print("WARNING: no --ckpt, using random weights", file=sys.stderr)
        det = Detector.from_random()

    img = load_image_rgb(args.image)
    if args.int8:
        calib = (
            [load_image_rgb(p) for p in args.calib_images]
            if args.calib_images
            else [img]
        )
        det.quantize_int8(calib)
        print(f"[int8] quantized (calibrated on {len(calib)} images)",
              file=sys.stderr)
    if args.tta:
        out = det.detect_tta(img, score_threshold=args.score_threshold)
    else:
        out = det.detect(img, score_threshold=args.score_threshold)

    print(f"{len(out['scores'])} detections")
    for box, s in zip(out["bboxes"], out["scores"]):
        print(f"  [{box[0]:7.1f} {box[1]:7.1f} {box[2]:7.1f} {box[3]:7.1f}] {s:.3f}")

    if args.out:
        from dan_tpu.utils.viz import draw_detections

        draw_detections(img, out["bboxes"], out["scores"], args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
