#!/usr/bin/env python
"""Measure the int8-PTQ detect graph vs the bf16 headline on real TPU.

    python scripts/bench_int8.py [--batch 128] [--iters 20]

Runs bench.py's exact bf16 pipeline first (persistent-cache-warm), then
calibrates on-device (batch-8 stats graph), quantizes, and measures the
int8-body detect graph at the same batch.  Prints both img/s numbers and
the speedup.  NOT the driver headline — bench.py stays bf16 (the
parity-faithful configuration); this records the deployment-mode number
for BASELINE.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip_bf16", action="store_true")
    args = ap.parse_args()

    from dan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from dan_tpu.box.anchors import generate_anchors_np
    from dan_tpu.config import default_config
    from dan_tpu.models.detector import init_detector_params
    from dan_tpu.ops.postprocess import postprocess_batch
    from dan_tpu.ops.preprocess import normalize_image
    from dan_tpu.quant import (
        calibrate_act_scales,
        quantize_detector_params,
        quantized_detector_forward,
    )

    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpu:
        print("no TPU device — aborting", file=sys.stderr)
        sys.exit(5)
    device = tpu[0]
    print(f"device: {device}", file=sys.stderr)

    cfg = default_config()
    size = cfg.model.image_size
    B = args.batch
    rng = np.random.default_rng(0)
    images_np = rng.integers(0, 255, (B, size, size, 3), dtype=np.uint8)
    params = jax.device_put(
        init_detector_params(jax.random.PRNGKey(0), cfg.model), device
    )
    images = jax.device_put(jnp.asarray(images_np), device)

    def t(stage):
        print(f"t+{time.monotonic()-t0:.0f}s {stage}", file=sys.stderr)

    t0 = time.monotonic()
    if not args.skip_bf16:
        detect = bench.build_detect_fn(cfg, device)
        ips_f = bench.measure(detect, params, images, args.iters, B)
        t(f"bf16: {ips_f:.2f} img/s/chip")
    else:
        ips_f = None

    # --- calibration: batch-8 stats forward on normalized bench images ---
    calib_u8 = jax.device_put(jnp.asarray(images_np[:8]), device)

    @jax.jit
    def prep(u8):
        return normalize_image(u8.astype(jnp.float32), cfg.preprocess).astype(
            jnp.dtype(cfg.model.compute_dtype)
        )

    x_cal = prep(calib_u8)
    scales = calibrate_act_scales(params, [x_cal], cfg.model)
    t("calibrated")
    qparams = jax.device_put(
        jax.jit(
            lambda p: quantize_detector_params(p, cfg.model, scales)
        )(params),
        device,
    )
    t("quantized params on device")

    anchors = jnp.asarray(generate_anchors_np(cfg.anchors, size, size))

    def detect_q(qp, images_u8):
        x = normalize_image(images_u8.astype(jnp.float32), cfg.preprocess)
        cls_logits, loc_preds = quantized_detector_forward(qp, x, cfg.model)
        return postprocess_batch(
            cls_logits, loc_preds, anchors, cfg.anchors, cfg.postprocess,
            float(size), float(size),
        )

    detect_q = jax.jit(detect_q, device=device)
    ips_q = bench.measure(detect_q, qparams, images, args.iters, B)
    t(f"int8: {ips_q:.2f} img/s/chip")
    if ips_f:
        print(
            f"bf16 {ips_f:.2f} -> int8 {ips_q:.2f} img/s/chip "
            f"({ips_q/ips_f:.2f}x)"
        )
    else:
        print(f"int8 {ips_q:.2f} img/s/chip")


if __name__ == "__main__":
    main()
