#!/usr/bin/env python
"""Headline benchmark: images/sec/chip at 640x640 inference on TPU
(BASELINE.json north-star metric), printed as ONE JSON line.

The measured path is the full on-device detect pipeline per image —
uint8 canvas H2D -> normalize -> VGG+LFPN+heads forward (bf16) -> decode ->
top-k -> greedy NMS -> (<=750, 5) detections D2H — i.e. what the reference
does with sess.run + host numpy, all fused into one XLA executable.

vs_baseline: ratio against the TF1-on-CPU stand-in (the same pipeline
executed on this host's CPU backend; the reference itself cannot run here —
see SURVEY.md §0).  The CPU number is measured once and cached in
BENCH_CPU_BASELINE.json.
"""
import json
import os
import sys
import time

# Make both the TPU (axon) and CPU backends available in one process.
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from dan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

BATCH = int(os.environ.get("DAN_BENCH_BATCH", "128"))
WARMUP_ITERS = 3
MEASURE_ITERS = 20
CPU_BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_CPU_BASELINE.json"
)


def build_detect_fn(cfg, device):
    from dan_tpu.box.anchors import generate_anchors_np
    from dan_tpu.models.detector import detector_forward
    from dan_tpu.ops.postprocess import postprocess_batch
    from dan_tpu.ops.preprocess import normalize_image

    size = cfg.model.image_size
    anchors = jnp.asarray(generate_anchors_np(cfg.anchors, size, size))

    def detect(params, images_u8):
        x = normalize_image(images_u8.astype(jnp.float32), cfg.preprocess)
        cls_logits, loc_preds = detector_forward(
            params, x, cfg.model, for_inference=True
        )
        return postprocess_batch(
            cls_logits,
            loc_preds,
            anchors,
            cfg.anchors,
            cfg.postprocess,
            float(size),
            float(size),
        )

    return jax.jit(detect, device=device)


def _sync(out):
    """Force a real D2H fetch: on the axon tunnel platform,
    block_until_ready can return before execution completes, so only an
    actual value fetch is a trustworthy barrier.  Device execution is
    FIFO per core, so fetching the last call's output fences the queue."""
    return np.asarray(jax.tree_util.tree_leaves(out)[0])


def measure(detect, params, images, iters, batch, warmup=WARMUP_ITERS):
    out = detect(params, images)
    _sync(out)  # compile + warm
    for _ in range(warmup):
        out = detect(params, images)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = detect(params, images)
    _sync(out)
    dt = time.perf_counter() - t0
    return iters * batch / dt


def main():
    from dan_tpu.config import default_config
    from dan_tpu.models.detector import init_detector_params

    cfg = default_config()
    size = cfg.model.image_size
    rng = np.random.default_rng(0)
    images_np = rng.integers(0, 255, (BATCH, size, size, 3), dtype=np.uint8)

    # Device-init watchdog: when the axon tunnel is down, jax.devices()
    # hangs indefinitely (observed 2026-08-17, multi-hour outage) — abort
    # with a clear message instead of hanging the driver's bench run.
    import os
    import threading

    init_done = threading.Event()

    def _watch():
        if not init_done.wait(900):
            print(
                "bench: TPU device init exceeded 900s (axon tunnel down?)"
                " — aborting",
                file=sys.stderr,
            )
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    init_done.set()
    device = tpu_devices[0] if tpu_devices else jax.devices()[0]
    print(f"bench device: {device}", file=sys.stderr)

    params = jax.device_put(
        init_detector_params(jax.random.PRNGKey(0), cfg.model), device
    )
    images = jax.device_put(jnp.asarray(images_np), device)
    detect = build_detect_fn(cfg, device)
    ips = measure(detect, params, images, MEASURE_ITERS, BATCH)
    print(f"tpu: {ips:.2f} img/s/chip", file=sys.stderr)

    # --- CPU stand-in baseline (cached; measured at the SAME batch size so
    # the ratio is batch-matched — VERDICT r1 weak item 2). The cache is
    # also keyed on a config fingerprint so model/postprocess config
    # changes invalidate it (code-only pipeline changes still require
    # deleting BENCH_CPU_BASELINE.json by hand — noted in the file). ---
    import hashlib

    cfg_fp = hashlib.sha256(repr(cfg).encode()).hexdigest()[:16]
    cpu_ips = None
    if os.path.exists(CPU_BASELINE_CACHE):
        try:
            cached = json.load(open(CPU_BASELINE_CACHE))
            if cached.get("batch") == BATCH and (
                cached.get("config_fp", cfg_fp) == cfg_fp
            ):
                cpu_ips = cached["images_per_sec"]
        except Exception:
            cpu_ips = None
    if cpu_ips is None:
        try:
            import dataclasses

            cpu = jax.devices("cpu")[0]
            # Pallas/Mosaic doesn't lower for the CPU backend.
            cfg_cpu = dataclasses.replace(
                cfg,
                postprocess=dataclasses.replace(
                    cfg.postprocess, use_pallas_nms=False
                ),
            )
            params_c = jax.device_put(
                init_detector_params(jax.random.PRNGKey(0), cfg.model), cpu
            )
            images_c = jax.device_put(jnp.asarray(images_np), cpu)
            detect_c = build_detect_fn(cfg_cpu, cpu)
            cpu_ips = measure(detect_c, params_c, images_c, 2, BATCH, warmup=1)
            json.dump(
                {
                    "images_per_sec": cpu_ips,
                    "batch": BATCH,
                    "config_fp": cfg_fp,
                    "note": "640x640 detect pipeline on host CPU "
                    "(TF1-on-CPU stand-in), batch-matched to the TPU run; "
                    "delete this file to re-measure after pipeline-code "
                    "changes (config changes invalidate it automatically)",
                },
                open(CPU_BASELINE_CACHE, "w"),
            )
            print(
                f"cpu baseline: {cpu_ips:.3f} img/s @ batch {BATCH} (cached)",
                file=sys.stderr,
            )
        except Exception as e:  # CPU backend unavailable: report ratio vs target
            print(f"cpu baseline unavailable: {e}", file=sys.stderr)

    vs_baseline = ips / cpu_ips if cpu_ips else float("nan")
    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_640x640_inference",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs_baseline, 2) if cpu_ips else None,
            }
        )
    )


if __name__ == "__main__":
    main()
