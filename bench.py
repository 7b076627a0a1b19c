#!/usr/bin/env python
"""Headline benchmark: images/sec/chip at 640x640 inference on TPU
(BASELINE.json north-star metric), printed as ONE JSON line.

The measured path is the full on-device detect pipeline per image —
uint8 canvas H2D -> normalize -> VGG+LFPN+heads forward (bf16) -> decode ->
top-k -> greedy NMS -> (<=750, 5) detections D2H — i.e. what the reference
does with sess.run + host numpy, all fused into one XLA executable.

vs_baseline: ratio against the TF1-on-CPU stand-in (the same pipeline
executed on this host's CPU backend; the reference itself cannot run here —
see SURVEY.md §0).  The CPU number is read from BENCH_CPU_BASELINE.json;
re-measuring it (a ~35 min batch-128 run on the 1-core host) is OPT-IN via
DAN_BENCH_MEASURE_CPU=1 and never happens implicitly (VERDICT r3 item 1:
an implicit re-measure destroyed two rounds of driver bench evidence).

Evidence-chain hardening (VERDICT r3):
  - The headline JSON prints IMMEDIATELY after the TPU measurement; no
    baseline-cache problem can suppress it (vs_baseline is null + a stderr
    warning when the cache is stale/missing).
  - No silent CPU fallback: if no non-CPU device exists we abort with a
    clear message (override for local testing: DAN_BENCH_ALLOW_CPU=1).
  - A total wall-clock watchdog (DAN_BENCH_DEADLINE_S, default 1500 s)
    aborts informatively instead of letting the driver's timeout produce
    an opaque rc=124.
"""
import json
import os
import sys
import threading
import time

# Make both the TPU (axon) and CPU backends available in one process.
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Total wall-clock watchdog: armed at the top of main() (before ANY jax
# work — device init, compile, measure) so every hang mode dies with a
# message, not an opaque rc=124.  The opt-in CPU paths
# (DAN_BENCH_MEASURE_CPU / DAN_BENCH_ALLOW_CPU) legitimately take ~35 min
# at batch 128 on the 1-core host, so they get a longer default deadline.
_OPT_IN_CPU = (
    os.environ.get("DAN_BENCH_MEASURE_CPU") == "1"
    or os.environ.get("DAN_BENCH_ALLOW_CPU") == "1"
)
DEADLINE_S = float(
    os.environ.get("DAN_BENCH_DEADLINE_S", "7200" if _OPT_IN_CPU else "1500")
)
_t_start = time.monotonic()


def _arm_deadline_watchdog():
    def _watch():
        remaining = DEADLINE_S - (time.monotonic() - _t_start)
        if remaining > 0:
            time.sleep(remaining)
        print(
            f"bench: total wall clock exceeded {DEADLINE_S:.0f}s — aborting "
            "(cold remote compiles take 3-15 min/graph; persistent XLA cache "
            "missing or invalidated? axon tunnel slow?)",
            file=sys.stderr,
        )
        os._exit(4)

    threading.Thread(target=_watch, daemon=True).start()


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


def config_fingerprint(cfg):
    import hashlib

    return hashlib.sha256(repr(cfg).encode()).hexdigest()[:16]


def read_cpu_baseline(cfg_fp):
    """Return the cached CPU img/s, or (None, reason) when unusable.

    Strict key check (cached config_fp must be present AND current) so the
    runtime check and tests/unit/test_bench_baseline_cache.py enforce the
    same invariant (ADVICE r3).  Fully exception-proof: this runs AFTER
    the TPU measurement but BEFORE the headline print, so no cache
    malformation may ever raise (the headline-first invariant)."""
    try:
        if not os.path.exists(CPU_BASELINE_CACHE):
            return None, "BENCH_CPU_BASELINE.json missing"
        try:
            cached = json.load(open(CPU_BASELINE_CACHE))
        except Exception as e:
            return None, f"BENCH_CPU_BASELINE.json unreadable: {e}"
        if not isinstance(cached, dict):
            return None, "BENCH_CPU_BASELINE.json is not a JSON object"
        if cached.get("batch") != BATCH:
            return None, (
                f"cache batch {cached.get('batch')} != bench batch {BATCH}"
            )
        if cached.get("config_fp") != cfg_fp:
            return None, (
                f"cache config_fp {cached.get('config_fp')!r} is stale for "
                f"the current config ({cfg_fp!r})"
            )
        ips = cached.get("images_per_sec")
        if not isinstance(ips, (int, float)) or not ips > 0:
            return None, f"cache images_per_sec invalid: {ips!r}"
        return ips, None
    except Exception as e:  # belt and braces — never block the headline
        return None, f"cache check failed: {e}"


def measure_cpu_baseline(cfg, images_np, cfg_fp):
    """Measure the TF1-on-CPU stand-in and update the cache file.

    ~35 min at batch 128 on the 1-core host — ONLY ever called under
    DAN_BENCH_MEASURE_CPU=1, after the headline has already printed."""
    import dataclasses

    from dan_tpu.models.detector import init_detector_params

    print(
        f"bench: measuring CPU baseline at batch {BATCH} — this takes "
        "~35 min on the 1-core host",
        file=sys.stderr,
    )
    cpu = jax.devices("cpu")[0]
    # Pallas/Mosaic doesn't lower for the CPU backend.
    cfg_cpu = dataclasses.replace(
        cfg,
        postprocess=dataclasses.replace(cfg.postprocess, use_pallas_nms=False),
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
            "re-measure with DAN_BENCH_MEASURE_CPU=1 bench.py on an idle "
            "host after pipeline-code changes (config changes invalidate "
            "it automatically)",
        },
        open(CPU_BASELINE_CACHE, "w"),
    )
    print(
        f"cpu baseline: {cpu_ips:.3f} img/s @ batch {BATCH} (cached)",
        file=sys.stderr,
    )
    return cpu_ips


def main():
    _arm_deadline_watchdog()
    from dan_tpu.config import default_config
    from dan_tpu.models.detector import init_detector_params

    cfg = default_config()
    size = cfg.model.image_size
    rng = np.random.default_rng(0)
    images_np = rng.integers(0, 255, (BATCH, size, size, 3), dtype=np.uint8)

    # Device-init watchdog: when the axon tunnel is down, jax.devices()
    # hangs indefinitely (observed 2026-08-17, multi-hour outage) — abort
    # with a clear message instead of hanging the driver's bench run.
    init_done = threading.Event()

    def _watch():
        if not init_done.wait(900):
            print(
                "bench: TPU device init exceeded 900s (axon tunnel down?)"
                " — aborting",
                file=sys.stderr,
            )
            os._exit(3)

    def _t(stage):
        print(
            f"bench: t+{time.monotonic() - _t_start:.0f}s {stage}",
            file=sys.stderr,
        )

    threading.Thread(target=_watch, daemon=True).start()
    _t("device init")
    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    init_done.set()
    _t("devices ready")
    if tpu_devices:
        device = tpu_devices[0]
    elif os.environ.get("DAN_BENCH_ALLOW_CPU") == "1":
        device = jax.devices()[0]
        print(
            "bench: DAN_BENCH_ALLOW_CPU=1 — measuring the headline on CPU; "
            "this number is NOT the north-star metric",
            file=sys.stderr,
        )
    else:
        # TPU-or-abort: a silent CPU 'headline' grinds for hours and
        # produces a meaningless number (VERDICT r3 item 2).
        print(
            "bench: no non-CPU jax device found (axon tunnel down / TPU "
            "unavailable) — aborting instead of benchmarking on CPU. "
            "Set DAN_BENCH_ALLOW_CPU=1 to override for local testing.",
            file=sys.stderr,
        )
        sys.exit(5)
    print(f"bench device: {device}", file=sys.stderr)

    params = jax.device_put(
        init_detector_params(jax.random.PRNGKey(0), cfg.model), device
    )
    images = jax.device_put(jnp.asarray(images_np), device)
    _t("params+images device_put queued")
    detect = build_detect_fn(cfg, device)
    ips = measure(detect, params, images, MEASURE_ITERS, BATCH)
    _t("measured")
    print(f"tpu: {ips:.2f} img/s/chip", file=sys.stderr)

    # --- Headline FIRST: nothing after this point can suppress it. ---
    cfg_fp = config_fingerprint(cfg)
    cpu_ips, reason = read_cpu_baseline(cfg_fp)
    if cpu_ips is None:
        print(
            f"bench: CPU baseline unusable ({reason}); vs_baseline=null. "
            "Re-measure with DAN_BENCH_MEASURE_CPU=1 on an idle host.",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_640x640_inference",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / cpu_ips, 2) if cpu_ips else None,
            }
        )
    )
    sys.stdout.flush()

    # --- CPU stand-in baseline re-measure: OPT-IN ONLY.  The flag FORCES
    # a re-measure (cache valid or not): pipeline-code changes don't move
    # config_fp, so 'set the flag' must always work as the documented
    # re-measure path. ---
    if os.environ.get("DAN_BENCH_MEASURE_CPU") == "1":
        measure_cpu_baseline(cfg, images_np, cfg_fp)


if __name__ == "__main__":
    main()
