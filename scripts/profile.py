#!/usr/bin/env python
"""Capture an xprof device trace of the detect or train graph and print a
per-op cost table (the tool behind the profile tables in BASELINE.md).

    python scripts/profile.py detect [--batch 128] [--top 30]
    python scripts/profile.py train  [--batch 8]  [--top 30]

Traces 3 iterations to a temp dir, converts the xplane via xprof's
hlo_stats tool, and prints ms/iter, %, GFLOP/s, and boundedness per op.
"""
import argparse
import csv
import glob
import io
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _trace_detect(batch, trace_dir, iters):
    import jax
    import jax.numpy as jnp

    import bench
    from dan_tpu.config import default_config
    from dan_tpu.models.detector import init_detector_params

    cfg = default_config()
    size = cfg.model.image_size
    rng = np.random.default_rng(0)
    tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
    params = jax.device_put(
        init_detector_params(jax.random.PRNGKey(0), cfg.model), tpu
    )
    images = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (batch, size, size, 3), np.uint8)),
        tpu,
    )
    detect = bench.build_detect_fn(cfg, tpu)
    bench._sync(detect(params, images))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(10):
        out = detect(params, images)
    bench._sync(out)
    ips = 10 * batch / (time.perf_counter() - t0)
    print(f"detect batch={batch}: {ips:.1f} img/s", file=sys.stderr)
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = detect(params, images)
    bench._sync(out)
    jax.profiler.stop_trace()


def _trace_train(batch, trace_dir, iters):
    import jax

    from dan_tpu.config import default_config
    from dan_tpu.data.synthetic import synthetic_batch
    from dan_tpu.parallel.mesh import make_mesh, place_replicated, shard_batch
    from dan_tpu.train.loop import create_train_state, make_sharded_train_step

    cfg = default_config()
    mesh = make_mesh(cfg.mesh)
    state = place_replicated(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_sharded_train_step(cfg, mesh)
    b = shard_batch(synthetic_batch(cfg, batch, seed=0), mesh)
    state, m = step(state, b)
    float(m["loss"])  # compile + fence
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, b)
    float(m["loss"])
    ips = 10 * batch / (time.perf_counter() - t0)
    print(f"train batch={batch}: {ips:.1f} img/s/chip", file=sys.stderr)
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        state, m = step(state, b)
    float(m["loss"])
    jax.profiler.stop_trace()


def _hlo_stats_rows(trace_dir):
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    xplane = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    )[-1]
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    if data.lstrip().startswith("{"):
        obj = json.loads(data)
        cols = [c["label"] for c in obj["cols"]]
        rows = [
            {c: (cell.get("v") if cell else "") for c, cell in zip(cols, r["c"])}
            for r in obj["rows"]
        ]
        return rows
    return list(csv.DictReader(io.StringIO(data)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("graph", choices=["detect", "train"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters_traced", type=int, default=3)
    args = ap.parse_args()
    batch = args.batch or (128 if args.graph == "detect" else 8)

    from dan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    trace_dir = tempfile.mkdtemp(prefix="dan_xprof_")
    (_trace_detect if args.graph == "detect" else _trace_train)(
        batch, trace_dir, args.iters_traced
    )

    rows = _hlo_stats_rows(trace_dir)
    n = args.iters_traced
    total = sum(float(r["Total self time (us)"]) for r in rows)
    print(
        f"total device self time: {total / 1000:.3f} ms "
        f"=> {total / 1000 / n:.3f} ms/iter"
    )
    print(f"{'ms/iter':>8} {'%':>5} {'GF/s':>9} {'bound':>9}  category | op | shape")
    for r in sorted(
        rows, key=lambda r: -float(r["Total self time (us)"])
    )[: args.top]:
        t = float(r["Total self time (us)"]) / 1000 / n
        pct = 100 * float(r["Total self time (us)"]) / total
        m = re.match(r"%\S+ = (\S+)", r["HLO op text"])
        shape = m.group(1) if m else r["HLO op text"][:40]
        gfs = str(r["Model GFLOP/s"])[:9]
        print(
            f"{t:8.3f} {pct:5.1f} {gfs:>9} {r['Bound by']:>9}  "
            f"{r['HLO op category']} | {r['HLO op name']} | {shape[:60]}"
        )


if __name__ == "__main__":
    main()
