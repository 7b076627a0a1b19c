#!/usr/bin/env python
"""Dataset-scale TTA throughput sweep (VERDICT r3 item 4): replace the
20-image-fixture extrapolation with a measured knee on a few-hundred-image
synthetic set with a WIDER-like size distribution.

WIDER val images are 1024 px wide with mixed heights (median ~0.75 MP);
the synthetic set reproduces that: width 1024, heights drawn from a
truncated log-normal over [330, 1500] (seeded), which exercises the same
(scale-bucket, canvas-bucket) plan spread as the real set — including the
2.0x extra pass for small (h <= 410) images.

    python scripts/bench_tta_dataset.py --images 300 \
        --tta_batches 4,16,32 --vote_batches 32,128

Each combo is measured WARM (executables pre-compiled via
TTARunner.warmup); the first timed run per combo is preceded by the
threaded warmup so only steady-state throughput is recorded.  Launch
counts are computed from the same plan_variant_buckets rule run_dataset
uses, so the reported counts are exact, not estimates.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_sizes(n, seed=0):
    """(h, w) sizes with a WIDER-val-like distribution: w = 1024, h from a
    log-normal centered near 730 px, truncated to [330, 1500]."""
    rng = np.random.default_rng(seed)
    hs = np.exp(rng.normal(np.log(730.0), 0.35, size=n))
    hs = np.clip(hs, 330, 1500).astype(int)
    return [(int(h), 1024) for h in hs]


def launch_counts(sizes, runner, tta_batch, vote_chunk):
    """Exact launch counts for run_dataset over these sizes: bucket-fn
    launches (grouped by (scale-bucket, canvas), chunked by the runner's
    per-bucket HBM-budgeted rule) and vote launches."""
    from dan_tpu.eval.tta import plan_variant_buckets

    groups = {}
    for h, w in sizes:
        for v, bucket, canvas in plan_variant_buckets(h, w, runner.config):
            groups.setdefault((bucket, canvas), []).append(v)
    bucket_launches = sum(
        -(-len(us) // runner.bucket_chunk(b, 1, tta_batch))
        for (b, _), us in groups.items()
    )
    n_units = sum(len(us) for us in groups.values())
    vote_launches = -(-len(sizes) // vote_chunk)
    return bucket_launches, vote_launches, n_units, len(groups)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=300)
    ap.add_argument("--tta_batches", default="4,16,32")
    ap.add_argument("--vote_batches", default="32,128")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from dan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dan_tpu.config import default_config
    from dan_tpu.eval.tta import TTARunner
    from dan_tpu.models.detector import init_detector_params

    cfg = default_config()
    params = init_detector_params(jax.random.PRNGKey(0), cfg.model)
    runner = TTARunner(params, cfg)

    sizes = synth_sizes(args.images, args.seed)
    tta_batches = [int(x) for x in args.tta_batches.split(",")]
    vote_batches = [int(x) for x in args.vote_batches.split(",")]

    # Warm every executable for every tta_batch up front (threaded; the
    # remote compiles overlap).  Warming all combos before ANY timing keeps
    # the measured runs compile-free.
    for tb in tta_batches:
        for vb in vote_batches:
            t0 = time.time()
            n = runner.warmup(
                iter(sizes), batch_per_device=tb, vote_batch=vb, threads=16
            )
            print(
                f"[warm] tta_batch={tb} vote_batch={vb}: {n} executables "
                f"in {time.time() - t0:.0f}s",
                file=sys.stderr,
            )

    # Pre-generate all images OUTSIDE the timed window (host-side synthesis
    # of ~675 MB on the 1-core host would otherwise deflate every combo's
    # img/s); the same arrays serve every combo.
    rng = np.random.default_rng(args.seed + 1)
    images = [
        (f"im{i:04d}", rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        for i, (h, w) in enumerate(sizes)
    ]

    def items():
        return iter(images)

    rows = []
    for tb in tta_batches:
        for vb in vote_batches:
            vchunk = runner._vote_chunk(1, vb)
            bl, vl, n_units, n_groups = launch_counts(sizes, runner, tb, vchunk)
            t0 = time.time()
            results = runner.run_dataset(
                items(), batch_per_device=tb, vote_batch=vb
            )
            dt = time.time() - t0
            row = {
                "tta_batch": tb,
                "vote_batch": vb,
                "images": len(results),
                "seconds": round(dt, 1),
                "img_per_s": round(len(results) / dt, 3),
                "bucket_launches": bl,
                "vote_launches": vl,
                "units": n_units,
                "groups": n_groups,
            }
            rows.append(row)
            print(json.dumps(row))
    print(json.dumps({"rows": rows}), file=sys.stderr)


if __name__ == "__main__":
    main()
