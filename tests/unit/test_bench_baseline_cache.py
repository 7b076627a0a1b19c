"""Keep the committed CPU-baseline cache loadable by bench.py.

bench.py divides the TPU headline by the cached TF1-on-CPU stand-in number
(BENCH_CPU_BASELINE.json), keyed on a sha256 fingerprint of
repr(default_config()).  If a config-schema change lands without refreshing
the cache, every fresh bench.py process silently re-measures the baseline —
a ~35 min batch-128 CPU run — which times out the driver's round-end bench
capture (this exact ambush shipped in commit b059693: a new ModelConfig
field went in without the fp refresh).  This test makes a stale cache a
visible failure at commit time instead.
"""
import hashlib
import json
import os

from dan_tpu.config import default_config

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
CACHE = os.path.join(ROOT, "BENCH_CPU_BASELINE.json")


def test_cpu_baseline_cache_fingerprint_is_current():
    cached = json.load(open(CACHE))
    fp = hashlib.sha256(repr(default_config()).encode()).hexdigest()[:16]
    assert cached.get("config_fp") == fp, (
        "BENCH_CPU_BASELINE.json is stale for the current config schema — "
        "bench.py would re-measure the CPU baseline (~35 min at batch 128) "
        "on its next fresh run.  Either re-measure (delete the file, run "
        "bench.py once on an idle host) or, if the CPU detect pipeline is "
        "unchanged by the config change, update config_fp to "
        f"{fp!r} and note why in the file."
    )


def test_cpu_baseline_cache_batch_matches_bench_default():
    cached = json.load(open(CACHE))
    assert cached.get("batch") == 128, (
        "bench.py defaults to batch 128; a batch-mismatched cache also "
        "triggers the re-measure path"
    )
