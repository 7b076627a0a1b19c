"""Keep the committed CPU-baseline cache valid for bench.py.

bench.py divides the TPU headline by the cached TF1-on-CPU stand-in number
(BENCH_CPU_BASELINE.json), keyed on a sha256 fingerprint of
repr(default_config()).  If a config-schema change lands without refreshing
the cache, every fresh bench.py run prints vs_baseline=null (re-measuring
is opt-in via DAN_BENCH_MEASURE_CPU=1, never implicit — r4 hardening; the
original ambush in commit b059693 silently re-measured the ~35 min batch-128
CPU baseline and timed out the driver's round-end bench).  This test makes
a stale cache a visible failure at commit time, using bench.py's OWN check
so the two can't drift.
"""
import os
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, os.path.abspath(ROOT))

import bench  # noqa: E402
from dan_tpu.config import default_config  # noqa: E402


def test_cpu_baseline_cache_is_valid_for_bench():
    fp = bench.config_fingerprint(default_config())
    cpu_ips, reason = bench.read_cpu_baseline(fp)
    assert cpu_ips is not None, (
        f"BENCH_CPU_BASELINE.json is unusable for bench.py ({reason}) — "
        "vs_baseline would print null on the next bench run.  If the CPU "
        "detect pipeline is unchanged by your config change, update "
        f"config_fp to {fp!r} and note why in the file; otherwise "
        "re-measure on an idle host with DAN_BENCH_MEASURE_CPU=1 "
        "python bench.py."
    )
