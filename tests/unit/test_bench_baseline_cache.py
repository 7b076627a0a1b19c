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


def test_read_cpu_baseline_never_raises(tmp_path, monkeypatch):
    """Every malformation returns (None, reason) — read_cpu_baseline runs
    between the TPU measurement and the headline print, so a raise here
    would suppress the round's one piece of driver-visible evidence."""
    import json

    cache = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CPU_BASELINE_CACHE", str(cache))

    def check():
        ips, reason = bench.read_cpu_baseline("feedfacefeedface")
        assert ips is None and isinstance(reason, str) and reason
        return reason

    assert "missing" in check()  # no file
    cache.write_bytes(b"\x80not json")
    assert "unreadable" in check()
    cache.write_text("[1, 2, 3]")
    assert "not a JSON object" in check()
    cache.write_text(json.dumps({"batch": 64, "config_fp": "feedfacefeedface"}))
    assert "batch" in check()  # batch mismatch (bench default is 128)
    cache.write_text(
        json.dumps(
            {"batch": bench.BATCH, "config_fp": "0000000000000000",
             "images_per_sec": 1.0}
        )
    )
    assert "stale" in check()  # fingerprint mismatch
    for bad_ips in (None, 0, -1.0, "fast"):
        cache.write_text(
            json.dumps(
                {"batch": bench.BATCH, "config_fp": "feedfacefeedface",
                 "images_per_sec": bad_ips}
            )
        )
        assert "images_per_sec" in check()
    # And the happy path still returns the value.
    cache.write_text(
        json.dumps(
            {"batch": bench.BATCH, "config_fp": "feedfacefeedface",
             "images_per_sec": 0.178}
        )
    )
    ips, reason = bench.read_cpu_baseline("feedfacefeedface")
    assert ips == 0.178 and reason is None


def test_importing_bench_has_no_side_threads():
    """Preflight and this test import bench as a module; the wall-clock
    watchdog (os._exit(4) after DEADLINE_S) must only arm inside main()."""
    import ast

    assert callable(bench._arm_deadline_watchdog)
    tree = ast.parse(open(os.path.join(ROOT, "bench.py")).read())
    module_level_calls = [
        node.value.func.id
        for node in tree.body
        if isinstance(node, ast.Expr)
        and isinstance(node.value, ast.Call)
        and isinstance(node.value.func, ast.Name)
    ]
    assert "_arm_deadline_watchdog" not in module_level_calls, (
        "watchdog must not arm at import time — preflight/pytest import "
        "bench and would inherit a kill timer"
    )
