#!/usr/bin/env python
"""Round-end preflight: run exactly what the driver runs, with timeouts,
and refuse to pass unless everything is green (VERDICT r3 item 2 — round 3
ended with a red tree and a bench that timed out 29 minutes later; nothing
in the round-end flow had run the driver's own commands first).

Usage:
    python scripts/preflight.py            # quick tier (~8 min): unit+parity
                                           # tests, graft dryrun, bench
                                           # static checks
    python scripts/preflight.py --full     # + e2e tests (~35 min) and a real
                                           # `python bench.py` on the TPU

Exit 0 = safe to snapshot.  Anything else: fix before committing the
round-end state.

The int8 PTQ path is gated by BOTH tiers (VERDICT r4 item 1d): its unit
coverage (tests/unit/test_quant.py — integer exactness, mirror tap
parity, requant/max commutation, Detector surface) runs in tests-quick,
and the end-to-end deployment mode (scripts/eval.py --int8 --no_tta)
runs in tests-e2e via tests/e2e/test_eval_cli.py.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, cmd, timeout_s, env=None):
    print(f"[preflight] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            cmd,
            cwd=ROOT,
            timeout=timeout_s,
            env={**os.environ, **(env or {})},
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"[preflight] {name}: TIMEOUT after {timeout_s}s — FAIL")
        return False, None
    dt = time.monotonic() - t0
    status = "ok" if proc.returncode == 0 else f"rc={proc.returncode} FAIL"
    print(f"[preflight] {name}: {status} ({dt:.0f}s)")
    if proc.returncode != 0:
        tail = (proc.stdout + proc.stderr)[-3000:]
        print(tail)
    return proc.returncode == 0, proc


def bench_static_checks():
    """Fast invariants that killed past rounds, checked without a TPU:
    bench.py's OWN cache validity check must pass (vs_baseline would go
    null otherwise).  Uses bench.py's functions directly — a re-implemented
    copy of the fingerprint recipe could silently drift from the real
    check."""
    sys.path.insert(0, ROOT)
    import bench
    from dan_tpu.config import default_config

    cpu_ips, reason = bench.read_cpu_baseline(
        bench.config_fingerprint(default_config())
    )
    if cpu_ips is None:
        print(
            f"[preflight] bench-static: CPU baseline cache unusable "
            f"({reason}) — bench.py will print vs_baseline=null — FAIL"
        )
        return False
    print("[preflight] bench-static: ok")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--full",
        action="store_true",
        help="also run the e2e test tier and a real bench.py on the TPU",
    )
    args = ap.parse_args()

    results = {}
    results["bench-static"] = bench_static_checks()
    results["tests-quick"], _ = run(
        "tests-quick",
        [sys.executable, "-m", "pytest", "tests/unit", "tests/parity", "-q"],
        timeout_s=900,
    )
    results["graft-dryrun"], _ = run(
        "graft-dryrun",
        [sys.executable, "__graft_entry__.py", "8"],
        timeout_s=900,
    )
    if args.full:
        results["tests-e2e"], _ = run(
            "tests-e2e",
            [sys.executable, "-m", "pytest", "tests/e2e", "-q"],
            # r4 measured 1741 s; the tier grew ~2 min in r5 (int8 CLI e2e
            # + the run_dataset max_pending stress run) and timed out at
            # the old 1800 s budget with zero failing tests.
            timeout_s=2700,
        )
        ok, proc = run(
            "bench-tpu", [sys.executable, "bench.py"], timeout_s=1500
        )
        if ok:
            line = [
                ln
                for ln in proc.stdout.strip().splitlines()
                if ln.startswith("{")
            ]
            try:
                parsed = json.loads(line[-1])
                print(f"[preflight] bench-tpu headline: {parsed}")
                ok = parsed.get("value", 0) > 0 and parsed.get(
                    "vs_baseline"
                ) is not None
                if not ok:
                    print("[preflight] bench-tpu: headline malformed — FAIL")
            except Exception as e:
                print(f"[preflight] bench-tpu: no parseable JSON line ({e}) — FAIL")
                ok = False
        results["bench-tpu"] = ok

    print("\n[preflight] summary:")
    for k, v in results.items():
        print(f"  {k}: {'GREEN' if v else 'RED'}")
    if all(results.values()):
        print("[preflight] ALL GREEN — safe to snapshot")
        return 0
    print("[preflight] RED — fix before the round-end commit")
    return 1


if __name__ == "__main__":
    sys.exit(main())
