#!/usr/bin/env python
"""Probe: can AOT executable serialization skip the per-process remote
compile-cache roundtrip on the axon tunnel? (VERDICT r4 item 4 / weak 4:
TTA startup pays ~17 graphs x 20-40 s cache-HIT roundtrips per process,
~143 s warm — the one recurring deployment cost with no probe.)

Three child modes, each a FRESH process on the real TPU:
  save  — jit-compile the 640-bucket detect graph (persistent cache on),
          serialize the compiled executable (jax.experimental.
          serialize_executable) to --path, verify one run.
  load  — unpickle + deserialize_and_load + first run; times each stage.
  jit   — the status quo: plain jit with the persistent cache (the
          20-40 s remote cache-hit roundtrip), time to first output.

    python scripts/probe_aot_export.py            # orchestrates all three
    python scripts/probe_aot_export.py --mode save --path /tmp/aot.pkl
"""
import argparse
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T0 = time.monotonic()


def t(stage):
    print(f"t+{time.monotonic() - T0:6.1f}s {stage}", file=sys.stderr, flush=True)


def build():
    from dan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dan_tpu.api import Detector
    from dan_tpu.config import default_config

    t("imports done")
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpu:
        print("no TPU — abort", file=sys.stderr)
        sys.exit(5)
    det = Detector.from_random(key=jax.random.PRNGKey(0))
    c = det.config.model.image_size
    fn = jax.jit(det._detect_one_fn())
    args = (
        det.params,
        jnp.zeros((c, c, 3), jnp.uint8),
        jnp.float32(c),
        jnp.float32(c),
    )
    t("graph built")
    return fn, args


def fetch_one(out):
    import numpy as np

    return float(np.asarray(out["scores"])[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all", choices=["all", "save", "load", "jit"])
    ap.add_argument("--path", default="/tmp/aot_detect.pkl")
    args = ap.parse_args()

    if args.mode == "all":
        for mode in ("save", "load", "jit"):
            print(f"--- child: {mode} ---", flush=True)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--mode", mode,
                 "--path", args.path],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            if r.returncode != 0:
                print(f"child {mode} rc={r.returncode}", flush=True)
                if mode == "save":
                    break  # load is pointless without a payload
        return

    if args.mode == "save":
        fn, call_args = build()
        from jax.experimental import serialize_executable as se

        lowered = fn.lower(*call_args)
        t("lowered")
        compiled = lowered.compile()
        t("compiled (remote roundtrip incl.)")
        payload, in_tree, out_tree = se.serialize(compiled)
        t(f"serialized ({len(payload) / 1e6:.1f} MB)")
        with open(args.path, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        s = fetch_one(compiled(*call_args))
        t(f"verified run (score[0]={s:.4f})")
    elif args.mode == "load":
        from dan_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        import jax  # noqa: F401  (backend init cost is part of the story)

        from jax.experimental import serialize_executable as se

        t("imports done")
        with open(args.path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        t("payload read")
        compiled = se.deserialize_and_load(payload, in_tree, out_tree)
        t("deserialize_and_load done")
        fn, call_args = build()  # params + zeros (host work, cheap)
        s = fetch_one(compiled(*call_args))
        t(f"first output fetched (score[0]={s:.4f})")
    elif args.mode == "jit":
        fn, call_args = build()
        s = fetch_one(fn(*call_args))
        t(f"first output fetched via jit (score[0]={s:.4f})")


if __name__ == "__main__":
    main()
