#!/usr/bin/env python
"""Dump the optimized (post-layout, backend-lowered) HLO of the b16 train
step and extract the conv1_2'-backward region: the 844 MB `reverse` of the
cotangent and the weight-grad convolution that consumes it (BASELINE.md
round-3 floor analysis — the one unprobed lever).

    python scripts/dump_train_hlo.py [--batch 16] [--out /tmp/train_hlo.txt]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dan_tpu.utils.cache import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="/tmp/train_hlo.txt")
    args = ap.parse_args()

    enable_compilation_cache()
    import jax

    from dan_tpu.config import default_config
    from dan_tpu.data.synthetic import synthetic_batch
    from dan_tpu.parallel.mesh import make_mesh, place_replicated, shard_batch
    from dan_tpu.train.loop import create_train_state, make_sharded_train_step

    cfg = default_config()
    mesh = make_mesh(cfg.mesh)
    state = place_replicated(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_sharded_train_step(cfg, mesh)
    b = shard_batch(synthetic_batch(cfg, args.batch, seed=0), mesh)
    lowered = jax.jit(step).lower(state, b)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}", file=sys.stderr)

    # Extract every reverse op and any op mentioning it.
    rev_names = []
    for line in txt.splitlines():
        m = re.match(r"\s*(%?[\w.-]+) = .*reverse\(", line)
        if m and "reverse" in line.split("=", 1)[1][:200]:
            rev_names.append(m.group(1).lstrip("%"))
            print("REVERSE:", line.strip()[:400])
    for line in txt.splitlines():
        for rn in rev_names:
            if rn in line and "= " in line and not line.strip().startswith(
                f"%{rn} ="
            ) and not line.strip().startswith(f"{rn} ="):
                print("USE:", line.strip()[:400])
                break


if __name__ == "__main__":
    main()
