#!/usr/bin/env python
"""Convert a TF1 reference checkpoint into a dan_tpu orbax checkpoint
(SURVEY.md §3.4 warm-start flow).

    python scripts/convert_ckpt.py --tf_ckpt /path/model.ckpt-120000 \
        --out /path/orbax_dir [--strict]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tf_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--strict", action="store_true")
    ap.add_argument(
        "--platform",
        default="cpu",
        help="jax platform for the conversion (pure host work — cpu "
        "default keeps the saved shardings portable and leaves any TPU "
        "free; env vars are unreliable under the axon sitecustomize)",
    )
    args = ap.parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dan_tpu.ckpt.orbax_io import save_params
    from dan_tpu.ckpt.tf_import import load_tf_checkpoint
    from dan_tpu.config import default_config

    cfg = default_config()
    params = load_tf_checkpoint(args.tf_ckpt, cfg.model, strict=args.strict)
    save_params(args.out, params)
    print(f"wrote orbax params to {args.out}")


if __name__ == "__main__":
    main()
