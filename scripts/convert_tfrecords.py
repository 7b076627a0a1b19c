#!/usr/bin/env python
"""Convert WIDER FACE annotations + JPEGs into reference-format TFRecords
(reference `dataset/convert_tfrecords.py` equivalent; SURVEY.md §3.5 — kept
for parity runs; the dan_tpu pipeline itself reads JPEGs directly).

    python scripts/convert_tfrecords.py --wider_root /data/widerface \
        --split train --output_dir /data/tfrecords [--num_shards 16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wider_root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--num_shards", type=int, default=16)
    args = ap.parse_args()

    from dan_tpu.data.tfrecords import convert_to_tfrecords
    from dan_tpu.data.widerface import load_split

    records = load_split(args.wider_root, args.split)
    print(f"converting {len(records)} images -> {args.num_shards} shards")
    paths = convert_to_tfrecords(
        records, args.output_dir, args.split, args.num_shards
    )
    print(f"wrote {len(paths)} shards under {args.output_dir}")


if __name__ == "__main__":
    main()
