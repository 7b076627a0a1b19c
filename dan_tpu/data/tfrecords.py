"""TFRecord conversion — parity-run compatibility with the reference's
dataset format (SURVEY.md §2 'TFRecord converter', §3.5).

The dan_tpu pipeline reads JPEGs directly (no TFRecord stage needed), but
the reference trains from sharded TFRecords produced by
`dataset/convert_tfrecords.py` [?]; this module writes/reads the same
tf.Example layout (author's SSD.TensorFlow conventions [K]) so datasets can
be exchanged with reference tooling in both directions:

    image/encoded, image/format, image/height, image/width, image/filename
    image/object/bbox/{xmin, ymin, xmax, ymax}   (normalized floats)
    image/object/bbox/label                       (1 = face)
    image/object/bbox/difficult                   (invalid flag)

TF is imported lazily; everything here is host-side, run-once tooling.
"""
from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from dan_tpu.data.widerface import ImageRecord


def _features(record: ImageRecord, encoded: bytes, h: int, w: int):
    import tensorflow as tf

    boxes = record.boxes.astype(np.float64)
    xmin = (boxes[:, 0] / w).tolist() if len(boxes) else []
    ymin = (boxes[:, 1] / h).tolist() if len(boxes) else []
    xmax = (boxes[:, 2] / w).tolist() if len(boxes) else []
    ymax = (boxes[:, 3] / h).tolist() if len(boxes) else []

    def floats(v):
        return tf.train.Feature(float_list=tf.train.FloatList(value=v))

    def ints(v):
        return tf.train.Feature(int64_list=tf.train.Int64List(value=v))

    def bytes_f(v):
        return tf.train.Feature(bytes_list=tf.train.BytesList(value=[v]))

    return tf.train.Features(
        feature={
            "image/encoded": bytes_f(encoded),
            "image/format": bytes_f(b"JPEG"),
            "image/height": ints([h]),
            "image/width": ints([w]),
            "image/filename": bytes_f(record.rel_path.encode()),
            "image/object/bbox/xmin": floats(xmin),
            "image/object/bbox/ymin": floats(ymin),
            "image/object/bbox/xmax": floats(xmax),
            "image/object/bbox/ymax": floats(ymax),
            "image/object/bbox/label": ints([1] * len(boxes)),
            "image/object/bbox/difficult": ints([0] * len(boxes)),
        }
    )


def convert_to_tfrecords(
    records: List[ImageRecord],
    output_dir: str,
    split: str = "train",
    num_shards: int = 16,
) -> List[str]:
    """Write sharded TFRecords; returns the shard paths."""
    import cv2
    import tensorflow as tf

    os.makedirs(output_dir, exist_ok=True)
    paths = [
        os.path.join(
            output_dir, f"{split}-{i:05d}-of-{num_shards:05d}.tfrecord"
        )
        for i in range(num_shards)
    ]
    writers = [tf.io.TFRecordWriter(p) for p in paths]
    try:
        for i, rec in enumerate(records):
            with open(rec.path, "rb") as f:
                encoded = f.read()
            img = cv2.imdecode(
                np.frombuffer(encoded, np.uint8), cv2.IMREAD_COLOR
            )
            if img is None:
                raise ValueError(f"undecodable image: {rec.path}")
            h, w = img.shape[:2]
            example = tf.train.Example(
                features=_features(rec, encoded, h, w)
            )
            writers[i % num_shards].write(example.SerializeToString())
    finally:
        for wr in writers:
            wr.close()
    return paths


def read_tfrecords(paths: List[str]) -> Iterator[Tuple[ImageRecord, bytes]]:
    """Parse TFRecords back into (ImageRecord, jpeg_bytes) pairs (callers
    decode via cv2.imdecode when needed)."""
    import tensorflow as tf

    spec = {
        "image/encoded": tf.io.FixedLenFeature([], tf.string),
        "image/height": tf.io.FixedLenFeature([], tf.int64),
        "image/width": tf.io.FixedLenFeature([], tf.int64),
        "image/filename": tf.io.FixedLenFeature([], tf.string),
        "image/object/bbox/xmin": tf.io.VarLenFeature(tf.float32),
        "image/object/bbox/ymin": tf.io.VarLenFeature(tf.float32),
        "image/object/bbox/xmax": tf.io.VarLenFeature(tf.float32),
        "image/object/bbox/ymax": tf.io.VarLenFeature(tf.float32),
    }
    for path in paths:
        for raw in tf.data.TFRecordDataset([path]):
            ex = tf.io.parse_single_example(raw, spec)
            h = int(ex["image/height"])
            w = int(ex["image/width"])
            rel = ex["image/filename"].numpy().decode()
            xmin = tf.sparse.to_dense(ex["image/object/bbox/xmin"]).numpy()
            ymin = tf.sparse.to_dense(ex["image/object/bbox/ymin"]).numpy()
            xmax = tf.sparse.to_dense(ex["image/object/bbox/xmax"]).numpy()
            ymax = tf.sparse.to_dense(ex["image/object/bbox/ymax"]).numpy()
            boxes = np.stack(
                [xmin * w, ymin * h, xmax * w, ymax * h], axis=-1
            ).astype(np.float32) if len(xmin) else np.zeros((0, 4), np.float32)
            yield ImageRecord(
                path="",  # embedded: use .encoded below
                rel_path=rel,
                event=rel.split("/")[0],
                boxes=boxes,
                attrs=np.zeros((len(boxes), 6), np.float32),
            ), ex["image/encoded"].numpy()
