"""Host input pipeline: file I/O + JPEG decode + scalar crop sampling only.

TPU mapping of the reference's tf.data input_fn (SURVEY.md §3.1): the host
never resamples pixels — it decodes JPEGs, pads them into fixed uint8
canvases, samples data-anchor crop parameters, and hands batches to the
device, where dan_tpu.ops.preprocess does all the math inside the jitted
train step.  A worker pool overlaps decode with device compute
(double-buffered prefetch).

Batch contract (all fixed shapes):
    canvas    (B, C, C, 3) uint8   padded source image
    crop_x0   (B,) f32             data-anchor crop window (source pixels)
    crop_y0   (B,) f32
    crop_size (B,) f32
    boxes     (B, G, 4) f32        gt corner boxes in canvas pixels
    mask      (B, G) bool
    seed      (B,) uint32          per-image augmentation seed
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from dan_tpu.config import DANConfig
from dan_tpu.data.augment import sample_data_anchor_crop
from dan_tpu.data.widerface import ImageRecord, load_image_rgb


def _prepare_sample(
    record: ImageRecord,
    config: DANConfig,
    seed: int,
    image: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Decode + pad one record into the batch contract (single sample)."""
    rng = np.random.default_rng(seed)
    img = image if image is not None else load_image_rgb(record.path)
    c = config.preprocess.canvas_size
    h, w = img.shape[:2]
    boxes = record.boxes.copy()

    # Oversized image: slide the canvas window to contain a random face
    # (host-side CROP is allowed; host-side RESAMPLING is not).
    off_x = off_y = 0
    if h > c or w > c:
        if len(boxes):
            i = int(rng.integers(len(boxes)))
            cx = float(boxes[i, 0] + boxes[i, 2]) / 2
            cy = float(boxes[i, 1] + boxes[i, 3]) / 2
        else:
            cx, cy = w / 2, h / 2
        off_x = int(np.clip(cx - c / 2, 0, max(w - c, 0)))
        off_y = int(np.clip(cy - c / 2, 0, max(h - c, 0)))
        img = img[off_y : off_y + c, off_x : off_x + c]
        h, w = img.shape[:2]
        boxes[:, [0, 2]] -= off_x
        boxes[:, [1, 3]] -= off_y

    canvas = np.zeros((c, c, 3), np.uint8)
    canvas[:h, :w] = img

    # Keep boxes whose center survived the canvas window.
    if len(boxes):
        cxs = (boxes[:, 0] + boxes[:, 2]) / 2
        cys = (boxes[:, 1] + boxes[:, 3]) / 2
        keep = (cxs >= 0) & (cxs < w) & (cys >= 0) & (cys < h)
        boxes = np.clip(boxes[keep], 0, c)

    x0, y0, size = sample_data_anchor_crop(rng, boxes, h, w, config.preprocess)

    g = config.match.max_gt
    out_boxes = np.zeros((g, 4), np.float32)
    out_mask = np.zeros((g,), bool)
    n = min(len(boxes), g)
    out_boxes[:n] = boxes[:n]
    out_mask[:n] = True
    return {
        "canvas": canvas,
        "crop_x0": np.float32(x0),
        "crop_y0": np.float32(y0),
        "crop_size": np.float32(size),
        "boxes": out_boxes,
        "mask": out_mask,
        "seed": np.uint32(rng.integers(0, 2**31)),
    }


def _collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def _put_or_stop(q, item, stop) -> bool:
    """put() that keeps checking the stop flag so a closed consumer can't
    strand the worker (and its device-resident payload) forever."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.5)
            return True
        except queue.Full:
            continue
    return False


def device_prefetch(host_batches, mesh, depth: int = 2):
    """Overlap host batch production + H2D transfer with device compute.

    Wraps an iterator of host batches into an iterator of device-resident
    sharded batches, transferring `depth` batches ahead on a background
    thread (the reference's tf.data prefetch-to-device equivalent).
    Worker exceptions propagate to the consumer (they must not read as a
    clean end-of-stream).
    """
    from dan_tpu.parallel.mesh import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def worker():
        try:
            for hb in host_batches:
                if stop.is_set():
                    return
                if not _put_or_stop(q, shard_batch(hb, mesh), stop):
                    return
            _put_or_stop(q, _END, stop)
        except BaseException as e:  # propagate, don't die silently
            _put_or_stop(q, e, stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


class TrainPipeline:
    """Infinite shuffled loader over ImageRecords with threaded decode."""

    def __init__(
        self,
        records: List[ImageRecord],
        config: DANConfig,
        batch_size: Optional[int] = None,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        if not records:
            raise ValueError("empty dataset")
        self.records = records
        self.config = config
        self.batch_size = batch_size or config.train.batch_size
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._stop = threading.Event()

    def _index_stream(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        while True:
            order = rng.permutation(len(self.records))
            for i in order:
                yield int(i)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        # Fresh event per iteration: a previous generator's close() set the
        # old one, and a producer started against an already-set event would
        # exit without ever enqueuing (consumer hangs on q.get() forever).
        # Generators still holding the old event keep seeing it set.
        self._stop = stop = threading.Event()

        def producer():
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            stream = self._index_stream()
            sample_seed = np.random.default_rng(self.seed).integers(0, 2**31)
            try:
                step = 0
                while not stop.is_set():
                    idxs = [next(stream) for _ in range(self.batch_size)]
                    futures = [
                        pool.submit(
                            _prepare_sample,
                            self.records[i],
                            self.config,
                            int(sample_seed) + step * self.batch_size + j,
                        )
                        for j, i in enumerate(idxs)
                    ]
                    batch = _collate([f.result() for f in futures])
                    step += 1
                    if not _put_or_stop(q, batch, stop):
                        return
            except BaseException as e:
                # A corrupt/missing JPEG must surface in the consumer, not
                # silently kill this thread and hang training on q.get().
                _put_or_stop(q, e, stop)
            finally:
                pool.shutdown(wait=False)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def stop(self):
        self._stop.set()
