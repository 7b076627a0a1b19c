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
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from dan_tpu.config import DANConfig
from dan_tpu.data.augment import sample_data_anchor_crop
from dan_tpu.data.widerface import ImageRecord, load_image_rgb


def _window_params(
    record: ImageRecord, w: int, h: int, c: int, rng
) -> Tuple[int, int]:
    """Canvas-window origin for an oversized image: slide the window to
    contain a random face (host-side CROP is allowed; host-side RESAMPLING
    is not). (0, 0) when the image fits."""
    if h <= c and w <= c:
        return 0, 0
    boxes = record.boxes
    if len(boxes):
        i = int(rng.integers(len(boxes)))
        cx = float(boxes[i, 0] + boxes[i, 2]) / 2
        cy = float(boxes[i, 1] + boxes[i, 3]) / 2
    else:
        cx, cy = w / 2, h / 2
    off_x = int(np.clip(cx - c / 2, 0, max(w - c, 0)))
    off_y = int(np.clip(cy - c / 2, 0, max(h - c, 0)))
    return off_x, off_y


def _finish_sample(
    record: ImageRecord,
    config: DANConfig,
    rng,
    off_x: int,
    off_y: int,
    w: int,
    h: int,
) -> Dict[str, np.ndarray]:
    """Box bookkeeping + crop-parameter sampling for one sample whose
    canvas pixels are already placed ((w, h) = placed size after the
    (off_x, off_y) window). Consumes `rng` in the same order for every
    decode path, so native and fallback batches are bit-identical."""
    c = config.preprocess.canvas_size
    boxes = record.boxes.copy()
    if off_x or off_y:
        boxes[:, [0, 2]] -= off_x
        boxes[:, [1, 3]] -= off_y

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
        "crop_x0": np.float32(x0),
        "crop_y0": np.float32(y0),
        "crop_size": np.float32(size),
        "boxes": out_boxes,
        "mask": out_mask,
        "seed": np.uint32(rng.integers(0, 2**31)),
    }


def _prepare_sample(
    record: ImageRecord,
    config: DANConfig,
    seed: int,
    image: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Decode + pad one record into the batch contract (single sample,
    Python/cv2 path — the per-image fallback of the native batch decode)."""
    rng = np.random.default_rng(seed)
    img = image if image is not None else load_image_rgb(record.path)
    c = config.preprocess.canvas_size
    h, w = img.shape[:2]
    off_x, off_y = _window_params(record, w, h, c, rng)
    if off_x or off_y or h > c or w > c:
        img = img[off_y : off_y + c, off_x : off_x + c]
        h, w = img.shape[:2]
    canvas = np.zeros((c, c, 3), np.uint8)
    canvas[:h, :w] = img
    out = _finish_sample(record, config, rng, off_x, off_y, w, h)
    out["canvas"] = canvas
    return out


def _prepare_batch_native(
    records: Sequence[ImageRecord],
    config: DANConfig,
    seeds: Sequence[int],
    nthreads: int,
    window: str = "crop",
) -> Optional[Dict[str, np.ndarray]]:
    """Whole-batch native path: file bytes -> C++ threaded JPEG window
    decode directly into the (B, C, C, 3) canvas array (zero collation
    copies, GIL-free decode — the reference's C++ tf.data equivalent).

    window='crop' exploits that the data-anchor crop sampler needs only
    box METADATA (never pixels): each sample's crop window is drawn first
    and the decoder reads just that window (+2 px of bilinear margin) —
    the only canvas region the device-side train_preprocess_one ever
    samples. window='full' decodes the whole placed image.

    Returns None when the native library is unavailable; any single image
    the native decoder rejects falls back to the cv2 path in place."""
    from dan_tpu import native

    if native.load_loader() is None:
        return None
    c = config.preprocess.canvas_size
    n = len(records)
    bufs = []
    for r in records:
        with open(r.path, "rb") as f:
            bufs.append(f.read())

    # Metadata pass (no pixels): canvas window -> box bookkeeping -> crop
    # params, consuming each sample's rng in the same order as
    # _prepare_sample so native and fallback batches are interchangeable.
    samples: List[Optional[Dict[str, np.ndarray]]] = [None] * n
    src_x = np.zeros((n,), np.int32)
    src_y = np.zeros((n,), np.int32)
    dst_x = np.zeros((n,), np.int32)
    dst_y = np.zeros((n,), np.int32)
    win_w = np.zeros((n,), np.int32)
    win_h = np.zeros((n,), np.int32)
    for i, (r, b) in enumerate(zip(records, bufs)):
        wh = native.jpeg_dims(b)
        if wh is None:  # non-JPEG/corrupt header: full Python fallback
            continue
        # cv2 applies EXIF orientation; libjpeg does not. A rotated image
        # decoded natively would mis-align with its (display-oriented) gt
        # boxes — hand those to the cv2 fallback.
        if (native.jpeg_exif_orientation(b) or 1) != 1:
            continue
        rng = np.random.default_rng(seeds[i])
        off_x, off_y = _window_params(r, wh[0], wh[1], c, rng)
        placed_w = min(c, wh[0] - off_x)
        placed_h = min(c, wh[1] - off_y)
        s = _finish_sample(r, config, rng, off_x, off_y, placed_w, placed_h)
        samples[i] = s
        if window == "crop":
            # Decode the crop window +2 px (bilinear halo), clipped to the
            # placed region; everything else in the slot stays zero.
            x0 = max(0, int(np.floor(s["crop_x0"])) - 2)
            y0 = max(0, int(np.floor(s["crop_y0"])) - 2)
            x1 = min(placed_w, int(np.ceil(s["crop_x0"] + s["crop_size"])) + 2)
            y1 = min(placed_h, int(np.ceil(s["crop_y0"] + s["crop_size"])) + 2)
        else:
            x0, y0, x1, y1 = 0, 0, placed_w, placed_h
        dst_x[i], dst_y[i] = x0, y0
        src_x[i], src_y[i] = off_x + x0, off_y + y0
        win_w[i], win_h[i] = max(0, x1 - x0), max(0, y1 - y0)

    canvases = np.empty((n, c, c, 3), np.uint8)
    status = native.decode_batch_into(
        bufs, src_x, src_y, dst_x, dst_y, win_w, win_h, canvases,
        nthreads=nthreads,
    )
    for i, r in enumerate(records):
        if samples[i] is None or status[i] != 0:
            # cv2 fallback replays the SAME rng stream from the start.
            s = _prepare_sample(r, config, seeds[i])
            canvases[i] = s.pop("canvas")
            samples[i] = s
    batch = _collate(samples)
    batch["canvas"] = canvases
    return batch


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


def iter_prefetch(items, depth: int = 2, transform=None):
    """Run an iterator (plus an optional per-item `transform`) on a
    background thread, staying `depth` items ahead of the consumer.

    The generic overlap primitive behind device_prefetch, also used by the
    eval CLI to overlap host JPEG decode with device TTA work (decode
    releases the GIL, and the consumer's blocking device fetches leave the
    core idle otherwise).  Worker exceptions propagate to the consumer
    (they must not read as a clean end-of-stream); closing the consumer
    unblocks and stops the worker.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def worker():
        try:
            for it in items:
                if stop.is_set():
                    return
                if transform is not None:
                    it = transform(it)
                if not _put_or_stop(q, it, stop):
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


def device_prefetch(host_batches, mesh, depth: int = 2):
    """Overlap host batch production + H2D transfer with device compute.

    Wraps an iterator of host batches into an iterator of device-resident
    sharded batches, transferring `depth` batches ahead on a background
    thread (the reference's tf.data prefetch-to-device equivalent).
    """
    from dan_tpu.parallel.mesh import shard_batch

    return iter_prefetch(
        host_batches, depth=depth, transform=lambda hb: shard_batch(hb, mesh)
    )


class TrainPipeline:
    """Infinite shuffled loader over ImageRecords with threaded decode.

    Scaling (VERDICT r4 item 3): the JPEG decode itself is GIL-free and
    thread-parallel (native/loader.cc), but everything AROUND it — file
    reads, header parsing, rng/box bookkeeping, crop sampling, collation
    — used to run on ONE producer thread, capping the feed rate on
    many-core hosts no matter how many decode threads run.
    `num_producers` producer threads now each build WHOLE batches,
    striped by step (producer k builds steps k, k+K, k+2K, ...), and the
    consumer round-robins their queues so the yielded batch sequence is
    step-ordered and BIT-IDENTICAL for every K (tested): per-step sample
    seeds were already step-derived, and the shuffle is a per-epoch
    permutation derived from (seed, epoch) rather than a serially
    advanced rng, so any producer can compute any step's indices.
    `num_workers` decode threads are spawned PER producer (total host
    threads ~ num_producers * num_workers; size to the host's cores —
    the measured per-image host cost model is in BASELINE.md r5).
    """

    def __init__(
        self,
        records: List[ImageRecord],
        config: DANConfig,
        batch_size: Optional[int] = None,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        use_native: bool = True,
        native_window: str = "crop",
        num_producers: Optional[int] = None,
    ):
        if not records:
            raise ValueError("empty dataset")
        self.records = records
        self.config = config
        self.batch_size = batch_size or config.train.batch_size
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.use_native = use_native
        self.native_window = native_window
        if num_producers is None:
            # One producer per ~2 cores up to 4: the serial per-batch work
            # (file reads + metadata + collation) measures ~35-40% of the
            # decode cost, so a handful of producers keeps decode threads
            # fed without oversubscribing small hosts (1 on this 1-core box).
            import os as _os

            num_producers = max(1, min(4, (_os.cpu_count() or 1) // 2))
        self.num_producers = max(1, int(num_producers))
        self._stop = threading.Event()

    def _epoch_perm(self, epoch: int) -> np.ndarray:
        """Shuffle for one epoch, derived from (seed, epoch) so any
        producer can materialize any epoch without replaying a stream."""
        return np.random.default_rng([self.seed, epoch]).permutation(
            len(self.records)
        )

    def _step_indices(self, step: int, perm_cache: Dict[int, np.ndarray]):
        """Record indices for global step `step` — positions
        [step*B, (step+1)*B) of the infinite epoch-permutation
        concatenation.  perm_cache is per-producer (steps within one
        producer are monotone, so epochs older than the previous one are
        evicted)."""
        n = len(self.records)
        out = []
        for t in range(step * self.batch_size, (step + 1) * self.batch_size):
            e, pos = divmod(t, n)
            perm = perm_cache.get(e)
            if perm is None:
                perm = perm_cache[e] = self._epoch_perm(e)
                for old in [k for k in perm_cache if k < e - 1]:
                    del perm_cache[old]
            out.append(int(perm[pos]))
        return out

    def _producer(self, k: int, stop: threading.Event, q: "queue.Queue"):
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        sample_seed = int(
            np.random.default_rng(self.seed).integers(0, 2**31)
        )
        perm_cache: Dict[int, np.ndarray] = {}
        native_ok = self.use_native
        try:
            step = k
            while not stop.is_set():
                idxs = self._step_indices(step, perm_cache)
                seeds = [
                    sample_seed + step * self.batch_size + j
                    for j in range(self.batch_size)
                ]
                batch = None
                if native_ok:
                    batch = _prepare_batch_native(
                        [self.records[i] for i in idxs],
                        self.config,
                        seeds,
                        nthreads=self.num_workers,
                        window=self.native_window,
                    )
                    native_ok = batch is not None  # don't retry a dead lib
                if batch is None:
                    futures = [
                        pool.submit(
                            _prepare_sample,
                            self.records[i],
                            self.config,
                            seeds[j],
                        )
                        for j, i in enumerate(idxs)
                    ]
                    batch = _collate([f.result() for f in futures])
                if not _put_or_stop(q, batch, stop):
                    return
                step += self.num_producers
        except BaseException as e:
            # A corrupt/missing JPEG must surface in the consumer, not
            # silently kill this thread and hang training on q.get().
            _put_or_stop(q, e, stop)
        finally:
            pool.shutdown(wait=False)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # One queue per producer; the consumer walks them in step order so
        # batches arrive exactly as a single producer would emit them.
        qs = [
            queue.Queue(maxsize=self.prefetch)
            for _ in range(self.num_producers)
        ]
        # Fresh event per iteration: a previous generator's close() set the
        # old one, and a producer started against an already-set event would
        # exit without ever enqueuing (consumer hangs on q.get() forever).
        # Generators still holding the old event keep seeing it set.
        self._stop = stop = threading.Event()
        for k in range(self.num_producers):
            threading.Thread(
                target=self._producer, args=(k, stop, qs[k]), daemon=True
            ).start()
        try:
            step = 0
            while True:
                item = qs[step % self.num_producers].get()
                if isinstance(item, BaseException):
                    raise item
                yield item
                step += 1
        finally:
            stop.set()

    def stop(self):
        self._stop.set()
