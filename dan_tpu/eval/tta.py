"""Image-pyramid + horizontal-flip TTA with on-device bbox-vote fusion
(SURVEY.md §3.2; BASELINE.json config 4).

Reference protocol [K — S3FD]:
  * det0: forward at shrink = min(1, sqrt(max_pixels / (h*w)));
  * flip test: forward the mirrored image, un-mirror boxes;
  * multi-scale test at st in {0.5, 0.75, 1.25, 1.5, 1.75} (+2.0 for small
    images), where st > 1 passes keep only small boxes and st < 1 only
    large ones;
  * all detections fused with bbox-vote.

The reference runs each (image, scale, flip) as a separate variable-shape
sess.run with host numpy post-processing.  TPU-native design: a fixed set
of square resolution BUCKETS, one compiled executable per bucket, each
(image, variant) resized on-device into its bucket (zero-padded), decode +
NMS on device, and the final bbox-vote on device.  Variants are batched
within a bucket, so a dataset pass shards (image, variant) work across
chips (SURVEY.md §2: the reference's only 'long-context' analog).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dan_tpu.box.anchors import generate_anchors_np
from dan_tpu.box.decode import decode_boxes
from dan_tpu.config import DANConfig
from dan_tpu.models.detector import detector_forward
from dan_tpu.ops.nms import greedy_nms
from dan_tpu.ops.postprocess import _on_tpu
from dan_tpu.ops.preprocess import normalize_image


def _batched_nms(boxes_k, scores_k, post_config, interpret=False):
    """Batched greedy NMS over (V, K, 4)/(V, K): the lockstep Pallas kernel
    on TPU, vmapped XLA elsewhere — identical results (parity-tested).

    interpret=True forces the Pallas kernel in interpret mode regardless of
    backend: CPU-mesh coverage of the exact multi-chip eval configuration
    (Pallas-under-shard_map), mirroring the matcher island tests."""
    if post_config.use_pallas_nms and (interpret or _on_tpu()):
        from dan_tpu.ops.nms_batched_pallas import greedy_nms_pallas_batched

        return greedy_nms_pallas_batched(
            boxes_k,
            scores_k,
            post_config.nms_iou_threshold,
            post_config.max_detections,
            interpret=interpret,
        )
    return jax.vmap(
        lambda b, s: greedy_nms(
            b, s, post_config.nms_iou_threshold, post_config.max_detections
        )
    )(boxes_k, scores_k)


@dataclasses.dataclass(frozen=True)
class Variant:
    """One TTA forward pass: resize factor + optional mirror + size gate."""

    scale: float
    flip: bool
    # Post-hoc size gating in ORIGINAL pixels [K — S3FD multi-scale rule]:
    max_size: float = np.inf  # st > 1: keep only small boxes
    min_size: float = 0.0  # st < 1: keep only large boxes


def plan_variants(h: int, w: int, config: DANConfig) -> List[Variant]:
    """The S3FD TTA schedule for an (h, w) image.

    Gating is keyed on the ABSOLUTE capped scale s = min(st*shrink, cap):
    s > 1 (the pass enlarges the original image) keeps only small boxes,
    s < 1 keeps only large ones.  This matches the S3FD released eval
    code's `if bt > 1` test on the absolute factor, NOT the nominal st —
    for a large image (shrink < 1) a nominal st = 1.25 whose absolute
    factor stays below 1 is a shrinking pass and keeps large boxes.  [?]
    verify against the reference's multi_scale_test when the mount appears.

    Every variant's scaled extent is capped to the largest resolution
    bucket — the reference (bucket-free, variable-shape sess.runs) has no
    such cap.  With the 2048 bucket the cap no longer binds for WIDER
    (1024px-wide) images: the largest pass is 2.0 * 1024 = 2048 exactly.
    """
    tta = config.tta
    cap = max(tta.buckets) / float(max(h, w))
    shrink = min(1.0, math.sqrt(tta.max_pixels / float(h * w)), cap)
    variants = [Variant(scale=shrink, flip=False)]
    if tta.enable_flip:
        variants.append(Variant(scale=shrink, flip=True))
    scales = list(tta.scales)
    if shrink >= 0.99 and tta.extra_scale_small_images:
        scales.append(tta.extra_scale_small_images)
    for st in scales:
        s = min(st * shrink, cap)
        # Strictly greater, per the documented `bt > 1` rule: an absolute
        # factor of exactly 1.0 (shrink*st or the cap landing on 1) did not
        # enlarge the image, so it must keep LARGE boxes, not small ones.
        if s > 1.0:
            gate = Variant(
                scale=s, flip=False, max_size=tta.small_box_max_size
            )
        else:
            gate = Variant(scale=s, flip=False, min_size=tta.large_box_min_size)
        variants.append(gate)
    # The bucket cap can collapse several st values onto the same absolute
    # scale (elongated images): identical (scale, flip, gate) variants are
    # redundant full forward passes — keep the first of each.
    seen = set()
    unique = []
    for v in variants:
        if v not in seen:
            seen.add(v)
            unique.append(v)
    return unique


def variant_gate(
    boxes: np.ndarray, v: Variant, measure: str = "sqrt_area"
) -> np.ndarray:
    """Size gate for one variant's detections, in original-image pixels.

    'sqrt_area': keep sqrt(w*h) in [v.min_size, v.max_size] (inclusive).
    'side': the S3FD released-code rule — enlarged passes keep boxes with
    min-side + 1 < max_size (strict), shrunk passes keep max-side + 1 >
    min_size; the +1 is the legacy inclusive-pixel convention.  [?] — see
    TTAConfig.gate_measure.
    """
    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    if measure == "side":
        small_ok = (np.minimum(bw, bh) + 1.0) < v.max_size
        large_ok = (np.maximum(bw, bh) + 1.0) > v.min_size
        return small_ok & large_ok
    size = np.sqrt(np.maximum(bh * bw, 0.0))
    return (size <= v.max_size) & (size >= v.min_size)


def pick_bucket(extent: float, buckets: Sequence[int]) -> int:
    """Smallest bucket holding `extent` (the scaled network input)."""
    for b in sorted(buckets):
        if extent <= b:
            return b
    return max(buckets)


def canvas_bucket(extent: float, buckets: Sequence[int]) -> int:
    """Canvas size for the SOURCE image: must actually fit it, so oversized
    images round up to a /128 multiple beyond the largest bucket."""
    for b in sorted(buckets):
        if extent <= b:
            return b
    return -(-int(extent) // 128) * 128


def max_variants(config: DANConfig) -> int:
    """Static upper bound on len(plan_variants(h, w)) over ALL image sizes:
    det0 + optional flip + one pass per nominal scale + the optional extra
    small-image scale.  Depends only on config, so vote-stage shapes are
    stable across datasets (one compiled executable, warmable)."""
    tta = config.tta
    n = 1 + (1 if tta.enable_flip else 0) + len(tta.scales)
    if tta.extra_scale_small_images:
        n += 1
    return n


def plan_variant_buckets(h: int, w: int, config: DANConfig):
    """ONE definition of the executable-selection rule: for an (h, w)
    image, yield (variant, scale_bucket, canvas_bucket) per TTA variant.
    detect_tta, run_dataset, and warmup all group work by these pairs —
    they must stay bit-identical or warmup primes the wrong executables
    and run_dataset re-pays the serial compile penalty silently."""
    canvas = canvas_bucket(max(h, w), config.tta.buckets)
    for v in plan_variants(h, w, config):
        yield v, pick_bucket(max(h, w) * v.scale, config.tta.buckets), canvas


class TTARunner:
    """Compiled-per-bucket TTA executor over a fixed parameter set."""

    # Measured defaults (r4 dataset-scale sweep, BASELINE.md): tta_batch
    # 4->16 cuts bucket launches 535->148 (+39-73% img/s; 16->32 is
    # bucket-bound), vote_batch 128 is +17-34% vs 32.  ONE source of
    # truth — the eval CLI and the Detector API read these.
    DEFAULT_VOTE_BATCH = 128  # images per batched vote launch
    DEFAULT_TTA_BATCH = 16  # (image, variant) units per chip per launch

    def __init__(
        self,
        params,
        config: Optional[DANConfig] = None,
        pallas_interpret: bool = False,
        pixel_budget: Optional[int] = None,
    ):
        """pallas_interpret=True forces every Pallas kernel (batched NMS,
        batched vote) in interpret mode regardless of backend — CPU-mesh
        coverage of the exact multi-chip eval configuration.
        pixel_budget: per-device activation-pixel cap for one bucket
        launch (default DEFAULT_PIXEL_BUDGET — sized for a 16 GB v5e)."""
        self.config = config or DANConfig()
        self.params = params
        self._pallas_interpret = pallas_interpret
        self.pixel_budget = pixel_budget
        self._bucket_fns: Dict[int, callable] = {}
        self._vote_fns: Dict[Optional[int], callable] = {}
        # Filled by run_dataset: {'images', 'variants', 'bucket_launches',
        # 'vote_launches'} — the launch-count arithmetic the r3/r4 batching
        # rows reason about, made observable at dataset scale (VERDICT r4
        # item 5 asks the full-val soak to record it).
        self.last_run_stats: Dict[str, int] = {}

    # -- compiled stages -----------------------------------------------------

    def _get_bucket_fn(self, bucket: int, mesh=None):
        """(canvas, src_h, src_w, scale, flip) batch -> per-variant dets.

        With a mesh, the batch dim is sharded over ('data',) so variants of
        many images run data-parallel across chips (config 5 [B]).
        """
        key = (bucket, id(mesh) if mesh is not None else None)
        if key in self._bucket_fns:
            return self._bucket_fns[key]
        cfg = self.config
        anchors = jnp.asarray(generate_anchors_np(cfg.anchors, bucket, bucket))

        def prep(params, canvas_u8, src_h, src_w, scale, flip):
            """Per-variant forward + decode + filter + top-k (vmapped);
            greedy NMS runs afterwards as ONE batched kernel so the serial
            loops of all variants execute in lockstep."""
            c = canvas_u8.shape[1]
            img = canvas_u8.astype(jnp.float32)
            img_f = img[:, ::-1, :]
            img_in = jnp.where(flip, img_f, img)
            x_off = jnp.where(flip, c - src_w, 0.0)
            out_h = src_h * scale
            out_w = src_w * scale
            from dan_tpu.ops.preprocess import bilinear_resample

            resized = bilinear_resample(
                img_in,
                bucket,
                bucket,
                scale,
                scale,
                0.0,
                x_off,
                region=(0.0, src_h, x_off, x_off + src_w),
                semantics=cfg.preprocess.resize_semantics,
            )
            net_in = normalize_image(resized, cfg.preprocess)
            cls_logits, loc_preds = detector_forward(
                params, net_in[None], cfg.model, for_inference=True
            )
            scores = jax.nn.softmax(cls_logits[0], axis=-1)[:, 1]
            boxes = decode_boxes(
                loc_preds[0], anchors, cfg.anchors.prior_scaling, out_h, out_w
            )
            from dan_tpu.ops.postprocess import filter_and_topk

            boxes_k, scores_k = filter_and_topk(
                boxes, scores, cfg.postprocess
            )
            return boxes_k, scores_k, out_w

        def vmapped(params, canvas_u8, src_h, src_w, scale, flip):
            boxes_k, scores_k, out_w = jax.vmap(
                prep, in_axes=(None, 0, 0, 0, 0, 0)
            )(params, canvas_u8, src_h, src_w, scale, flip)
            res = _batched_nms(
                boxes_k, scores_k, cfg.postprocess,
                interpret=self._pallas_interpret,
            )
            # Un-mirror, then map back to original pixels.
            flip_c = flip[:, None]
            ow = out_w[:, None]
            x1 = jnp.where(flip_c, ow - res.boxes[..., 2], res.boxes[..., 0])
            x2 = jnp.where(flip_c, ow - res.boxes[..., 0], res.boxes[..., 2])
            out_boxes = (
                jnp.stack([x1, res.boxes[..., 1], x2, res.boxes[..., 3]], -1)
                / scale[:, None, None]
            )
            return out_boxes, res.scores, res.valid
        if mesh is not None:
            # shard_map (not pjit auto-sharding): the batched Pallas NMS has
            # no SPMD partitioning rule, so each chip must run the kernel on
            # its local (batch/n_chips) shard explicitly.
            from jax.sharding import PartitionSpec as P

            data = self.config.mesh.data_axis
            fn = jax.jit(
                jax.shard_map(
                    vmapped,
                    mesh=mesh,
                    in_specs=(P(), P(data), P(data), P(data), P(data), P(data)),
                    out_specs=P(data),
                    check_vma=False,
                )
            )
        else:
            fn = jax.jit(vmapped)
        self._bucket_fns[key] = fn
        return fn

    def warmup(
        self,
        sizes,
        mesh=None,
        batch_per_device: int = DEFAULT_TTA_BATCH,
        threads: int = 8,
        vote_batch: int = DEFAULT_VOTE_BATCH,
    ) -> int:
        """Concurrently compile/load every (scale-bucket, canvas-bucket)
        executable the given image sizes will need, so run_dataset starts
        at full speed.

        Compilation (or a persistent-cache load) of each distinct bucket
        graph costs a ~20-40 s remote roundtrip on the axon tunnel and
        run_dataset triggers them serially on first flush — WIDER's ~16
        graphs cost ~8 min/process.  Threads release the GIL inside XLA
        compile/deserialize, so warming them concurrently overlaps the
        roundtrips.  Each warm call runs one tiny dummy launch through the
        REAL jit fn (priming the in-process executable cache — a bare
        lower().compile() would leave the first real call re-loading from
        the disk cache over the tunnel again).

        Args:
          sizes: iterable of (h, w) image sizes (e.g. from JPEG headers).
          mesh/batch_per_device: must match the run_dataset call.
          threads: concurrent warm calls.
        Returns the number of distinct executables warmed.
        """
        pairs = set()
        for h, w in sizes:
            for _, bucket, canvas in plan_variant_buckets(h, w, self.config):
                pairs.add((bucket, canvas))
        if not pairs:
            return 0
        n_dev = len(mesh.devices.flat) if mesh is not None else 1
        # Build the jit wrappers serially (cheap, and keeps the fn-cache
        # dict single-writer); only the calls below compile.
        fns = {b: self._get_bucket_fn(b, mesh) for b, _ in pairs}

        def warm(pair):
            bucket, canvas_size = pair
            chunk = self.bucket_chunk(bucket, n_dev, batch_per_device)
            fns[bucket](
                self.params,
                jnp.zeros((chunk, canvas_size, canvas_size, 3), jnp.uint8),
                jnp.full((chunk,), float(canvas_size), jnp.float32),
                jnp.full((chunk,), float(canvas_size), jnp.float32),
                jnp.ones((chunk,), jnp.float32),
                jnp.zeros((chunk,), bool),
            )

        def warm_vote():
            # Prime the batched vote executable too (same shape rule as
            # run_dataset's tail): before round 3 the first vote launch of
            # each shape class paid the serial remote compile warmup was
            # built to eliminate (VERDICT r2 missing #3).
            r = self.vote_rows()
            vchunk = self._vote_chunk(n_dev, vote_batch)
            self._get_vote_batch_fn(mesh)(
                jnp.zeros((vchunk, r, 4), jnp.float32),
                jnp.zeros((vchunk, r), jnp.float32),
                jnp.zeros((vchunk, r), bool),
            )

        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=max(1, threads)) as ex:
            futs = [ex.submit(warm, p) for p in sorted(pairs)]
            futs.append(ex.submit(warm_vote))
            for f in futs:
                f.result()
        return len(pairs) + 1

    # Per-DEVICE activation-pixel budget for one bucket launch.  Network
    # activations/anchors scale ~linearly with bucket² x local batch, and
    # the measured ceiling on a 16 GB v5e is between 2048²x8 (fits) and
    # 2048²x16 (compile OOM: 16.02 GB > 15.75 — caught by the r4
    # dataset-scale sweep; the 20-image fixture never planned a 2048
    # bucket, so fixture-scale runs could not trip it).  32M px/device
    # = 2048²x8 = 640²x80.
    DEFAULT_PIXEL_BUDGET = 32 << 20

    def bucket_chunk(
        self, bucket: int, n_dev: int, batch_per_device: int
    ) -> int:
        """(image, variant) units per launch for this resolution bucket:
        n_dev * batch_per_device, capped so per-device activation pixels
        (bucket² x local batch) stay under the HBM budget.  ONE rule
        shared by warmup and run_dataset (they must agree on shapes)."""
        budget = getattr(self, "pixel_budget", None) or self.DEFAULT_PIXEL_BUDGET
        cap_per_dev = max(1, budget // (bucket * bucket))
        return n_dev * max(1, min(batch_per_device, cap_per_dev))

    def vote_rows(self) -> int:
        """Fixed per-image row count for the batched vote stage:
        max_variants * max_detections.  Static from config, so every vote
        launch (detect_tta at B=1, run_dataset at B=vote chunk) shares one
        executable shape per batch size — warmable up front."""
        return max_variants(self.config) * self.config.postprocess.max_detections

    def _vote_chunk(self, n_dev: int, vote_batch: int) -> int:
        """Images per vote launch, padded up to a multiple of the device
        count (shard_map needs an even split).  ONE rule shared by warmup
        and run_dataset — they must agree or warmup primes the wrong
        shape."""
        return -(-max(vote_batch, 1) // n_dev) * n_dev

    def _get_vote_batch_fn(self, mesh=None):
        """Batched bbox-vote: (B, R, 4)/(B, R)/(B, R) -> VoteResult with
        (B, max_det, ...) leaves.  The lockstep Pallas kernel on TPU (all
        rows' greedy loops in lockstep), vmapped XLA elsewhere; under a
        mesh, a shard_map island over ('data',) like the bucket fns
        (config 5 [B]: the vote stage is data-parallel too)."""
        key = id(mesh) if mesh is not None else None
        if key in self._vote_fns:
            return self._vote_fns[key]
        cfg = self.config
        interp = self._pallas_interpret
        if cfg.postprocess.use_pallas_nms and (interp or _on_tpu()):
            from dan_tpu.ops.bbox_vote_pallas import bbox_vote_pallas_batched

            vote = lambda b, s, v: bbox_vote_pallas_batched(  # noqa: E731
                b,
                s,
                v,
                cfg.postprocess.vote_iou_threshold,
                cfg.postprocess.max_detections,
                interpret=interp,
            )
        else:
            from dan_tpu.ops.bbox_vote import bbox_vote_batched

            vote = lambda b, s, v: bbox_vote_batched(  # noqa: E731
                b,
                s,
                v,
                cfg.postprocess.vote_iou_threshold,
                cfg.postprocess.max_detections,
            )
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            data = self.config.mesh.data_axis
            fn = jax.jit(
                jax.shard_map(
                    vote,
                    mesh=mesh,
                    in_specs=(P(data), P(data), P(data)),
                    out_specs=P(data),
                    check_vma=False,
                )
            )
        else:
            fn = jax.jit(vote)
        self._vote_fns[key] = fn
        return fn

    # -- single image ----------------------------------------------------------

    def detect_tta(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """Full TTA on one (H, W, 3) uint8 RGB image -> detection dict."""
        boxes, scores, valid = self.collect_variant_dets(image)
        boxes_b, scores_b, valid_b = self._pack_vote_rows(
            [(boxes, scores, valid)]
        )
        vote = self._get_vote_batch_fn()(
            jnp.asarray(boxes_b), jnp.asarray(scores_b), jnp.asarray(valid_b)
        )
        keep = np.asarray(vote.valid[0])
        return {
            "bboxes": np.asarray(vote.boxes[0])[keep],
            "scores": np.asarray(vote.scores[0])[keep],
        }

    def collect_variant_dets(self, image: np.ndarray):
        """All TTA variants' post-NMS post-gate detections for one image,
        concatenated: (N, 4) boxes, (N,) scores, (N,) valid — the pre-vote
        stage of detect_tta, exposed so golden/drift tests can pin the
        vote input independently of the vote itself."""
        image = np.asarray(image)
        if image.dtype != np.uint8:
            image = np.clip(image, 0, 255).astype(np.uint8)
        h, w = image.shape[:2]
        all_boxes, all_scores, all_valid = [], [], []
        # Group variants by bucket for batched execution (shared rule:
        # plan_variant_buckets).
        groups: Dict[Tuple[int, int], List[Variant]] = {}
        for v, bucket, canvas in plan_variant_buckets(h, w, self.config):
            groups.setdefault((bucket, canvas), []).append(v)
        # One canvas + ONE H2D for the whole image: canvas_bucket depends
        # only on (h, w), so every bucket group shares the same canvas
        # (replicating on device is free; re-uploading per group is not —
        # H2D rides the ~12 MB/s axon tunnel here).
        canvas_size = canvas_bucket(max(h, w), self.config.tta.buckets)
        canvas = np.zeros((canvas_size, canvas_size, 3), np.uint8)
        canvas[:h, :w] = image
        canvas_dev = jax.device_put(canvas)
        for (bucket, _), vs in groups.items():
            fn = self._get_bucket_fn(bucket)
            n = len(vs)
            boxes, scores, valid = fn(
                self.params,
                jnp.broadcast_to(canvas_dev, (n, *canvas.shape)),
                jnp.full((n,), h, jnp.float32),
                jnp.full((n,), w, jnp.float32),
                jnp.asarray([v.scale for v in vs], jnp.float32),
                jnp.asarray([v.flip for v in vs]),
            )
            boxes = np.asarray(boxes)
            scores = np.asarray(scores)
            valid = np.asarray(valid)
            for i, v in enumerate(vs):
                gate = variant_gate(boxes[i], v, self.config.tta.gate_measure)
                all_boxes.append(boxes[i])
                all_scores.append(scores[i])
                all_valid.append(valid[i] & gate)
        return (
            np.concatenate(all_boxes),
            np.concatenate(all_scores),
            np.concatenate(all_valid),
        )

    def _pack_vote_rows(self, images_dets):
        """Pack per-image (boxes, scores, valid) host arrays into fixed
        (B, R) vote inputs.  Invalid rows are dropped before upload (they
        are never active in the vote, and relative order of the valid rows
        — the tie-break key — is preserved, so results are bit-identical)
        and the rest is zero-padded to R = vote_rows().  Compaction cuts
        H2D bytes ~5-10x: NMS survivor counts are usually far below
        max_detections."""
        r = self.vote_rows()
        b = len(images_dets)
        boxes_b = np.zeros((b, r, 4), np.float32)
        scores_b = np.zeros((b, r), np.float32)
        valid_b = np.zeros((b, r), bool)
        for i, (bx, sc, va) in enumerate(images_dets):
            sel = np.asarray(va, bool)
            nb = np.asarray(bx, np.float32)[sel]
            ns = np.asarray(sc, np.float32)[sel]
            k = len(ns)
            boxes_b[i, :k] = nb
            scores_b[i, :k] = ns
            valid_b[i, :k] = True
        return boxes_b, scores_b, valid_b

    # -- dataset scale (config 5: batched data-parallel over the mesh) -------

    def run_dataset(
        self,
        items,
        mesh=None,
        batch_per_device: int = DEFAULT_TTA_BATCH,
        progress_every: int = 0,
        vote_batch: int = DEFAULT_VOTE_BATCH,
        max_pending: int = 32,
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Full-dataset TTA, (image, variant) units sharded across chips.

        Args:
          items: iterable of (key, image_uint8) — e.g. WIDER rel-path stems.
          mesh: jax Mesh; None -> single default device.
          batch_per_device: variants per chip per launch.
          vote_batch: images per batched vote launch (padded up to a
            multiple of the device count under a mesh).
          max_pending: bucket launches kept un-fetched before the oldest is
            drained — the host/HBM memory vs dispatch-depth trade (32 keeps
            the device queue ~500 variants deep while bounding host RSS;
            see the r5 soak rows in BASELINE.md).
        Returns {key: {'bboxes': (N, 4), 'scores': (N,)}}.

        TPU mapping of the reference's serial 3226-image x ~7-sess.run eval
        loop (SURVEY.md §3.2): units are grouped by (bucket, canvas)
        resolution so each group runs one compiled executable, batched to
        n_chips * batch_per_device and sharded over the ('data',) mesh.
        """
        n_dev = len(mesh.devices.flat) if mesh is not None else 1

        # unit: (key, variant, h, w, device-resident canvas).
        # Each image's canvas is device_put ONCE (async) and shared by all
        # of its TTA variants; launches stack the device-resident arrays.
        # On this box H2D rides the axon tunnel at ~12 MB/s, so shipping
        # the padded canvas per VARIANT (as a host-side np.stack would)
        # made eval transfer-bound — ~7x the necessary bytes.  On a real
        # PCIe host this is still strictly fewer copies.
        groups: Dict[Tuple[int, int], list] = {}
        per_key: Dict[str, list] = {}
        pending: list = []  # (part, boxes_dev, scores_dev, valid_dev)
        n_images = 0
        n_variants = 0
        n_bucket_launches = 0

        def drain_oldest():
            # Fetch the OLDEST queued launch (FIFO device queue: it has
            # long since executed once max_pending launches sit ahead of
            # it, so this costs one ~30-60 ms tunnel roundtrip, overlapped
            # with the decode prefetch thread).  Draining incrementally —
            # instead of deferring every fetch to the end — is what bounds
            # host memory: the r5 full-val soak measured ~5-6 MB/image of
            # LINEAR host-RSS growth (23.1 GB peak over 3,226 images) with
            # the defer-everything design, because the client releases the
            # host-side shadows of device_put canvases only as the queue
            # drains; it also spreads the ~50 ms/launch fetch cost that a
            # single end-of-run loop paid serially (BASELINE.md r5 soak
            # rows).
            part, boxes, scores, valid = pending.pop(0)
            boxes = np.asarray(boxes)
            scores = np.asarray(scores)
            valid = np.asarray(valid)
            for i, (key, v) in enumerate(part):
                gate = variant_gate(boxes[i], v, self.config.tta.gate_measure)
                per_key[key].append((boxes[i], scores[i], valid[i] & gate))

        def flush(group_key):
            bucket, canvas_size = group_key
            units = groups.pop(group_key, [])
            if not units:
                return
            fn = self._get_bucket_fn(bucket, mesh)
            # Large buckets take smaller launches (HBM pixel budget) —
            # same rule as warmup.
            chunk = self.bucket_chunk(bucket, n_dev, batch_per_device)
            for start in range(0, len(units), chunk):
                part = units[start : start + chunk]
                n = len(part)
                pad = chunk - n
                canv = jnp.stack(
                    [u[4] for u in part] + [part[0][4]] * pad
                )  # device-side stack: no duplicated H2D
                hs = np.asarray([u[2] for u in part] + [part[0][2]] * pad, np.float32)
                ws = np.asarray([u[3] for u in part] + [part[0][3]] * pad, np.float32)
                scales = np.asarray(
                    [u[1].scale for u in part] + [1.0] * pad, np.float32
                )
                flips = np.asarray([u[1].flip for u in part] + [False] * pad)
                boxes, scores, valid = fn(
                    self.params,
                    canv,
                    jnp.asarray(hs),
                    jnp.asarray(ws),
                    jnp.asarray(scales),
                    jnp.asarray(flips),
                )
                # Defer the D2H fetch a BOUNDED distance: keep device refs
                # so launches queue back-to-back (results are ~250 KB per
                # launch, cheap to hold on device), but drain the oldest
                # once max_pending launches are queued — see drain_oldest.
                # Keep only (key, variant) per unit — retaining the full
                # unit tuples would pin every image's device-resident
                # canvas in HBM for the whole run (~16 GB over WIDER val).
                nonlocal n_bucket_launches
                n_bucket_launches += 1
                pending.append(
                    ([(u[0], u[1]) for u in part], boxes, scores, valid)
                )
                while len(pending) > max_pending:
                    drain_oldest()

        for key, image in items:
            image = np.asarray(image)
            if image.dtype != np.uint8:
                image = np.clip(image, 0, 255).astype(np.uint8)
            h, w = image.shape[:2]
            per_key.setdefault(key, [])
            plan = list(plan_variant_buckets(h, w, self.config))
            canvas_size = plan[0][2] if plan else canvas_bucket(
                max(h, w), self.config.tta.buckets
            )
            canvas = np.zeros((canvas_size, canvas_size, 3), np.uint8)
            canvas[:h, :w] = image
            canvas_dev = jax.device_put(canvas)  # async; one H2D per image
            for v, bucket, _ in plan:
                n_variants += 1
                gk = (bucket, canvas_size)
                groups.setdefault(gk, []).append((key, v, h, w, canvas_dev))
                if len(groups[gk]) >= self.bucket_chunk(
                    bucket, n_dev, batch_per_device
                ):
                    flush(gk)
            n_images += 1
            if progress_every and n_images % progress_every == 0:
                import resource
                import sys

                rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
                print(
                    f"[tta] {n_images} images planned (peak rss {rss} MB)",
                    file=sys.stderr,
                )

        for gk in list(groups):
            flush(gk)

        while pending:
            drain_oldest()

        # Per-image fusion: BATCHED device bbox-vote.  The round-2 tail ran
        # one jit call + blocking fetches PER IMAGE (3,226 serial ~100 ms
        # dispatches on the axon tunnel for WIDER val); now images are
        # packed into fixed (vote_chunk, R) launches — one executable, one
        # H2D per chunk, fetches deferred until every launch is queued.
        results: Dict[str, Dict[str, np.ndarray]] = {}
        vote_fn = self._get_vote_batch_fn(mesh)
        vchunk = self._vote_chunk(n_dev, vote_batch)
        keys = list(per_key)
        vote_pending = []  # (keys_part, VoteResult device refs)
        for start in range(0, len(keys), vchunk):
            ks = keys[start : start + vchunk]
            packed = [
                (
                    np.concatenate([d[0] for d in per_key[k]]),
                    np.concatenate([d[1] for d in per_key[k]]),
                    np.concatenate([d[2] for d in per_key[k]]),
                )
                for k in ks
            ]
            # Pad the final partial chunk with empty images (all-invalid
            # rows vote to nothing) so every launch shares one shape.
            packed += [
                (np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, bool))
            ] * (vchunk - len(ks))
            boxes_b, scores_b, valid_b = self._pack_vote_rows(packed)
            vote = vote_fn(
                jnp.asarray(boxes_b), jnp.asarray(scores_b), jnp.asarray(valid_b)
            )
            vote_pending.append((ks, vote))
        for ks, vote in vote_pending:
            vb = np.asarray(vote.boxes)
            vs = np.asarray(vote.scores)
            vv = np.asarray(vote.valid)
            for i, k in enumerate(ks):
                keep = vv[i]
                results[k] = {"bboxes": vb[i][keep], "scores": vs[i][keep]}
        # One count per bucket/vote launch — exactly the dispatch counts
        # the tta_batch/vote_batch sweeps trade against.
        self.last_run_stats = {
            "images": n_images,
            "variants": n_variants,
            "bucket_launches": n_bucket_launches,
            "vote_launches": len(vote_pending),
        }
        return results
