"""Public detector API — the reference's single-image demo surface
(SURVEY.md §3.3 / BASELINE.json config 1): load a checkpoint, forward one
image, decode + score-filter + NMS, return a detection dict.

Unlike the reference (host-side numpy decode/NMS), the whole
image -> detections path is ONE jitted function per canvas bucket: device-
side squash-resize, normalization, VGG+LFPN+heads forward, decode, top-k,
greedy NMS.  Only the final (<= max_detections) boxes return to host.

    det = Detector.from_checkpoint("/path/to/ckpt")   # orbax or TF1 ckpt
    out = det.detect(image_rgb_uint8)                  # (H, W, 3) any size
    out["bboxes"], out["scores"]                       # original-pixel coords
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dan_tpu.box.anchors import generate_anchors
from dan_tpu.config import DANConfig, default_config
from dan_tpu.models.detector import detector_forward, init_detector_params
from dan_tpu.ops.postprocess import postprocess_one
from dan_tpu.ops.squash import eval_preprocess


class Detector:
    """Checkpoint-loadable single-shot face detector [B]."""

    def __init__(self, params, config: Optional[DANConfig] = None):
        self.config = config or default_config()
        self.params = params
        self._detect_fns: Dict[int, callable] = {}
        # int8 PTQ state (dan_tpu/quant.py): when set by quantize_int8(),
        # detect()/detect_batch()/warmup() run the int8-body graph.
        self._quant = None

    # -- construction --------------------------------------------------------

    @classmethod
    def from_random(cls, key=None, config: Optional[DANConfig] = None) -> "Detector":
        config = config or default_config()
        key = key if key is not None else jax.random.PRNGKey(0)
        return cls(init_detector_params(key, config.model), config)

    @classmethod
    def from_checkpoint(
        cls, path: str, config: Optional[DANConfig] = None
    ) -> "Detector":
        """Load from an orbax checkpoint dir or a TF1 .ckpt prefix."""
        config = config or default_config()
        if _looks_like_tf_ckpt(path):
            from dan_tpu.ckpt.tf_import import load_tf_checkpoint

            params = load_tf_checkpoint(path, config.model)
        else:
            from dan_tpu.ckpt.orbax_io import restore_params

            params = restore_params(path, config)
        return cls(params, config)

    # -- inference -----------------------------------------------------------

    def _detect_one_fn(self):
        """The shared per-image detect graph: canvas + true extent ->
        detection dict in original pixels.  jit'd directly for detect(),
        vmapped for detect_batch() — one definition, no drift.  Runs the
        int8-body forward when quantize_int8() has been called."""
        cfg = self.config
        size = cfg.model.image_size
        anchors = generate_anchors(cfg.anchors, size, size)
        quantized = self._quant is not None

        def one(params, canvas_u8, src_h, src_w):
            img = eval_preprocess(canvas_u8, src_h, src_w, size, cfg.preprocess)
            if quantized:
                from dan_tpu.quant import quantized_detector_forward

                cls_logits, loc_preds = quantized_detector_forward(
                    params, img[None], cfg.model
                )
            else:
                cls_logits, loc_preds = detector_forward(
                    params, img[None], cfg.model, for_inference=True
                )
            det = postprocess_one(
                cls_logits[0],
                loc_preds[0],
                anchors,
                cfg.anchors,
                cfg.postprocess,
                float(size),
                float(size),
            )
            # Map back to original pixels (inverse of the squash resize).
            sx = src_w / size
            sy = src_h / size
            det["bboxes"] = det["bboxes"] * jnp.stack([sx, sy, sx, sy])
            return det

        return one

    def _get_detect_fn(self, canvas_size: int):
        """One compiled executable per canvas bucket (fixed shapes)."""
        if canvas_size in self._detect_fns:
            return self._detect_fns[canvas_size]
        fn = jax.jit(self._detect_one_fn())
        self._detect_fns[canvas_size] = fn
        return fn

    def _get_detect_batch_fn(self, batch: int, canvas_size: int):
        """Batched (vmapped) variant for serving throughput."""
        key = ("batch", batch, canvas_size)
        if key in self._detect_fns:
            return self._detect_fns[key]
        fn = jax.jit(jax.vmap(self._detect_one_fn(), in_axes=(None, 0, 0, 0)))
        self._detect_fns[key] = fn
        return fn

    @property
    def _fwd_params(self):
        """The pytree the compiled detect fns consume: the int8 qparams
        after quantize_int8(), else the raw f32 params."""
        return self._quant if self._quant is not None else self.params

    def quantize_int8(self, calib_images, batch_size: int = 8):
        """Post-training-quantize the detect path to an int8 body
        (dan_tpu/quant.py): measured 1.49x the bf16 detect throughput at
        batch 128 on v5e (670.3 vs 451.3 img/s/chip — BASELINE.md r5).

        calib_images: iterable of (H, W, 3) uint8/float RGB images — a
        representative sample of the deployment distribution (8-64 images
        is typical for absmax PTQ).  Each is pushed through the SAME
        eval-preprocess the detect graph uses, so the collected activation
        ranges match serving exactly.  Returns the activation scales.

        detect()/detect_batch()/warmup() run the quantized graph from the
        next call on; the TTA path stays bf16 (accuracy mode) and
        detect_tta() warns once if called on a quantized detector.  Call
        again to re-calibrate; call dequantize() to drop back to bf16.
        The quantized graphs are NEW executables: any detect fns
        pre-compiled via warmup() are discarded, so re-run warmup() after
        quantizing to avoid a first-request compile per canvas bucket.
        A deployment should re-validate its AP after quantizing
        (tests validate logits closeness + integer-math exactness;
        scripts/smoke_e2e.py --int8 validates synthetic AP on TPU —
        measured rows in BASELINE.md).
        """
        import jax as _jax

        from dan_tpu.quant import (
            calibrate_act_scales,
            quantize_detector_params,
        )

        size = self.config.model.image_size
        dt = jnp.dtype(self.config.model.compute_dtype)
        imgs = [self._check_image(im) for im in calib_images]
        if not imgs:
            raise ValueError("quantize_int8 needs at least one calib image")
        c = self._canvas_for(
            max(im.shape[0] for im in imgs), max(im.shape[1] for im in imgs)
        )
        prep = _jax.jit(
            _jax.vmap(
                lambda cv, h, w: eval_preprocess(
                    cv, h, w, size, self.config.preprocess
                )
            )
        )

        def batches():
            for i in range(0, len(imgs), batch_size):
                chunk = imgs[i : i + batch_size]
                # Pad short tails by repeating the last image: one fixed
                # batch shape = one compiled graph (absmax is unaffected
                # by duplicates).
                chunk = chunk + [chunk[-1]] * (batch_size - len(chunk))
                canvases = np.zeros((batch_size, c, c, 3), np.uint8)
                hs = np.zeros((batch_size,), np.float32)
                ws = np.zeros((batch_size,), np.float32)
                for j, im in enumerate(chunk):
                    h, w = im.shape[:2]
                    canvases[j, :h, :w] = im
                    hs[j], ws[j] = h, w
                yield prep(
                    jnp.asarray(canvases), jnp.asarray(hs), jnp.asarray(ws)
                ).astype(dt)

        scales = calibrate_act_scales(
            self.params, batches(), self.config.model
        )
        self._quant = quantize_detector_params(
            self.params, self.config.model, scales
        )
        self._detect_fns.clear()
        self._tta_quant_warned = False
        return scales

    def dequantize(self) -> None:
        """Drop back to the bf16/f32 detect path after quantize_int8().

        Clears BOTH the qparams and the compiled detect fns — the cached
        closures were compiled against the int8 pytree, so feeding them
        the raw f32 params would crash (KeyError 'act').  As with
        quantize_int8(), re-run warmup() afterwards if first-request
        compile latency matters."""
        self._quant = None
        self._detect_fns.clear()

    @staticmethod
    def _check_image(image) -> np.ndarray:
        image = np.asarray(image)
        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) RGB image, got {image.shape}")
        if image.dtype != np.uint8:
            if np.issubdtype(image.dtype, np.floating):
                # Accept both float conventions: [0, 1]-normalized (the
                # common float-image format — truncating it to uint8 would
                # silently black the image out) and [0, 255].
                if image.size and float(np.nanmax(image)) <= 1.0 + 1e-6:
                    image = image * 255.0
                image = np.rint(image)
            image = np.clip(image, 0, 255).astype(np.uint8)
        return image

    @staticmethod
    def _batch_bucket(n: int) -> int:
        """Round batch size up to a power of two so ragged serving batches
        reuse a handful of compiled executables instead of one per exact
        length (each fresh compile is minutes on this setup)."""
        b = 1
        while b < n:
            b *= 2
        return b

    def detect_batch(self, images, score_threshold: Optional[float] = None) -> list:
        """Batched detection for serving: list of (H, W, 3) images -> list
        of detection dicts.  Images share the smallest canvas bucket that
        fits the largest of them; the batch dim is padded up to a power of
        two so one executable serves each (bucket, batch-bucket) pair."""
        images = [self._check_image(im) for im in images]
        if not images:
            return []
        c = self._canvas_for(
            max(im.shape[0] for im in images), max(im.shape[1] for im in images)
        )
        n = len(images)
        nb = self._batch_bucket(n)
        canvases = np.zeros((nb, c, c, 3), np.uint8)
        hs = np.ones((nb,), np.float32)
        ws = np.ones((nb,), np.float32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            canvases[i, :h, :w] = im
            hs[i], ws[i] = h, w
        fn = self._get_detect_batch_fn(nb, c)
        det = fn(self._fwd_params, jnp.asarray(canvases), jnp.asarray(hs), jnp.asarray(ws))
        bboxes = np.asarray(det["bboxes"])
        scores = np.asarray(det["scores"])
        valid = np.asarray(det["valid"])
        out = []
        for i in range(n):
            keep = valid[i]
            if score_threshold is not None:
                keep = keep & (scores[i] >= score_threshold)
            out.append({"bboxes": bboxes[i][keep], "scores": scores[i][keep]})
        return out

    def warmup(self, buckets=None) -> None:
        """Pre-compile (or load from the persistent cache) the detect
        executables for the given canvas buckets — call once at serving
        startup so the first request per resolution isn't a multi-minute
        compile."""
        for c in buckets or self.config.tta.buckets:
            fn = self._get_detect_fn(c)
            fn(
                self._fwd_params,
                jnp.zeros((c, c, 3), jnp.uint8),
                jnp.float32(c),
                jnp.float32(c),
            )

    def _canvas_for(self, h: int, w: int) -> int:
        m = max(h, w)
        for b in self.config.tta.buckets:
            if m <= b:
                return b
        return -(-m // 128) * 128  # round up to 128 for outsized inputs

    def detect(
        self, image: np.ndarray, score_threshold: Optional[float] = None
    ) -> Dict[str, np.ndarray]:
        """Detect faces in an (H, W, 3) uint8/float RGB image.

        Returns {'bboxes': (N, 4) float32 corner boxes in input pixels,
        'scores': (N,) float32}, N <= config.postprocess.max_detections,
        sorted by descending score (reference detection-dict contract [B]).
        """
        image = self._check_image(image)
        h, w = image.shape[:2]
        c = self._canvas_for(h, w)
        canvas = np.zeros((c, c, 3), np.uint8)
        canvas[:h, :w] = image
        fn = self._get_detect_fn(c)
        det = fn(
            self._fwd_params,
            jnp.asarray(canvas),
            jnp.float32(h),
            jnp.float32(w),
        )
        valid = np.asarray(det["valid"])
        out = {
            "bboxes": np.asarray(det["bboxes"])[valid],
            "scores": np.asarray(det["scores"])[valid],
        }
        if score_threshold is not None:
            keep = out["scores"] >= score_threshold
            out = {k: v[keep] for k, v in out.items()}
        return out

    def _get_tta_runner(self):
        runner = getattr(self, "_tta_runner", None)
        if runner is None:
            from dan_tpu.eval.tta import TTARunner

            runner = TTARunner(self.params, self.config)
            self._tta_runner = runner
        return runner

    def _warn_tta_quant(self) -> None:
        """One-time warning when a quantized detector runs the (bf16) TTA
        path, so the int8/bf16 mode split never surprises a user."""
        if self._quant is not None and not getattr(
            self, "_tta_quant_warned", False
        ):
            import warnings

            warnings.warn(
                "Detector is int8-quantized but the TTA path always runs "
                "bf16 (accuracy mode); detect()/detect_batch() remain int8."
            )
            self._tta_quant_warned = True

    def warmup_tta(
        self,
        sizes,
        mesh=None,
        tta_batch: Optional[int] = None,
        vote_batch: Optional[int] = None,
        threads: int = 8,
    ) -> int:
        """Pre-compile every TTA executable the given (h, w) image sizes
        will need — the serving-startup analog of warmup() for the TTA
        path, threading through to eval.tta.TTARunner.warmup with the same
        knobs the eval CLI exposes (--tta_batch / --vote_batch; None =
        TTARunner's measured defaults).  Returns the number of executables
        warmed."""
        from dan_tpu.eval.tta import TTARunner

        runner = self._get_tta_runner()
        return runner.warmup(
            sizes,
            mesh=mesh,
            batch_per_device=(
                tta_batch if tta_batch is not None
                else TTARunner.DEFAULT_TTA_BATCH
            ),
            threads=threads,
            vote_batch=(
                vote_batch if vote_batch is not None
                else TTARunner.DEFAULT_VOTE_BATCH
            ),
        )

    def detect_tta(
        self, image: np.ndarray, score_threshold: Optional[float] = None
    ) -> Dict[str, np.ndarray]:
        """Full pyramid+flip TTA with bbox-vote fusion on one image — the
        reference's accuracy-mode eval path (config 4 [B]), same detection
        dict as detect().  The TTARunner (compiled per resolution bucket)
        is cached on the Detector, so repeated calls reuse executables;
        for dataset-scale work use detect_tta_dataset / warmup_tta.

        TTA always runs the bf16 graph: it is the accuracy-mode protocol,
        and int8 would trade away exactly what TTA buys.  If the detector
        has been quantized via quantize_int8(), a one-time warning makes
        the mode mismatch explicit (detect()/detect_batch() are int8,
        detect_tta* are not)."""
        self._warn_tta_quant()
        runner = self._get_tta_runner()
        out = runner.detect_tta(self._check_image(image))
        if score_threshold is not None:
            keep = out["scores"] >= score_threshold
            out = {k: v[keep] for k, v in out.items()}
        return out

    def detect_tta_dataset(
        self,
        items,
        mesh=None,
        tta_batch: Optional[int] = None,
        vote_batch: Optional[int] = None,
        progress_every: int = 0,
        max_pending: int = 32,
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Dataset-scale TTA: iterable of (key, image) -> {key: detection
        dict}, batched per resolution bucket and (optionally) sharded over
        a mesh — the API-surface twin of the eval CLI's run_dataset path,
        with the same tta_batch/vote_batch/max_pending knobs (None =
        TTARunner's measured defaults, currently 16/128; max_pending
        bounds un-fetched launches, see run_dataset).  Like detect_tta,
        always bf16 — warns once on a quantized detector."""
        from dan_tpu.eval.tta import TTARunner

        self._warn_tta_quant()
        runner = self._get_tta_runner()
        return runner.run_dataset(
            ((k, self._check_image(im)) for k, im in items),
            mesh=mesh,
            batch_per_device=(
                tta_batch if tta_batch is not None
                else TTARunner.DEFAULT_TTA_BATCH
            ),
            progress_every=progress_every,
            vote_batch=(
                vote_batch if vote_batch is not None
                else TTARunner.DEFAULT_VOTE_BATCH
            ),
            max_pending=max_pending,
        )


def _looks_like_tf_ckpt(path: str) -> bool:
    import os

    return (
        os.path.exists(path + ".index")
        or path.endswith(".ckpt")
        or ".ckpt-" in os.path.basename(path)
    )
