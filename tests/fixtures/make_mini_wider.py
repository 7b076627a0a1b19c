#!/usr/bin/env python
"""Generate the committed mini-WIDER fixture + goldens (SURVEY.md §4 items
2+5; VERDICT r1 'Next round' item 7).

    python tests/fixtures/make_mini_wider.py

Deterministic (fixed seeds); outputs are COMMITTED so tests never depend on
this script at runtime — rerun it only to intentionally refresh goldens
(e.g. after a deliberate behavior change), then review the diff.

Produces under tests/fixtures/mini_wider/:
  WIDER_val/images/<event>/<img>.jpg      20 synthetic images, 2 events
  wider_face_split/wider_face_val_bbx_gt.txt
  eval_tools/ground_truth/wider_face_val.mat + wider_{easy,medium,hard}_val.mat
      (official-tool .mat layout, validated by round-tripping through
       dan_tpu.eval.widerface_ap.load_official_gt)
  goldens/model_io.npz       2 images: 640-canvas f32 input + f32 logits
                             (random-init params, PRNGKey(0), CPU)
  goldens/postprocess.npz    detections from the frozen logits via the XLA
                             postprocess AND the f64 numpy oracle
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mini_wider")
EVENTS = ("0--Fixture", "1--Crowd")

# Difficulty by face height (official subsets are nested: easy ⊆ medium ⊆ hard).
EASY_MIN_H, MEDIUM_MIN_H = 50, 25


def paint_face(img, x, y, w, h, rng):
    """A face-like blob: skin-tone ellipse + two dark eyes + mouth."""
    import cv2

    cx, cy = int(x + w / 2), int(y + h / 2)
    tone = (
        int(rng.integers(180, 240)),
        int(rng.integers(140, 200)),
        int(rng.integers(110, 170)),
    )
    cv2.ellipse(img, (cx, cy), (max(w // 2, 1), max(h // 2, 1)), 0, 0, 360, tone, -1)
    ew = max(w // 8, 1)
    for dx in (-w // 4, w // 4):
        cv2.circle(img, (cx + dx, cy - h // 6), ew, (30, 25, 25), -1)
    cv2.ellipse(
        img, (cx, cy + h // 4), (max(w // 5, 1), max(h // 10, 1)),
        0, 0, 180, (120, 60, 60), 2,
    )


def make_images():
    import cv2

    rng = np.random.default_rng(20260816)
    records = []  # (rel_path, faces) ; faces = list of (x, y, w, h, invalid)
    sizes = [
        (480, 640), (360, 540), (600, 600), (320, 480), (640, 640),
        (400, 400), (512, 384), (300, 620), (576, 432), (448, 608),
        (352, 352), (416, 544), (500, 500), (384, 640), (560, 420),
        (336, 336), (608, 456), (372, 496), (540, 540), (460, 615),
    ]
    for i, (h, w) in enumerate(sizes):
        event = EVENTS[i % 2]
        name = f"{i}_Fixture_img_{i}"
        rel = f"{event}/{name}.jpg"
        # Gradient + noise background.
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                40 + 120 * xx / w,
                60 + 100 * yy / h,
                80 + 60 * (xx + yy) / (h + w),
            ],
            -1,
        ).astype(np.float32)
        img += rng.normal(0, 12, (h, w, 3))
        img = np.clip(img, 0, 255).astype(np.uint8)

        n_faces = int(rng.integers(1, 9)) if i != 7 else 0  # one empty image
        faces = []
        for j in range(n_faces):
            # Mix of sizes: hard (12-24px), medium (25-49), easy (50-140).
            bucket = (j + i) % 3
            fh = int(
                rng.integers(*[(12, 25), (25, 50), (50, 140)][bucket])
            )
            fw = int(fh * rng.uniform(0.75, 0.95))
            if fh >= h - 2 or fw >= w - 2:
                continue
            x = int(rng.integers(0, w - fw))
            y = int(rng.integers(0, h - fh))
            invalid = 1 if (i % 6 == 0 and j == n_faces - 1 and j > 0) else 0
            paint_face(img, x, y, fw, fh, rng)
            faces.append((x, y, fw, fh, invalid))
        path = os.path.join(ROOT, "WIDER_val", "images", rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cv2.imwrite(path, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        records.append((rel, faces))
    return records


def write_bbx_gt(records):
    lines = []
    for rel, faces in records:
        lines.append(rel)
        lines.append(str(len(faces)))
        if not faces:
            lines.append("0 0 0 0 0 0 0 0 0 0")
        for x, y, w, h, invalid in faces:
            lines.append(f"{x} {y} {w} {h} 0 0 0 {invalid} 0 0")
    path = os.path.join(ROOT, "wider_face_split", "wider_face_val_bbx_gt.txt")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _cell(items):
    """A MATLAB cell column: (N, 1) object array."""
    out = np.empty((len(items), 1), object)
    for i, it in enumerate(items):
        out[i, 0] = it
    return out


def write_mats(records):
    """Official eval-tool ground-truth .mat files.

    Layout must round-trip through load_official_gt: event_list (E,1) cells
    of char; file_list (E,1) cells of (F,1) cells of char; face_bbx_list
    (E,1) cells of (F,1) cells of (n,4) double (x,y,w,h); per-setting
    gt_list (E,1) of (F,1) of (k,1) double 1-based keep indices.
    """
    from scipy.io import savemat

    by_event = {e: [] for e in EVENTS}
    for rel, faces in records:
        event, fname = rel.split("/")
        by_event[event].append((os.path.splitext(fname)[0], faces))

    event_list, file_list, bbx_list = [], [], []
    gt_lists = {"easy": [], "medium": [], "hard": []}
    for event in EVENTS:
        files, bbxs = [], []
        keeps = {s: [] for s in gt_lists}
        for name, faces in by_event[event]:
            files.append(np.array([name]))
            b = np.asarray(
                [[x, y, w, h] for (x, y, w, h, _inv) in faces], np.float64
            ).reshape(-1, 4)
            bbxs.append(b)
            for s, min_h in (("easy", EASY_MIN_H), ("medium", MEDIUM_MIN_H), ("hard", 0)):
                idx = [
                    fi + 1  # MATLAB 1-based
                    for fi, (_x, _y, _w, fh, inv) in enumerate(faces)
                    if not inv and fh >= min_h
                ]
                keeps[s].append(np.asarray(idx, np.float64).reshape(-1, 1))
        event_list.append(np.array([event]))
        file_list.append(_cell(files))
        bbx_list.append(_cell(bbxs))
        for s in gt_lists:
            gt_lists[s].append(_cell(keeps[s]))

    gt_dir = os.path.join(ROOT, "eval_tools", "ground_truth")
    os.makedirs(gt_dir, exist_ok=True)
    savemat(
        os.path.join(gt_dir, "wider_face_val.mat"),
        {
            "event_list": _cell(event_list),
            "file_list": _cell(file_list),
            "face_bbx_list": _cell(bbx_list),
        },
    )
    for s in gt_lists:
        savemat(
            os.path.join(gt_dir, f"wider_{s}_val.mat"),
            {"gt_list": _cell(gt_lists[s])},
        )

    # Validate the layout by round-tripping through the real loader.
    from dan_tpu.eval.widerface_ap import load_official_gt

    gt_boxes, keep_lists, stems = load_official_gt(gt_dir)
    assert len(stems) == len(records), (len(stems), len(records))
    for rel, faces in records:
        stem = os.path.splitext(rel)[0]
        want = np.asarray(
            [[x, y, x + w, y + h] for (x, y, w, h, _inv) in faces], np.float64
        ).reshape(-1, 4)
        np.testing.assert_array_equal(gt_boxes[stem], want)
        n_valid = sum(1 for f in faces if not f[4])
        assert len(keep_lists["hard"][stem]) == n_valid, stem
    print(f"mats OK: {len(stems)} stems", file=sys.stderr)


def write_goldens(records):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from dan_tpu.box.anchors import generate_anchors_np
    from dan_tpu.config import default_config
    from dan_tpu.data.widerface import load_image_rgb
    from dan_tpu.models.detector import detector_forward, init_detector_params
    from dan_tpu.ops.postprocess import postprocess_batch
    from dan_tpu.ops.preprocess import normalize_image
    import dataclasses

    cfg = default_config()
    # f32 compute: platform-stable goldens (bf16 rounding is backend-specific).
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
        postprocess=dataclasses.replace(cfg.postprocess, use_pallas_nms=False),
    )
    size = cfg.model.image_size
    params = init_detector_params(jax.random.PRNGKey(0), cfg.model)

    golden_rels = [records[0][0], records[4][0]]  # 480x640 and 640x640
    canvases = []
    for rel in golden_rels:
        img = load_image_rgb(os.path.join(ROOT, "WIDER_val", "images", rel))
        canvas = np.zeros((size, size, 3), np.uint8)
        canvas[: img.shape[0], : img.shape[1]] = img[:size, :size]
        canvases.append(canvas)
    images = jnp.asarray(np.stack(canvases))

    x = normalize_image(images.astype(jnp.float32), cfg.preprocess)
    cls_logits, loc_preds = jax.jit(
        lambda p, x: detector_forward(p, x, cfg.model)
    )(params, x)
    cls_logits = np.asarray(cls_logits, np.float32)
    loc_preds = np.asarray(loc_preds, np.float32)

    gdir = os.path.join(ROOT, "goldens")
    os.makedirs(gdir, exist_ok=True)
    np.savez_compressed(
        os.path.join(gdir, "model_io.npz"),
        rels=np.array(golden_rels),
        images=np.stack(canvases),
        cls_logits=cls_logits,
        loc_preds=loc_preds,
    )

    # Postprocess golden: XLA pipeline output from the FROZEN logits.
    anchors = jnp.asarray(generate_anchors_np(cfg.anchors, size, size))
    res = jax.jit(
        lambda c, l: postprocess_batch(
            c, l, anchors, cfg.anchors, cfg.postprocess, float(size), float(size)
        )
    )(jnp.asarray(cls_logits), jnp.asarray(loc_preds))
    boxes = np.asarray(res["bboxes"], np.float32)
    scores = np.asarray(res["scores"], np.float32)
    valid = np.asarray(res["valid"])

    # Independent f64 oracle detections from the same frozen logits
    # (vectorized — tests/oracles.py's loop-based IoU is too slow at 5000
    # candidates; same semantics incl. the exp clamp, the pre-NMS top-k
    # stable ordering, and >-threshold ties).
    pc = cfg.postprocess
    anchors_np = generate_anchors_np(cfg.anchors, size, size).astype(np.float64)
    ps = np.asarray(cfg.anchors.prior_scaling, np.float64)
    oracle = []
    for b in range(len(golden_rels)):
        z = cls_logits[b].astype(np.float64)
        z = z - z.max(axis=-1, keepdims=True)
        p = np.exp(z)
        s = (p / p.sum(axis=-1, keepdims=True))[:, 1]
        t = loc_preds[b].astype(np.float64)
        acx, acy, aw, ah = anchors_np.T
        cx = t[:, 0] * ps[0] * aw + acx
        cy = t[:, 1] * ps[1] * ah + acy
        w = np.exp(np.minimum(t[:, 2] * ps[2], 10.0)) * aw
        h = np.exp(np.minimum(t[:, 3] * ps[3], 10.0)) * ah
        bx = np.stack(
            [
                np.clip(cx - w / 2, 0, size),
                np.clip(cy - h / 2, 0, size),
                np.clip(cx + w / 2, 0, size),
                np.clip(cy + h / 2, 0, size),
            ],
            -1,
        )
        keep = (
            (s >= pc.score_threshold)
            & (bx[:, 2] - bx[:, 0] > 1.0)
            & (bx[:, 3] - bx[:, 1] > 1.0)
        )
        s = np.where(keep, s, 0.0)
        order = np.argsort(-s, kind="stable")[: pc.pre_nms_topk]
        cand_b, cand_s = bx[order], s[order]
        areas = (cand_b[:, 2] - cand_b[:, 0]) * (cand_b[:, 3] - cand_b[:, 1])
        kept, suppressed = [], np.zeros(len(cand_b), bool)
        for i in range(len(cand_b)):
            if suppressed[i] or cand_s[i] <= 0.0:
                continue
            kept.append(i)
            if len(kept) >= pc.max_detections:
                break
            ix1 = np.maximum(cand_b[i, 0], cand_b[:, 0])
            iy1 = np.maximum(cand_b[i, 1], cand_b[:, 1])
            ix2 = np.minimum(cand_b[i, 2], cand_b[:, 2])
            iy2 = np.minimum(cand_b[i, 3], cand_b[:, 3])
            inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
            union = areas[i] + areas - inter
            iou = np.where(union > 0, inter / np.maximum(union, 1e-300), 0.0)
            suppressed |= iou > pc.nms_iou_threshold
        kept = np.asarray(kept, np.int64)
        oracle.append((cand_b[kept], cand_s[kept]))

    np.savez_compressed(
        os.path.join(gdir, "postprocess.npz"),
        boxes=boxes,
        scores=scores,
        valid=valid,
        oracle_boxes_0=oracle[0][0],
        oracle_scores_0=oracle[0][1],
        oracle_boxes_1=oracle[1][0],
        oracle_scores_1=oracle[1][1],
    )
    n0 = int(valid[0].sum())
    print(
        f"goldens OK: {n0} dets img0 (oracle {len(oracle[0][0])})",
        file=sys.stderr,
    )


def tta_golden_config():
    """THE config for the TTA golden (imported by test_golden_drift.py so
    generator and drift test can never disagree): tiny 64px random-init
    model — forwards are fast on the 1-CPU suite host — but the REAL
    planning/gating/vote code paths with both shrink-capped and enlarging
    scales, flip, and the size gates all active."""
    import dataclasses  # noqa: F401  (kept for symmetry with callers)

    from dan_tpu.config import (
        DANConfig,
        MatchConfig,
        ModelConfig,
        PostprocessConfig,
        PreprocessConfig,
        TTAConfig,
    )

    return DANConfig(
        model=ModelConfig(image_size=64, compute_dtype="float32"),
        preprocess=PreprocessConfig(train_image_size=64, canvas_size=128),
        match=MatchConfig(max_gt=8),
        postprocess=PostprocessConfig(
            pre_nms_topk=64, max_detections=16, use_pallas_nms=False
        ),
        tta=TTAConfig(
            buckets=(64, 128),
            scales=(0.5, 1.5),
            extra_scale_small_images=0.0,
            max_pixels=16384.0,  # 128^2: real shrink < 1 for fixture images
        ),
    )


TTA_GOLDEN_RELS_IDX = (0, 4, 7)  # 480x640, 640x640, and the empty image


def write_tta_golden(records):
    """Golden detections through the FULL pyramid+flip+vote path (VERDICT
    r2 item 6): for each golden image, the concatenated pre-vote variant
    detections AND the final fused output, plus the variant plan — so
    planning/gating/vote changes can't silently shift eval results, and
    the committed pre-vote dets let an independent f64 numpy vote oracle
    check the fused output."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    jax.config.update("jax_platforms", "cpu")

    from dan_tpu.data.widerface import load_image_rgb
    from dan_tpu.eval.tta import TTARunner, plan_variant_buckets
    from dan_tpu.models.detector import init_detector_params

    cfg = tta_golden_config()
    params = init_detector_params(jax.random.PRNGKey(0), cfg.model)
    runner = TTARunner(params, cfg)

    payload = {}
    rels = []
    for gi, ri in enumerate(TTA_GOLDEN_RELS_IDX):
        rel = records[ri][0]
        rels.append(rel)
        img = load_image_rgb(os.path.join(ROOT, "WIDER_val", "images", rel))
        h, w = img.shape[:2]
        plan = [
            (v.scale, float(v.flip), v.max_size, v.min_size, float(b), float(c))
            for v, b, c in plan_variant_buckets(h, w, cfg)
        ]
        boxes, scores, valid = runner.collect_variant_dets(img)
        out = runner.detect_tta(img)
        payload[f"plan_{gi}"] = np.asarray(plan, np.float64)
        payload[f"size_{gi}"] = np.asarray([h, w], np.int64)
        payload[f"prevote_boxes_{gi}"] = boxes.astype(np.float32)
        payload[f"prevote_scores_{gi}"] = scores.astype(np.float32)
        payload[f"prevote_valid_{gi}"] = valid
        payload[f"final_boxes_{gi}"] = out["bboxes"].astype(np.float32)
        payload[f"final_scores_{gi}"] = out["scores"].astype(np.float32)
    gdir = os.path.join(ROOT, "goldens")
    os.makedirs(gdir, exist_ok=True)
    np.savez_compressed(
        os.path.join(gdir, "tta.npz"), rels=np.array(rels), **payload
    )
    print(
        "tta golden OK: "
        + ", ".join(
            f"{r}:{len(payload[f'final_boxes_{i}'])} dets"
            for i, r in enumerate(rels)
        ),
        file=sys.stderr,
    )


def load_records_from_fixture():
    """Rel-paths of the COMMITTED fixture, in bbx_gt order (the same order
    make_images produced), for golden-only refreshes that must not
    re-encode the committed JPEGs."""
    from dan_tpu.data.widerface import load_split

    return [(r.rel_path, None) for r in load_split(ROOT, "val", keep_invalid=True)]


def main():
    if "--only-tta" in sys.argv:
        write_tta_golden(load_records_from_fixture())
        return
    records = make_images()
    write_bbx_gt(records)
    write_mats(records)
    write_goldens(records)
    write_tta_golden(records)
    print(f"fixture written under {ROOT}", file=sys.stderr)


if __name__ == "__main__":
    main()
