"""Pure-numpy float64 oracles for the box/NMS/vote math.

These are the goldens for the unit suite until the reference ckpt/code are
available (SURVEY.md §4 item 2): deliberately naive, loop-based, and written
independently from the JAX implementations.
"""
import numpy as np


def iou_matrix(a, b):
    """(A,4) x (B,4) corner boxes -> (A,B) IoU, float64."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    out = np.zeros((len(a), len(b)))
    for i, ba in enumerate(a):
        for j, bb in enumerate(b):
            ix1, iy1 = max(ba[0], bb[0]), max(ba[1], bb[1])
            ix2, iy2 = min(ba[2], bb[2]), min(ba[3], bb[3])
            inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
            area_a = max(ba[2] - ba[0], 0.0) * max(ba[3] - ba[1], 0.0)
            area_b = max(bb[2] - bb[0], 0.0) * max(bb[3] - bb[1], 0.0)
            union = area_a + area_b - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def encode(gt_center, anchor_center, scaling=(0.1, 0.1, 0.2, 0.2)):
    gcx, gcy, gw, gh = np.asarray(gt_center, dtype=np.float64)
    acx, acy, aw, ah = np.asarray(anchor_center, dtype=np.float64)
    return np.array(
        [
            (gcx - acx) / aw / scaling[0],
            (gcy - acy) / ah / scaling[1],
            np.log(gw / aw) / scaling[2],
            np.log(gh / ah) / scaling[3],
        ]
    )


def decode(t, anchor_center, scaling=(0.1, 0.1, 0.2, 0.2)):
    tx, ty, tw, th = np.asarray(t, dtype=np.float64)
    acx, acy, aw, ah = np.asarray(anchor_center, dtype=np.float64)
    cx = tx * scaling[0] * aw + acx
    cy = ty * scaling[1] * ah + acy
    w = np.exp(tw * scaling[2]) * aw
    h = np.exp(th * scaling[3]) * ah
    return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


def greedy_nms(boxes, scores, iou_threshold, max_out=None):
    """Classic score-descending greedy NMS. Returns kept indices in order.

    Ties broken by lower index first (numpy argsort stability on -scores).
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-scores, kind="stable")
    kept = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for idx in order:
        if suppressed[idx]:
            continue
        kept.append(idx)
        if max_out is not None and len(kept) >= max_out:
            break
        ious = iou_matrix(boxes[idx : idx + 1], boxes)[0]
        suppressed |= ious > iou_threshold
        suppressed[idx] = True
    return np.array(kept, dtype=np.int64)


def bbox_vote(dets, iou_threshold=0.3, max_out=750):
    """Reference bbox-vote (SURVEY.md §2 'bbox-vote fusion' [B][K]).

    dets: (N, 5) [x1, y1, x2, y2, score].  Iteratively take the max-score
    det, average the coordinates of all dets with IoU >= threshold weighted
    by score, emit with the max score, remove merged, repeat.
    """
    dets = np.asarray(dets, dtype=np.float64).copy()
    out = []
    while len(dets) and len(out) < max_out:
        top = np.argmax(dets[:, 4])
        ious = iou_matrix(dets[top : top + 1, :4], dets[:, :4])[0]
        merge = ious >= iou_threshold
        merge[top] = True
        group = dets[merge]
        w = group[:, 4:5]
        box = (group[:, :4] * w).sum(axis=0) / w.sum()
        out.append(np.concatenate([box, [group[:, 4].max()]]))
        dets = dets[~merge]
    return np.array(out) if out else np.zeros((0, 5))
