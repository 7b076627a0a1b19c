"""Detection drawing (reference `utility/draw_toolbox.py` equivalent,
SURVEY.md §2 'Box drawing / viz'). Host-side, optional."""
from __future__ import annotations

import numpy as np


def draw_detections(
    image_rgb: np.ndarray,
    bboxes: np.ndarray,
    scores: np.ndarray,
    out_path: str,
    color=(0, 255, 0),
) -> None:
    import cv2

    img = image_rgb[:, :, ::-1].copy()  # RGB -> BGR for cv2
    for box, s in zip(np.asarray(bboxes), np.asarray(scores)):
        x1, y1, x2, y2 = (int(round(v)) for v in box)
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        cv2.putText(
            img,
            f"{s:.2f}",
            (x1, max(y1 - 4, 10)),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.4,
            color,
            1,
        )
    cv2.imwrite(out_path, img)
