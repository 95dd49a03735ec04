"""Box visualization (cv2), behavioral spec /root/reference/util/visualize.py."""

from __future__ import annotations

import colorsys
import os
from typing import Dict, Optional, Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _palette(n: int):
    return [
        tuple(int(c * 255) for c in colorsys.hsv_to_rgb(i / max(n, 1), 0.8, 0.95))
        for i in range(n)
    ]


def plot_bounding_boxes_on_image(
    image: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    scores: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    score_threshold: float = 0.3,
    thickness: int = 2,
) -> np.ndarray:
    """Draw xyxy boxes with labels/scores on an RGB uint8 image."""
    img = image.copy()
    n_classes = int(labels.max()) + 1 if len(labels) else 1
    colors = _palette(max(n_classes, 8))
    for i in range(len(boxes)):
        if scores is not None and scores[i] < score_threshold:
            continue
        x0, y0, x1, y1 = (int(v) for v in boxes[i])
        c = colors[int(labels[i]) % len(colors)]
        cv2.rectangle(img, (x0, y0), (x1, y1), c, thickness)
        name = (
            class_names[int(labels[i])]
            if class_names and int(labels[i]) < len(class_names)
            else str(int(labels[i]))
        )
        text = f"{name}" + (f" {scores[i]:.2f}" if scores is not None else "")
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(img, (x0, y0 - th - 4), (x0 + tw + 2, y0), c, -1)
        cv2.putText(
            img, text, (x0 + 1, y0 - 3), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
            (255, 255, 255), 1, cv2.LINE_AA,
        )
    return img


def save_visualization(
    image: np.ndarray, prediction: Dict[str, np.ndarray], out_path: str, **kw
):
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    img = plot_bounding_boxes_on_image(
        image, prediction["boxes"], prediction["labels"],
        prediction.get("scores"), **kw,
    )
    cv2.imwrite(out_path, img[:, :, ::-1])
