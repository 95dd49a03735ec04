"""COCO-index helpers for arbitrary (non-COCO) datasets.

TPU-native restatement of /root/reference/util/coco_utils.py: the reference's
``convert_to_coco_api`` (:29-77) walks any torch dataset and synthesizes a
pycocotools ``COCO`` object so ``CocoEvaluator`` can score it;
``get_coco_api_from_dataset`` (:80-88) unwraps Subset nesting and short-cuts
when the dataset already carries a COCO index.  Here the synthesized object
is the framework's own :class:`~salience_detr_tpu.data.coco.CocoIndex`
(pycocotools-free), consumed by ``utils.coco_eval.CocoEvaluator`` — this is
what makes custom-dataset fine-tunes (e.g. the paper's defect-detection
tasks, BASELINE.md) evaluable without writing a COCO JSON first.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from salience_detr_tpu.data.coco import CocoIndex
from salience_detr_tpu.utils.coco_eval import rle_encode


def convert_to_coco_api(dataset) -> CocoIndex:
    """Build a :class:`CocoIndex` from any dataset of framework samples.

    The dataset must be indexable and yield the framework's sample dict
    (the ``CocoDetection.get_raw`` contract): ``image`` (H, W, 3), ``boxes``
    xyxy absolute, ``labels``, optional ``area`` / ``iscrowd`` / ``masks`` /
    ``image_id`` / ``orig_size``.  Prefers ``dataset.get_raw(i)`` (no
    augmentations) over ``dataset[i]``.  Box/area/crowd handling mirrors the
    reference (/root/reference/util/coco_utils.py:40-71: xyxy -> xywh,
    area fallback to box area, mask RLE encoding).
    """
    images: List[dict] = []
    annotations: List[dict] = []
    cat_ids = set()
    ann_id = 1  # reference starts ann ids at 1 (coco_utils.py:38)
    fetch = getattr(dataset, "get_raw", None) or dataset.__getitem__
    for idx in range(len(dataset)):
        sample = fetch(idx)
        img_id = int(sample.get("image_id", idx))
        if "orig_size" in sample:
            h, w = (int(v) for v in sample["orig_size"])
        else:
            h, w = sample["image"].shape[:2]
        images.append({"id": img_id, "height": h, "width": w})

        boxes = np.asarray(sample["boxes"], np.float64).reshape(-1, 4)
        labels = np.asarray(sample["labels"]).reshape(-1)
        n = boxes.shape[0]
        xywh = boxes.copy()
        xywh[:, 2:] -= xywh[:, :2]
        areas = np.asarray(
            sample.get("area", xywh[:, 2] * xywh[:, 3]), np.float64
        ).reshape(-1)
        iscrowd = np.asarray(sample.get("iscrowd", np.zeros(n)), np.int64).reshape(-1)
        masks = sample.get("masks")
        for i in range(n):
            ann = {
                "id": ann_id,
                "image_id": img_id,
                "category_id": int(labels[i]),
                "bbox": [float(v) for v in xywh[i]],
                "area": float(areas[i]),
                "iscrowd": int(iscrowd[i]),
            }
            if masks is not None:
                ann["segmentation"] = rle_encode(np.asarray(masks[i], bool))
            cat_ids.add(int(labels[i]))
            annotations.append(ann)
            ann_id += 1

    categories = [{"id": c, "name": str(c)} for c in sorted(cat_ids)]
    return CocoIndex(
        {"images": images, "annotations": annotations, "categories": categories}
    )


def get_coco_index_from_dataset(dataset) -> CocoIndex:
    """Unwrap Subset-style nesting and return the dataset's COCO index,
    synthesizing one when absent (reference coco_utils.py:80-88)."""
    for _ in range(10):
        if isinstance(getattr(dataset, "coco", None), CocoIndex):
            return dataset.coco
        inner = getattr(dataset, "dataset", None) or getattr(dataset, "_ds", None)
        if inner is None:
            break
        dataset = inner
    if isinstance(getattr(dataset, "coco", None), CocoIndex):
        return dataset.coco
    return convert_to_coco_api(dataset)
