"""Detection post-processing to COCO-style results.

Numerical spec: /root/reference/models/bricks/post_process.py:8-74 — flat
top-k over (num_queries x num_classes) sigmoid scores, label = idx % C,
cxcywh -> xyxy scaled to the original image size.  Optional confidence and
NMS filtering (:47-62) are expressed as masks (static shapes) rather than
ragged list filtering.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from salience_detr_tpu.ops.boxes import box_cxcywh_to_xyxy
from salience_detr_tpu.ops.nms import nms_keep_mask


class PostProcess:
    def __init__(
        self,
        select_box_nums_for_evaluation: int = 300,
        nms_iou_threshold: float = -1.0,
        confidence_score: float = -1.0,
    ):
        self.select_box_nums_for_evaluation = select_box_nums_for_evaluation
        self.nms_iou_threshold = nms_iou_threshold
        self.confidence_score = confidence_score

    def __call__(
        self,
        pred_logits: jnp.ndarray,  # (B, Q, C)
        pred_boxes: jnp.ndarray,  # (B, Q, 4) normalized cxcywh
        target_sizes: jnp.ndarray,  # (B, 2) original (h, w)
    ) -> Dict[str, jnp.ndarray]:
        B, Q, C = pred_logits.shape
        prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32)).reshape(B, Q * C)
        k = min(self.select_box_nums_for_evaluation, Q * C)
        scores, topk_indexes = jax.lax.top_k(prob, k)
        topk_boxes = topk_indexes // C
        labels = topk_indexes % C
        boxes = box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32))
        boxes = jnp.take_along_axis(boxes, topk_boxes[..., None], axis=1)

        img_h = target_sizes[:, 0].astype(jnp.float32)
        img_w = target_sizes[:, 1].astype(jnp.float32)
        scale = jnp.stack([img_w, img_h, img_w, img_h], -1)[:, None, :]
        boxes = boxes * scale

        valid = jnp.ones_like(scores, dtype=bool)
        if self.confidence_score > 0:
            valid = valid & (scores > self.confidence_score)
        if self.nms_iou_threshold > 0:
            keep = jax.vmap(lambda b: nms_keep_mask(b, self.nms_iou_threshold))(boxes)
            valid = valid & keep

        return {"scores": scores, "labels": labels, "boxes": boxes, "valid": valid}


class SegmentationPostProcess:
    """Query masks -> per-pixel class map (functional equivalent of the
    reference's unused SegmentationPostProcess, post_process.py:77-129):
    queries of the same argmax class are averaged into one mask per class,
    then the per-class stack is argmaxed after resizing."""

    def __call__(
        self,
        pred_logits: jnp.ndarray,  # (B, Q, C)
        pred_masks: jnp.ndarray,  # (B, Q, h, w)
        target_hw,  # static (H, W) output size
    ) -> jnp.ndarray:
        B, Q, C = pred_logits.shape
        cls = jnp.argmax(pred_logits, -1)  # (B, Q)
        onehot = jax.nn.one_hot(cls, C, dtype=jnp.float32)  # (B, Q, C)
        masks = jax.nn.sigmoid(pred_masks.astype(jnp.float32))
        # mean mask per class over its queries (empty class -> zeros)
        num = jnp.einsum("bqc,bqhw->bchw", onehot, masks)
        den = jnp.maximum(onehot.sum(1), 1.0)[..., None, None]
        per_class = num / den  # (B, C, h, w)
        per_class = jax.image.resize(
            per_class, (B, C, *target_hw), method="bilinear"
        )
        return jnp.argmax(per_class, axis=1)  # (B, H, W)
