"""Set criterion with on-device Hungarian matching, for padded targets.

Numerical spec:
* cost matrix — /root/reference/models/matcher/hungarian_matcher.py:41-70;
* focal / IoU-aware class loss, L1+GIoU box losses, num_boxes normalization —
  /root/reference/models/bricks/set_criterion.py:14-212;
* salience (focus) supervision — /root/reference/models/detectors/
  salience_detr.py:13-116.

Targets are statically padded: labels (B, M) int32, boxes (B, M, 4)
normalized cxcywh, valid (B, M) bool.  The assignment runs on device
(ops/hungarian.py) so the whole loss is one XLA program — the reference syncs
to host per image per decoder layer (set_criterion.py:126).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_iou_elementwise,
    generalized_box_iou_elementwise,
    generalized_box_iou_pairwise,
)
from salience_detr_tpu.ops.hungarian import batched_assignment, batched_mixed_assignment
from salience_detr_tpu.ops.losses import sigmoid_focal_loss, vari_sigmoid_focal_loss


class Targets(NamedTuple):
    labels: jnp.ndarray  # (B, M) int32
    boxes: jnp.ndarray  # (B, M, 4) normalized cxcywh
    valid: jnp.ndarray  # (B, M) bool


def compute_matching_cost(
    pred_logits: jnp.ndarray,  # (B, Q, K)
    pred_boxes: jnp.ndarray,  # (B, Q, 4)
    targets: Targets,
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> jnp.ndarray:
    """(B, Q, M) matching cost (hungarian_matcher.py:41-70)."""
    pred_logits = pred_logits.astype(jnp.float32)
    pred_boxes = pred_boxes.astype(jnp.float32)
    prob = jax.nn.sigmoid(pred_logits)
    neg_cost = -(1 - focal_alpha) * prob**focal_gamma * jnp.log(1 - prob + 1e-6)
    pos_cost = -focal_alpha * (1 - prob) ** focal_gamma * jnp.log(prob + 1e-6)
    labels = jnp.clip(targets.labels, 0, pred_logits.shape[-1] - 1)
    # gather per-gt class columns: (B, Q, M)
    cls = jnp.take_along_axis(
        pos_cost - neg_cost, labels[:, None, :], axis=-1
    )

    bbox = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - targets.boxes[:, None, :, :]), -1
    )
    giou = -generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(targets.boxes)
    )
    return cost_bbox * bbox + cost_class * cls + cost_giou * giou


class SetCriterion:
    """Hungarian-matched detection loss.  ``hybrid=True`` is the
    HybridSetCriterion IoU-aware variant used by Salience-DETR."""

    def __init__(
        self,
        num_classes: int,
        cost_class: float = 2.0,
        cost_bbox: float = 5.0,
        cost_giou: float = 2.0,
        alpha: float = 0.25,
        gamma: float = 2.0,
        hybrid: bool = True,
        two_stage_binary_cls: bool = False,
        mixed_match_copies: int = 1,
    ):
        self.num_classes = num_classes
        self.cost_class = cost_class
        self.cost_bbox = cost_bbox
        self.cost_giou = cost_giou
        self.alpha = alpha
        self.gamma = gamma
        self.hybrid = hybrid
        self.two_stage_binary_cls = two_stage_binary_cls
        # Align-DETR mixed assignment (hungarian_matcher.py:83-91): > 1 gives
        # each gt up to that many matched queries; off in all shipped configs
        self.mixed_match_copies = mixed_match_copies

    # -------------------------------------------------------------- matching

    def match(self, pred_logits, pred_boxes, targets: Targets) -> jnp.ndarray:
        """(B, M) matched query per gt (-1 for invalid), via on-device LSA."""
        cost = compute_matching_cost(
            jax.lax.stop_gradient(pred_logits),
            jax.lax.stop_gradient(pred_boxes),
            targets,
            self.cost_class, self.cost_bbox, self.cost_giou,
            self.alpha, self.gamma,
        )
        return batched_assignment(cost, targets.valid)

    def match_mixed(
        self, pred_logits, pred_boxes, targets: Targets
    ) -> Tuple[jnp.ndarray, Targets]:
        """Align-DETR mixed assignment: each gt matched to up to
        ``mixed_match_copies`` queries.  Returns the (B, C*M) flat gt->query
        map plus the correspondingly replicated targets, so the loss math
        downstream is unchanged."""
        C = self.mixed_match_copies
        cost = compute_matching_cost(
            jax.lax.stop_gradient(pred_logits),
            jax.lax.stop_gradient(pred_boxes),
            targets,
            self.cost_class, self.cost_bbox, self.cost_giou,
            self.alpha, self.gamma,
        )
        match, copy_valid = batched_mixed_assignment(cost, targets.valid, C)
        B, _, M = match.shape
        rep = lambda x: jnp.tile(x, (1, C) + (1,) * (x.ndim - 2))
        expanded = Targets(rep(targets.labels), rep(targets.boxes), copy_valid.reshape(B, C * M))
        return match.reshape(B, C * M), expanded

    # ---------------------------------------------------------------- losses

    def calculate_loss(
        self,
        pred_logits: jnp.ndarray,  # (B, Q, K)
        pred_boxes: jnp.ndarray,  # (B, Q, 4)
        targets: Targets,
        num_boxes: jnp.ndarray,
        gt_to_query: Optional[jnp.ndarray] = None,  # (B, M); None -> match
        class_mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, Q, K)
    ) -> Dict[str, jnp.ndarray]:
        if gt_to_query is None:
            if self.mixed_match_copies > 1:
                gt_to_query, targets = self.match_mixed(pred_logits, pred_boxes, targets)
            else:
                gt_to_query = self.match(pred_logits, pred_boxes, targets)

        B, Q, K = pred_logits.shape
        valid = targets.valid
        q_idx = jnp.clip(gt_to_query, 0, Q - 1)
        # invalid gts scatter into a throwaway slot Q so they can never
        # clobber a real match (dropped below)
        q_scatter = jnp.where(valid, q_idx, Q)
        batch_ix = jnp.arange(B)[:, None]

        pred_boxes = pred_boxes.astype(jnp.float32)
        src_boxes = pred_boxes[batch_ix, q_idx]  # (B, M, 4)
        tgt_boxes = targets.boxes.astype(jnp.float32)

        # ---- class loss
        # scatter labels of matched queries; everything else = background
        target_classes = jnp.full((B, Q + 1), self.num_classes, jnp.int32)
        target_classes = target_classes.at[batch_ix, q_scatter].set(targets.labels)[:, :Q]
        onehot = jax.nn.one_hot(target_classes, K, dtype=jnp.float32)

        if self.hybrid:
            iou = box_iou_elementwise(
                box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(tgt_boxes)
            )
            iou = jax.lax.stop_gradient(jnp.where(valid, iou, 0.0))
            target_score = jnp.zeros((B, Q + 1), jnp.float32)
            target_score = target_score.at[batch_ix, q_scatter].set(iou)[:, :Q]
            loss_class = vari_sigmoid_focal_loss(
                pred_logits, onehot, target_score, num_boxes,
                alpha=self.alpha, gamma=self.gamma, mask=class_mask,
            ) * Q
        else:
            loss_class = sigmoid_focal_loss(
                pred_logits, onehot, num_boxes, alpha=self.alpha,
                gamma=self.gamma, mask=class_mask,
            ) * Q

        # ---- box losses over matched pairs only
        l1 = jnp.sum(jnp.abs(src_boxes - tgt_boxes), -1)
        loss_bbox = jnp.sum(jnp.where(valid, l1, 0.0)) / num_boxes
        giou = generalized_box_iou_elementwise(
            box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(tgt_boxes)
        )
        loss_giou = jnp.sum(jnp.where(valid, 1.0 - giou, 0.0)) / num_boxes

        return {
            "loss_class": loss_class,
            "loss_bbox": loss_bbox,
            "loss_giou": loss_giou,
        }

    def __call__(
        self,
        outputs_class: jnp.ndarray,  # (num_layers, B, Q, K)
        outputs_coord: jnp.ndarray,  # (num_layers, B, Q, 4)
        enc_class: jnp.ndarray,  # (B, Qe, K)
        enc_coord: jnp.ndarray,  # (B, Qe, 4)
        targets: Targets,
        num_boxes: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Final + aux + enc losses (set_criterion.py:133-170)."""
        losses = {}
        n_layers = outputs_class.shape[0]
        for i in range(n_layers):
            l = self.calculate_loss(
                outputs_class[i], outputs_coord[i], targets, num_boxes
            )
            suffix = "" if i == n_layers - 1 else f"_{i}"
            losses.update({k + suffix: v for k, v in l.items()})

        enc_targets = targets
        if self.two_stage_binary_cls:
            enc_targets = Targets(
                jnp.zeros_like(targets.labels), targets.boxes, targets.valid
            )
        l = self.calculate_loss(enc_class, enc_coord, enc_targets, num_boxes)
        losses.update({k + "_enc": v for k, v in l.items()})
        return losses

    def dn_loss(
        self,
        dn_class: jnp.ndarray,  # (num_layers, B, Ndn, K)
        dn_coord: jnp.ndarray,  # (num_layers, B, Ndn, 4)
        targets: Targets,
        num_boxes: jnp.ndarray,
        dn_query_idx: jnp.ndarray,  # (P,) positive slot indices (on device)
        dn_gt_idx: jnp.ndarray,  # (P,) gt indices (on device)
        pair_live: jnp.ndarray,  # (P,) bool — pairs within the live g*m prefix
        dn_groups: jnp.ndarray,  # scalar g (traced)
        dn_m: Optional[jnp.ndarray] = None,  # scalar m (traced)
    ) -> Dict[str, jnp.ndarray]:
        """Denoising losses (base_detector.py:188-244).  Indices are traced
        arrays from :func:`denoising.cdn_match_indices` — the pair layout
        follows the batch's exact (m, g) like the reference's per-batch
        meshgrid.  Dead pairs are masked out of the box losses, and dead
        SLOTS (indices >= 2*g*m up to the static capacity, which the
        dynamically-shaped reference never materializes) are masked out of
        the class loss so they receive no background supervision."""
        labels, boxes, valid = targets
        M = labels.shape[1]
        t_c = jnp.clip(dn_gt_idx, 0, M - 1)[None]  # (1, P)
        dn_targets = Targets(
            jnp.take_along_axis(labels, t_c, axis=1),
            jnp.take_along_axis(boxes, t_c[..., None], axis=1),
            jnp.take_along_axis(valid, t_c, axis=1) & pair_live[None],
        )
        B = dn_class.shape[1]
        gt_to_query = jnp.broadcast_to(
            dn_query_idx.astype(jnp.int32)[None], (B, dn_query_idx.shape[0])
        )
        class_mask = None
        if dn_m is not None:
            from salience_detr_tpu.models.bricks.denoising import cdn_slot_layout

            _, _, slot_live = cdn_slot_layout(dn_m, dn_groups, dn_class.shape[2])
            class_mask = slot_live[None, :, None]  # (1, Ndn, 1)
        losses = {}
        n_layers = dn_class.shape[0]
        nb = num_boxes * dn_groups.astype(jnp.float32)
        for i in range(n_layers):
            l = self.calculate_loss(
                dn_class[i], dn_coord[i], dn_targets, nb,
                gt_to_query=gt_to_query, class_mask=class_mask,
            )
            suffix = "_dn" if i == n_layers - 1 else f"_dn_{i}"
            losses.update({k + suffix: v for k, v in l.items()})
        return losses


class SalienceCriterion:
    """Supervision for the hierarchical salience maps
    (/root/reference/models/detectors/salience_detr.py:13-116)."""

    def __init__(
        self,
        limit_range: Sequence[Tuple[float, float]] = (
            (-1, 64), (64, 128), (128, 256), (256, 99999),
        ),
        noise_scale: float = 0.0,
        alpha: float = 0.25,
        gamma: float = 2.0,
    ):
        self.limit_range = limit_range
        self.noise_scale = noise_scale
        self.alpha = alpha
        self.gamma = gamma

    def __call__(
        self,
        foreground_mask: List[jnp.ndarray],  # [(B, h, w, 1)] salience scores
        targets: Targets,
        feature_strides: Sequence[Tuple[float, float]],  # canvas/feat per level
        image_sizes: jnp.ndarray,  # (B, 2) valid (h, w)
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        # denormalize gt to absolute xyxy on the valid image
        scale = jnp.stack(
            [image_sizes[:, 1], image_sizes[:, 0], image_sizes[:, 1], image_sizes[:, 0]],
            -1,
        ).astype(jnp.float32)[:, None, :]
        gt_xyxy = box_cxcywh_to_xyxy(targets.boxes.astype(jnp.float32)) * scale  # (B, M, 4)
        valid = targets.valid

        mask_targets = []
        flat_scores = []
        for level_idx, (mask, stride) in enumerate(zip(foreground_mask, feature_strides)):
            b, h, w, _ = mask.shape
            coord_y, coord_x = jnp.meshgrid(
                (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride[0],
                (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride[1],
                indexing="ij",
            )
            cx = coord_x.reshape(-1)  # (S,)
            cy = coord_y.reshape(-1)
            left = cx[None, :, None] - gt_xyxy[:, None, :, 0]  # (B, S, M)
            top = cy[None, :, None] - gt_xyxy[:, None, :, 1]
            right = gt_xyxy[:, None, :, 2] - cx[None, :, None]
            bottom = gt_xyxy[:, None, :, 3] - cy[None, :, None]
            borders = jnp.stack([left, top, right, bottom], -1)  # (B, S, M, 4)
            min_border = jnp.min(borders, -1)
            max_border = jnp.max(borders, -1)
            in_boxes = (min_border > 0) & valid[:, None, :]
            lo, hi = self.limit_range[level_idx]
            in_level = (max_border > lo) & (max_border <= hi)

            row = left + right
            col = top + bottom
            dx = (left - right) / jnp.where(row == 0, 1.0, row)
            dy = (top - bottom) / jnp.where(col == 0, 1.0, col)
            conf = jnp.sqrt(dx**2 + dy**2) / 2
            conf_per_box = jnp.where(in_boxes, 1.0 - conf, 0.0)
            tgt = jnp.max(conf_per_box, -1) if conf_per_box.shape[-1] else jnp.zeros_like(cx)[None]
            pos = jnp.any(in_boxes & in_level, -1)
            tgt = jnp.where(pos, tgt, 0.0)
            if self.noise_scale > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                tgt = (1 - self.noise_scale) * tgt + self.noise_scale * jax.random.uniform(
                    sub, tgt.shape
                )
            mask_targets.append(tgt)
            flat_scores.append(mask.reshape(b, h * w))

        mask_targets = jnp.concatenate(mask_targets, 1)  # (B, S)
        scores = jnp.concatenate(flat_scores, 1).astype(jnp.float32)
        num_pos = jnp.maximum(
            jnp.sum(mask_targets > 0.5 * self.noise_scale).astype(jnp.float32), 1.0
        )
        loss = sigmoid_focal_loss(
            scores, mask_targets, num_pos, alpha=self.alpha, gamma=self.gamma
        ) * scores.shape[1]
        return {"loss_salience": loss}


def default_weight_dict(num_decoder_layers: int = 6) -> Dict[str, float]:
    """Loss reweighting table (/root/reference/configs/salience_detr/
    salience_detr_resnet50_800_1333.py:86-94)."""
    base = {"loss_class": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0}
    w = dict(base)
    w.update({k + "_dn": v for k, v in base.items()})
    for i in range(num_decoder_layers - 1):
        w.update({f"{k}_{i}": v for k, v in base.items()})
        w.update({f"{k}_dn_{i}": v for k, v in base.items()})
    w.update({k + "_enc": v for k, v in base.items()})
    w["loss_salience"] = 2.0
    return w
