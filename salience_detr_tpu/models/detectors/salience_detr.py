"""SalienceDETR detector assembly.

Numerical spec: /root/reference/models/detectors/salience_detr.py:120-243 and
base_detector.py:147-261.  The flax module runs backbone -> neck -> masks/pos
embeds -> CDN generation -> transformer and returns raw outputs; losses are
computed by :func:`compute_loss` (a pure function over the outputs), so the
whole train step stays one jitted program with no host syncs.

Static-shape I/O contract:
* images: (B, H, W, 3) float, already normalized and padded to the canvas;
* image_sizes: (B, 2) int32 valid (h, w) — all masks derive from this;
* targets: padded ``Targets`` (labels/boxes/valid) with static max_gt.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.models.bricks.criterion import (
    SalienceCriterion,
    SetCriterion,
    Targets,
    default_weight_dict,
)
from salience_detr_tpu.models.bricks.denoising import (
    GenerateCDNQueries,
    cdn_attn_mask_dynamic,
    cdn_match_indices,
)
from salience_detr_tpu.models.bricks.salience_transformer import SalienceTransformer
from salience_detr_tpu.ops import misc as misc_ops
from salience_detr_tpu.ops.pos_encoding import sine_position_embedding

# ImageNet statistics used by the reference's eval transform
# (/root/reference/models/detectors/base_detector.py:74)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SalienceDETR(nn.Module):
    """Backbone + ChannelMapper + SalienceTransformer forward."""

    backbone: nn.Module
    neck: nn.Module
    transformer: SalienceTransformer
    num_classes: int = 91
    num_queries: int = 900
    denoising_nums: int = 100
    dn_max_gt: int = 25  # deprecated (dynamic CDN groups); kept for configs
    strides: Tuple[int, ...] = (8, 16, 32, 64)
    dtype: Any = jnp.float32

    def setup(self):
        self.denoising_generator = GenerateCDNQueries(
            num_classes=self.num_classes,
            label_embed_dim=self.transformer.embed_dim,
            denoising_nums=self.denoising_nums,
            label_noise_prob=0.5,
            box_noise_scale=1.0,
            dtype=self.dtype,
        )

    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3)
        image_sizes: jnp.ndarray,  # (B, 2) valid (h, w)
        targets: Optional[Targets] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        B, H, W, _ = images.shape
        canvas = (H, W)

        # stochastic depth in the transformer backbones needs the train flag
        # (reference trains backbones with StochasticDepth active)
        with jax.named_scope("backbone"):
            feats = self.backbone(images.astype(self.dtype), train=train)
        with jax.named_scope("channel_mapper"):
            feats = self.neck(feats)  # list of (B, h, w, C)

        with jax.named_scope("masks_pos_embeds"):
            shapes = [(f.shape[1], f.shape[2]) for f in feats]
            valid_hw = misc_ops.multi_level_valid_sizes(image_sizes, canvas, shapes)
            masks = [misc_ops.rect_mask(v, s) for v, s in zip(valid_hw, shapes)]
            pos_embeds = [
                sine_position_embedding(
                    m, num_pos_feats=self.transformer.embed_dim // 2,
                    normalize=True, offset=-0.5,
                ).astype(self.dtype)
                for m in masks
            ]
            vr = misc_ops.valid_ratios(valid_hw, shapes)

        noised_label_query = noised_box_query = attn_mask = None
        dn_m = dn_g = None
        if train and targets is not None:
            rng = self.make_rng("denoising")
            noised_label_query, noised_box_query, dn_m, dn_g = self.denoising_generator(
                targets.labels, targets.boxes, targets.valid, rng
            )
            # matching-query count is clamped by the token budget on tiny
            # canvases (see SalienceTransformer two-stage selection)
            total_tokens = sum(s[0] * s[1] for s in shapes)
            num_matching = min(self.num_queries, 4 * self.num_queries, total_tokens)
            attn_mask = cdn_attn_mask_dynamic(
                dn_m, dn_g,
                self.denoising_generator.num_denoising_queries,
                num_matching,
            )

        outputs_class, outputs_coord, enc_class, enc_coord, salience = self.transformer(
            feats, masks, pos_embeds, valid_hw, vr,
            noised_label_query, noised_box_query, attn_mask, train=train,
        )

        out: Dict[str, Any] = {
            "enc_class": enc_class,
            "enc_coord": enc_coord,
            "salience": salience,
            "feature_strides": [(H / s[0], W / s[1]) for s in shapes],
        }
        if train and targets is not None:
            ndn = self.denoising_generator.num_denoising_queries
            out["dn_class"] = outputs_class[:, :, :ndn]
            out["dn_coord"] = outputs_coord[:, :, :ndn]
            out["pred_class"] = outputs_class[:, :, ndn:]
            out["pred_coord"] = outputs_coord[:, :, ndn:]
            out["dn_m"] = dn_m
            out["dn_groups"] = dn_g
        else:
            out["pred_class"] = outputs_class
            out["pred_coord"] = outputs_coord
        return out


def compute_loss(
    outputs: Dict[str, Any],
    targets: Targets,
    image_sizes: jnp.ndarray,
    criterion: SetCriterion,
    salience_criterion: SalienceCriterion,
    num_boxes: jnp.ndarray,
    weight_dict: Optional[Dict[str, float]] = None,
    denoising_nums: int = 100,
) -> Dict[str, jnp.ndarray]:
    """Hungarian + denoising + salience losses with weight_dict reweighting
    (salience_detr.py:223-240).  The dn match indices are computed on device
    from the batch's (m, g) CDN scalars carried in ``outputs``."""
    if weight_dict is None:
        weight_dict = default_weight_dict(outputs["pred_class"].shape[0])

    losses = criterion(
        outputs["pred_class"], outputs["pred_coord"],
        outputs["enc_class"], outputs["enc_coord"],
        targets, num_boxes,
    )
    if "dn_class" in outputs:
        dn_query_idx, dn_gt_idx, pair_live = cdn_match_indices(
            outputs["dn_m"], outputs["dn_groups"], denoising_nums
        )
        losses.update(
            criterion.dn_loss(
                outputs["dn_class"], outputs["dn_coord"], targets, num_boxes,
                dn_query_idx, dn_gt_idx, pair_live, outputs["dn_groups"],
                dn_m=outputs["dn_m"],
            )
        )
    losses.update(
        salience_criterion(
            outputs["salience"], targets, outputs["feature_strides"], image_sizes
        )
    )
    return {k: v * weight_dict[k] for k, v in losses.items() if k in weight_dict}


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization of float [0, 1] RGB images (NHWC)."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD
