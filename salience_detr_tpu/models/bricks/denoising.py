"""Contrastive denoising (CDN) query generation with static shapes.

Numerical spec: /root/reference/models/bricks/denoising.py (GenerateCDNQueries
:178-329).  The reference sizes the denoising slots from the per-batch max
ground-truth count (denoising.py:251-252), which is shape-dynamic; here the
per-image gt capacity ``dn_max_gt`` is a compile-time constant (SURVEY.md
§7.1) and the group count is ``max(denoising_nums // dn_max_gt, 1)``, so the
total slot count 2 * groups * dn_max_gt (~2 * denoising_nums) is static.
Ground truths beyond ``dn_max_gt`` simply receive no denoising supervision
(they keep their Hungarian loss).

Slot layout matches the reference: [g0_pos | g0_neg | g1_pos | g1_neg | ...],
each block of size ``dn_max_gt``; padded gt slots hold zero label embeddings
and zero box logits exactly like the reference's zero-initialized queries.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.ops.boxes import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh
from salience_detr_tpu.ops.misc import inverse_sigmoid


def cdn_attn_mask(dn_groups: int, group_size: int, num_queries: int) -> np.ndarray:
    """Block-diagonal attention mask (True = blocked), mirroring
    generate_query_masks (/root/reference/models/bricks/denoising.py:64-76)
    with max_gt_num_per_image = group_size (= 2 * dn_max_gt for CDN)."""
    dn_total = dn_groups * group_size
    t = dn_total + num_queries
    mask = np.zeros((t, t), dtype=bool)
    mask[dn_total:, :dn_total] = True  # matching queries cannot see dn
    for g in range(dn_groups):
        s, e = g * group_size, (g + 1) * group_size
        mask[s:e, :s] = True
        mask[s:e, e:dn_total] = True
    return mask


class GenerateCDNQueries(nn.Module):
    num_classes: int = 91
    label_embed_dim: int = 256
    denoising_nums: int = 100
    dn_max_gt: int = 25  # static per-image gt capacity for denoising
    label_noise_prob: float = 0.5
    box_noise_scale: float = 1.0
    dtype: Any = jnp.float32

    @property
    def dn_groups(self) -> int:
        return max(self.denoising_nums // self.dn_max_gt, 1)

    @property
    def num_denoising_queries(self) -> int:
        return 2 * self.dn_groups * self.dn_max_gt

    @nn.compact
    def __call__(
        self,
        gt_labels: jnp.ndarray,  # (B, M) int32
        gt_boxes: jnp.ndarray,  # (B, M, 4) normalized cxcywh
        gt_valid: jnp.ndarray,  # (B, M) bool
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (noised_label_queries (B, Ndn, C), noised_box_queries
        (B, Ndn, 4) logits).  The attention mask is static — use
        :func:`cdn_attn_mask`."""
        B = gt_labels.shape[0]
        M = self.dn_max_gt
        G = self.dn_groups

        label_encoder = self.param(
            "label_encoder", nn.initializers.normal(1.0),
            (self.num_classes, self.label_embed_dim),
        )

        # truncate or pad gt to the static dn capacity
        def fit(x, fill):
            if x.shape[1] >= M:
                return x[:, :M]
            pad = [(0, 0), (0, M - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
            return jnp.pad(x, pad, constant_values=fill)

        labels = fit(gt_labels, 0)
        boxes = fit(gt_boxes.astype(jnp.float32), 0.5)
        valid = fit(gt_valid, False)

        # repeat for 2G blocks: (B, 2G, M, ...)
        rep = lambda x: jnp.broadcast_to(x[:, None], (B, 2 * G) + x.shape[1:])
        labels_r = rep(labels)
        boxes_r = rep(boxes)
        valid_r = rep(valid)

        k_label, k_flip, k_sign, k_part = jax.random.split(rng, 4)

        # label noise at prob * 0.5 (denoising.py:272)
        p = self.label_noise_prob * 0.5
        flip = jax.random.uniform(k_flip, labels_r.shape) < p
        rand_labels = jax.random.randint(k_label, labels_r.shape, 0, self.num_classes)
        noised_labels = jnp.where(flip, rand_labels, labels_r)

        # box noise (denoising.py:203-229): positive blocks scale in [0,1),
        # negative blocks in [1,2), sign random, half-extent diff
        diff = jnp.concatenate([boxes_r[..., 2:] / 2, boxes_r[..., 2:] / 2], -1)
        sign = jax.random.randint(k_sign, boxes_r.shape, 0, 2).astype(jnp.float32) * 2.0 - 1.0
        part = jax.random.uniform(k_part, boxes_r.shape)
        is_negative = (jnp.arange(2 * G) % 2 == 1)[None, :, None, None]
        part = part + is_negative.astype(part.dtype)
        xyxy = box_cxcywh_to_xyxy(boxes_r)
        xyxy = jnp.clip(xyxy + part * sign * diff * self.box_noise_scale, 0.0, 1.0)
        noised_boxes = box_xyxy_to_cxcywh(xyxy)
        noised_boxes = inverse_sigmoid(noised_boxes)

        label_embedding = label_encoder[jnp.clip(noised_labels, 0, self.num_classes - 1)]
        label_embedding = jnp.where(valid_r[..., None], label_embedding, 0.0)
        noised_boxes = jnp.where(valid_r[..., None], noised_boxes, 0.0)

        Ndn = self.num_denoising_queries
        return (
            label_embedding.reshape(B, Ndn, self.label_embed_dim).astype(self.dtype),
            noised_boxes.reshape(B, Ndn, 4),
        )

    def dn_match_indices(self) -> Tuple[np.ndarray, np.ndarray]:
        """Static (query_idx, gt_idx) pairs for the dn loss: positives of each
        group match gt slots in order (/root/reference/models/detectors/
        base_detector.py:205-216 builds the same meshgrid per image)."""
        G, M = self.dn_groups, self.dn_max_gt
        group_index, target_index = np.meshgrid(np.arange(G), np.arange(M), indexing="ij")
        query_idx = group_index * (2 * M) + target_index
        return query_idx.flatten(), target_index.flatten()
