"""Contrastive denoising (CDN) query generation — exact reference semantics
under static shapes.

Numerical spec: /root/reference/models/bricks/denoising.py (GenerateCDNQueries
:178-329).  The reference sizes the denoising slots from the per-batch max
ground-truth count m (denoising.py:251-252): groups g = denoising_nums//m,
group size 2m, total 2*g*m <= 2*denoising_nums.  That bound makes the layout
expressible with a STATIC slot capacity ``2 * denoising_nums`` while keeping
m and g as traced scalars: slot -> (group, positive/negative, gt index) is
integer arithmetic on a static arange, dead slots (beyond 2*g*m) carry zero
queries and are isolated by the attention mask, and the dn-loss indices are
computed on device from the same scalars.  The denoising curriculum thus
matches the reference for every batch with m <= denoising_nums (not pinned
groups — an earlier revision pinned g from a config constant, which
under-supervised images with few objects).  One deliberate cap: cdn_meta
clamps m at denoising_nums, so in the rare case of an image with more than
denoising_nums gts the overflow gts get no denoising supervision, where the
reference instead grows the group to 2*max_gt slots; keep the static gt
capacity max_gt <= denoising_nums if exact parity matters.

Slot layout matches the reference: [g0_pos(m) | g0_neg(m) | g1_pos | ...].
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
    """Static block-diagonal attention mask (True = blocked), mirroring
    generate_query_masks (/root/reference/models/bricks/denoising.py:64-76)
    with max_gt_num_per_image = group_size (= 2 * m for CDN).  Kept for tests
    and as the spec for the dynamic variant below."""
    dn_total = dn_groups * group_size
    t = dn_total + num_queries
    mask = np.zeros((t, t), dtype=bool)
    mask[dn_total:, :dn_total] = True  # matching queries cannot see dn
    for g in range(dn_groups):
        s, e = g * group_size, (g + 1) * group_size
        mask[s:e, :s] = True
        mask[s:e, e:dn_total] = True
    return mask


def cdn_attn_mask_dynamic(
    m: jnp.ndarray, g: jnp.ndarray, dn_capacity: int, num_queries: int
) -> jnp.ndarray:
    """On-device CDN attention mask over the static slot capacity.

    Entries follow generate_query_masks exactly on the live 2*g*m prefix;
    dead slots are blocked from (and invisible to) everything except
    themselves so their zero queries cannot contaminate real attention.

    m, g: traced scalars (per-batch max gt count, group count).
    returns (dn_capacity + num_queries,)^2 bool, True = blocked.
    """
    m0 = jnp.maximum(m, 1)
    idx = jnp.arange(dn_capacity, dtype=jnp.int32)
    blk = idx // (2 * m0)
    dead = idx >= 2 * g * m0
    same = blk[:, None] == blk[None, :]
    blocked_dn = (~same) | dead[None, :] | dead[:, None]
    blocked_dn = blocked_dn & ~jnp.eye(dn_capacity, dtype=bool)
    top = jnp.concatenate(
        [blocked_dn, jnp.zeros((dn_capacity, num_queries), bool)], axis=1
    )
    bottom = jnp.concatenate(
        [
            jnp.ones((num_queries, dn_capacity), bool),
            jnp.zeros((num_queries, num_queries), bool),
        ],
        axis=1,
    )
    return jnp.concatenate([top, bottom], axis=0)


def cdn_meta(gt_valid: jnp.ndarray, denoising_nums: int):
    """Per-batch CDN scalars, matching denoising.py:244-252:
    m = max gts per image (traced), g = max(denoising_nums // m, 1).
    Returns (n_per_image (B,), m, g)."""
    n_per_image = jnp.sum(gt_valid.astype(jnp.int32), axis=1)
    m = jnp.minimum(jnp.max(n_per_image), denoising_nums)
    m0 = jnp.maximum(m, 1)
    g = jnp.maximum(denoising_nums * m // jnp.maximum(m * m, 1), 1)
    del m0
    return n_per_image, m, g


def cdn_slot_layout(m: jnp.ndarray, g: jnp.ndarray, dn_capacity: int):
    """Slot decomposition over the static capacity: returns (gt_index (NDN,),
    is_negative (NDN,), live (NDN,)) where live marks slots < 2*g*m."""
    m0 = jnp.maximum(m, 1)
    idx = jnp.arange(dn_capacity, dtype=jnp.int32)
    blk = idx // (2 * m0)
    within = idx - blk * (2 * m0)
    is_neg = within >= m0
    t = jnp.where(is_neg, within - m0, within)
    live = (blk < g) & (m > 0)
    return t, is_neg, live


def cdn_box_noise(
    boxes_r: jnp.ndarray,  # (..., 4) normalized cxcywh, repeated per block
    sign: jnp.ndarray,  # (..., 4) in {-1, +1}
    part: jnp.ndarray,  # (..., 4) uniform [0, 1)
    is_negative: jnp.ndarray,  # broadcastable bool: negative slots
    box_noise_scale: float,
) -> jnp.ndarray:
    """Contrastive box-noise math (/root/reference/models/bricks/
    denoising.py:200-229): half-extent diff on xyxy corners, positives scaled
    by U[0,1), negatives by U[1,2), random sign, clamp, back to cxcywh.  The
    random draws are arguments so tests can differentially compare against the
    reference math with identical noise."""
    diff = jnp.concatenate([boxes_r[..., 2:] / 2, boxes_r[..., 2:] / 2], -1)
    part = part + is_negative.astype(part.dtype)
    xyxy = box_cxcywh_to_xyxy(boxes_r)
    xyxy = jnp.clip(xyxy + part * sign * diff * box_noise_scale, 0.0, 1.0)
    return box_xyxy_to_cxcywh(xyxy)


class GenerateCDNQueries(nn.Module):
    num_classes: int = 91
    label_embed_dim: int = 256
    denoising_nums: int = 100
    label_noise_prob: float = 0.5
    box_noise_scale: float = 1.0
    dtype: Any = jnp.float32

    @property
    def num_denoising_queries(self) -> int:
        """Static slot capacity: 2*g*m <= 2*denoising_nums for every batch."""
        return 2 * self.denoising_nums

    @nn.compact
    def __call__(
        self,
        gt_labels: jnp.ndarray,  # (B, M) int32
        gt_boxes: jnp.ndarray,  # (B, M, 4) normalized cxcywh
        gt_valid: jnp.ndarray,  # (B, M) bool
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (noised_label_queries (B, NDN, C), noised_box_queries
        (B, NDN, 4) logits, m scalar, g scalar).  The attention mask comes
        from :func:`cdn_attn_mask_dynamic` with the same (m, g)."""
        B, M = gt_labels.shape
        NDN = self.num_denoising_queries

        label_encoder = self.param(
            "label_encoder", nn.initializers.normal(1.0),
            (self.num_classes, self.label_embed_dim),
        )

        n_per_image, m, g = cdn_meta(gt_valid, self.denoising_nums)
        t, is_neg, live = cdn_slot_layout(m, g, NDN)

        # gather each slot's gt (dynamic values, static shapes)
        t_c = jnp.clip(t, 0, M - 1)
        labels_s = jnp.take_along_axis(gt_labels, t_c[None, :], axis=1)  # (B, NDN)
        boxes_s = jnp.take_along_axis(
            gt_boxes.astype(jnp.float32), t_c[None, :, None], axis=1
        )  # (B, NDN, 4)
        valid_s = live[None, :] & (t[None, :] < n_per_image[:, None])  # (B, NDN)

        k_label, k_flip, k_sign, k_part = jax.random.split(rng, 4)

        # label noise at prob * 0.5 (denoising.py:272)
        p = self.label_noise_prob * 0.5
        flip = jax.random.uniform(k_flip, labels_s.shape) < p
        rand_labels = jax.random.randint(k_label, labels_s.shape, 0, self.num_classes)
        noised_labels = jnp.where(flip, rand_labels, labels_s)

        # box noise (denoising.py:200-229)
        sign = jax.random.randint(k_sign, boxes_s.shape, 0, 2).astype(jnp.float32) * 2.0 - 1.0
        part = jax.random.uniform(k_part, boxes_s.shape)
        noised_boxes = cdn_box_noise(boxes_s, sign, part, is_neg[None, :, None], self.box_noise_scale)
        noised_boxes = inverse_sigmoid(noised_boxes)

        label_embedding = label_encoder[jnp.clip(noised_labels, 0, self.num_classes - 1)]
        label_embedding = jnp.where(valid_s[..., None], label_embedding, 0.0)
        noised_boxes = jnp.where(valid_s[..., None], noised_boxes, 0.0)

        return (
            label_embedding.astype(self.dtype),
            noised_boxes,
            m,
            g,
        )

    def dn_match_indices(self, m: jnp.ndarray, g: jnp.ndarray):
        return cdn_match_indices(m, g, self.denoising_nums)


def cdn_match_indices(
    m: jnp.ndarray, g: jnp.ndarray, denoising_nums: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device (query_idx, gt_idx, pair_live) for the dn loss: the positives
    of each live group match gt slots in order
    (/root/reference/models/detectors/base_detector.py:205-216 builds the same
    meshgrid per image).  Static pair capacity = denoising_nums >= g*m."""
    P = denoising_nums
    m0 = jnp.maximum(m, 1)
    p = jnp.arange(P, dtype=jnp.int32)
    grp = p // m0
    t = p - grp * m0
    query_idx = grp * (2 * m0) + t
    pair_live = (grp < g) & (m > 0)
    return query_idx, t, pair_live
