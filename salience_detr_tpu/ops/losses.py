"""Focal-style classification losses.

Numerical spec: /root/reference/models/bricks/losses.py (sigmoid_focal_loss
keeps gradient through the focal weight; vari_/ia_ variants detach the
probability).  All computation is fp32 regardless of input dtype — these are
tiny elementwise reductions, precision matters more than flops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits (elementwise)."""
    return jnp.clip(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _normalize(loss: jnp.ndarray, num_boxes: jnp.ndarray) -> jnp.ndarray:
    """Reference normalization: (loss.sum(1) / dim1).sum() / num_boxes."""
    n = max(loss.shape[1], 1)
    return (loss.sum(axis=1) / n).sum() / num_boxes


def sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss with gradient kept on the focal weight.

    inputs/targets: (B, N, ...) with reductions matching the reference; `mask`
    (broadcastable to inputs) zeroes contributions of padded positions, which
    the dynamic-shaped reference simply does not materialize.
    """
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    prob = jax.nn.sigmoid(inputs)
    weight = (1.0 - alpha) * prob**gamma * (1.0 - targets) + targets * alpha * (1.0 - prob) ** gamma
    loss = _bce_with_logits(inputs, targets) * weight
    if mask is not None:
        loss = loss * mask.astype(loss.dtype)
    return _normalize(loss, num_boxes)


def vari_sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    gt_score: jnp.ndarray,
    num_boxes: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """IoU-aware (RT-DETR style) focal loss; probability is detached."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    prob = jax.lax.stop_gradient(jax.nn.sigmoid(inputs))
    target_score = targets * gt_score[..., None].astype(jnp.float32)
    weight = (1.0 - alpha) * prob**gamma * (1.0 - targets) + target_score
    loss = _bce_with_logits(inputs, target_score) * weight
    if mask is not None:
        loss = loss * mask.astype(loss.dtype)
    return _normalize(loss, num_boxes)


def ia_bce_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    gt_score: jnp.ndarray,
    num_boxes: jnp.ndarray,
    k: float = 0.25,
    alpha: float = 0.0,
    gamma: float = 2.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """IoU-aware BCE loss (/root/reference/models/bricks/losses.py:24-33)."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    prob = jax.lax.stop_gradient(jax.nn.sigmoid(inputs))
    iou_aware_score = prob**k * gt_score[..., None].astype(jnp.float32) ** (1.0 - k)
    iou_aware_score = jnp.clip(iou_aware_score, 0.01)
    target_score = targets * iou_aware_score
    weight = (1.0 - alpha) * prob**gamma * (1.0 - targets) + targets
    loss = _bce_with_logits(inputs, target_score) * weight
    if mask is not None:
        loss = loss * mask.astype(loss.dtype)
    return _normalize(loss, num_boxes)
