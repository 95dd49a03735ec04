"""Static-shape mask / multi-level feature utilities.

The reference carries per-image padding masks and derives per-level shapes
dynamically (/root/reference/models/bricks/base_transformer.py:21-56,
/root/reference/models/detectors/base_detector.py:168-175).  On TPU every
shape is static: the padded canvas (H, W) and the per-level strides are
compile-time constants, and per-image validity is carried as an
``image_sizes: (B, 2) int32`` array [(h, w) valid pixels] from which all masks
and valid ratios are computed on device.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Logit with the reference's clamping (/root/reference/util/misc.py:31-35)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def level_shapes(canvas_hw: Tuple[int, int], strides: Sequence[int]) -> List[Tuple[int, int]]:
    """Static per-level feature map shapes for a padded canvas.

    Backbone convs with stride s produce ceil(H/s) x ceil(W/s) maps when the
    canvas is padded to a multiple of the largest stride (size_divisible=32 in
    the reference, /root/reference/util/misc.py:75-104).
    """
    H, W = canvas_hw
    return [(int(math.ceil(H / s)), int(math.ceil(W / s))) for s in strides]


def level_valid_sizes(
    image_sizes: jnp.ndarray, canvas_hw: Tuple[int, int], feat_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Valid (h, w) extent of one feature level for each image.

    Matches nearest-neighbour downsampling of the binary canvas mask used by
    the reference (F.interpolate in /root/reference/models/detectors/
    salience_detr.py:172): feature row r maps to canvas row floor(r*H/h_f),
    which is valid iff r < ceil(h * h_f / H).

    image_sizes: (B, 2) int32 (h, w) -> (B, 2) int32 valid feature extents.
    """
    H, W = canvas_hw
    h_f, w_f = feat_hw
    vh = -(-image_sizes[:, 0] * h_f // H)  # ceil div
    vw = -(-image_sizes[:, 1] * w_f // W)
    return jnp.stack([vh, vw], axis=-1)


def rect_mask(valid_hw: jnp.ndarray, feat_hw: Tuple[int, int]) -> jnp.ndarray:
    """Boolean padding mask (True = PADDING, like the reference's mask).

    valid_hw: (B, 2) -> (B, h_f, w_f) bool.
    """
    h_f, w_f = feat_hw
    rows = jnp.arange(h_f)[None, :, None]
    cols = jnp.arange(w_f)[None, None, :]
    valid = (rows < valid_hw[:, 0, None, None]) & (cols < valid_hw[:, 1, None, None])
    return ~valid


def multi_level_valid_sizes(
    image_sizes: jnp.ndarray,
    canvas_hw: Tuple[int, int],
    shapes: Sequence[Tuple[int, int]],
) -> List[jnp.ndarray]:
    return [level_valid_sizes(image_sizes, canvas_hw, s) for s in shapes]


def multi_level_masks(
    image_sizes: jnp.ndarray,
    canvas_hw: Tuple[int, int],
    shapes: Sequence[Tuple[int, int]],
) -> List[jnp.ndarray]:
    """Per-level padding masks (True = padding) from image sizes."""
    return [
        rect_mask(level_valid_sizes(image_sizes, canvas_hw, s), s) for s in shapes
    ]


def valid_ratios(valid_hw_per_level: Sequence[jnp.ndarray], shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """(B, num_levels, 2) of (w_ratio, h_ratio), matching the reference's
    get_valid_ratios (/root/reference/models/bricks/base_transformer.py:48-56)."""
    ratios = []
    for vhw, (h, w) in zip(valid_hw_per_level, shapes):
        r = jnp.stack(
            [vhw[:, 1].astype(jnp.float32) / w, vhw[:, 0].astype(jnp.float32) / h],
            axis=-1,
        )
        ratios.append(r)
    return jnp.stack(ratios, axis=1)


def flatten_multi_level(feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[(B, h, w, C)...] -> (B, sum hw, C); [(B, h, w)...] -> (B, sum hw).

    NHWC layout throughout (TPU-native), unlike the reference's NCHW.
    """
    flat = []
    for f in feats:
        if f.ndim == 4:
            b, h, w, c = f.shape
            flat.append(f.reshape(b, h * w, c))
        else:
            b, h, w = f.shape
            flat.append(f.reshape(b, h * w))
    return jnp.concatenate(flat, axis=1)


def level_start_index(shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Static cumulative token offsets per level."""
    sizes = [h * w for h, w in shapes]
    return np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)


def spatial_shapes_array(shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    return np.asarray(shapes, dtype=np.int32)
