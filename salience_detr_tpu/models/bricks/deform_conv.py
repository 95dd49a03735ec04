"""Modulated deformable convolution (DCNv2).

Behavioral spec: /root/reference/models/bricks/deform_conv2d_pack.py:9-81
(offset+mask convs feeding torchvision.ops.DeformConv2d), used by ResNet
stages when ``stage_with_dcn`` is configured (resnet.py:31-44,177).  The
sampling is expressed as bilinear corner gathers + an einsum contraction over
kernel taps (the same issue-bound-gather analysis as deformable attention
applies; this brick is off by default in all shipped configs)."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample_map(x: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Sample x (B, H, W, C) at pixel coords px/py (B, N) -> (B, N, C),
    zero padding outside."""
    B, H, W, C = x.shape
    x_flat = x.reshape(B * H * W, C)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = 0.0
    base = (jnp.arange(B, dtype=jnp.int32) * H * W)[:, None]
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            cx = x0i + dx
            cy = y0i + dy
            valid = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
            idx = base + jnp.clip(cy, 0, H - 1) * W + jnp.clip(cx, 0, W - 1)
            g = jnp.take(x_flat, idx.reshape(-1), axis=0).reshape(*px.shape, C)
            out = out + jnp.where(valid[..., None], (wx * wy)[..., None], 0.0) * g
    return out


class DeformConv2dPack(nn.Module):
    """3x3 modulated deformable conv with self-predicted offsets/masks.

    Separate ``conv_offset`` / ``conv_mask`` convs mirror the reference's
    module layout (deform_conv2d_pack.py:32-51), with torchvision's
    interleaved (dy, dx)-per-tap offset channel order; both are
    zero-initialized so the op starts as a plain conv."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True  # conv3x3_dcn in ResNet stages uses bias=False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, Cin = x.shape
        K = self.kernel_size
        pad = K // 2
        taps = K * K

        conv = lambda ch, name: nn.Conv(
            ch, (K, K), strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name=name,
        )
        om = conv(2 * taps, "conv_offset")(x)  # (dy, dx) interleaved per tap
        mask = jax.nn.sigmoid(conv(taps, "conv_mask")(x))  # (B, Ho, Wo, taps)
        Ho, Wo = om.shape[1], om.shape[2]
        off_y = om[..., 0::2]
        off_x = om[..., 1::2]

        # base sampling grid per tap
        gy, gx = jnp.meshgrid(
            jnp.arange(Ho, dtype=jnp.float32) * self.stride,
            jnp.arange(Wo, dtype=jnp.float32) * self.stride,
            indexing="ij",
        )
        ky, kx = jnp.meshgrid(
            jnp.arange(K, dtype=jnp.float32) - pad,
            jnp.arange(K, dtype=jnp.float32) - pad,
            indexing="ij",
        )
        py = gy[None, :, :, None] + ky.reshape(-1)[None, None, None, :] + off_y
        px = gx[None, :, :, None] + kx.reshape(-1)[None, None, None, :] + off_x

        sampled = _bilinear_sample_map(
            x, px.reshape(B, -1), py.reshape(B, -1)
        ).reshape(B, Ho, Wo, taps, Cin)
        sampled = sampled * mask[..., None]

        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (taps, Cin, self.features),
        )
        out = jnp.einsum(
            "bhwkc,kcf->bhwf", sampled.astype(self.dtype), w.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out.astype(self.dtype)
