"""ViT / ViTDet backbone with SimpleFeaturePyramid (NHWC flax).

Re-design of /root/reference/models/backbones/vit.py (vendored detectron2
ViT with window attention + SimpleFeaturePyramid at vit.py:686, registry
:747-875).  Present for registry parity — no shipped Salience-DETR config
uses it (SURVEY.md §2.6).  Supports interleaved window/global attention
blocks (ViTDet) and builds strides 8/16/32(/64) from the single-stride ViT
via transposed/strided convs."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ARCH_SETTINGS: Dict[str, Dict] = {
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, window=14,
                  global_idx=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, window=14,
                  global_idx=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, window=14,
                  global_idx=(7, 15, 23, 31)),
}


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window: int  # 0 = global attention
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)

        ws = self.window
        if ws > 0:
            pad_h = (ws - H % ws) % ws
            pad_w = (ws - W % ws) % ws
            yp = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            Hp, Wp = H + pad_h, W + pad_w
            nh, nw = Hp // ws, Wp // ws
            tokens = yp.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
            tokens = tokens.reshape(B * nh * nw, ws * ws, C)
        else:
            tokens = y.reshape(B, H * W, C)

        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, -1)
        hd = C // self.num_heads
        rs = lambda t: t.reshape(t.shape[0], -1, self.num_heads, hd)
        q, k, v = map(rs, (q, k, v))
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / np.sqrt(hd), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(tokens.shape)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)

        if ws > 0:
            out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
            out = out.reshape(B, Hp, Wp, C)[:, :H, :W]
        else:
            out = out.reshape(B, H, W, C)

        x = x + out
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class VisionTransformerBackbone(nn.Module):
    """Single-stride ViT -> SimpleFeaturePyramid multi-scale features.

    Outputs are indexed like the other backbones: stage i has stride 4*2**i,
    built from the stride-16 ViT map by x2 deconv (stride 8), identity
    (stride 16), and strided convs (stride 32/64)."""

    arch: str = "vit_b"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    out_channels: int = 256
    img_pos_size: int = 64  # learned pos-embed grid side (interpolated)
    dtype: Any = jnp.float32

    @property
    def num_channels(self):
        return [self.out_channels] * len(self.return_indices)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
        cfg = ARCH_SETTINGS[self.arch]
        C = cfg["embed_dim"]

        x = nn.Conv(C, (16, 16), strides=(16, 16), dtype=self.dtype, name="patch_embed")(x)
        B, H, W, _ = x.shape
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (self.img_pos_size, self.img_pos_size, C),
        )
        # bilinear-resize the learned table to the actual grid
        pos_r = jax.image.resize(pos, (H, W, C), "bilinear")
        x = x + pos_r[None].astype(x.dtype)

        for i in range(cfg["depth"]):
            ws = 0 if i in cfg["global_idx"] else cfg["window"]
            x = ViTBlock(C, cfg["num_heads"], ws, dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        # SimpleFeaturePyramid: stride 16 base map -> 8/16/32/64
        outputs = {}
        feats = {}
        feats[1] = nn.ConvTranspose(
            C // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name="up2"
        )(x)  # stride 8
        feats[2] = x  # stride 16
        feats[3] = nn.max_pool(x, (2, 2), strides=(2, 2))  # stride 32
        for idx in self.return_indices:
            f = feats[idx]
            f = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"lateral{idx}")(f)
            f = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"lateral_norm{idx}")(f)
            f = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name=f"out{idx}")(f)
            f = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"out_norm{idx}")(f)
            outputs[idx] = f
        return outputs
