"""ViT / ViTDet / EVA-02 backbone with SimpleFeaturePyramid (NHWC flax).

Re-design of /root/reference/models/backbones/vit.py (vendored detectron2
ViT with window attention + SimpleFeaturePyramid at vit.py:686, registry
:747-875).  Present for registry parity — no shipped Salience-DETR config
uses it (SURVEY.md §2.6).  Supports interleaved window/global attention
blocks (ViTDet) and the EVA-02 variants (2D rotary position embedding +
SwiGLU FFN + separate q/k/v projections, reference vit.py:76-211,285-345),
and builds strides 8/16/32(/64) from the single-stride ViT via transposed/
strided convs."""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ARCH_SETTINGS: Dict[str, Dict] = {
    # pos_grid = the PRETRAINED learned pos-embed grid side (224/patch for
    # every reference registry arch, vit.py:384-394) so converted torchvision
    # checkpoints (/root/reference/models/backbones/vit.py:747-789) load
    # shape-exact; the table is bilinear-resized to the actual token grid.
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, window=14,
                  global_idx=(2, 5, 8, 11), pos_grid=14),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, window=14,
                  global_idx=(5, 11, 17, 23), pos_grid=14),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, window=14,
                  global_idx=(7, 15, 23, 31), patch=14, pos_grid=16),
    # EVA-02 (reference vit.py:811-875): rope + SwiGLU; `window_idx` lists the
    # WINDOWED blocks (the registry's window_block_indexes), the rest global.
    # pos_grid=14: EVA-02 checkpoints pretrain at 224 with patch 16, so the
    # learned pos table is (1, 14*14+1, C) (reference vit.py:385) — the model
    # param must be (14, 14, C) for the converted table to load shape-exact.
    "eva_02_vit_b_4attn_1024": dict(
        embed_dim=768, depth=12, num_heads=12, mlp_dim=2048, window=16,
        window_idx=(0, 1, 3, 4, 6, 7, 9, 10), rope=True, swiglu=True,
        drop_path=0.1, pos_grid=14),
    "eva_02_vit_b_6attn_win32_1536": dict(
        embed_dim=768, depth=12, num_heads=12, mlp_dim=2048, window=32,
        window_idx=(0, 2, 4, 6, 8, 10), rope=True, swiglu=True,
        drop_path=0.1, pos_grid=14),
    "eva_02_vit_l_4attn_1024": dict(
        embed_dim=1024, depth=24, num_heads=16, mlp_dim=2730, window=16,
        window_idx=(0, 1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 18,
                    19, 20, 21, 22),
        rope=True, swiglu=True, drop_path=0.4, pos_grid=14),
    "eva_02_vit_l_8attn_1536": dict(
        embed_dim=1024, depth=24, num_heads=16, mlp_dim=2730, window=16,
        window_idx=(0, 1, 3, 4, 6, 7, 9, 10, 12, 13, 15, 16, 18, 19, 21, 22),
        rope=True, swiglu=True, drop_path=0.3, pos_grid=14),
    "eva_02_vit_l_8attn_win32_1536": dict(
        embed_dim=1024, depth=24, num_heads=16, mlp_dim=2730, window=32,
        window_idx=(0, 1, 3, 4, 6, 7, 9, 10, 12, 13, 15, 16, 18, 19, 21, 22),
        rope=True, swiglu=True, drop_path=0.4, pos_grid=14),
}


@lru_cache(maxsize=32)
def rope_tables(hh: int, ww: int, head_dim: int, pt_seq_len: int = 16):
    """VisionRotaryEmbeddingFast cos/sin tables for an (hh, ww) token grid
    (reference vit.py:76-115): per-axis 'lang' frequencies over half the head
    dim, coordinates scaled to the pretrain patch grid, consecutive-pair
    rotation layout.  Returns (cos, sin) each (hh*ww, head_dim) float32.

    Generalization note: y is normalized by hh and x by ww independently, so
    on a non-square canvas (e.g. 800x1344) the two axes get anisotropic rope
    frequencies.  The reference instead builds one square table
    (ft_seq_len = image_size/patch_size) and square-pads its inputs; for
    closer parity with square-padded reference inference, normalize both
    axes by max(hh, ww)."""
    dim = head_dim // 2  # the reference constructs with dim = hidden/heads/2
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    ty = np.arange(hh, dtype=np.float64) / hh * pt_seq_len
    tx = np.arange(ww, dtype=np.float64) / ww * pt_seq_len
    t = np.stack(
        [np.broadcast_to(ty[:, None], (hh, ww)),
         np.broadcast_to(tx[None, :], (hh, ww))], -1
    )  # (hh, ww, 2) — (y, x), matching torch.stack([t.T, t], -1)
    fr = t[..., None] * freqs  # (hh, ww, 2, dim//2)
    fr = np.repeat(fr, 2, axis=-1).reshape(hh, ww, 2 * dim)  # (hh, ww, head_dim)
    fr = fr.reshape(hh * ww, -1)
    return (
        jnp.asarray(np.cos(fr), jnp.float32),
        jnp.asarray(np.sin(fr), jnp.float32),
    )


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, x2) consecutive pairs -> (-x2, x1) (reference vit.py:69-73)."""
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], -1).reshape(*x.shape[:-2], -1)


def apply_rope(t: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """t (B, N, H, hd), tables (N, hd)."""
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    tf = t.astype(jnp.float32)
    return (tf * c + rotate_half(tf) * s).astype(t.dtype)


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


class EVABlock(nn.Module):
    """EVA-02 encoder block (reference vit.py:285-345): LN -> (window
    partition) -> rope attention with separate q/k/v (q,v biased, k not;
    vit.py:155-211) -> LN -> SwiGLU (w1/w2/ffn_ln/w3, vit.py:117-146), both
    residuals under row-mode stochastic depth."""

    dim: int
    num_heads: int
    mlp_dim: int
    window: int  # 0 = global attention
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, train: bool = False):  # (B, H, W, C)
        B, H, W, C = x.shape
        hd = C // self.num_heads

        def drop_path(y):
            if train and self.drop_path > 0:
                keep = 1.0 - self.drop_path
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (y.shape[0],) + (1,) * (y.ndim - 1))
                return y * mask.astype(y.dtype) / keep
            return y

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_1")(x)

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

        dense = lambda bias, name: nn.Dense(
            C, use_bias=bias, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name=name)
        q = dense(True, "q_proj")(tokens)
        k = dense(False, "k_proj")(tokens)
        v = dense(True, "v_proj")(tokens)
        rs = lambda t: t.reshape(t.shape[0], -1, self.num_heads, hd)
        q, k, v = map(rs, (q, k, v))
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / np.sqrt(hd), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(tokens.shape)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)

        if ws > 0:
            out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
            out = out.reshape(B, Hp, Wp, C)[:, :H, :W]
        else:
            out = out.reshape(B, H, W, C)

        x = x + drop_path(out)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_2")(x)
        x1 = nn.Dense(self.mlp_dim, dtype=self.dtype, name="w1")(y)
        x2 = nn.Dense(self.mlp_dim, dtype=self.dtype, name="w2")(y)
        hidden = jax.nn.silu(x1) * x2
        hidden = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_ln")(hidden)
        y = nn.Dense(C, dtype=self.dtype, name="w3")(hidden)
        return x + drop_path(y)


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

        patch = cfg.get("patch", 16)
        x = nn.Conv(
            C, (patch, patch), strides=(patch, patch), dtype=self.dtype,
            name="patch_embed",
        )(x)
        B, H, W, _ = x.shape
        pos_size = cfg.get("pos_grid", self.img_pos_size)
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (pos_size, pos_size, C),
        )
        # bilinear-resize the learned table to the actual grid
        pos_r = jax.image.resize(pos, (H, W, C), "bilinear")
        x = x + pos_r[None].astype(x.dtype)

        if cfg.get("rope"):
            hd = C // cfg["num_heads"]
            ws = cfg["window"]
            # window rope over the (ws, ws) grid, global over the full map
            # (reference vit.py:398-412: pt_seq_len = patch_size = 16)
            cos_w, sin_w = rope_tables(ws, ws, hd)
            cos_g, sin_g = rope_tables(H, W, hd)
            dpr = np.linspace(0, cfg.get("drop_path", 0.0), cfg["depth"])
            for i in range(cfg["depth"]):
                windowed = i in cfg["window_idx"]
                x = EVABlock(
                    C, cfg["num_heads"], cfg["mlp_dim"],
                    window=ws if windowed else 0,
                    drop_path=float(dpr[i]), dtype=self.dtype, name=f"block{i}",
                )(
                    x,
                    cos_w if windowed else cos_g,
                    sin_w if windowed else sin_g,
                    train=train,
                )
        else:
            for i in range(cfg["depth"]):
                ws = 0 if i in cfg["global_idx"] else cfg["window"]
                x = ViTBlock(C, cfg["num_heads"], ws, dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        # SimpleFeaturePyramid (reference vit.py:686-744): stride 16 base map
        # -> strides 4/8/16/32, optional stride-64 extra maxpool (index 4)
        outputs = {}
        feats = {}
        if 0 in self.return_indices:  # scale 4.0: 2x deconv + LN + GELU + 2x deconv
            f = nn.ConvTranspose(
                C // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name="up4_deconv1"
            )(x)
            f = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="up4_norm")(f)
            f = jax.nn.gelu(f, approximate=False)
            feats[0] = nn.ConvTranspose(
                C // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="up4_deconv2"
            )(f)  # stride 4
        if 1 in self.return_indices:
            feats[1] = nn.ConvTranspose(
                C // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name="up2"
            )(x)  # stride 8
        feats[2] = x  # stride 16
        feats[3] = nn.max_pool(x, (2, 2), strides=(2, 2))  # stride 32
        for idx in sorted(self.return_indices):
            if idx == 4:
                # extra_block: stride-2 maxpool of the previous stage's OUTPUT
                # (reference vit.py:738-741, kernel 1)
                outputs[idx] = nn.max_pool(
                    outputs[max(i for i in self.return_indices if i < 4)],
                    (1, 1), strides=(2, 2),
                )
                continue
            f = feats[idx]
            # Conv2dNormActivation pairs (conv no-bias -> LN -> ReLU, the
            # torchvision default activation the reference inherits,
            # models/bricks/misc.py:112-160)
            f = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"lateral{idx}")(f)
            f = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"lateral_norm{idx}")(f)
            f = jax.nn.relu(f)
            f = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name=f"out{idx}")(f)
            f = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"out_norm{idx}")(f)
            f = jax.nn.relu(f)
            outputs[idx] = f
        return outputs
