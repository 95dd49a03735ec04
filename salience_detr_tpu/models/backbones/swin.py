"""Swin Transformer backbone family (NHWC flax).

Re-design of /root/reference/models/backbones/swin.py (vendored torchvision
Swin incl. ShiftedWindowAttention at swin.py:219, arch registry :612-735).
Multi-scale features are the post-stage (pre-merge) outputs, matching the
reference's fx extraction of features.{1,3,5,7}; layout stays NHWC end to
end (the reference permutes back to NCHW at swin.py:605-607).

Shifted-window masks and relative-position indices are precomputed in numpy
per static padded shape — no dynamic shapes reach XLA."""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ARCH_SETTINGS: Dict[str, Dict] = {
    # sd = stochastic depth prob from the reference registry (swin.py:612-735)
    "swin_t": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window=7, sd=0.2),
    "swin_s": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), window=7, sd=0.3),
    "swin_b": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window=7, sd=0.5),
    "swin_l": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window=7, sd=0.2),
    "swin_b_384": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window=12, sd=0.2),
    "swin_l_384": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window=12, sd=0.2),
    # V2 (reference swin.py:712-735): cosine attention with learned logit
    # scale, continuous relative position bias via cpb MLP, post-norm blocks,
    # reduce-then-norm patch merging
    "swin_v2_t": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window=8, sd=0.2, v2=True),
    "swin_v2_b": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window=8, sd=0.5, v2=True),
}


@functools.lru_cache(maxsize=None)
def relative_coords_table(window: int) -> np.ndarray:
    """V2 continuous-bias input grid (reference swin.py:322-340): relative
    coords normalized by (w-1), scaled to [-8, 8], sign-log2 compressed."""
    r = np.arange(-(window - 1), window, dtype=np.float32)
    t = np.stack(np.meshgrid(r, r, indexing="ij"), -1)  # (2w-1, 2w-1, 2)
    t = t / (window - 1) * 8.0
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / 3.0
    return t.reshape(-1, 2)


@functools.lru_cache(maxsize=None)
def relative_position_index(window: int) -> np.ndarray:
    """(ws*ws, ws*ws) indices into the (2w-1)^2 bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, N, N) float mask (0 / -inf-ish) for SW-MSA regions."""
    img = np.zeros((hp, wp))
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws_ in slices:
            img[hs, ws_] = cnt
            cnt += 1
    img = img.reshape(hp // window, window, wp // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, :, None] - img[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    shift: int
    v2: bool = False  # cosine attention + continuous relative position bias
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws = self.window
        shift = self.shift
        # clamp: no shift when the window covers the whole map (torchvision does the same)
        if H <= ws and W <= ws:
            shift = 0
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        if shift > 0:
            xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))

        nh, nw = Hp // ws, Wp // ws
        windows = xp.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
        windows = windows.reshape(B * nh * nw, ws * ws, C)

        if self.v2:
            # the reference zeroes the k third of the qkv bias every forward
            # (swin.py:159-162) — structurally zero here
            qkv_w = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="qkv")
            qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * C,))
            b = jnp.concatenate(
                [qkv_bias[:C], jnp.zeros((C,), qkv_bias.dtype), qkv_bias[2 * C:]]
            )
            qkv = qkv_w(windows) + b.astype(self.dtype)
        else:
            qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(windows)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        head_dim = C // self.num_heads
        reshape_heads = lambda t: t.reshape(-1, ws * ws, self.num_heads, head_dim)
        q, k, v = map(reshape_heads, (q, k, v))

        if self.v2:
            # cosine attention with per-head learned logit scale, clamped at
            # log(100) (reference swin.py:165-170)
            logit_scale = self.param(
                "logit_scale",
                nn.initializers.constant(np.log(10.0)),
                (self.num_heads, 1, 1),
            )
            qn = q / jnp.maximum(
                jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
            )
            kn = k / jnp.maximum(
                jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
            )
            attn = jnp.einsum("bqhd,bkhd->bhqk", qn, kn, preferred_element_type=jnp.float32)
            scale = jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))
            attn = attn * scale[None].astype(attn.dtype)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            attn = attn / np.sqrt(head_dim)

        idx = jnp.asarray(relative_position_index(ws))
        if self.v2:
            # continuous position bias: MLP(2 -> 512 -> H) over the log-scaled
            # coords table, 16*sigmoid (reference swin.py:341-363)
            table_in = jnp.asarray(relative_coords_table(ws))  # ((2w-1)^2, 2)
            h1 = nn.Dense(512, dtype=jnp.float32, name="cpb_mlp_0")(table_in)
            bias_table = nn.Dense(
                self.num_heads, use_bias=False, dtype=jnp.float32, name="cpb_mlp_2"
            )(nn.relu(h1))
            bias = bias_table[idx.reshape(-1)].reshape(ws * ws, ws * ws, self.num_heads)
            bias = 16.0 * jax.nn.sigmoid(bias)
        else:
            bias_table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02),
                ((2 * ws - 1) ** 2, self.num_heads),
            )
            bias = bias_table[idx.reshape(-1)].reshape(ws * ws, ws * ws, self.num_heads)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None].astype(attn.dtype)

        if shift > 0:
            mask = jnp.asarray(shifted_window_mask(Hp, Wp, ws, shift))  # (nWin, N, N)
            attn = attn.reshape(B, nh * nw, self.num_heads, ws * ws, ws * ws)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(B * nh * nw, self.num_heads, ws * ws, ws * ws)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, ws * ws, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)

        out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, Hp, Wp, C)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out[:, :H, :W]


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    stochastic_depth_prob: float = 0.0
    v2: bool = False  # post-norm residuals (reference swin.py:488-492)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def drop_path(y):
            # torchvision StochasticDepth(p, "row") on both residual branches
            # (reference swin.py SwinTransformerBlock.forward :441-442)
            if train and self.stochastic_depth_prob > 0:
                keep = 1.0 - self.stochastic_depth_prob
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
                return y * mask.astype(y.dtype) / keep
            return y

        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        attn = WindowAttention(
            self.dim, self.window, self.num_heads, self.shift, v2=self.v2,
            dtype=self.dtype, name="attn",
        )

        def mlp(y):
            y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            return nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)

        if self.v2:  # norm AFTER the branch in V2
            x = x + drop_path(norm1(attn(x)))
            return x + drop_path(norm2(mlp(x)))
        x = x + drop_path(attn(norm1(x)))
        return x + drop_path(mlp(norm2(x)))


class PatchMerging(nn.Module):
    dim: int  # input dim; output is 2*dim
    v2: bool = False  # V2: reduce first, then norm over 2*dim (swin.py:72-95)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = xp[:, 0::2, 0::2]
        x1 = xp[:, 1::2, 0::2]
        x2 = xp[:, 0::2, 1::2]
        x3 = xp[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], -1)  # (B, H/2, W/2, 4C)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        reduction = nn.Dense(
            2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction"
        )
        if self.v2:
            return norm(reduction(x))
        return reduction(norm(x))


class SwinTransformerBackbone(nn.Module):
    arch: str = "swin_l"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    # None -> the reference arch registry's value (swin.py:612-735)
    stochastic_depth_prob: Any = None
    dtype: Any = jnp.float32

    @property
    def num_channels(self):
        e = ARCH_SETTINGS[self.arch]["embed_dim"]
        return [e * 2**i for i in self.return_indices]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
        cfg = ARCH_SETTINGS[self.arch]
        e, depths, heads, window = (
            cfg["embed_dim"], cfg["depths"], cfg["num_heads"], cfg["window"],
        )
        x = nn.Conv(e, (4, 4), strides=(4, 4), dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        outputs = {}
        dim = e
        sd_prob = (
            cfg["sd"] if self.stochastic_depth_prob is None
            else self.stochastic_depth_prob
        )
        total_blocks = sum(depths)
        block_id = 0
        v2 = bool(cfg.get("v2", False))
        for stage in range(4):
            if stage > 0:
                x = PatchMerging(dim, v2=v2, dtype=self.dtype, name=f"merge{stage}")(x)
                dim *= 2
            for b in range(depths[stage]):
                sd = sd_prob * block_id / max(total_blocks - 1, 1)
                x = SwinBlock(
                    dim, heads[stage], window,
                    shift=0 if b % 2 == 0 else window // 2,
                    stochastic_depth_prob=sd, v2=v2,
                    dtype=self.dtype, name=f"stage{stage}_block{b}",
                )(x, train=train)
                block_id += 1
            if stage in self.return_indices:
                outputs[stage] = x
        return outputs
