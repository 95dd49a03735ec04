"""ConvNeXt backbone family (NHWC flax), re-design of
/root/reference/models/backbones/convnext.py (vendored torchvision ConvNeXt,
CNBlock at convnext.py:17-54, arch registry :171-220, factory :223+).

Features are returned after each stage (the reference extracts
``features.{2i+1}``, i.e. post-stage outputs)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ARCH_SETTINGS: Dict[str, Dict] = {
    # torchvision convnext_* block settings: (depths, dims, stochastic depth)
    # sd values from the reference arch registry (convnext.py:180-220)
    "conv_t": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), sd=0.1),
    "conv_s": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), sd=0.4),
    "conv_b": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), sd=0.5),
    "conv_l": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), sd=0.5),
}


class CNBlock(nn.Module):
    dim: int
    layer_scale: float = 1e-6
    stochastic_depth_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        # depthwise 7x7
        x = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale), (self.dim,)
        )
        x = x * gamma.astype(x.dtype)
        if train and self.stochastic_depth_prob > 0:
            keep = 1.0 - self.stochastic_depth_prob
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            x = x * mask.astype(x.dtype) / keep
        return inp + x


class ConvNeXtBackbone(nn.Module):
    arch: str = "conv_l"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    # None -> the reference arch registry's value (convnext.py:180-220)
    stochastic_depth_prob: Any = None
    dtype: Any = jnp.float32

    @property
    def num_channels(self):
        return [ARCH_SETTINGS[self.arch]["dims"][i] for i in self.return_indices]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
        cfg = ARCH_SETTINGS[self.arch]
        depths, dims = cfg["depths"], cfg["dims"]
        sd_prob = (
            cfg["sd"] if self.stochastic_depth_prob is None
            else self.stochastic_depth_prob
        )
        total_blocks = sum(depths)
        block_id = 0

        # stem: 4x4 s4 conv + LN
        x = nn.Conv(
            dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem_conv"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)

        outputs = {}
        for stage in range(4):
            if stage > 0:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"downsample_norm{stage}"
                )(x)
                x = nn.Conv(
                    dims[stage], (2, 2), strides=(2, 2), dtype=self.dtype,
                    name=f"downsample_conv{stage}",
                )(x)
            for b in range(depths[stage]):
                sd = sd_prob * block_id / max(total_blocks - 1, 1)
                x = CNBlock(
                    dims[stage], stochastic_depth_prob=sd, dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, train=train)
                block_id += 1
            if stage in self.return_indices:
                outputs[stage] = x
        return outputs
