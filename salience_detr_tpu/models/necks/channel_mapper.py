"""ChannelMapper neck: 1x1 conv + GroupNorm(32) per level, extra levels via
stride-2 3x3 convs (/root/reference/models/necks/channel_mapper.py:8-80)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from salience_detr_tpu.models.layers import ConvNormAct


class ChannelMapper(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 4
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @property
    def num_channels(self) -> List[int]:
        return [self.out_channels] * self.num_outs

    @nn.compact
    def __call__(self, inputs: Dict[int, jnp.ndarray]) -> List[jnp.ndarray]:
        feats = list(inputs.values())
        assert len(feats) == len(self.in_channels)
        outs = []
        for i, f in enumerate(feats):
            outs.append(
                ConvNormAct(
                    self.out_channels,
                    kernel_size=self.kernel_size,
                    norm="gn32",
                    act=None,
                    dtype=self.dtype,
                    name=f"convs_{i}",
                )(f)
            )
        x = feats[-1]
        for i in range(len(feats), self.num_outs):
            x = ConvNormAct(
                self.out_channels,
                kernel_size=3,
                stride=2,
                norm="gn32",
                act=None,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x)
            outs.append(x)
        return outs
