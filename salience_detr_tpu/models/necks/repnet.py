"""RepVGG-PluX PAN network re-fusing encoder memory as 2D maps.

Numerical spec: /root/reference/models/necks/repnet.py (RepVggPluXBlock :12,
CSPRepPluXLayer :67, RepVGGPluXNetwork :125).  Used inside the transformer
between the salience encoder and the two-stage selection head
(/root/reference/models/bricks/salience_transformer.py:185-192).

BatchNorm statistics sync across data-parallel devices through the
``batch_stats`` collection with an axis_name psum (replacing the reference's
SyncBatchNorm conversion, /root/reference/main.py:126-127).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from salience_detr_tpu.models.layers import GlobalContextSE


def _nearest_resize(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest-neighbour resize NHWC matching F.interpolate(mode='nearest')."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    cols = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, rows][:, :, cols]


class _BlockDiagGroupConv(nn.Module):
    """Grouped conv executed as a DENSE conv with a block-diagonal kernel.

    XLA's TPU lowering of feature_group_count=4 at 64 channels/group emits
    (…, 4, 64)-shaped intermediates whose 64-lane minor dim wastes half of
    every (8, 128) vector register, plus layout copies on both sides (the
    round-3 device trace showed the repnet neck spending ~2 ms/iter in such
    copies).  Embedding the grouped kernel on the diagonal of a dense
    (k, k, C, C) kernel is numerically identical, keeps the stored parameter
    in the grouped (k, k, C/g, C) shape the weight converter expects
    (/root/reference/models/necks/repnet.py:198-203), and runs at full MXU
    lane utilization — the 4x extra MACs multiply zeros, which is cheaper
    than half-empty vregs."""

    features: int
    kernel_size: int
    stride: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        gin = in_ch // self.groups
        gout = self.features // self.groups
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, gin, self.features),
        )
        dense = jnp.zeros((k, k, in_ch, self.features), self.dtype)
        for g in range(self.groups):
            dense = dense.at[:, :, g * gin : (g + 1) * gin, g * gout : (g + 1) * gout].set(
                kernel[:, :, :, g * gout : (g + 1) * gout].astype(self.dtype)
            )
        pad = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            dense,
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ConvBNAct(nn.Module):
    """Conv + BatchNorm + activation with torch-matching kaiming_uniform(a=1)
    conv init (repnet.py:198-203)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    act: Optional[str] = "silu"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        if self.groups == 1:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                use_bias=False,
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                name="conv",
            )(x)
        else:
            x = _BlockDiagGroupConv(
                self.features, self.kernel_size, self.stride, self.groups,
                self.dtype, name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)
        if self.act == "silu":
            x = nn.silu(x)
        elif self.act == "relu":
            x = nn.relu(x)
        return x


class RepVggPluXBlock(nn.Module):
    features: int
    groups: int = 4
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = ConvBNAct(
            self.features, 3, groups=self.groups, act=None, dtype=self.dtype,
            axis_name=self.axis_name, name="conv1",
        )(x, train) + ConvBNAct(
            self.features, 1, groups=self.groups, act=None, dtype=self.dtype,
            axis_name=self.axis_name, name="conv2",
        )(x, train)
        y = nn.silu(y) if self.act == "silu" else nn.relu(y)
        y = GlobalContextSE(self.features, dtype=self.dtype, name="se_module")(y)
        if in_ch != self.features:
            identity = nn.Conv(
                self.features, (1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                name="identity",
            )(x)
        else:
            identity = x
        return y + identity


class CSPRepPluXLayer(nn.Module):
    features: int
    num_blocks: int = 3
    expansion: float = 1.0
    groups: int = 4
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        y1 = ConvBNAct(hidden, 1, **kw, name="conv1")(x, train)
        for i in range(self.num_blocks):
            y1 = RepVggPluXBlock(hidden, groups=self.groups, **kw, name=f"bottlenecks_{i}")(y1, train)
        y2 = ConvBNAct(hidden, 1, **kw, name="conv2")(x, train)
        y = y1 + y2
        if hidden != self.features:
            y = ConvBNAct(self.features, 1, **kw, name="conv3")(y, train)
        return y


class RepVGGPluXNetwork(nn.Module):
    """PAN: top-down lateral fusion then bottom-up path aggregation."""

    in_channels_list: Sequence[int]
    out_channels_list: Sequence[int]
    groups: int = 4
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Dict[int, jnp.ndarray], train: bool = False) -> Dict[int, jnp.ndarray]:
        keys = list(x.keys())
        feats = list(x.values())
        n = len(feats)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        # top-down
        inner_outs = [feats[-1]]
        for idx in range(n - 1, 0, -1):
            feat_high = inner_outs[0]
            feat_low = feats[idx - 1]
            feat_high = ConvBNAct(
                self.out_channels_list[idx - 1], 1, **kw, name=f"lateral_convs_{idx - 1}",
            )(feat_high, train)
            inner_outs[0] = feat_high
            upsample = _nearest_resize(feat_high, feat_low.shape[1:3])
            inner_out = CSPRepPluXLayer(
                self.out_channels_list[idx - 1], groups=self.groups, **kw,
                name=f"layer_blocks_{idx - 1}",
            )(jnp.concatenate([upsample, feat_low], axis=-1), train)
            inner_outs.insert(0, inner_out)

        # bottom-up
        results = [inner_outs[0]]
        for idx in range(n - 1):
            feat_low = results[-1]
            feat_high = inner_outs[idx + 1]
            down = ConvBNAct(
                self.out_channels_list[idx + 1], 3, stride=2, **kw,
                name=f"downsample_blocks_{idx}",
            )(feat_low, train)
            out = CSPRepPluXLayer(
                self.out_channels_list[idx + 1], groups=self.groups, **kw,
                name=f"pan_blocks_{idx}",
            )(jnp.concatenate([down, feat_high], axis=-1), train)
            results.append(out)

        return {k: v for k, v in zip(keys, results)}
