"""ResNet backbone family (NHWC, FrozenBatchNorm), TPU-native re-design of
/root/reference/models/backbones/resnet.py (vendored torchvision ResNet with
an fx feature extractor, factory at resnet.py:398-426).

Differences by design:
* NHWC layout and flax.linen functional modules instead of NCHW nn.Module;
* multi-scale features are returned directly from ``__call__`` (no fx
  tracing machinery needed — the module simply returns a dict);
* stage freezing (resnet.py:428-436) is expressed as an optimizer mask via
  :func:`frozen_param_predicate` instead of requires_grad mutation.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from salience_detr_tpu.models.bricks.deform_conv import DeformConv2dPack
from salience_detr_tpu.models.layers import FrozenBatchNorm

Dtype = Any

ARCH_SETTINGS: Dict[str, Dict] = {
    # name: (block, layers, width_per_group)
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2), width=64),
    "resnet34": dict(block="basic", layers=(3, 4, 6, 3), width=64),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3), width=64),
    "resnet101": dict(block="bottleneck", layers=(3, 4, 23, 3), width=64),
    "resnet152": dict(block="bottleneck", layers=(3, 8, 36, 3), width=64),
    "wide_resnet50_2": dict(block="bottleneck", layers=(3, 4, 6, 3), width=128),
    "wide_resnet101_2": dict(block="bottleneck", layers=(3, 4, 23, 3), width=128),
    # grouped-conv ResNeXt variants (reference resnet.py:335-346); the 3x3
    # conv becomes a grouped conv (feature_group_count) — XLA maps grouped
    # convs straight onto the MXU, no per-group loop
    "resnext50_32x4d": dict(
        block="bottleneck", layers=(3, 4, 6, 3), width=4, groups=32
    ),
    "resnext101_32x4d": dict(
        block="bottleneck", layers=(3, 4, 23, 3), width=4, groups=32
    ),
    "resnext101_32x8d": dict(
        block="bottleneck", layers=(3, 4, 23, 3), width=8, groups=32
    ),
    "resnext101_64x4d": dict(
        block="bottleneck", layers=(3, 4, 23, 3), width=4, groups=64
    ),
}


def _conv(features, kernel, stride, dtype, name, dilation=1, groups=1):
    pad = (kernel - 1) // 2 * dilation
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=False,
        dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
    )


def _conv3x3_maybe_dcn(features, stride, with_dcn, dtype, name, groups=1):
    """conv2 of a residual block: plain 3x3 or DCNv2 when the stage is
    configured with deformable convs (/root/reference/models/backbones/
    resnet.py:31-44,78-81,133-136; conv3x3_dcn uses bias=False)."""
    if with_dcn:
        if groups != 1:
            raise NotImplementedError("DCN + grouped conv is not supported")
        return DeformConv2dPack(
            features, kernel_size=3, stride=stride, use_bias=False,
            dtype=dtype, name=name,
        )
    return _conv(features, 3, stride, dtype, name, groups=groups)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    with_dcn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.planes, 3, self.stride, self.dtype, "conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        # the reference's BasicBlock dcn conv2 is stride-1 (resnet.py:78-81)
        out = _conv3x3_maybe_dcn(self.planes, 1, self.with_dcn, self.dtype, "conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, self.dtype, "downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes, dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; output is planes * 4
    stride: int = 1
    downsample: bool = False
    base_width: int = 64
    groups: int = 1
    with_dcn: bool = False
    dtype: Dtype = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        out = _conv(width, 1, 1, self.dtype, "conv1")(x)
        out = FrozenBatchNorm(width, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        # torchvision puts the stride (and the ResNeXt groups) on the 3x3 conv
        out = _conv3x3_maybe_dcn(
            width, self.stride, self.with_dcn, self.dtype, "conv2",
            groups=self.groups,
        )(out)
        out = FrozenBatchNorm(width, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(out_ch, 1, 1, self.dtype, "conv3")(out)
        out = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = _conv(out_ch, 1, self.stride, self.dtype, "downsample_conv")(x)
            identity = FrozenBatchNorm(out_ch, dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """Multi-scale ResNet feature extractor.

    __call__(images: (B, H, W, 3)) -> dict {stage_idx: (B, H/s, W/s, C)} for
    stage_idx in return_indices (stage i has stride 4*2**i).
    """

    arch: str = "resnet50"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    freeze_indices: Tuple[int, ...] = (0,)
    # per-stage modulated deformable convs in conv2 of every block
    # (/root/reference/models/backbones/resnet.py:177,204-227)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dtype: Dtype = jnp.float32

    @property
    def num_channels(self):
        cfg = ARCH_SETTINGS[self.arch]
        expansion = 4 if cfg["block"] == "bottleneck" else 1
        return [64 * expansion * 2**i for i in self.return_indices]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
        cfg = ARCH_SETTINGS[self.arch]
        block_cls = Bottleneck if cfg["block"] == "bottleneck" else BasicBlock
        layers = cfg["layers"]

        # stem
        x = _conv(64, 7, 2, self.dtype, "conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs = {}
        for stage in range(4):
            planes = 64 * 2**stage
            for blk in range(layers[stage]):
                stride = 2 if (stage > 0 and blk == 0) else 1
                downsample = blk == 0 and (
                    stage > 0 or cfg["block"] == "bottleneck"
                )
                kwargs = {}
                if block_cls is Bottleneck:
                    kwargs["base_width"] = cfg["width"]
                    kwargs["groups"] = cfg.get("groups", 1)
                x = block_cls(
                    planes=planes,
                    stride=stride,
                    downsample=downsample,
                    with_dcn=self.stage_with_dcn[stage],
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}",
                    **kwargs,
                )(x)
            if stage in self.return_indices:
                outputs[stage] = x
        return outputs


def frozen_param_predicate(freeze_indices: Sequence[int]):
    """Predicate over flattened param paths marking frozen subtrees
    (mirrors _freeze_stages, /root/reference/models/backbones/resnet.py:428-436:
    any freezing also freezes the stem)."""

    frozen_prefixes = []
    if len(freeze_indices) > 0:
        frozen_prefixes += ["conv1", "bn1"]
    for idx in freeze_indices:
        frozen_prefixes.append(f"layer{idx + 1}_")

    def is_frozen(path: Tuple[str, ...]) -> bool:
        return any(str(p).startswith(pref) for pref in frozen_prefixes for p in path[:1])

    return is_frozen
