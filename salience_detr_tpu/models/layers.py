"""Shared flax.linen building blocks.

Functional re-designs of the reference's nn.Module bricks
(/root/reference/models/bricks/misc.py, basic.py).  All convolutions are NHWC
(TPU-native); parameters are fp32, compute dtype is configurable (bf16 for
the MXU path).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == uniform(+-1/sqrt(fan_in))
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return nn.initializers.uniform(scale=2 * bound, offset=-bound) if hasattr(
        nn.initializers, "uniform"
    ) else None


def uniform_in(lo: float, hi: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, lo, hi)

    return init


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine parameters.

    Stats live in the ``frozen`` variable collection so they never receive
    gradients (the reference registers them as buffers,
    /root/reference/models/bricks/misc.py:9-59).
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.variable("frozen", "scale", nn.initializers.ones, None, (self.features,)).value
        bias = self.variable("frozen", "bias", nn.initializers.zeros, None, (self.features,)).value
        mean = self.variable("frozen", "mean", nn.initializers.zeros, None, (self.features,)).value
        var = self.variable("frozen", "var", nn.initializers.ones, None, (self.features,)).value
        w = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * w
        return (x * w.astype(x.dtype) + b.astype(x.dtype)).astype(x.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm(32) as used by ChannelMapper (/root/reference/models/necks/
    channel_mapper.py:17)."""

    features: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype)(x)


class BatchNorm(nn.Module):
    """Standard BatchNorm2d; ``train`` toggles batch-stat updates.

    Cross-device stat sync (the reference's SyncBatchNorm, /root/reference/
    main.py:126-127) happens automatically under pjit: the batch axis is
    sharded and XLA inserts the psum for the mean/var reductions when
    ``axis_name`` is set.
    """

    features: int
    momentum: float = 0.9
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )(x)


class ConvNormAct(nn.Module):
    """Conv2d + optional norm + optional activation
    (/root/reference/models/bricks/misc.py:62-112)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    norm: Optional[str] = "frozen_bn"  # frozen_bn | gn32 | bn | None
    act: Optional[Callable] = nn.relu
    bias: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.bias if self.bias is not None else (self.norm is None)
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        # norm submodule names deliberately avoid a lowercase "norm" substring:
        # the reference wraps these in Conv2dNormActivation whose sequential
        # index names escape the optimizer's "norm" keyword match
        # (/root/reference/optimizer/param_dict.py:81), and we mirror that
        # grouping (see engine/optim.py).
        if self.norm == "frozen_bn":
            x = FrozenBatchNorm(self.features, dtype=self.dtype, name="fbn")(x)
        elif self.norm == "gn32":
            x = GroupNorm32(self.features, dtype=self.dtype, name="gn")(x)
        elif self.norm == "bn":
            x = BatchNorm(self.features, dtype=self.dtype, name="bn")(x, train=train)
        elif self.norm is not None:
            raise ValueError(f"unknown norm {self.norm}")
        if self.act is not None:
            x = self.act(x)
        return x


class MLP(nn.Module):
    """Stacked Linear+ReLU head (/root/reference/models/bricks/basic.py:6-26);
    xavier-uniform weights, zero bias.  ``zero_init_last`` zeroes the final
    layer (bbox-regression heads, /root/reference/models/bricks/
    salience_transformer.py:94-95,621-623)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    zero_init_last: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out = self.output_dim if last else self.hidden_dim
            kernel_init = (
                nn.initializers.zeros
                if (last and self.zero_init_last)
                else nn.initializers.xavier_uniform()
            )
            x = nn.Dense(
                out,
                kernel_init=kernel_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x)
            if not last:
                x = nn.relu(x)
        return x


class GlobalContextSE(nn.Module):
    """GCNet-style squeeze-excitation used inside RepVGG blocks
    (/root/reference/models/bricks/basic.py:29-54)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        ctx_mask = nn.Conv(
            1,
            (1, 1),
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
            name="conv_mask",
        )(x)  # (B, H, W, 1)
        ctx_mask = jax.nn.softmax(ctx_mask.reshape(b, h * w, 1), axis=1)
        context = jnp.einsum("bsc,bso->boc", x.reshape(b, h * w, c), ctx_mask)  # (B,1,C)
        context = context.reshape(b, 1, 1, c)
        se = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=False, dtype=self.dtype, name="se_reduce")(context)
        se = nn.relu(se)
        se = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="se_expand")(se)
        return jax.nn.sigmoid(se) * x


class Linear(nn.Module):
    """nn.Dense with torch's default initialization, for init parity."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = torch_linear_init
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bias_init = self.bias_init
        if bias_init is None:
            bound = 1.0 / math.sqrt(fan_in)
            bias_init = uniform_in(-bound, bound)
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
        )(x)
