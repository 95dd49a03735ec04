"""Attention bricks: multi-scale deformable attention and dense MHA.

Numerical spec: /root/reference/models/bricks/ms_deform_attn.py:215-377
(module) and torch nn.MultiheadAttention (batch_first) for the dense paths.
Compute is channel-last; the sampling core lives in ops/deform_attn.py.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.models.layers import Linear, uniform_in
import os

from salience_detr_tpu.ops.deform_attn import (
    compute_sampling_locations,
    ms_deform_attn_core,
    ms_deform_attn_core_grouped,
    ms_deform_attn_core_quad,
    ms_deform_attn_core_shared,
    ms_deform_attn_core_shared_q8,
)

# The quad-packed exact core is numerically identical to ms_deform_attn_core
# (differential-tested) and ~4x faster on v5e (issue-bound per-head gathers);
# kill-switch for A/B measurement.
_EXACT_QUAD = os.environ.get("MSDA_EXACT_QUAD", "1") == "1"

# Eval-time gather quantization for the HEAD-SHARED core only ("int8" |
# "none"): gathers int8 quad-packed rows — half the gathered bytes of the
# bandwidth-bound encoder sampling (see ms_deform_attn_core_shared_q8).
# Training and the exact/grouped per-head paths are never quantized.  Read at
# trace time (not import time) so harnesses can A/B eval programs in-process.
def _gather_quant() -> str:
    return os.environ.get("MSDA_GATHER_QUANT", "none")


def _offset_bias_init(num_heads: int, num_levels: int, num_points: int):
    """Directional grid initialization of sampling offsets
    (/root/reference/models/bricks/ms_deform_attn.py:266-284)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


def _shared_offset_bias_init(num_levels: int, num_points: int):
    """Directional init for head-shared offsets: the P points fan out over P
    directions (one ring of the reference's per-head star pattern)."""
    thetas = np.arange(num_points, dtype=np.float64) * (2.0 * math.pi / num_points)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (P, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[None, :, :], (num_levels, 1, 1))  # (L, P, 2)

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MultiScaleDeformableAttention(nn.Module):
    """Deformable attention with two sampling modes:

    * ``shared_locations=False`` — the reference's per-head sampling
      (ms_deform_attn.py:215-377), exact for checkpoint parity;
    * ``shared_locations=True`` — TPU-native head-shared sampling locations
      (per-head attention weights retained).  One gather fetches a 2x2xC
      patch for all heads, cutting gather issues 32x — see
      ops/deform_attn.ms_deform_attn_core_shared;
    * ``sampling_groups=G`` (overrides ``shared_locations`` when > 0) — G
      location groups each shared by H/G heads, the speed/quality frontier
      between the two: G=1 ≡ fully shared, G=H ≡ exact per-head.  See
      ops/deform_attn.ms_deform_attn_core_grouped.
    """

    embed_dim: int = 256
    num_levels: int = 4
    num_heads: int = 8
    num_points: int = 4
    shared_locations: bool = False
    # 0 = legacy (derive from shared_locations); 1..H = explicit group count
    sampling_groups: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        reference_points: jnp.ndarray,  # (B, Q, L, 2) or (B, Q, L, 4)
        value: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True=pad
        train: bool = False,
    ) -> jnp.ndarray:
        B, Q, _ = query.shape
        _, S, _ = value.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        head_dim = self.embed_dim // H
        G = self.sampling_groups or (1 if self.shared_locations else H)
        assert 1 <= G <= H and H % G == 0, (G, H)
        offset_heads = G

        value = nn.Dense(
            self.embed_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="value_proj",
        )(value)
        if key_padding_mask is not None:
            value = jnp.where(key_padding_mask[..., None], 0.0, value)

        offsets = nn.Dense(
            offset_heads * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=(
                # G=1: fan the P points over P directions; G>1: the
                # reference's directional star over G location groups
                _shared_offset_bias_init(L, P)
                if G == 1
                else _offset_bias_init(G, L, P)
            ),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(B, Q, offset_heads, L, P, 2)
        weights = nn.Dense(
            H * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(B, Q, H, L * P)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).astype(self.dtype)
        weights = weights.reshape(B, Q, H, L, P)

        locations = compute_sampling_locations(
            reference_points.astype(jnp.float32), offsets.astype(jnp.float32),
            spatial_shapes, P,
        )  # (B, Q, offset_heads, L, P, 2)

        if G == 1:
            if not train and _gather_quant() == "int8":
                out = ms_deform_attn_core_shared_q8(
                    value, spatial_shapes, locations[:, :, 0], weights, H
                )
            else:
                # quad-packed backward scatter in training only (the
                # custom-vjp wrapper costs eval ~3% for a backward-only win:
                # +18% train step)
                out = ms_deform_attn_core_shared(
                    value, spatial_shapes, locations[:, :, 0], weights, H,
                    quad_scatter=train,
                )
        elif G < H:
            out = ms_deform_attn_core_grouped(
                value, spatial_shapes, locations, weights, H
            )
        else:
            # quad fwd layout in train AND eval: the r3 train-OOM (all
            # levels' (B,H,Q*P,4D) gathers + scatter targets live at once in
            # the backward) is fixed by query-chunking inside the quad core
            core = ms_deform_attn_core_quad if _EXACT_QUAD else ms_deform_attn_core
            out = core(
                value.reshape(B, S, H, head_dim), spatial_shapes, locations, weights
            )
        out = nn.Dense(
            self.embed_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="output_proj",
        )(out)
        return out


class MultiheadAttention(nn.Module):
    """Dense MHA matching torch nn.MultiheadAttention(batch_first=True):
    merged in-proj (xavier-initialized by the callers), out-proj, optional
    boolean attn_mask (True = blocked)."""

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        key: jnp.ndarray,  # (B, K, C)
        value: jnp.ndarray,  # (B, K, C)
        attn_mask: Optional[jnp.ndarray] = None,  # (Q, K) or (B, Q, K), True = blocked
    ) -> jnp.ndarray:
        B, Q, C = query.shape
        H = self.num_heads
        head_dim = C // H

        def in_proj(x, idx, name):
            # torch initializes the MERGED (3C, C) in_proj with xavier-uniform
            # (limit sqrt(6/4C)); a per-projection xavier over (C, C) would be
            # sqrt(2) larger.  variance_scaling(0.5, fan_avg, uniform) gives
            # limit sqrt(3*0.5/C) = sqrt(6/4C) — exact from-scratch parity.
            return nn.Dense(
                C,
                kernel_init=nn.initializers.variance_scaling(0.5, "fan_avg", "uniform"),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=name,
            )(x)

        q = in_proj(query, 0, "q_proj").reshape(B, Q, H, head_dim)
        k = in_proj(key, 1, "k_proj").reshape(B, -1, H, head_dim)
        v = in_proj(value, 2, "v_proj").reshape(B, -1, H, head_dim)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(head_dim)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None, None]
            elif attn_mask.ndim == 3:
                attn_mask = attn_mask[:, None]
            logits = jnp.where(attn_mask, -1e30, logits)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Q, C)
        return nn.Dense(
            C,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(out)
