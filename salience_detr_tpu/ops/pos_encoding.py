"""Position embeddings: sinusoidal and learned.

Numerical spec: /root/reference/models/bricks/position_encoding.py
(PositionEmbeddingSine at :9, PositionEmbeddingLearned at :68,
get_sine_pos_embed at :105).  Outputs are channel-last (NHWC) — the
TPU-native layout — where the reference emits NCHW.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def _dim_t(num_pos_feats: int, temperature: float) -> jnp.ndarray:
    exponent = 2.0 * (jnp.arange(num_pos_feats) // 2).astype(jnp.float32) / num_pos_feats
    return jnp.asarray(temperature, jnp.float32) ** exponent


def _interleave_sin_cos(x: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(x[..., 0::2]), cos(x[..., 1::2])).flatten(-2) of the reference."""
    sin = jnp.sin(x[..., 0::2])
    cos = jnp.cos(x[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*x.shape[:-1], -1)


def sine_position_embedding(
    padding_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2.0 * math.pi,
    eps: float = 1e-6,
    offset: float = 0.0,
) -> jnp.ndarray:
    """DETR sine embedding over a padding mask (True = padding).

    padding_mask: (B, H, W) bool -> (B, H, W, 2*num_pos_feats) float32.
    The Salience-DETR config uses num_pos_feats=embed_dim//2, normalize=True,
    offset=-0.5 (/root/reference/configs/salience_detr/
    salience_detr_resnet50_800_1333.py:32).
    """
    not_mask = (~padding_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    else:
        y_embed = y_embed + offset
        x_embed = x_embed + offset

    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class LearnedPositionEmbedding(nn.Module):
    """Absolute learned 2D position embedding.

    Spec: /root/reference/models/bricks/position_encoding.py:68-95
    (PositionEmbeddingLearned) — one row and one column embedding table of
    ``num_embeddings`` slots, uniform-initialized; position (i, j) gets
    concat(col_embed[j], row_embed[i]) — note the reference's (x, y) channel
    order here, the opposite of the sine embedding's (y, x).  Unused by the
    shipped Salience-DETR configs (they use sine), provided for parity.

    Call: padding_mask (B, H, W) bool -> (B, H, W, 2*num_pos_feats) float32.
    H and W must not exceed ``num_embeddings`` (the reference indexes the
    tables directly and would fail the same way).
    """

    num_embeddings: int = 50
    num_pos_feats: int = 256

    @nn.compact
    def __call__(self, padding_mask: jnp.ndarray) -> jnp.ndarray:
        B, h, w = padding_mask.shape
        row = nn.Embed(
            self.num_embeddings,
            self.num_pos_feats,
            embedding_init=nn.initializers.uniform(scale=1.0),
            name="row_embed",
        )(jnp.arange(h))  # (h, F)
        col = nn.Embed(
            self.num_embeddings,
            self.num_pos_feats,
            embedding_init=nn.initializers.uniform(scale=1.0),
            name="col_embed",
        )(jnp.arange(w))  # (w, F)
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(col[None, :, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(row[:, None, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (B, h, w, 2 * self.num_pos_feats))


def get_sine_pos_embed(
    pos_tensor: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    scale: float = 2.0 * math.pi,
    exchange_xy: bool = True,
) -> jnp.ndarray:
    """Sine embedding of a coordinate tensor (..., D) -> (..., D*num_pos_feats).

    With exchange_xy the first two coordinate blocks are swapped so that an
    (x, y, ...) input yields [emb(y), emb(x), ...] — used by the decoder's
    ref_point_head (/root/reference/models/bricks/salience_transformer.py:642).
    """
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_res = _interleave_sin_cos(pos_tensor[..., None].astype(jnp.float32) * scale / dim_t)
    if exchange_xy and pos_res.shape[-2] >= 2:
        order = [1, 0] + list(range(2, pos_res.shape[-2]))
        pos_res = pos_res[..., order, :]
    return pos_res.reshape(*pos_tensor.shape[:-1], -1)
