"""Salience transformer: hierarchical salience filtering encoder, two-stage
proposal selection with on-device grid NMS, and box-refining decoder.

Numerical spec: /root/reference/models/bricks/salience_transformer.py
(SalienceTransformer :50, MaskPredictor :16, encoder :298/:399, decoder
:500/:592) and base_transformer.py:6-112.  Re-designed for XLA static shapes:

* per-level token budgets come from the padded canvas
  (``level_filter_ratio`` x static token counts) instead of the batch-max of
  per-image valid counts (salience_transformer.py:117-121) — the reference
  itself over-selects for small images and drops the surplus at scatter time,
  and we keep exactly that semantics via the per-image ``focus_token_nums``
  scatter mask;
* per-encoder-layer prefixes (``layer_filter_ratio``) are static ints;
* the two-stage NMS (salience_transformer.py:249-295) is the exact on-device
  grid NMS from ops/nms.py with a fixed 900-proposal output;
* everything else (alpha-modulated salience cascade, shared encoder class
  head, look-forward-twice refinement) follows the reference math 1:1.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.models.bricks.attention import (
    MultiheadAttention,
    MultiScaleDeformableAttention,
)
from salience_detr_tpu.models.layers import MLP, Linear, uniform_in
from salience_detr_tpu.ops.misc import flatten_multi_level, inverse_sigmoid
from salience_detr_tpu.ops.nms import grid_nms_topk
from salience_detr_tpu.ops.pos_encoding import get_sine_pos_embed

LN_EPS = 1e-5  # torch LayerNorm default


def _class_bias_init(prior_prob: float = 0.01):
    bias = -math.log((1 - prior_prob) / prior_prob)
    return nn.initializers.constant(bias)


def bilinear_resize_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear NHWC resize with align_corners=True (matches the reference's
    F.interpolate for the salience score cascade, salience_transformer.py:135)."""
    b, h, w, c = x.shape
    oh, ow = out_hw

    def axis_coords(src, dst):
        if dst == 1:
            return jnp.zeros((1,)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)
        pos = jnp.arange(dst) * ((src - 1) / (dst - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, src - 1)
        hi = jnp.clip(lo + 1, 0, src - 1)
        frac = pos - lo
        return frac, lo, hi

    fy, y0, y1 = axis_coords(h, oh)
    fx, x0, x1 = axis_coords(w, ow)
    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + x[:, y0][:, :, x1] * fx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + x[:, y1][:, :, x1] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


class MaskPredictor(nn.Module):
    """LN->Linear->GELU, split local/global halves, global token mean, 3-layer
    MLP to a scalar (/root/reference/models/bricks/salience_transformer.py:16-47)."""

    h_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = lambda n, name: nn.Dense(
            n, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name=name)
        z = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        z = dense(self.h_dim, "layer1")(z)
        z = jax.nn.gelu(z, approximate=False)
        z_local, z_global = z[..., : self.h_dim // 2], z[..., self.h_dim // 2 :]
        z_global = jnp.mean(z_global, axis=1, keepdims=True)
        z_global = jnp.broadcast_to(z_global, z_local.shape[:-1] + (z_global.shape[-1],))
        z = jnp.concatenate([z_local, z_global], axis=-1)
        z = dense(self.h_dim // 2, "layer2_0")(z)
        z = jax.nn.gelu(z, approximate=False)
        z = dense(self.h_dim // 4, "layer2_1")(z)
        z = jax.nn.gelu(z, approximate=False)
        return dense(1, "layer2_2")(z)


class SalienceEncoderLayer(nn.Module):
    """Top-k dense pre-attention + deformable self-attention + FFN
    (salience_transformer.py:298-396)."""

    embed_dim: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    topk_sa: int = 300
    shared_locations: bool = False
    sampling_groups: int = 0  # 0 = legacy; 1..H location groups (attention.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,  # (B, K, C)
        query_pos,  # (B, K, C)
        value,  # (B, S, C)
        reference_points,  # (B, K, L, 2)
        spatial_shapes,
        key_padding_mask,  # (B, S)
        score_tgt,  # (B, K, num_classes)
        foreground_pre_layer,  # (B, K)
        train: bool = False,
    ):
        B, K, C = query.shape
        topk_sa = min(self.topk_sa, K)

        mc_score = jnp.max(score_tgt, axis=-1) * foreground_pre_layer  # (B, K)
        _, sel = jax.lax.top_k(mc_score, topk_sa)  # (B, topk_sa)
        take = lambda arr: jnp.take_along_axis(arr, sel[..., None], axis=1)
        select_tgt = take(query)
        select_pos = take(query_pos)
        qk = select_tgt + select_pos
        tgt2 = MultiheadAttention(C, self.n_heads, dtype=self.dtype, name="pre_attention")(
            qk, qk, select_tgt
        )
        select_tgt = select_tgt + tgt2
        select_tgt = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="pre_norm")(select_tgt)
        batch_ix = jnp.arange(B)[:, None]
        query = query.at[batch_ix, sel].set(select_tgt)

        src2 = MultiScaleDeformableAttention(
            C, self.n_levels, self.n_heads, self.n_points,
            shared_locations=self.shared_locations,
            sampling_groups=self.sampling_groups, dtype=self.dtype, name="self_attn",
        )(query + query_pos, reference_points, value, spatial_shapes, key_padding_mask,
          train=train)
        query = query + src2
        query = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(query)

        # ffn
        src2 = nn.Dense(
            self.d_ffn, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="linear1")(query)
        src2 = nn.relu(src2)
        src2 = nn.Dense(
            C, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="linear2")(src2)
        query = query + src2
        query = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(query)
        return query


class SalienceDecoderLayer(nn.Module):
    """Self-attn (with CDN mask) -> deformable cross-attn -> FFN
    (salience_transformer.py:500-589)."""

    embed_dim: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    shared_locations: bool = False
    sampling_groups: int = 0  # 0 = legacy; 1..H location groups (attention.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,  # (B, Q, C)
        query_pos,
        reference_points,  # (B, Q, L, 4)
        value,  # (B, S, C)
        spatial_shapes,
        key_padding_mask,
        self_attn_mask=None,
        train: bool = False,
    ):
        C = self.embed_dim
        qk = query + query_pos
        q2 = MultiheadAttention(C, self.n_heads, dtype=self.dtype, name="self_attn")(
            qk, qk, query, attn_mask=self_attn_mask
        )
        query = query + q2
        query = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(query)

        q2 = MultiScaleDeformableAttention(
            C, self.n_levels, self.n_heads, self.n_points,
            shared_locations=self.shared_locations,
            sampling_groups=self.sampling_groups, dtype=self.dtype, name="cross_attn",
        )(query + query_pos, reference_points, value, spatial_shapes, key_padding_mask,
          train=train)
        query = query + q2
        query = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(query)

        q2 = nn.Dense(
            self.d_ffn, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="linear1")(query)
        q2 = nn.relu(q2)
        q2 = nn.Dense(
            C, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="linear2")(q2)
        query = query + q2
        query = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm3")(query)
        return query


class SalienceTransformer(nn.Module):
    """Full transformer; __call__ signature mirrors the reference forward
    (salience_transformer.py:97-246) with static shapes."""

    num_classes: int
    embed_dim: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    d_ffn: int = 2048
    num_feature_levels: int = 4
    num_points: int = 4
    topk_sa: int = 300
    two_stage_num_proposals: int = 900
    level_filter_ratio: Tuple[float, ...] = (0.4, 0.8, 1.0, 1.0)
    layer_filter_ratio: Tuple[float, ...] = (1.0, 0.8, 0.6, 0.6, 0.4, 0.2)
    max_num_embedding: int = 200  # background embedding table size
    neck: Optional[nn.Module] = None  # RepVGGPluXNetwork factory applied in-line
    # TPU-native head-shared sampling locations (see bricks/attention.py);
    # set False for exact reference-checkpoint numerics
    shared_locations: bool = False
    # 0 = legacy (shared_locations decides); 1..H = G location groups each
    # shared by H/G heads (ops/deform_attn.ms_deform_attn_core_grouped)
    sampling_groups: int = 0
    # decoder cross-attn override: -1 = follow the encoder settings; 0 =
    # exact per-head; 1..H = G location groups.  The decoder's ~1k queries
    # are a rounding error next to the encoder's ~41k query-layers, so exact
    # decoder sampling buys back per-head diversity nearly for free
    decoder_sampling_groups: int = -1
    # re-order each encoder layer's foreground prefix by ascending flat
    # spatial index before the gather/layer/scatter trio.  MSDA output is
    # per-query, the pre-attn top-300 is selected by score, and the
    # scatter-back indices are unique, so the permutation is semantics-free
    # (modulo top-k tie breaks) — but it turns the score-ordered (spatially
    # random) HBM access pattern of the corner gathers, the query gathers,
    # and the scatter-back into a near-sequential one (tools/bench_locality)
    sort_encoder_prefix: bool = False
    # rematerialize encoder/decoder layers in backward: the deformable
    # attention's gathered rows (~1.5GB/layer at the 800x1344 canvas) would
    # otherwise be saved as residuals and exhaust HBM
    remat_layers: bool = True
    # "full": recompute everything per layer (lowest memory);
    # "selective": save all residuals except the named msda gathers — fewer
    # recomputed matmuls per backward at higher activation memory;
    # "dots": save matmul/einsum outputs only (jax.checkpoint_policies.
    # checkpoint_dots) — the MSDA gathers are not dots, so the ~1.5GB/layer
    # gathered rows still rematerialize while projections/FFNs don't
    remat_policy: str = "full"
    dtype: Any = jnp.float32

    def setup(self):
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.embed_dim),
        )
        self.enc_output = nn.Dense(
            self.embed_dim, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="enc_output_norm")

        self.alpha = self.param("alpha", uniform_in(-0.3, 0.3), (3,))
        self.enc_mask_predictor = MaskPredictor(self.embed_dim, dtype=self.dtype)
        self.encoder_class_head = nn.Dense(
            self.num_classes, kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            bias_init=_class_bias_init(), dtype=self.dtype, name="encoder_class_head")
        self.encoder_bbox_head = MLP(
            self.embed_dim, 4, 3, zero_init_last=True, dtype=self.dtype,
            name="encoder_bbox_head")
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0),
            (self.two_stage_num_proposals, self.embed_dim),
        )

        remat_kwargs = {}
        if self.remat_policy == "selective":
            remat_kwargs["policy"] = jax.checkpoint_policies.save_anything_except_these_names(
                "msda_gather"
            )
        elif self.remat_policy == "dots":
            remat_kwargs["policy"] = jax.checkpoint_policies.checkpoint_dots
        enc_cls = (
            nn.remat(SalienceEncoderLayer, static_argnums=(5, 9), **remat_kwargs)
            if self.remat_layers
            else SalienceEncoderLayer
        )
        self.encoder_layers = [
            enc_cls(
                self.embed_dim, self.d_ffn, self.num_heads, self.num_feature_levels,
                self.num_points, self.topk_sa,
                shared_locations=self.shared_locations,
                sampling_groups=self.sampling_groups,
                dtype=self.dtype, name=f"encoder_layer_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        # learned background embedding (PositionEmbeddingLearned, encoder :467)
        self.background_row_embed = self.param(
            "background_row_embed", uniform_in(0.0, 1.0),
            (self.max_num_embedding, self.embed_dim // 2),
        )
        self.background_col_embed = self.param(
            "background_col_embed", uniform_in(0.0, 1.0),
            (self.max_num_embedding, self.embed_dim // 2),
        )

        dec_cls = (
            nn.remat(SalienceDecoderLayer, static_argnums=(5, 8), **remat_kwargs)
            if self.remat_layers
            else SalienceDecoderLayer
        )
        if self.decoder_sampling_groups < 0:
            dec_shared, dec_groups = self.shared_locations, self.sampling_groups
        elif self.decoder_sampling_groups == 0:
            dec_shared, dec_groups = False, self.num_heads  # exact per-head
        else:
            dec_shared, dec_groups = True, self.decoder_sampling_groups
        self.decoder_layers = [
            dec_cls(
                self.embed_dim, self.d_ffn, self.num_heads, self.num_feature_levels,
                self.num_points, shared_locations=dec_shared,
                sampling_groups=dec_groups,
                dtype=self.dtype, name=f"decoder_layer_{i}",
            )
            for i in range(self.num_decoder_layers)
        ]
        self.ref_point_head = MLP(self.embed_dim, self.embed_dim, 2, dtype=self.dtype, name="ref_point_head")
        self.decoder_class_heads = [
            nn.Dense(
                self.num_classes,
                kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                bias_init=_class_bias_init(), dtype=self.dtype, name=f"class_head_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.decoder_bbox_heads = [
            MLP(self.embed_dim, 4, 3, zero_init_last=True, dtype=self.dtype,
                name=f"bbox_head_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="decoder_norm")

    # ------------------------------------------------------------------ helpers

    def _gen_encoder_output_proposals(self, memory, mask_flatten, spatial_shapes, valid_hw):
        """TwostageTransformer.gen_encoder_output_proposals
        (/root/reference/models/bricks/base_transformer.py:74-112)."""
        B, S, C = memory.shape
        proposals = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            grid_y = jnp.arange(h, dtype=jnp.float32)
            grid_x = jnp.arange(w, dtype=jnp.float32)
            gx, gy = jnp.meshgrid(grid_x, grid_y)  # (h, w)
            grid = jnp.stack([gx, gy], -1)[None]  # (1, h, w, 2)
            scale = valid_hw[lvl][:, ::-1].astype(jnp.float32)[:, None, None, :]  # (B,1,1,2)=(w,h)
            grid = (grid + 0.5) / scale
            wh = jnp.full_like(grid, 0.05 * 2.0**lvl)
            proposals.append(jnp.concatenate([grid, wh], -1).reshape(B, h * w, 4))
        output_proposals = jnp.concatenate(proposals, 1)  # (B, S, 4)
        valid = jnp.all(
            (output_proposals > 0.01) & (output_proposals < 0.99), -1, keepdims=True
        )
        p = jnp.clip(output_proposals, 1e-7, 1.0 - 1e-7)
        output_proposals = jnp.log(p / (1 - p))
        invalid = mask_flatten[..., None] | ~valid
        output_proposals = jnp.where(invalid, jnp.inf, output_proposals)

        output_memory = memory * (~mask_flatten[..., None]) * valid
        output_memory = self.enc_output_norm(self.enc_output(output_memory))
        return output_memory, output_proposals

    def _encoder_reference_points(self, spatial_shapes, valid_ratios):
        """Grid reference points (salience_transformer.py:417-432)."""
        B = valid_ratios.shape[0]
        ref_list = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)
            rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)
            gx, gy = jnp.meshgrid(rx, ry)
            ref_y = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
            ref_x = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
            ref_list.append(jnp.stack([ref_x, ref_y], -1))  # (B, hw, 2)
        ref = jnp.concatenate(ref_list, 1)  # (B, S, 2)
        return ref[:, :, None] * valid_ratios[:, None]  # (B, S, L, 2)

    def _background_embedding(self, spatial_shapes, batch_size):
        """PositionEmbeddingLearned flattened over levels (encoder :487-495)."""
        embs = []
        for h, w in spatial_shapes:
            x_emb = self.background_col_embed[:w]  # (w, C/2)
            y_emb = self.background_row_embed[:h]  # (h, C/2)
            pos = jnp.concatenate(
                [
                    jnp.broadcast_to(x_emb[None, :, :], (h, w, x_emb.shape[-1])),
                    jnp.broadcast_to(y_emb[:, None, :], (h, w, y_emb.shape[-1])),
                ],
                axis=-1,
            )
            embs.append(pos.reshape(h * w, -1))
        emb = jnp.concatenate(embs, 0)[None]  # (1, S, C)
        return jnp.broadcast_to(emb, (batch_size,) + emb.shape[1:])

    # ------------------------------------------------------------------ forward

    def __call__(
        self,
        multi_level_feats: List[jnp.ndarray],  # [(B, h, w, C)]
        multi_level_masks: List[jnp.ndarray],  # [(B, h, w)] True = padding
        multi_level_pos: List[jnp.ndarray],  # [(B, h, w, C)]
        valid_hw: List[jnp.ndarray],  # [(B, 2)] valid (h, w) per level
        valid_ratios: jnp.ndarray,  # (B, L, 2) (w, h) ratios
        noised_label_query: Optional[jnp.ndarray] = None,  # (B, Ndn, C)
        noised_box_query: Optional[jnp.ndarray] = None,  # (B, Ndn, 4) logits
        attn_mask: Optional[jnp.ndarray] = None,  # (Qt, Qt) True = blocked
        train: bool = False,
    ):
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in multi_level_feats)
        level_sizes = [h * w for h, w in spatial_shapes]
        S = sum(level_sizes)
        starts = np.concatenate([[0], np.cumsum(level_sizes)]).astype(np.int32)
        B = multi_level_feats[0].shape[0]
        C = self.embed_dim
        L = len(spatial_shapes)

        with jax.named_scope("flatten_inputs"):
            feat_flatten = flatten_multi_level(multi_level_feats)
            mask_flatten = flatten_multi_level(multi_level_masks)
            lvl_pos = flatten_multi_level(
                [p + self.level_embeds[i].astype(p.dtype) for i, p in enumerate(multi_level_pos)]
            )

        with jax.named_scope("backbone_memory_proj"):
            backbone_output_memory, _ = self._gen_encoder_output_proposals(
                feat_flatten + lvl_pos, mask_flatten, spatial_shapes, valid_hw
            )

        # static per-level budgets from padded canvas; per-image focus counts
        # reproduce the reference's valid-token accounting (:117-121)
        level_token_nums = [
            max(int(sz * r), 1) for sz, r in zip(level_sizes, self.level_filter_ratio)
        ]
        valid_token_nums = jnp.stack(
            [(vh[:, 0] * vh[:, 1]) for vh in valid_hw], -1
        )  # (B, L)
        ratios = jnp.asarray(self.level_filter_ratio, jnp.float32)
        focus_token_nums = (valid_token_nums.astype(jnp.float32) * ratios).astype(jnp.int32)
        focus_token_nums = jnp.sum(focus_token_nums, -1)  # (B,)

        # high -> low level salience cascade (:128-153)
        selected_score, selected_inds, salience_score = [], [], [None] * L
        score = None
        with jax.named_scope("salience_cascade"):
            for level_idx in range(L - 1, -1, -1):
                h, w = spatial_shapes[level_idx]
                s0, s1 = int(starts[level_idx]), int(starts[level_idx + 1])
                level_memory = backbone_output_memory[:, s0:s1]
                mask = mask_flatten[:, s0:s1]
                if level_idx != L - 1:
                    up = bilinear_resize_align_corners(score, (h, w))  # (B, h, w, 1)
                    up = up.reshape(B, h * w, 1)
                    level_memory = level_memory + level_memory * up * self.alpha[level_idx].astype(level_memory.dtype)
                score_tok = self.enc_mask_predictor(level_memory)  # (B, hw, 1)
                valid_score = jnp.where(mask, jnp.min(score_tok), score_tok[..., 0])
                score = score_tok.reshape(B, h, w, 1)
                k = min(level_token_nums[level_idx], h * w)
                level_score, level_inds = jax.lax.top_k(valid_score, k)
                selected_inds.append(level_inds + s0)
                selected_score.append(level_score)
                salience_score[level_idx] = score

        # global sort and per-layer prefixes (:156-165)
        with jax.named_scope("salience_sort"):
            selected_score = jnp.concatenate(selected_score[::-1], 1)
            selected_inds = jnp.concatenate(selected_inds[::-1], 1)
            order = jnp.argsort(-selected_score, axis=1)
            selected_inds = jnp.take_along_axis(selected_inds, order, axis=1)
            K = selected_inds.shape[1]
            layer_ks = [max(int(K * r), 1) for r in self.layer_filter_ratio]

            foreground_score = flatten_multi_level([s[..., 0] for s in salience_score])
            foreground_score = jnp.where(mask_flatten, jnp.min(foreground_score), foreground_score)

        # ---------------- encoder (:434-497)
        # NOTE: deformable attention samples from the ORIGINAL encoder input in
        # every layer — the reference binds `value = output = query` once and
        # never rebinds `value` (salience_transformer.py:449), so updated
        # memory is only seen through the gathered queries.
        enc_ref_points = self._encoder_reference_points(spatial_shapes, valid_ratios)
        output = feat_flatten
        enc_value = feat_flatten
        batch_ix = jnp.arange(B)[:, None]
        last_inds = None
        for layer_id, layer in enumerate(self.encoder_layers):
            with jax.named_scope(f"encoder_layer_{layer_id}"):
                inds = selected_inds[:, : layer_ks[layer_id]]  # (B, K_i)
                # focus mask rides the score order; compute BEFORE any re-sort
                pos_rank = jnp.arange(inds.shape[1])[None, :]
                upd = pos_rank < focus_token_nums[:, None]
                if self.sort_encoder_prefix:
                    with jax.named_scope("prefix_sort"):
                        perm = jnp.argsort(inds, axis=1)
                        inds = jnp.take_along_axis(inds, perm, axis=1)
                        upd = jnp.take_along_axis(upd, perm, axis=1)
                last_inds = inds
                # top_k indices are always in [0, S): promise_in_bounds skips
                # the clamp+select pass the default fill mode adds per gather
                query = jnp.take_along_axis(
                    output, inds[..., None], axis=1, mode="promise_in_bounds"
                )
                query_pos = jnp.take_along_axis(
                    lvl_pos, inds[..., None], axis=1, mode="promise_in_bounds"
                )
                fg_pre = jnp.take_along_axis(
                    foreground_score, inds, axis=1, mode="promise_in_bounds"
                )
                ref = jnp.take_along_axis(
                    enc_ref_points.reshape(B, S, -1), inds[..., None], axis=1,
                    mode="promise_in_bounds",
                ).reshape(B, -1, L, 2)
                score_tgt = self.encoder_class_head(query)  # shared enhance_mcsp (:79)
                query = layer(
                    query, query_pos, enc_value, ref, spatial_shapes, mask_flatten,
                    score_tgt, fg_pre, train,
                )
                # masked scatter back (:474-485): per-image focus prefix only
                cur = jnp.take_along_axis(
                    output, inds[..., None], axis=1, mode="promise_in_bounds"
                )
                merged = jnp.where(upd[..., None], query, cur)
                output = output.at[batch_ix, inds].set(
                    merged, mode="promise_in_bounds"
                )

        # background embedding for non-foreground tokens (:487-495)
        with jax.named_scope("background_embed"):
            bg = self._background_embedding(spatial_shapes, B).astype(output.dtype)
            bg = bg.at[batch_ix, last_inds].set(0.0)
            bg = bg * (~mask_flatten[..., None])
            memory = output + bg

        # ---------------- neck re-fusion (:185-192)
        if self.neck is not None:
            with jax.named_scope("repnet_neck"):
                feat_unflat = {}
                for lvl, (h, w) in enumerate(spatial_shapes):
                    s0, s1 = int(starts[lvl]), int(starts[lvl + 1])
                    feat_unflat[lvl] = memory[:, s0:s1].reshape(B, h, w, C)
                feat_unflat = self.neck(feat_unflat, train=train)
                memory = jnp.concatenate(
                    [f.reshape(B, -1, C) for f in feat_unflat.values()], axis=1
                )

        # ---------------- two-stage proposals (:195-212)
        with jax.named_scope("two_stage_heads"):
            output_memory, output_proposals = self._gen_encoder_output_proposals(
                memory, mask_flatten, spatial_shapes, valid_hw
            )
            enc_outputs_class = self.encoder_class_head(output_memory)
            coord_logits = self.encoder_bbox_head(output_memory) + output_proposals
            enc_outputs_coord = jax.nn.sigmoid(coord_logits)

        topk = min(self.two_stage_num_proposals * 4, S)
        num_proposals = min(self.two_stage_num_proposals, topk)
        with jax.named_scope("proposal_topk"):
            topk_scores, topk_index = jax.lax.top_k(
                jnp.max(enc_outputs_class, -1), topk
            )  # (B, topk), sorted by score
        with jax.named_scope("proposal_nms"):
            nms_index = jax.vmap(
                lambda ti: grid_nms_topk(ti, spatial_shapes, num_proposals)
            )(topk_index)  # (B, num_proposals)
            enc_class = jnp.take_along_axis(enc_outputs_class, nms_index[..., None], axis=1)
            enc_coord = jnp.take_along_axis(enc_outputs_coord, nms_index[..., None], axis=1)

        # ---------------- decoder inputs (:215-233)
        reference_points = jax.lax.stop_gradient(enc_coord)
        target = jnp.broadcast_to(
            self.tgt_embed[None, :num_proposals].astype(memory.dtype),
            (B, num_proposals, C),
        )
        if noised_label_query is not None and noised_box_query is not None:
            target = jnp.concatenate([noised_label_query, target], 1)
            reference_points = jnp.concatenate(
                [jax.nn.sigmoid(noised_box_query), reference_points], 1
            )

        outputs_classes, outputs_coords = self._decode(
            target, reference_points, memory, mask_flatten, spatial_shapes,
            valid_ratios, attn_mask, train,
        )
        return outputs_classes, outputs_coords, enc_class, enc_coord, salience_score

    def _decode(
        self, query, reference_points, value, key_padding_mask, spatial_shapes,
        valid_ratios, attn_mask, train=False,
    ):
        """Decoder with look-forward-twice (salience_transformer.py:626-674)."""
        outputs_classes, outputs_coords = [], []
        vr_scale = jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None]  # (B,1,L,4)

        for i, layer in enumerate(self.decoder_layers):
            with jax.named_scope(f"decoder_layer_{i}"):
                ref_in = jax.lax.stop_gradient(reference_points)[:, :, None] * vr_scale  # (B,Q,L,4)
                query_sine = get_sine_pos_embed(ref_in[:, :, 0, :], num_pos_feats=self.embed_dim // 2)
                query_pos = self.ref_point_head(query_sine.astype(query.dtype))

                query = layer(
                    query, query_pos, ref_in, value, spatial_shapes,
                    key_padding_mask, attn_mask, train,
                )

                normed = self.decoder_norm(query)
                output_class = self.decoder_class_heads[i](normed)
                output_coord = jax.nn.sigmoid(
                    self.decoder_bbox_heads[i](normed) + inverse_sigmoid(reference_points)
                )
                outputs_classes.append(output_class)
                outputs_coords.append(output_coord)

                if i == self.num_decoder_layers - 1:
                    break
                # iterative refinement uses detached refs, un-normed query
                reference_points = jax.nn.sigmoid(
                    self.decoder_bbox_heads[i](query)
                    + inverse_sigmoid(jax.lax.stop_gradient(reference_points))
                )

        return jnp.stack(outputs_classes), jnp.stack(outputs_coords)
