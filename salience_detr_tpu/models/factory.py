"""Model factory: composes the full Salience-DETR object graph from a config
dict, mirroring the composition in /root/reference/configs/salience_detr/
salience_detr_resnet50_800_1333.py:31-114 (config-as-Python is preserved at
the configs/ layer; this factory is the single construction point)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp

from salience_detr_tpu.models.backbones.convnext import ConvNeXtBackbone
from salience_detr_tpu.models.backbones.focalnet import FocalNetBackbone
from salience_detr_tpu.models.backbones.resnet import ResNetBackbone
from salience_detr_tpu.models.backbones.swin import SwinTransformerBackbone
from salience_detr_tpu.models.bricks.criterion import (
    SalienceCriterion,
    SetCriterion,
)
from salience_detr_tpu.models.bricks.post_process import PostProcess
from salience_detr_tpu.models.bricks.salience_transformer import SalienceTransformer
from salience_detr_tpu.models.detectors.salience_detr import SalienceDETR
from salience_detr_tpu.models.necks.channel_mapper import ChannelMapper
from salience_detr_tpu.models.necks.repnet import RepVGGPluXNetwork


@dataclass
class SalienceDETRConfig:
    # architecture
    embed_dim: int = 256
    num_classes: int = 91
    num_queries: int = 900
    num_feature_levels: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    dim_feedforward: int = 2048
    num_points: int = 4
    topk_sa: int = 300
    level_filter_ratio: Tuple[float, ...] = (0.4, 0.8, 1.0, 1.0)
    layer_filter_ratio: Tuple[float, ...] = (1.0, 0.8, 0.6, 0.6, 0.4, 0.2)
    max_num_embedding: int = 200
    # TPU-native head-shared deformable sampling (fast path); False restores
    # the reference's exact per-head sampling for checkpoint parity
    shared_sampling_locations: bool = False
    # 0 = legacy (shared_sampling_locations decides); G in [1, num_heads] =
    # G sampling-location groups each shared by num_heads/G heads — the
    # speed/quality frontier between fully-shared (G=1) and exact (G=H);
    # see ops/deform_attn.ms_deform_attn_core_grouped
    sampling_groups: int = 0
    # decoder cross-attn override: -1 = follow the encoder sampling settings;
    # 0 = exact per-head; 1..H = G groups.  The decoder's ~1k queries cost a
    # fraction of the encoder's ~41k query-layers, so exact decoder sampling
    # restores per-head diversity nearly for free
    decoder_sampling_groups: int = -1
    # spatially re-sort each encoder layer's foreground prefix (gather/
    # scatter locality; see SalienceTransformer.sort_encoder_prefix)
    sort_encoder_prefix: bool = False
    # backbone
    backbone: str = "resnet50"
    backbone_return_indices: Tuple[int, ...] = (1, 2, 3)
    backbone_freeze_indices: Tuple[int, ...] = (0,)
    # ResNet only: per-stage DCNv2 (reference resnet.py:177)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    # denoising
    denoising_nums: int = 100
    # deprecated: CDN group count is now the reference's per-batch dynamic
    # value (models/bricks/denoising.py); kept so old configs still load
    dn_max_gt: int = 25
    # matcher / loss
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    salience_limit_range: Sequence[Tuple[float, float]] = (
        (-1, 64), (64, 128), (128, 256), (256, 99999),
    )
    # eval
    min_size: int = 800
    max_size: int = 1333
    select_box_nums_for_evaluation: int = 300
    # numerics
    dtype: Any = jnp.float32
    # backward rematerialization: "full" | "selective" (see SalienceTransformer)
    remat_policy: str = "full"
    # parallelism
    axis_name: Optional[str] = None  # data-parallel axis for BN stat sync


def build_backbone(cfg: SalienceDETRConfig):
    """Backbone dispatch by arch name (the reference's 5 backbone factories,
    SURVEY.md §2.6)."""
    name = cfg.backbone
    if name.startswith(("resnet", "resnext", "wide_resnet")):
        return ResNetBackbone(
            arch=name,
            return_indices=cfg.backbone_return_indices,
            freeze_indices=cfg.backbone_freeze_indices,
            stage_with_dcn=cfg.stage_with_dcn,
            dtype=cfg.dtype,
        )
    if name.startswith("conv"):
        return ConvNeXtBackbone(
            arch=name, return_indices=cfg.backbone_return_indices, dtype=cfg.dtype
        )
    if name.startswith("swin"):
        return SwinTransformerBackbone(
            arch=name, return_indices=cfg.backbone_return_indices, dtype=cfg.dtype
        )
    if name.startswith("focalnet"):
        return FocalNetBackbone(
            arch=name, return_indices=cfg.backbone_return_indices, dtype=cfg.dtype
        )
    if name.startswith(("vit", "eva")):
        from salience_detr_tpu.models.backbones.vit import VisionTransformerBackbone

        return VisionTransformerBackbone(
            arch=name, return_indices=cfg.backbone_return_indices,
            out_channels=cfg.embed_dim, dtype=cfg.dtype,
        )
    raise ValueError(f"unknown backbone {name}")


def build_salience_detr(cfg: SalienceDETRConfig):
    """Returns (model: nn.Module, criterion, salience_criterion, postprocess)."""
    backbone = build_backbone(cfg)
    neck = ChannelMapper(
        in_channels=tuple(backbone.num_channels),
        out_channels=cfg.embed_dim,
        num_outs=cfg.num_feature_levels,
        dtype=cfg.dtype,
    )
    repnet = RepVGGPluXNetwork(
        in_channels_list=(cfg.embed_dim,) * cfg.num_feature_levels,
        out_channels_list=(cfg.embed_dim,) * cfg.num_feature_levels,
        groups=4,
        dtype=cfg.dtype,
        axis_name=cfg.axis_name,
    )
    transformer = SalienceTransformer(
        num_classes=cfg.num_classes,
        embed_dim=cfg.embed_dim,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        num_heads=cfg.num_heads,
        d_ffn=cfg.dim_feedforward,
        num_feature_levels=cfg.num_feature_levels,
        num_points=cfg.num_points,
        topk_sa=cfg.topk_sa,
        two_stage_num_proposals=cfg.num_queries,
        level_filter_ratio=cfg.level_filter_ratio,
        layer_filter_ratio=cfg.layer_filter_ratio,
        max_num_embedding=cfg.max_num_embedding,
        neck=repnet,
        shared_locations=cfg.shared_sampling_locations,
        sampling_groups=cfg.sampling_groups,
        decoder_sampling_groups=cfg.decoder_sampling_groups,
        sort_encoder_prefix=cfg.sort_encoder_prefix,
        remat_policy=cfg.remat_policy,
        dtype=cfg.dtype,
    )
    # backbone stage i has stride 4*2**i; extra pyramid levels from the neck
    # halve resolution again (so the 4scale r50 config gives 8/16/32/64 and
    # the 5scale one 4/8/16/32/64, matching the reference neck layouts)
    strides = tuple(4 * 2**i for i in cfg.backbone_return_indices)
    while len(strides) < cfg.num_feature_levels:
        strides += (strides[-1] * 2,)
    model = SalienceDETR(
        backbone=backbone,
        neck=neck,
        transformer=transformer,
        num_classes=cfg.num_classes,
        num_queries=cfg.num_queries,
        denoising_nums=cfg.denoising_nums,
        dn_max_gt=cfg.dn_max_gt,
        strides=strides,
        dtype=cfg.dtype,
    )
    criterion = SetCriterion(
        num_classes=cfg.num_classes,
        cost_class=cfg.cost_class,
        cost_bbox=cfg.cost_bbox,
        cost_giou=cfg.cost_giou,
        alpha=cfg.focal_alpha,
        gamma=cfg.focal_gamma,
        hybrid=True,
    )
    salience_criterion = SalienceCriterion(
        limit_range=cfg.salience_limit_range, noise_scale=0.0,
        alpha=cfg.focal_alpha, gamma=cfg.focal_gamma,
    )
    postprocess = PostProcess(cfg.select_box_nums_for_evaluation)
    return model, criterion, salience_criterion, postprocess
