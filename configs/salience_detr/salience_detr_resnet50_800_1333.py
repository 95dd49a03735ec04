"""Flagship config: Salience-DETR ResNet-50, 800x1333 eval canvas.

Mirrors /root/reference/configs/salience_detr/salience_detr_resnet50_800_1333.py
but builds a pure dataclass (SURVEY.md §5.6) instead of a live module graph.
"""

import jax.numpy as jnp

from salience_detr_tpu.models.factory import SalienceDETRConfig

model_config = SalienceDETRConfig(
    embed_dim=256,
    num_classes=91,
    num_queries=900,
    num_feature_levels=4,
    num_encoder_layers=6,
    num_decoder_layers=6,
    num_heads=8,
    dim_feedforward=2048,
    num_points=4,
    topk_sa=300,
    level_filter_ratio=(0.4, 0.8, 1.0, 1.0),
    layer_filter_ratio=(1.0, 0.8, 0.6, 0.6, 0.4, 0.2),
    backbone="resnet50",
    backbone_return_indices=(1, 2, 3),
    backbone_freeze_indices=(0,),
    denoising_nums=100,
    dn_max_gt=25,
    cost_class=2.0,
    cost_bbox=5.0,
    cost_giou=2.0,
    min_size=800,
    max_size=1333,
    select_box_nums_for_evaluation=300,
    # TPU-native head-shared deformable sampling in the ENCODER: XLA gathers
    # are issue-bound (~10ns/slice), so fetching one 2x2xC patch per point
    # instead of per-head 32-float corners cuts the model's dominant cost ~30x
    # (tools/bench_gather.py).  The DECODER cross-attn keeps the reference's
    # exact per-head sampling (decoder_sampling_groups=0): the paired quality
    # campaign (ROADMAP.md, docs/quality_campaign_r4.jsonl) showed per-head
    # decoder sampling is the quality lever, and the decoder is only ~2.5% of
    # the encoder's gather volume.
    shared_sampling_locations=True,
    decoder_sampling_groups=0,
    dtype=jnp.bfloat16,
    # BatchNorm stats sync automatically under GSPMD (global-batch reductions);
    # a named-axis psum is only needed under shard_map
    axis_name=None,
)
