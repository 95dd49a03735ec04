"""R50 with C2-C5 features (strides 4/8/16/32), mirrors the reference's
salience_detr_resnet50_5scale_800_1333.py (return_indices=(0,1,2,3),
max_num_embedding=500)."""

import jax.numpy as jnp

from salience_detr_tpu.models.factory import SalienceDETRConfig

model_config = SalienceDETRConfig(
    backbone="resnet50",
    backbone_return_indices=(0, 1, 2, 3),
    backbone_freeze_indices=(0,),
    max_num_embedding=500,
    dtype=jnp.bfloat16,
)
