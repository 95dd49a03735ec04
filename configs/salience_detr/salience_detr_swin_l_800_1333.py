"""Swin-L (IN-22K) backbone variant (reference salience_detr_swin_l_800_1333.py)."""

import jax.numpy as jnp

from salience_detr_tpu.models.factory import SalienceDETRConfig

model_config = SalienceDETRConfig(
    backbone="swin_l",
    backbone_return_indices=(1, 2, 3),
    dtype=jnp.bfloat16,
)
