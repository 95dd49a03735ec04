"""FocalNet-Large-LRF fl4 (IN-22K) backbone variant (reference
salience_detr_focalnet_large_lrf_800_1333.py)."""

import jax.numpy as jnp

from salience_detr_tpu.models.factory import SalienceDETRConfig

model_config = SalienceDETRConfig(
    backbone="focalnet_large_lrf_fl4",
    backbone_return_indices=(1, 2, 3),
    dtype=jnp.bfloat16,
)
