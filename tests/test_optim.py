"""Optimizer construction: param grouping rules, schedule shape, freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from salience_detr_tpu.engine.optim import (
    build_optimizer,
    make_lr_schedule,
    param_group_of,
)
from salience_detr_tpu.models.backbones.resnet import frozen_param_predicate


def path(*parts):
    return tuple(jax.tree_util.DictKey(p) for p in parts)


class TestParamGroups:
    def test_grouping_rules(self):
        # backbone conv -> backbone (0.1x, wd)
        assert param_group_of(path("backbone", "layer2_0", "conv1", "kernel")) == "backbone"
        # backbone bias -> backbone_norm
        assert param_group_of(path("backbone", "conv1", "bias")) == "backbone_norm"
        # sampling_offsets weight -> linear_projection
        assert (
            param_group_of(path("transformer", "encoder_layer_0", "self_attn",
                                "sampling_offsets", "kernel"))
            == "linear_projection"
        )
        # sampling_offsets bias -> linear_projection_norm
        assert (
            param_group_of(path("transformer", "encoder_layer_0", "self_attn",
                                "sampling_offsets", "bias"))
            == "linear_projection_norm"
        )
        # LayerNorm scale (module name contains 'norm') -> other_norm
        assert param_group_of(path("transformer", "enc_output_norm", "scale")) == "other_norm"
        # plain dense kernel -> other
        assert param_group_of(path("transformer", "enc_output", "kernel")) == "other"
        # repnet BN scale under 'bn' escapes the norm keyword (reference
        # Conv2dNormActivation parity) -> other
        assert param_group_of(path("transformer", "neck", "lateral_convs_0", "bn", "scale")) == "other"

    def test_lr_schedule(self):
        sched = make_lr_schedule(1e-4, steps_per_epoch=100, milestones=[10], gamma=0.1,
                                 warmup_factor=1e-3, warmup_steps=50)
        assert np.isclose(float(sched(0)), 1e-4 * 1e-3, rtol=1e-5)
        assert np.isclose(float(sched(50)), 1e-4, rtol=1e-5)
        assert np.isclose(float(sched(999)), 1e-4, rtol=1e-5)
        assert np.isclose(float(sched(1000)), 1e-5, rtol=1e-5)  # epoch 10 decay

    def test_freezing_and_multipliers(self):
        params = {
            "backbone": {
                "conv1": {"kernel": jnp.ones((3, 3, 3, 8))},
                "layer1_0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}},
                "layer3_0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}},
            },
            "transformer": {"enc_output": {"kernel": jnp.ones((8, 8)),
                                           "bias": jnp.zeros((8,))}},
        }
        sched = make_lr_schedule(1.0, steps_per_epoch=10**6, warmup_factor=1.0, warmup_steps=0)
        tx = build_optimizer(
            params, sched, weight_decay=0.0, max_norm=1e9,
            frozen_predicate=frozen_param_predicate((0,)),  # freeze stem+layer1
        )
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # frozen: stem + layer1
        assert float(jnp.abs(updates["backbone"]["conv1"]["kernel"]).sum()) == 0
        assert float(jnp.abs(updates["backbone"]["layer1_0"]["conv1"]["kernel"]).sum()) == 0
        # trainable backbone stage at 0.1x of head lr
        bb = float(jnp.abs(updates["backbone"]["layer3_0"]["conv1"]["kernel"]).max())
        head = float(jnp.abs(updates["transformer"]["enc_output"]["kernel"]).max())
        assert np.isclose(bb / head, 0.1, rtol=1e-3)
