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

    def test_backbone_only_grouping(self):
        """finetune_backbone_param (reference param_dict.py:15-28): two
        groups, uniform weight decay."""
        from salience_detr_tpu.engine.optim import PARAM_GROUPINGS

        classify, lr, wd = PARAM_GROUPINGS["finetune_backbone_param"]
        assert classify(path("backbone", "layer2_0", "conv1", "kernel")) == "backbone"
        assert classify(path("backbone", "bn1", "bias")) == "backbone"
        assert classify(path("transformer", "enc_output_norm", "scale")) == "other"
        assert lr == {"other": 1.0, "backbone": 0.1}
        assert wd["backbone"] and wd["other"]

    def test_no_norm_wd_grouping(self):
        """finetune_backbone_with_no_norm_weight_decay (param_dict.py:31-76):
        norm-MODULE params lose wd (incl. their scale), but biases of
        non-norm modules keep it."""
        from salience_detr_tpu.engine.optim import PARAM_GROUPINGS

        classify, lr, wd = PARAM_GROUPINGS[
            "finetune_backbone_with_no_norm_weight_decay"
        ]
        assert classify(path("backbone", "bn1", "scale")) == "backbone_norm"
        assert classify(path("backbone", "layer1_0", "conv1", "kernel")) == "backbone"
        # a bias belonging to a NON-norm module keeps weight decay (unlike
        # the 6-group default, which drops wd for all biases)
        assert classify(path("transformer", "enc_output", "bias")) == "other"
        assert classify(path("transformer", "enc_output_norm", "bias")) == "other_norm"
        # repnet fbn / gn are norm modules here (class-based in the ref)
        assert classify(path("transformer", "neck", "x", "fbn", "scale")) == "other_norm"
        assert not wd["other_norm"] and not wd["backbone_norm"]
        assert lr["backbone"] == 0.1 and lr["backbone_norm"] == 0.1

    def test_build_optimizer_accepts_groupings(self):
        params = {
            "backbone": {"conv1": {"kernel": jnp.ones((3, 3, 3, 8))}},
            "transformer": {"enc_output": {"kernel": jnp.ones((8, 8)),
                                           "bias": jnp.zeros((8,))}},
        }
        sched = make_lr_schedule(1e-4, steps_per_epoch=10)
        for name in ("finetune_backbone_param",
                     "finetune_backbone_with_no_norm_weight_decay"):
            tx = build_optimizer(params, sched, grouping=name)
            state = tx.init(params)
            grads = jax.tree.map(jnp.ones_like, params)
            updates, _ = tx.update(grads, state, params)
            # backbone updates are 0.1x the head updates under both variants
            bb = updates["backbone"]["conv1"]["kernel"]
            head = updates["transformer"]["enc_output"]["kernel"]
            np.testing.assert_allclose(
                np.abs(np.asarray(bb)).mean() / np.abs(np.asarray(head)).mean(),
                0.1, rtol=0.05,
            )

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
