"""Converter coverage tests: each backbone family's torch->flax rule set must
cover the FULL model parameter tree bidirectionally (uses eval_shape — no
compute).  Reference name spaces: /root/reference/models/backbones/{resnet,
convnext,swin,focalnet}.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salience_detr_tpu.models.bricks.criterion import Targets
from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr
from salience_detr_tpu.utils.weight_converter import (
    flatten_variables,
    salience_detr_r50_rules,
    salience_detr_rules,
)


def _tree_paths(cfg: SalienceDETRConfig):
    model, _, _, _ = build_salience_detr(cfg)
    B, H, W, M = 1, 64, 64, 4
    images = jnp.zeros((B, H, W, 3))
    sizes = jnp.full((B, 2), 32, jnp.int32)
    targets = Targets(
        jnp.zeros((B, M), jnp.int32), jnp.full((B, M, 4), 0.5), jnp.ones((B, M), bool)
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "denoising": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
            },
            images, sizes, targets, train=True,
        )
    )
    flat = flatten_variables(
        jax.tree.map(lambda x: np.zeros(x.shape, np.float32), shapes)
    )
    return set(flat.keys())


def _assert_bidirectional(tree_paths, rules):
    dsts = {dst for _, dst, _ in rules}
    missing_in_rules = sorted(tree_paths - dsts)
    extra_in_rules = sorted(dsts - tree_paths)
    assert not missing_in_rules, f"params not covered by converter: {missing_in_rules[:20]}"
    assert not extra_in_rules, f"converter rules with no target param: {extra_in_rules[:20]}"
    assert len(dsts) == len(rules)  # no duplicate destinations


def test_rules_cover_full_tree():
    _assert_bidirectional(_tree_paths(SalienceDETRConfig()), salience_detr_r50_rules())


@pytest.mark.slow
@pytest.mark.parametrize(
    "backbone", ["conv_l", "swin_l", "swin_v2_b", "focalnet_large_lrf_fl4"]
)
def test_rules_cover_full_tree_large_backbones(backbone):
    cfg = SalienceDETRConfig(backbone=backbone, backbone_return_indices=(1, 2, 3))
    _assert_bidirectional(_tree_paths(cfg), salience_detr_rules(backbone))


def test_r50_dispatch_matches_legacy():
    assert salience_detr_rules("resnet50") == salience_detr_r50_rules()


@pytest.mark.parametrize(
    "arch,return_indices",
    [
        ("vit_b", (1, 2, 3)),
        ("vit_b", (0, 1, 2, 3)),
        ("eva_02_vit_b_4attn_1024", (1, 2, 3)),
        ("eva_02_vit_l_8attn_1536", (1, 2, 3, 4)),
    ],
)
def test_vit_backbone_rules_cover_backbone_tree(arch, return_indices):
    """ViT/EVA-02 families (reference vit.py:747-875): rule dsts must cover
    the full backbone tree exactly, incl. the scale-4 deconv stage (index 0)
    and the param-free extra maxpool (index 4)."""
    from salience_detr_tpu.models.backbones.vit import VisionTransformerBackbone
    from salience_detr_tpu.utils.weight_converter import _vit_rules

    bb = VisionTransformerBackbone(arch=arch, return_indices=return_indices)
    shapes = jax.eval_shape(
        lambda: bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    )
    flat = flatten_variables(
        jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    )
    tree_paths = {k.replace("params/", "params/backbone/") for k in flat}
    dsts = {dst for _, dst, _ in _vit_rules(arch, return_indices)}
    assert tree_paths == dsts, (
        sorted(tree_paths - dsts)[:10], sorted(dsts - tree_paths)[:10]
    )


def test_vit_pos_transform_strips_class_token():
    from salience_detr_tpu.utils.weight_converter import _apply_transform

    table = np.arange(1 * (7 * 7 + 1) * 4, dtype=np.float32).reshape(1, 50, 4)
    out = _apply_transform(table, "vit_pos")
    assert out.shape == (7, 7, 4)
    np.testing.assert_array_equal(out[0, 0], table[0, 1])
    # square table without a class slot passes through
    out2 = _apply_transform(table[:, 1:], "vit_pos")
    assert out2.shape == (7, 7, 4)
    np.testing.assert_array_equal(out2[0, 0], table[0, 1])


def test_resnext_backbone_rules_cover_backbone_tree():
    """Grouped-conv archs: rule dsts must cover the backbone subtree exactly
    (torchvision resnext param names differ from resnet50 only in shapes)."""
    from salience_detr_tpu.models.backbones.resnet import ResNetBackbone
    from salience_detr_tpu.utils.weight_converter import backbone_rules

    bb = ResNetBackbone(arch="resnext50_32x4d", return_indices=(1, 2, 3))
    shapes = jax.eval_shape(
        lambda: bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    )
    flat = flatten_variables(
        jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    )
    tree_paths = {
        k.replace("params/", "params/backbone/").replace(
            "frozen/", "frozen/backbone/"
        )
        for k in flat
    }
    dsts = {dst for _, dst, _ in backbone_rules("resnext50_32x4d")}
    assert tree_paths == dsts, (
        sorted(tree_paths - dsts)[:10], sorted(dsts - tree_paths)[:10]
    )
