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


def test_export_torch_state_dict_roundtrips():
    """Inverse converter (export_torch_state_dict): exporting the flax tree
    to reference torch layout and converting it back must reproduce every
    parameter bit-exactly — the path that lets users hand weights trained
    here back to the reference implementation (reference test.py:107-112)."""
    from salience_detr_tpu.utils.weight_converter import (
        _apply_converted,
        convert_state_dict,
        export_torch_state_dict,
    )

    cfg = SalienceDETRConfig()  # checkpoint-exact default geometry
    model, _, _, _ = build_salience_detr(cfg)
    B, H, W, M = 1, 64, 64, 4
    targets = Targets(
        jnp.zeros((B, M), jnp.int32), jnp.full((B, M, 4), 0.5),
        jnp.ones((B, M), bool),
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "denoising": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            jnp.zeros((B, H, W, 3)), jnp.full((B, 2), 32, jnp.int32),
            targets, train=True,
        )
    )
    rng = np.random.default_rng(3)
    variables = jax.tree.map(
        lambda s: rng.normal(size=s.shape).astype(np.float32), shapes
    )
    rules = salience_detr_rules("resnet50")
    state, skipped = export_torch_state_dict(variables, rules)
    assert not skipped, skipped[:10]

    zeros = jax.tree.map(np.zeros_like, variables)
    flat_new, missing, unused = convert_state_dict(state, rules)
    assert not missing and not unused, (missing[:5], unused[:5])
    merged = _apply_converted(zeros, flat_new, missing, unused)
    flat_a = flatten_variables(variables)
    flat_b = flatten_variables(merged)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_b[k], flat_a[k], err_msg=k)


def test_eva_pos_table_applies_shape_exact():
    """EVA-02 pretrains at 224/patch16, so real checkpoints carry a
    (1, 14*14+1, C) learned pos table (reference vit.py:385).  The model's
    pos_embed param must be (14, 14, C) (ARCH_SETTINGS pos_grid=14) so the
    converted table APPLIES rather than being silently dropped by the
    tolerant merge (regression: ADVICE r4 — eva archs fell back to the
    64x64 interpolation grid and lost the pretrained table)."""
    from salience_detr_tpu.models.backbones.vit import VisionTransformerBackbone
    from salience_detr_tpu.utils.weight_converter import (
        _apply_converted,
        _vit_rules,
        convert_state_dict,
    )

    arch = "eva_02_vit_b_4attn_1024"
    bb = VisionTransformerBackbone(arch=arch, return_indices=(1, 2, 3))
    shapes = jax.eval_shape(
        lambda: bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    )
    variables = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    assert variables["params"]["pos_embed"].shape == (14, 14, 768)

    # realistically-shaped EVA pos table: class token + 14x14 grid
    table = np.random.default_rng(0).normal(size=(1, 14 * 14 + 1, 768)).astype(np.float32)
    torch_state = {"backbone.0.encoder.pos_embedding": table}
    # strip the detector prefix mismatch: rules expect the full-model dst
    # namespace, our variables are the bare backbone subtree
    rules = [
        (src, dst.replace("params/backbone/", "params/"), kind)
        for src, dst, kind in _vit_rules(arch, (1, 2, 3))
        if dst == "params/backbone/pos_embed"
    ]
    flat_new, missing, unused = convert_state_dict(torch_state, rules)
    merged = _apply_converted(variables, flat_new, missing, unused)
    np.testing.assert_array_equal(
        merged["params"]["pos_embed"], table[0, 1:].reshape(14, 14, 768)
    )


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


def _synthesize_torch_state(rules, tree_shapes):
    """Synthesize a COMPLETE reference state_dict at the real dimensions by
    inverting each rule's layout transform against the flax tree's shapes.
    Sources shared by several rules (merged in_proj, BN stat pairs) are
    checked for consistency."""
    inv = {}

    def torch_shape(kind, shp):
        if kind in ("copy",):
            return shp
        if kind == "conv":
            return (shp[3], shp[2], shp[0], shp[1])
        if kind == "linear":
            return (shp[1], shp[0])
        if kind == "flatten":
            return (shp[0], 1, 1)  # convnext layer_scale (C, 1, 1)
        if kind == "dcn_kernel":
            kk, cin, f = shp
            k = int(round(kk ** 0.5))
            return (f, cin, k, k)
        if kind == "deconv":
            return (shp[2], shp[3], shp[0], shp[1])
        if kind == "vit_pos":
            return (1, shp[0] * shp[1] + 1, shp[2])
        if kind.startswith("inproj_w"):
            return (3 * shp[1], shp[0])
        if kind.startswith("inproj_b"):
            return (3 * shp[0],)
        raise ValueError(kind)

    for src, dst, kind in rules:
        t = torch_shape(kind, tree_shapes[dst])
        if src in inv:
            assert inv[src] == t, f"inconsistent synthesized shape for {src}"
        inv[src] = t
    rng = np.random.default_rng(0)
    return {k: rng.normal(size=s).astype(np.float32) for k, s in inv.items()}


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["resnet50", "swin_l"])
def test_full_scale_conversion_rehearsal(backbone):
    """Full-scale restore rehearsal (VERDICT r3 #8): a complete reference
    state_dict at REAL dimensions (R50 3-4-6-3 / Swin-L, embed 256, 6+6
    layers, 8 heads, 900 queries) must convert and merge into the real flax
    tree with EVERY tensor applied shape-exact — no missing, unused, or
    mismatched keys.  (Numerical parity of the mapped forward is covered at
    toy scale by test_full_model_parity.py; this test pins the real tree's
    SHAPES, which the toy cannot.)"""
    from salience_detr_tpu.utils.weight_converter import convert_state_dict

    kwargs = (
        {} if backbone == "resnet50" else {"backbone_return_indices": (1, 2, 3)}
    )
    cfg = SalienceDETRConfig(backbone=backbone, **kwargs)
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
    flat_shapes = {
        k: tuple(v.shape)
        for k, v in flatten_variables(
            jax.tree.map(lambda x: np.zeros(x.shape, np.float32), shapes)
        ).items()
    }
    rules = salience_detr_rules(backbone)
    torch_state = _synthesize_torch_state(rules, flat_shapes)
    flat_new, missing, unused = convert_state_dict(torch_state, rules)
    assert not missing, missing[:10]
    assert not unused, unused[:10]
    mismatched = [
        k for k, v in flat_new.items()
        if k not in flat_shapes or tuple(v.shape) != flat_shapes[k]
    ]
    assert not mismatched, mismatched[:10]
    not_applied = sorted(set(flat_shapes) - set(flat_new))
    assert not not_applied, not_applied[:10]
    # spot-check a value actually rode through a layout transform intact:
    # conv kernel OIHW[o, i, h, w] must land at HWIO[h, w, i, o]
    if backbone == "resnet50":
        src_key, dst_key = "backbone.conv1.weight", "params/backbone/conv1/kernel"
    else:
        src_key = "backbone.0.features.0.0.weight"
        dst_key = "params/backbone/patch_embed/kernel"
    src = torch_state[src_key]
    dst = flat_new[dst_key]
    np.testing.assert_array_equal(dst[2, 3, 1, 40], src[40, 1, 2, 3])
