"""DCNv2 brick: zero-offset init must equal a plain 3x3 conv (x0.5 from the
sigmoid mask at zero logits)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salience_detr_tpu.models.bricks.deform_conv import DeformConv2dPack


def test_zero_offsets_match_plain_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 6)).astype(np.float32))
    mod = DeformConv2dPack(features=8)
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    assert out.shape == (2, 10, 12, 8)

    # with zero offset conv, sampling grid == plain 3x3 taps; mask = 0.5
    w = np.asarray(v["params"]["kernel"])  # (9, Cin, F)
    b = np.asarray(v["params"]["bias"])
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((2, 10, 12, 8), np.float32)
    k = 0
    for ky in range(3):
        for kx in range(3):
            patch = xp[:, ky : ky + 10, kx : kx + 12]
            want += 0.5 * patch @ w[k]
            k += 1
    want += b
    # XLA:CPU's oneDNN matmuls use reduced-precision accumulation paths
    # (bf16-capable hosts), so tolerances are looser than pure fp32
    np.testing.assert_allclose(np.asarray(out), want, rtol=5e-3, atol=5e-3)


def test_stride_two_shape():
    x = jnp.zeros((1, 8, 8, 4))
    mod = DeformConv2dPack(features=4, stride=2)
    v = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(v, x).shape == (1, 4, 4, 4)


def test_resnet_stage_with_dcn_structure():
    """stage_with_dcn swaps conv2 for DCNv2 in the configured stages
    (reference resnet.py:177,133-136) — param-tree structure only (fast)."""
    from salience_detr_tpu.models.backbones.resnet import ResNetBackbone

    m = ResNetBackbone(arch="resnet18", stage_with_dcn=(False, False, True, True))
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    p = shapes["params"]
    assert "conv_offset" in p["layer3_0"]["conv2"]
    assert "conv_mask" in p["layer4_0"]["conv2"]
    assert "bias" not in p["layer4_0"]["conv2"]  # conv3x3_dcn bias=False
    assert set(p["layer2_0"]["conv2"].keys()) == {"kernel"}  # plain conv stage


@pytest.mark.slow
def test_resnet_stage_with_dcn_forward():
    """Full forward through a DCN-staged resnet (compile-heavy — slow lane)."""
    from salience_detr_tpu.models.backbones.resnet import ResNetBackbone

    m = ResNetBackbone(arch="resnet18", stage_with_dcn=(False, False, True, True))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs[3].shape == (1, 2, 2, 512)
    assert np.isfinite(np.asarray(outs[3])).all()


def test_dcn_converter_rules_cover_backbone():
    from salience_detr_tpu.models.backbones.resnet import ResNetBackbone
    from salience_detr_tpu.utils.weight_converter import (
        _resnet_rules,
        flatten_variables,
    )

    dcn = (False, True, True, True)
    m = ResNetBackbone(arch="resnet50", stage_with_dcn=dcn)
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    flat = flatten_variables(
        jax.tree.map(lambda x: np.zeros(x.shape, np.float32), shapes)
    )
    paths = {
        k.replace("params/", "params/backbone/").replace("frozen/", "frozen/backbone/")
        for k in flat
    }
    dsts = {d for _, d, _ in _resnet_rules((3, 4, 6, 3), True, dcn)}
    assert paths == dsts


def test_dcn_kernel_transform():
    from salience_detr_tpu.utils.weight_converter import _apply_transform

    w = np.random.default_rng(1).normal(size=(8, 6, 3, 3)).astype(np.float32)
    got = _apply_transform(w, "dcn_kernel")
    assert got.shape == (9, 6, 8)
    # tap k = (ky, kx) row-major must map to torch weight [..., ky, kx]
    np.testing.assert_array_equal(got[5], w[:, :, 1, 2].T)
