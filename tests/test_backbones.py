"""Backbone zoo: shape contracts via eval_shape (no heavy compute) plus a
tiny real forward for the lightest variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salience_detr_tpu.models.backbones.convnext import ConvNeXtBackbone
from salience_detr_tpu.models.backbones.focalnet import FocalNetBackbone
from salience_detr_tpu.models.backbones.resnet import ResNetBackbone
from salience_detr_tpu.models.backbones.swin import SwinTransformerBackbone

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane


def shapes_of(module, hw=(64, 96)):
    x = jnp.zeros((1, *hw, 3))
    out = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), x))
    var_shapes = out
    feats = jax.eval_shape(
        lambda v: module.apply(v, x),
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), var_shapes),
    )
    return feats


class TestBackboneShapes:
    @pytest.mark.parametrize("arch,chans", [
        ("resnet50", [512, 1024, 2048]),
        ("resnet18", [128, 256, 512]),
    ])
    def test_resnet(self, arch, chans):
        bb = ResNetBackbone(arch=arch, return_indices=(1, 2, 3))
        assert bb.num_channels == chans
        feats = shapes_of(bb)
        assert [feats[i].shape for i in (1, 2, 3)] == [
            (1, 8, 12, chans[0]), (1, 4, 6, chans[1]), (1, 2, 3, chans[2]),
        ]

    def test_resnext_grouped(self):
        """ResNeXt (reference resnet.py:335-346): grouped 3x3 conv2 with
        width = planes * width_per_group/64 * groups."""
        bb = ResNetBackbone(arch="resnext50_32x4d", return_indices=(1, 2, 3))
        assert bb.num_channels == [512, 1024, 2048]
        feats = shapes_of(bb)
        assert [feats[i].shape for i in (1, 2, 3)] == [
            (1, 8, 12, 512), (1, 4, 6, 1024), (1, 2, 3, 2048),
        ]
        x = jnp.zeros((1, 64, 96, 3))
        var_shapes = jax.eval_shape(lambda: bb.init(jax.random.PRNGKey(0), x))
        # stage-1 block 0: planes=64 -> width = 64*(4/64)*32 = 128; the
        # grouped kernel stores in_features/groups = 4 input channels
        k = var_shapes["params"]["layer1_0"]["conv2"]["kernel"]
        assert k.shape == (3, 3, 4, 128), k.shape

    def test_convnext(self):
        bb = ConvNeXtBackbone(arch="conv_t", return_indices=(1, 2, 3))
        assert bb.num_channels == [192, 384, 768]
        feats = shapes_of(bb)
        assert feats[1].shape == (1, 8, 12, 192)
        assert feats[3].shape == (1, 2, 3, 768)

    def test_swin(self):
        bb = SwinTransformerBackbone(arch="swin_t", return_indices=(1, 2, 3))
        assert bb.num_channels == [192, 384, 768]
        feats = shapes_of(bb)
        assert feats[1].shape == (1, 8, 12, 192)
        assert feats[3].shape == (1, 2, 3, 768)

    def test_focalnet(self):
        bb = FocalNetBackbone(arch="focalnet_tiny_srf", return_indices=(1, 2, 3))
        assert bb.num_channels == [192, 384, 768]
        feats = shapes_of(bb)
        assert feats[1].shape == (1, 8, 12, 192)
        assert feats[3].shape == (1, 2, 3, 768)

    def test_focalnet_large_fl4_shapes(self):
        bb = FocalNetBackbone(arch="focalnet_large_lrf_fl4", return_indices=(1, 2, 3))
        assert bb.num_channels == [384, 768, 1536]
        feats = shapes_of(bb)
        assert feats[3].shape == (1, 2, 3, 1536)


class TestViT:
    def test_vit_shapes(self):
        from salience_detr_tpu.models.backbones.vit import VisionTransformerBackbone

        bb = VisionTransformerBackbone(arch="vit_b", return_indices=(1, 2, 3), out_channels=64)
        assert bb.num_channels == [64, 64, 64]
        feats = shapes_of(bb, hw=(64, 96))
        assert feats[1].shape == (1, 8, 12, 64)
        assert feats[2].shape == (1, 4, 6, 64)
        assert feats[3].shape == (1, 2, 3, 64)

    def test_eva02_shapes(self):
        from salience_detr_tpu.models.backbones.vit import VisionTransformerBackbone

        bb = VisionTransformerBackbone(
            arch="eva_02_vit_b_4attn_1024", return_indices=(1, 2, 3), out_channels=64
        )
        feats = shapes_of(bb, hw=(64, 96))
        assert feats[1].shape == (1, 8, 12, 64)
        assert feats[2].shape == (1, 4, 6, 64)
        assert feats[3].shape == (1, 2, 3, 64)

    def test_rope_tables_match_reference_math(self):
        """VisionRotaryEmbeddingFast (reference vit.py:76-115) restated in
        numpy for a square grid; our tables must match exactly."""
        from salience_detr_tpu.models.backbones.vit import apply_rope, rope_tables

        ft, pt, hd = 5, 16, 8  # head_dim 8 -> rope dim 4
        dim = hd // 2
        freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
        t = np.arange(ft) / ft * pt
        tg = np.broadcast_to(t[None, :], (ft, ft))  # reference t.expand
        t2 = np.stack([tg.T, tg], -1)  # torch.stack([t.T, t], -1)
        fr = t2[..., None] * freqs
        fr = np.repeat(fr, 2, axis=-1).reshape(ft, ft, -1)
        want_cos = np.cos(fr).reshape(ft * ft, -1)
        want_sin = np.sin(fr).reshape(ft * ft, -1)
        cos, sin = rope_tables(ft, ft, hd, pt)
        np.testing.assert_allclose(np.asarray(cos), want_cos, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sin), want_sin, rtol=1e-6)

        # rope application: t*cos + rotate_half(t)*sin with (-x2, x1) pairs
        rng = np.random.default_rng(0)
        q = rng.normal(size=(2, ft * ft, 3, hd)).astype(np.float32)
        qr = q.reshape(2, ft * ft, 3, hd // 2, 2)
        rot = np.stack([-qr[..., 1], qr[..., 0]], -1).reshape(q.shape)
        want = q * want_cos[None, :, None, :] + rot * want_sin[None, :, None, :]
        got = apply_rope(jnp.asarray(q), cos, sin)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


class TestBackboneForward:
    def test_swin_tiny_forward_finite(self):
        bb = SwinTransformerBackbone(arch="swin_t", return_indices=(1, 2, 3))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 96, 3)), jnp.float32)
        v = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), x))()
        feats = jax.jit(lambda v: bb.apply(v, x))(v)
        for f in feats.values():
            assert np.isfinite(np.asarray(f)).all()

    def test_convnext_tiny_forward_finite(self):
        bb = ConvNeXtBackbone(arch="conv_t", return_indices=(1, 2, 3))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 96, 3)), jnp.float32)
        v = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), x))()
        feats = jax.jit(lambda v: bb.apply(v, x))(v)
        for f in feats.values():
            assert np.isfinite(np.asarray(f)).all()


class TestSwinV2:
    def test_v2_forward_finite(self):
        bb = SwinTransformerBackbone(arch="swin_v2_t", return_indices=(1, 2, 3))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 96, 3)), jnp.float32)
        v = bb.init(jax.random.PRNGKey(0), x)
        p = v["params"]["stage0_block0"]["attn"]
        # V2 structure: logit scale + cpb MLP + standalone qkv bias, no table
        assert "logit_scale" in p and "cpb_mlp_0" in p and "qkv_bias" in p
        assert "relative_position_bias_table" not in p
        outs = bb.apply(v, x)
        assert outs[1].shape == (1, 8, 12, 96 * 2)
        for o in outs.values():
            assert np.isfinite(np.asarray(o)).all()

    def test_relative_coords_table_matches_torch_formula(self):
        """swin.py:322-340: coords normalized by (w-1), x8, sign-log2/3."""
        import torch

        from salience_detr_tpu.models.backbones.swin import relative_coords_table

        w = 8
        rh = torch.arange(-(w - 1), w, dtype=torch.float32)
        t = torch.stack(torch.meshgrid([rh, rh], indexing="ij")).permute(1, 2, 0)
        t = t / (w - 1) * 8
        t = torch.sign(t) * torch.log2(torch.abs(t) + 1.0) / 3.0
        np.testing.assert_allclose(
            relative_coords_table(w), t.reshape(-1, 2).numpy(), rtol=1e-6
        )
