"""Unit tests for core ops: boxes, losses, position encodings, misc utils.

Differential-tested against independent torch/numpy expressions of the
reference numerics (the reference ships no tests; SURVEY.md §4 defines this
differential strategy)."""

import math

import jax

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from salience_detr_tpu.ops import boxes as B
from salience_detr_tpu.ops import losses as L
from salience_detr_tpu.ops import misc as M
from salience_detr_tpu.ops import pos_encoding as PE


def rand_boxes_xyxy(rng, n):
    xy = rng.uniform(0, 0.7, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


class TestBoxes:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        b = rand_boxes_xyxy(rng, 50)
        out = B.box_cxcywh_to_xyxy(B.box_xyxy_to_cxcywh(jnp.asarray(b)))
        np.testing.assert_allclose(out, b, atol=1e-6)

    def test_giou_pairwise_vs_naive(self):
        rng = np.random.default_rng(1)
        b1, b2 = rand_boxes_xyxy(rng, 20), rand_boxes_xyxy(rng, 30)
        got = np.asarray(B.generalized_box_iou_pairwise(jnp.asarray(b1), jnp.asarray(b2)))
        for i in range(20):
            for j in range(0, 30, 7):
                x0 = max(b1[i, 0], b2[j, 0]); y0 = max(b1[i, 1], b2[j, 1])
                x1 = min(b1[i, 2], b2[j, 2]); y1 = min(b1[i, 3], b2[j, 3])
                inter = max(0, x1 - x0) * max(0, y1 - y0)
                a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
                a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
                union = a1 + a2 - inter
                cx0 = min(b1[i, 0], b2[j, 0]); cy0 = min(b1[i, 1], b2[j, 1])
                cx1 = max(b1[i, 2], b2[j, 2]); cy1 = max(b1[i, 3], b2[j, 3])
                hull = (cx1 - cx0) * (cy1 - cy0)
                giou = inter / union - (hull - union) / hull
                assert abs(got[i, j] - giou) < 1e-5

    def test_elementwise_matches_diag(self):
        rng = np.random.default_rng(2)
        b1, b2 = rand_boxes_xyxy(rng, 15), rand_boxes_xyxy(rng, 15)
        full = np.asarray(B.generalized_box_iou_pairwise(jnp.asarray(b1), jnp.asarray(b2)))
        ew = np.asarray(B.generalized_box_iou_elementwise(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(ew, np.diag(full), atol=1e-6)
        full_iou, _ = B.box_iou_pairwise(jnp.asarray(b1), jnp.asarray(b2))
        ew_iou = np.asarray(B.box_iou_elementwise(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(ew_iou, np.diag(np.asarray(full_iou)), atol=1e-6)


def torch_sigmoid_focal(inputs, targets, num_boxes, alpha=0.25, gamma=2.0):
    # independent expression of /root/reference/models/bricks/losses.py:4-12
    prob = inputs.sigmoid()
    weight = (1 - alpha) * prob**gamma * (1 - targets) + targets * alpha * (1 - prob) ** gamma
    loss = torch.nn.functional.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    loss = loss * weight
    return (loss.sum(1) / max(loss.shape[1], 1)).sum() / num_boxes


def torch_vari_focal(inputs, targets, gt_score, num_boxes, alpha=0.25, gamma=2.0):
    prob = inputs.sigmoid().detach()
    target_score = targets * gt_score.unsqueeze(-1)
    weight = (1 - alpha) * prob.pow(gamma) * (1 - targets) + target_score
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        inputs, target_score, weight=weight, reduction="none"
    )
    return (loss.sum(1) / max(loss.shape[1], 1)).sum() / num_boxes


class TestLosses:
    def test_sigmoid_focal(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 30, 7)).astype(np.float32)
        t = (rng.uniform(size=(2, 30, 7)) < 0.1).astype(np.float32)
        want = torch_sigmoid_focal(torch.tensor(x), torch.tensor(t), 5.0).item()
        got = float(L.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t), 5.0))
        assert abs(got - want) < 1e-5

    def test_vari_sigmoid_focal(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 30, 7)).astype(np.float32)
        t = (rng.uniform(size=(2, 30, 7)) < 0.1).astype(np.float32)
        s = rng.uniform(size=(2, 30)).astype(np.float32)
        want = torch_vari_focal(torch.tensor(x), torch.tensor(t), torch.tensor(s), 5.0).item()
        got = float(L.vari_sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t), jnp.asarray(s), 5.0))
        assert abs(got - want) < 1e-5


class TestPosEncoding:
    def test_sine_embedding_vs_torch(self):
        # independent torch expression of PositionEmbeddingSine.forward
        rng = np.random.default_rng(5)
        Bn, H, W, npf = 2, 7, 9, 16
        valid = np.array([[5, 9], [7, 4]])
        mask = np.ones((Bn, H, W), bool)
        for i, (h, w) in enumerate(valid):
            mask[i, :h, :w] = False

        not_mask = torch.tensor(~mask).int()
        y_embed = not_mask.cumsum(1, dtype=torch.float32)
        x_embed = not_mask.cumsum(2, dtype=torch.float32)
        scale, eps, offset = 2 * math.pi, 1e-6, -0.5
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
        dim_t = 2 * torch.arange(npf).div(2, rounding_mode="floor") / npf
        dim_t = 10000.0 ** dim_t
        pos_x = x_embed[..., None] / dim_t
        pos_y = y_embed[..., None] / dim_t
        pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
        pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
        want = torch.cat((pos_y, pos_x), dim=3).numpy()  # NHWC

        got = np.asarray(
            PE.sine_position_embedding(jnp.asarray(mask), num_pos_feats=npf, normalize=True, offset=-0.5)
        )
        # compare on valid positions only: padding positions divide by ~eps and
        # feed sin/cos huge arguments whose fp32 value is implementation noise
        # (and they are masked out downstream in both implementations)
        for i, (h, w) in enumerate(valid):
            np.testing.assert_allclose(got[i, :h, :w], want[i, :h, :w], atol=1e-4)

    def test_learned_embedding_vs_torch(self):
        # independent torch expression of PositionEmbeddingLearned.forward
        # (reference position_encoding.py:68-95): position (i, j) is
        # concat(col_embed[j], row_embed[i]) broadcast over the batch
        rng = np.random.default_rng(7)
        Bn, H, W, npf, NE = 2, 5, 6, 8, 50
        mask = np.zeros((Bn, H, W), bool)

        mod = PE.LearnedPositionEmbedding(num_embeddings=NE, num_pos_feats=npf)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(mask))
        row = np.asarray(variables["params"]["row_embed"]["embedding"])
        col = np.asarray(variables["params"]["col_embed"]["embedding"])
        assert row.shape == col.shape == (NE, npf)

        x_emb = torch.tensor(col)[:W]  # col_embed(arange(w))
        y_emb = torch.tensor(row)[:H]  # row_embed(arange(h))
        want = (
            torch.cat(
                [
                    x_emb.unsqueeze(0).repeat(H, 1, 1),
                    y_emb.unsqueeze(1).repeat(1, W, 1),
                ],
                dim=-1,
            )
            .unsqueeze(0)
            .repeat(Bn, 1, 1, 1)
            .numpy()
        )  # NHWC (the reference permutes to NCHW afterwards)

        got = np.asarray(mod.apply(variables, jnp.asarray(mask)))
        assert got.shape == (Bn, H, W, 2 * npf)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_get_sine_pos_embed_exchange(self):
        rng = np.random.default_rng(6)
        pos = rng.uniform(size=(3, 5, 4)).astype(np.float32)
        npf = 8
        dim_t = 10000.0 ** (2 * (torch.arange(npf) // 2) / npf)
        pos_res = torch.tensor(pos).unsqueeze(-1) * 2 * math.pi / dim_t
        pos_res = torch.stack(
            (pos_res[..., 0::2].sin(), pos_res[..., 1::2].cos()), dim=-1
        ).flatten(-2)
        index = torch.cat([torch.arange(1, -1, -1), torch.arange(2, pos_res.shape[-2])])
        pos_res = torch.index_select(pos_res, -2, index).flatten(-2)
        got = np.asarray(PE.get_sine_pos_embed(jnp.asarray(pos), num_pos_feats=npf))
        np.testing.assert_allclose(got, pos_res.numpy(), atol=1e-4)


class TestMisc:
    def test_inverse_sigmoid(self):
        x = jnp.asarray([0.0, 1e-5, 0.3, 0.999, 1.0])
        got = np.asarray(M.inverse_sigmoid(x))
        x_t = torch.tensor([0.0, 1e-5, 0.3, 0.999, 1.0]).clamp(0, 1)
        want = torch.log(x_t.clamp(min=1e-3) / (1 - x_t).clamp(min=1e-3)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)  # fp32 log noise

    def test_masks_and_ratios(self):
        canvas = (64, 96)
        strides = [8, 16, 32, 64]
        shapes = M.level_shapes(canvas, strides)
        assert shapes == [(8, 12), (4, 6), (2, 3), (1, 2)]
        sizes = jnp.asarray([[64, 96], [40, 50]])
        masks = M.multi_level_masks(sizes, canvas, shapes)
        # image 0 fully valid
        assert not bool(masks[0][0].any())
        # image 1 at stride 8: ceil(40*8/64)=5 rows, ceil(50*12/96)=7 cols valid
        m = np.asarray(masks[0][1])
        assert (~m).sum() == 5 * 7
        vhw = M.multi_level_valid_sizes(sizes, canvas, shapes)
        vr = np.asarray(M.valid_ratios(vhw, shapes))
        assert vr.shape == (2, 4, 2)
        np.testing.assert_allclose(vr[0], 1.0)

    def test_flatten_and_start_index(self):
        shapes = [(4, 6), (2, 3)]
        feats = [jnp.ones((2, 4, 6, 5)), 2 * jnp.ones((2, 2, 3, 5))]
        flat = M.flatten_multi_level(feats)
        assert flat.shape == (2, 30, 5)
        assert float(flat[0, 23, 0]) == 1.0 and float(flat[0, 24, 0]) == 2.0
        np.testing.assert_array_equal(M.level_start_index(shapes), [0, 24])


class TestBlockDiagGroupConv:
    """The repnet grouped convs run as block-diagonal DENSE convs on TPU
    (lane-utilization, see necks/repnet.py _BlockDiagGroupConv); the dense
    expansion must be numerically identical to feature_group_count and share
    the grouped parameter tree the weight converter maps."""

    def test_matches_grouped_conv(self):
        import flax.linen as nn

        from salience_detr_tpu.models.necks.repnet import _BlockDiagGroupConv

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 9, 11, 16)).astype(np.float32))

        class Grouped(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(
                    16, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=4,
                    use_bias=False, name="conv",
                )(x)

        class Dense(nn.Module):
            @nn.compact
            def __call__(self, x):
                return _BlockDiagGroupConv(16, 3, 1, 4, name="conv")(x)

        variables = Grouped().init(jax.random.PRNGKey(0), x)
        assert variables["params"]["conv"]["kernel"].shape == (3, 3, 4, 16)
        want = Grouped().apply(variables, x)
        got = Dense().apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_stride_and_1x1(self):
        import flax.linen as nn

        from salience_detr_tpu.models.necks.repnet import _BlockDiagGroupConv

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))

        class Grouped(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(
                    8, (1, 1), strides=(2, 2), padding=[(0, 0), (0, 0)],
                    feature_group_count=2, use_bias=False, name="conv",
                )(x)

        class Dense(nn.Module):
            @nn.compact
            def __call__(self, x):
                return _BlockDiagGroupConv(8, 1, 2, 2, name="conv")(x)

        variables = Grouped().init(jax.random.PRNGKey(1), x)
        want = Grouped().apply(variables, x)
        got = Dense().apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


class TestSegmentationPostProcess:
    """Differential test vs a direct torch restatement of the reference's
    (config-unused) SegmentationPostProcess (/root/reference/models/bricks/
    post_process.py:77-129): average sigmoid masks per argmax class (empty
    class -> zeros), bilinear-upsample the per-class stack, argmax."""

    def _torch_reference(self, logits, masks, target_hw):
        import torch.nn.functional as F

        lg = torch.tensor(logits)
        mk = torch.tensor(masks)
        out_class = lg.argmax(-1)
        num_class = lg.shape[-1]
        result = []
        for b in range(lg.shape[0]):
            per_class = []
            for c in range(num_class):
                sel = mk[b][out_class[b] == c].sigmoid()
                if sel.numel() == 0:
                    sel = sel.new_zeros((1, *mk.shape[-2:]))
                per_class.append(sel.mean(0))
            result.append(torch.stack(per_class, 0))
        stack = torch.stack(result, 0)
        up = F.interpolate(stack, size=target_hw, mode="bilinear", align_corners=False)
        return up.argmax(1).numpy()

    def test_matches_torch_reference(self):
        from salience_detr_tpu.models.bricks.post_process import (
            SegmentationPostProcess,
        )

        rng = np.random.default_rng(5)
        B_, Q, C, h, w = 2, 9, 5, 8, 12
        # well-separated logits/masks so bilinear rounding can't flip argmax
        logits = rng.normal(size=(B_, Q, C)).astype(np.float32) * 4
        masks = rng.normal(size=(B_, Q, h, w)).astype(np.float32) * 4
        got = np.asarray(
            SegmentationPostProcess()(jnp.asarray(logits), jnp.asarray(masks), (16, 24))
        )
        want = self._torch_reference(logits, masks, (16, 24))
        assert got.shape == (B_, 16, 24)
        # bilinear implementations may differ in ulps near class boundaries;
        # demand near-total agreement instead of bit equality
        agree = (got == want).mean()
        assert agree > 0.99, f"only {agree:.3f} of pixels agree"
