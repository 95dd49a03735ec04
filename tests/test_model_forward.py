"""End-to-end smoke tests for the full SalienceDETR model on a tiny canvas:
init, eval forward, train forward + full loss, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salience_detr_tpu.models.bricks.criterion import Targets
from salience_detr_tpu.models.detectors.salience_detr import compute_loss
from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane

CANVAS = (128, 128)
B = 2
MAX_GT = 7


def tiny_config(**kw):
    defaults = dict(
        backbone="resnet18",
        embed_dim=32,
        num_classes=11,
        num_queries=40,
        num_encoder_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        dim_feedforward=64,
        topk_sa=20,
        layer_filter_ratio=(1.0, 0.5),
        denoising_nums=8,
        dn_max_gt=4,
        max_num_embedding=32,
    )
    defaults.update(kw)
    return SalienceDETRConfig(**defaults)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(-1, 1, size=(B, *CANVAS, 3)).astype(np.float32)
    image_sizes = np.array([[128, 128], [96, 64]], np.int32)
    cxy = rng.uniform(0.2, 0.7, (B, MAX_GT, 2))
    wh = rng.uniform(0.05, 0.25, (B, MAX_GT, 2))
    boxes = np.concatenate([cxy, wh], -1).astype(np.float32)
    labels = rng.integers(0, 11, (B, MAX_GT)).astype(np.int32)
    valid = np.zeros((B, MAX_GT), bool)
    valid[0, :5] = True
    valid[1, :3] = True
    targets = Targets(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
    return jnp.asarray(images), jnp.asarray(image_sizes), targets


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config()
    model, criterion, sal_criterion, post = build_salience_detr(cfg)
    images, image_sizes, targets = make_inputs()
    # jitted init: eager init dispatches hundreds of tiny CPU executables and
    # takes minutes; one jitted program hits the persistent compile cache
    init = jax.jit(lambda rngs: model.init(rngs, images, image_sizes, targets, train=True))
    variables = init(
        {"params": jax.random.PRNGKey(0), "denoising": jax.random.PRNGKey(1)}
    )
    return cfg, model, criterion, sal_criterion, post, variables


class TestModelForward:
    def test_eval_forward_shapes(self, model_and_vars):
        cfg, model, _, _, post, variables = model_and_vars
        images, image_sizes, _ = make_inputs()
        out = jax.jit(lambda im, sz: model.apply(variables, im, sz, train=False))(
            images, image_sizes
        )
        assert out["pred_class"].shape == (2, B, cfg.num_queries, cfg.num_classes)
        assert out["pred_coord"].shape == (2, B, cfg.num_queries, 4)
        assert out["enc_class"].shape == (B, cfg.num_queries, cfg.num_classes)
        assert np.isfinite(np.asarray(out["pred_class"])).all()
        assert np.isfinite(np.asarray(out["pred_coord"])).all()
        coords = np.asarray(out["pred_coord"])
        assert (coords >= 0).all() and (coords <= 1).all()

        dets = post(out["pred_class"][-1], out["pred_coord"][-1], image_sizes)
        assert dets["boxes"].shape == (B, cfg.select_box_nums_for_evaluation, 4)

    def test_fp16_eval_forward(self):
        # train.py --mixed-precision fp16 (parity with the reference's fp16
        # AMP flag, reference main.py:27-35): the compute path runs in
        # float16 with f32 islands where the bf16 path has them; outputs
        # must stay finite and in-range
        cfg = tiny_config(dtype=jnp.float16)
        model, _, _, _ = build_salience_detr(cfg)
        images, image_sizes, _ = make_inputs()
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)}, images, image_sizes,
                train=False,
            )
        )()
        out = jax.jit(lambda im, sz: model.apply(variables, im, sz, train=False))(
            images, image_sizes
        )
        assert np.isfinite(np.asarray(out["pred_class"])).all()
        coords = np.asarray(out["pred_coord"])
        assert np.isfinite(coords).all()
        assert (coords >= 0).all() and (coords <= 1).all()

    def test_train_forward_and_loss(self, model_and_vars):
        cfg, model, criterion, sal_criterion, _, variables = model_and_vars
        images, image_sizes, targets = make_inputs()
        out, mutated = jax.jit(
            lambda im, sz, tg: model.apply(
                variables, im, sz, tg, train=True,
                rngs={"denoising": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
        )(images, image_sizes, targets)
        ndn = 2 * cfg.denoising_nums
        assert out["dn_class"].shape[2] == ndn
        assert out["pred_class"].shape[2] == cfg.num_queries
        # batch max gt = 5, denoising_nums = 8 -> reference groups = 8*5//25 = 1
        assert int(out["dn_m"]) == 5 and int(out["dn_groups"]) == 1

        num_boxes = jnp.maximum(targets.valid.sum().astype(jnp.float32), 1.0)
        losses = compute_loss(
            out, targets, image_sizes, criterion, sal_criterion, num_boxes,
            denoising_nums=cfg.denoising_nums,
        )
        assert "loss_class" in losses and "loss_salience" in losses
        assert "loss_class_dn" in losses and "loss_class_enc" in losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} not finite"

    def test_sort_encoder_prefix_is_semantics_free(self, model_and_vars):
        """sort_encoder_prefix re-orders each encoder layer's foreground
        prefix for gather locality; MSDA is per-query, the pre-attn top-k is
        a set selection, and the scatter-back indices are unique, so eval
        outputs must match the unsorted model up to f32 reduction-order
        noise (the pre-attn key order changes dot accumulation order)."""
        cfg, model, _, _, _, variables = model_and_vars
        images, image_sizes, _ = make_inputs()
        out_ref = jax.jit(lambda im, sz: model.apply(variables, im, sz, train=False))(
            images, image_sizes
        )
        cfg_s = tiny_config(sort_encoder_prefix=True)
        model_s, _, _, _ = build_salience_detr(cfg_s)
        out_s = jax.jit(lambda im, sz: model_s.apply(variables, im, sz, train=False))(
            images, image_sizes
        )
        np.testing.assert_allclose(
            np.asarray(out_s["pred_class"], np.float32),
            np.asarray(out_ref["pred_class"], np.float32),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_s["pred_coord"], np.float32),
            np.asarray(out_ref["pred_coord"], np.float32),
            rtol=2e-3, atol=2e-3,
        )

    def test_gradients(self, model_and_vars):
        cfg, model, criterion, sal_criterion, _, variables = model_and_vars
        images, image_sizes, targets = make_inputs()
        num_boxes = jnp.maximum(targets.valid.sum().astype(jnp.float32), 1.0)

        def loss_fn(params):
            out, _ = model.apply(
                {**variables, "params": params}, images, image_sizes, targets,
                train=True, rngs={"denoising": jax.random.PRNGKey(3)},
                mutable=["batch_stats"],
            )
            losses = compute_loss(
                out, targets, image_sizes, criterion, sal_criterion, num_boxes,
                denoising_nums=cfg.denoising_nums,
            )
            return sum(losses.values())

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        total = sum(float(jnp.abs(g).sum()) for g in flat)
        assert total > 0


