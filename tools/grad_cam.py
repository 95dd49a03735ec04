"""Grad-CAM for detections (the reference's grad_cam/grad_cam.ipynb
equivalent): class-activation maps of the top detections' class scores with
respect to a chosen neck feature level.

The CAM follows the standard Grad-CAM recipe the notebook uses: channel
weights = spatially-pooled gradients of the target score at the chosen
feature map, CAM = ReLU(sum_c w_c * A_c).  Gradients w.r.t. the intermediate
activation are taken with a zero-perturbation probe (feats[lvl] + eps,
differentiated at eps = 0) — the JAX equivalent of the notebook's backward
hook on the layer.
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir", required=True)
    p.add_argument("--model-config", default="configs/salience_detr/salience_detr_resnet50_800_1333.py")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--show-dir", default="grad_cam_maps")
    p.add_argument("--level", type=int, default=1, help="neck feature level for the CAM")
    p.add_argument("--top-k", type=int, default=5, help="detections whose scores drive the CAM")
    p.add_argument("--limit", type=int, default=10)
    return p.parse_args()


def make_cam_fn(model, variables, level: int, top_k: int):
    """Builds a jitted (images, sizes) -> (cam (B, h, w), detections) fn.

    Reproduces SalienceDETR.__call__ (models/detectors/salience_detr.py:65-130,
    eval path) with an additive probe on the chosen neck level so the CAM
    gradient is w.r.t. that activation.
    """
    from salience_detr_tpu.ops import misc as misc_ops
    from salience_detr_tpu.ops.pos_encoding import sine_position_embedding

    def forward_from_probe(eps, images, image_sizes):
        bound = model.bind(variables)
        B, H, W, _ = images.shape
        feats = bound.backbone(images.astype(model.dtype), train=False)
        feats = bound.neck(feats)
        feats = [f + eps if i == level else f for i, f in enumerate(feats)]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        valid_hw = misc_ops.multi_level_valid_sizes(image_sizes, (H, W), shapes)
        masks = [misc_ops.rect_mask(v, s) for v, s in zip(valid_hw, shapes)]
        pos = [
            sine_position_embedding(
                m, num_pos_feats=bound.transformer.embed_dim // 2,
                normalize=True, offset=-0.5,
            ).astype(model.dtype)
            for m in masks
        ]
        vr = misc_ops.valid_ratios(valid_hw, shapes)
        outputs_class, outputs_coord, *_ = bound.transformer(
            feats, masks, pos, valid_hw, vr, None, None, None, train=False
        )
        logits = outputs_class[-1]  # (B, Q, K)
        scores = jax.nn.sigmoid(logits.astype(jnp.float32)).max(-1)  # (B, Q)
        top = jax.lax.top_k(scores, top_k)[0]
        return top.sum(), (logits, outputs_coord[-1])

    @jax.jit
    def cam_inner(eps, images, image_sizes):
        grads, (logits, coords) = jax.grad(forward_from_probe, has_aux=True)(
            eps, images, image_sizes
        )
        # recompute the activation itself for the CAM weighting
        bound = model.bind(variables)
        feats = bound.neck(bound.backbone(images.astype(model.dtype), train=False))
        act = feats[level].astype(jnp.float32)
        g = grads.astype(jnp.float32)
        weights = jnp.mean(g, axis=(1, 2), keepdims=True)  # GAP of gradients
        cam = jax.nn.relu(jnp.sum(weights * act, axis=-1))  # (B, h, w)
        return cam, logits, coords

    def cam_fn(images, image_sizes):
        # probe shape = the chosen neck level's activation shape (eval_shape:
        # the extra stride-64 level is a ceil-div conv, not an exact divide)
        bound = model.bind(variables)
        feat_shapes = jax.eval_shape(
            lambda im: bound.neck(bound.backbone(im, train=False)), images
        )
        eps = jnp.zeros(feat_shapes[level].shape, model.dtype)
        return cam_inner(eps, images, image_sizes)

    return cam_fn


def main():
    import cv2

    args = parse_args()
    from salience_detr_tpu.data.coco import InferenceDataset
    from salience_detr_tpu.data.loader import DetectionLoader
    from salience_detr_tpu.models.detectors.salience_detr import normalize_images
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.utils.config import Config
    from tools.feature_viz import colorize

    model_cfg = Config(args.model_config).model_config
    model, _, _, _ = build_salience_detr(model_cfg)
    dataset = InferenceDataset(args.image_dir)
    loader = DetectionLoader(
        dataset, batch_size=1, canvas_hw=(800, 1344), max_gt=1, shuffle=False,
        drop_last=False, eval_min_size=model_cfg.min_size,
        eval_max_size=model_cfg.max_size,
    )
    H, W = 800, 1344
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, H, W, 3)), jnp.full((1, 2), 32, jnp.int32), train=False,
        )
    )()
    if args.checkpoint:
        from salience_detr_tpu.utils.weight_converter import load_reference_checkpoint

        variables = load_reference_checkpoint(variables, args.checkpoint)

    cam_fn = make_cam_fn(model, variables, args.level, args.top_k)

    os.makedirs(args.show_dir, exist_ok=True)
    count = 0
    for batch in loader:
        if count >= args.limit:
            break
        images = normalize_images(jnp.asarray(batch["images"], jnp.float32) / 255.0)
        cam, _, _ = jax.device_get(cam_fn(images, jnp.asarray(batch["image_sizes"])))
        base = batch["images"][0]
        h0, w0 = batch["image_sizes"][0]
        heat = colorize(cam[0])
        heat = cv2.resize(heat, (int(w0), int(h0)), interpolation=cv2.INTER_LINEAR)
        overlay = (0.5 * base[:h0, :w0] + 0.5 * heat).astype(np.uint8)
        panel = np.concatenate([base[:h0, :w0], overlay], axis=1)
        idx = int(batch["image_ids"][0])
        name = os.path.basename(dataset.paths[idx])
        cv2.imwrite(os.path.join(args.show_dir, name), panel[:, :, ::-1])
        count += 1
    print(f"wrote {count} grad-cam visualizations to {args.show_dir}")


if __name__ == "__main__":
    main()
