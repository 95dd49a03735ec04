"""Salience / feature visualization (the reference's grad_cam notebooks,
/root/reference/grad_cam/feat_show.ipynb + grad_cam.ipynb): renders the
model's hierarchical salience score maps over input images."""

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
    p.add_argument("--show-dir", default="salience_maps")
    p.add_argument("--limit", type=int, default=10)
    return p.parse_args()


def colorize(score: np.ndarray) -> np.ndarray:
    """Score map [h, w] -> heatmap uint8 RGB."""
    import cv2

    s = score - score.min()
    s = s / max(s.max(), 1e-6)
    return cv2.applyColorMap((s * 255).astype(np.uint8), cv2.COLORMAP_JET)[:, :, ::-1]


def main():
    import cv2

    args = parse_args()
    from salience_detr_tpu.data.coco import InferenceDataset
    from salience_detr_tpu.data.loader import DetectionLoader
    from salience_detr_tpu.models.detectors.salience_detr import normalize_images
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.utils.config import Config

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

    @jax.jit
    def forward(images, sizes):
        out = model.apply(variables, images, sizes, train=False)
        return [s for s in out["salience"]]

    os.makedirs(args.show_dir, exist_ok=True)
    count = 0
    for batch in loader:
        if count >= args.limit:
            break
        images = normalize_images(jnp.asarray(batch["images"], jnp.float32) / 255.0)
        maps = jax.device_get(forward(images, jnp.asarray(batch["image_sizes"])))
        base = batch["images"][0]
        h0, w0 = batch["image_sizes"][0]
        panels = [base[:h0, :w0]]
        for lvl, m in enumerate(maps):
            heat = colorize(m[0, :, :, 0])
            heat = cv2.resize(heat, (int(w0), int(h0)), interpolation=cv2.INTER_NEAREST)
            overlay = (0.5 * base[:h0, :w0] + 0.5 * heat).astype(np.uint8)
            panels.append(overlay)
        panel = np.concatenate(panels, axis=1)
        idx = int(batch["image_ids"][0])
        name = os.path.basename(dataset.paths[idx])
        cv2.imwrite(os.path.join(args.show_dir, name), panel[:, :, ::-1])
        count += 1
    print(f"wrote {count} salience visualizations to {args.show_dir}")


if __name__ == "__main__":
    main()
