"""Inference CLI (the reference's inference.py:31-166 equivalent): run the
detector on a folder of images and save visualizations / predictions."""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser("Salience-DETR TPU inference")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--model-config", default="configs/salience_detr/salience_detr_resnet50_800_1333.py")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--show-dir", default="visualization")
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--save-results", default=None)
    p.add_argument("--canvas", type=int, nargs=2, default=(800, 1344))
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    from salience_detr_tpu.data.coco import InferenceDataset
    from salience_detr_tpu.data.loader import DetectionLoader
    from salience_detr_tpu.models.detectors.salience_detr import normalize_images
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.parallel.train_step import TrainState
    from salience_detr_tpu.utils.checkpoint import CheckpointManager
    from salience_detr_tpu.utils.config import Config
    from salience_detr_tpu.utils.logging_utils import setup_logger
    from salience_detr_tpu.utils.visualize import save_visualization

    logger = setup_logger()
    model_cfg = Config(args.model_config).model_config
    model, _, _, postprocess = build_salience_detr(model_cfg)
    dataset = InferenceDataset(args.image_dir)
    loader = DetectionLoader(
        dataset, batch_size=1, canvas_hw=tuple(args.canvas), max_gt=1, shuffle=False,
        drop_last=False, eval_min_size=model_cfg.min_size,
        eval_max_size=model_cfg.max_size,
    )

    H, W = args.canvas
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(args.seed)},
            jnp.zeros((1, H, W, 3)), jnp.full((1, 2), 32, jnp.int32), train=False,
        )
    )()
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}), opt_state=None,
    )
    if args.checkpoint:
        # templateless weight restore: a training checkpoint carries opt_state
        # and the train-only denoising_generator params, which this eval-mode
        # template lacks — restore(template) would reject the structure
        # mismatch (same path as test.py:145-153)
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore_weights()
        if restored is not None:
            state = TrainState(
                step=jnp.asarray(restored["step"], jnp.int32),
                params=restored["params"], frozen=restored["frozen"],
                batch_stats=restored["batch_stats"], opt_state=None,
            )
            logger.info(f"Restored checkpoint from {args.checkpoint}")

    @jax.jit
    def forward(images, image_sizes, orig_sizes):
        out = model.apply(
            {"params": state.params, "frozen": state.frozen,
             **({"batch_stats": state.batch_stats} if state.batch_stats else {})},
            images, image_sizes, train=False,
        )
        return postprocess(out["pred_class"][-1], out["pred_coord"][-1], orig_sizes)

    all_results = []
    for batch in loader:
        images = normalize_images(jnp.asarray(batch["images"], jnp.float32) / 255.0)
        dets = jax.device_get(
            forward(images, jnp.asarray(batch["image_sizes"]), jnp.asarray(batch["orig_sizes"]))
        )
        for i in range(len(batch["image_ids"])):
            keep = dets["valid"][i].astype(bool) & (dets["scores"][i] > args.score_threshold)
            idx = int(batch["image_ids"][i])
            pred = {
                "boxes": dets["boxes"][i][keep],
                "scores": dets["scores"][i][keep],
                "labels": dets["labels"][i][keep],
            }
            path = dataset.paths[idx]
            if args.show_dir:
                img = dataset[idx]["image"]
                save_visualization(
                    img, pred,
                    os.path.join(args.show_dir, os.path.basename(path)),
                    score_threshold=args.score_threshold,
                )
            all_results.append({
                "image": path,
                "boxes": pred["boxes"].tolist(),
                "scores": pred["scores"].tolist(),
                "labels": pred["labels"].tolist(),
            })
            logger.info(f"{path}: {len(pred['boxes'])} detections")

    if args.save_results:
        with open(args.save_results, "w") as f:
            json.dump(all_results, f)


if __name__ == "__main__":
    main()
