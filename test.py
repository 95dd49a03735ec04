"""Evaluation CLI (the reference's test.py:28-163 equivalent): evaluate a
checkpoint on a COCO split, or re-score a saved predictions JSON; optionally
dump predictions and visualizations."""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser("Salience-DETR TPU evaluation")
    p.add_argument("--coco-img", default="data/coco/val2017")
    p.add_argument("--coco-ann", default="data/coco/annotations/instances_val2017.json")
    p.add_argument("--model-config", default="configs/salience_detr/salience_detr_resnet50_800_1333.py")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument(
        "--torch-checkpoint", default=None,
        help="released reference .pth to convert and evaluate "
        "(the reference's test.py:107-112 path)",
    )
    p.add_argument("--result-file", default=None, help="re-score an existing predictions JSON")
    p.add_argument("--save-results", default=None, help="dump predictions JSON here")
    p.add_argument("--show-dir", default=None, help="save visualizations here")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--canvas", type=int, nargs=2, default=(800, 1344))
    p.add_argument("--max-gt", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def rescore_result_file(coco, result_file):
    """COCO-result-format JSON -> evaluator (test.py:126-140)."""
    from salience_detr_tpu.utils.coco_eval import CocoEvaluator

    with open(result_file) as f:
        results = json.load(f)
    by_img = {}
    for r in results:
        by_img.setdefault(r["image_id"], {"boxes": [], "scores": [], "labels": []})
        x, y, w, h = r["bbox"]
        by_img[r["image_id"]]["boxes"].append([x, y, x + w, y + h])
        by_img[r["image_id"]]["scores"].append(r["score"])
        by_img[r["image_id"]]["labels"].append(r["category_id"])
    ev = CocoEvaluator(coco)
    ev.update({
        k: {kk: np.asarray(vv) for kk, vv in v.items()} for k, v in by_img.items()
    })
    ev.accumulate()
    stats = ev.summarize()
    print(" ".join(f"{k}={v:.4f}" for k, v in stats.items()))
    print(ev.per_category_table())
    return stats


def main():
    args = parse_args()
    from salience_detr_tpu.data.coco import CocoDetection
    from salience_detr_tpu.data.loader import DetectionLoader, DevicePrefetcher
    from salience_detr_tpu.engine.train import evaluate
    from salience_detr_tpu.models.bricks.criterion import Targets
    from salience_detr_tpu.models.detectors.salience_detr import normalize_images
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.parallel.mesh import make_mesh, shard_batch
    from salience_detr_tpu.parallel.train_step import TrainState, make_eval_step
    from salience_detr_tpu.utils.checkpoint import CheckpointManager
    from salience_detr_tpu.utils.coco_eval import CocoEvaluator
    from salience_detr_tpu.utils.config import Config
    from salience_detr_tpu.utils.logging_utils import setup_logger

    logger = setup_logger()
    dataset = CocoDetection(args.coco_img, args.coco_ann)

    if args.result_file:
        rescore_result_file(dataset.coco, args.result_file)
        return

    model_cfg = Config(args.model_config).model_config
    if args.torch_checkpoint and (
        model_cfg.shared_sampling_locations
        or model_cfg.sampling_groups > 0
        or model_cfg.decoder_sampling_groups >= 1
    ):
        # Reference checkpoints carry per-head sampling-offset heads; the
        # TPU-tuned hybrid config's shared encoder head has a different shape
        # and the tolerant merge would silently leave it at random init.
        # Converted-checkpoint evaluation therefore always runs the
        # checkpoint-exact per-head sampling path.
        import dataclasses
        model_cfg = dataclasses.replace(
            model_cfg,
            shared_sampling_locations=False,
            sampling_groups=0,
            decoder_sampling_groups=-1,
        )
        logger.info(
            "torch-checkpoint eval: forcing checkpoint-exact per-head "
            "sampling (config requested the TPU hybrid fast path)"
        )
    model, _, _, postprocess = build_salience_detr(model_cfg)

    loader = DetectionLoader(
        dataset, args.batch_size, canvas_hw=tuple(args.canvas), max_gt=args.max_gt,
        shuffle=False, drop_last=False,
        eval_min_size=model_cfg.min_size, eval_max_size=model_cfg.max_size,
    )
    mesh = make_mesh()
    B, (H, W), M = args.batch_size, tuple(args.canvas), args.max_gt
    with mesh:
        init = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(args.seed)},
                jnp.zeros((B, H, W, 3)), jnp.full((B, 2), 32, jnp.int32), train=False,
            )
        )
        variables = init()
        if args.torch_checkpoint:
            from salience_detr_tpu.utils.weight_converter import (
                load_reference_checkpoint,
                salience_detr_rules,
            )

            rules = salience_detr_rules(
                backbone=model_cfg.backbone,
                stage_with_dcn=tuple(model_cfg.stage_with_dcn),
                num_encoder_layers=model_cfg.num_encoder_layers,
                num_decoder_layers=model_cfg.num_decoder_layers,
                num_levels=model_cfg.num_feature_levels,
                num_channel_mapper_convs=model_cfg.num_feature_levels,
            )
            variables = load_reference_checkpoint(
                jax.device_get(variables), args.torch_checkpoint,
                rules=rules, logger=logger,
            )
            logger.info(f"Converted torch checkpoint {args.torch_checkpoint}")
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            frozen=variables.get("frozen", {}),
            batch_stats=variables.get("batch_stats", {}), opt_state=None,
        )
        if args.checkpoint:
            mgr = CheckpointManager(args.checkpoint)
            restored = mgr.restore_weights()
            if restored is not None:
                state = TrainState(
                    step=jnp.asarray(restored["step"], jnp.int32),
                    params=restored["params"], frozen=restored["frozen"],
                    batch_stats=restored["batch_stats"], opt_state=None,
                )
                logger.info(f"Restored checkpoint from {args.checkpoint}")

        eval_step = make_eval_step(model, postprocess, mesh=mesh)

        def device_put(batch):
            batch = dict(batch)
            batch["images"] = normalize_images(
                jnp.asarray(batch["images"], jnp.float32) / 255.0
            )
            return shard_batch(batch, mesh)

        evaluator = CocoEvaluator(dataset.coco)
        stats = evaluate(
            eval_step, state, DevicePrefetcher(loader, device_put), evaluator,
            logger=logger,
        )

    if args.save_results:
        results = []
        for img_id, pred in evaluator.predictions.items():
            # evaluator stores xywh (COCO result format)
            for b, s, l in zip(pred["boxes"], pred["scores"], pred["labels"]):
                results.append({
                    "image_id": int(img_id),
                    "category_id": int(l),
                    "bbox": [float(v) for v in b],
                    "score": float(s),
                })
        with open(args.save_results, "w") as f:
            json.dump(results, f)
        logger.info(f"Saved {len(results)} predictions to {args.save_results}")


if __name__ == "__main__":
    main()
