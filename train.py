"""Training CLI (the reference's main.py:24-201 equivalent).

Usage:
    python train.py --config-file configs/train_config.py [--seed 0] ...
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser("Salience-DETR TPU training")
    p.add_argument("--config-file", default="configs/train_config.py")
    p.add_argument(
        "--mixed-precision", default="bf16", choices=["no", "bf16", "fp16"],
        help="bf16 runs the compute path in bfloat16 on the MXU (the TPU-"
        "native choice); fp16 mirrors the reference's fp16 AMP flag "
        "(reference main.py:27-35) for parity — same dynamic range caveats "
        "as torch AMP apply, and bf16 is preferred on TPU",
    )
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument(
        "--accumulate-steps", type=int, default=1,
        help="micro-batch gradient accumulation inside the compiled step "
        "(the reference's accelerator.accumulate, main.py:36-38); the batch "
        "size must be divisible by it",
    )
    p.add_argument(
        "--pretrained-backbone", default=None,
        help="ImageNet .pth (bare torchvision/timm names) converted into the "
        "backbone before training — the reference loads these inside every "
        "backbone factory (resnet.py:398-426); overrides the config's "
        "backbone_weights",
    )
    p.add_argument("--use-deterministic-algorithms", action="store_true")
    p.add_argument("--dry-run-steps", type=int, default=0,
                   help="stop after N steps (smoke testing)")
    return p.parse_args()


def main():
    args = parse_args()

    from salience_detr_tpu.data.coco import CocoDetection
    from salience_detr_tpu.data.loader import DetectionLoader, DevicePrefetcher
    from salience_detr_tpu.data.transforms import PRESETS
    from salience_detr_tpu.engine.optim import build_optimizer, make_lr_schedule
    from salience_detr_tpu.engine.train import evaluate, train_one_epoch
    from salience_detr_tpu.models.backbones.resnet import frozen_param_predicate
    from salience_detr_tpu.models.bricks.criterion import Targets, default_weight_dict
    from salience_detr_tpu.models.detectors.salience_detr import normalize_images
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.parallel.mesh import init_distributed, make_mesh, shard_batch
    from salience_detr_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from salience_detr_tpu.utils.checkpoint import CheckpointManager, HighestCheckpoint
    from salience_detr_tpu.utils.config import Config
    from salience_detr_tpu.utils.coco_eval import CocoEvaluator
    from salience_detr_tpu.utils.coco_utils import get_coco_index_from_dataset
    from salience_detr_tpu.utils.logging_utils import setup_logger
    from salience_detr_tpu.utils.tracker import TensorBoardTracker

    init_distributed()
    cfg = Config(args.config_file)
    model_cfg = Config(cfg.model_path).model_config
    if args.mixed_precision == "bf16":
        model_cfg.dtype = jnp.bfloat16
    elif args.mixed_precision == "fp16":
        # parity with the reference's fp16 AMP option; params/optimizer and
        # the loss/matching path stay f32 (mixed-precision, not casting)
        model_cfg.dtype = jnp.float16

    seed = args.seed if args.seed is not None else int.from_bytes(os.urandom(2), "big")

    model_name = os.path.splitext(os.path.basename(cfg.model_path))[0]
    output_dir = cfg.get("output_dir") or os.path.join(
        "checkpoints", model_name, "train",
        datetime.datetime.now().strftime("%Y-%m-%d-%H_%M_%S"),
    )
    logger = setup_logger(output=output_dir, rank=jax.process_index())
    logger.info(f"Command: {' '.join(sys.argv)}")
    logger.info(f"Config:\n{cfg.pretty()}")

    from salience_detr_tpu.utils.env import (
        GracefulShutdown,
        collect_env_info,
        seed_everything,
    )

    seed = seed_everything(seed)
    logger.info(f"Environment:\n{collect_env_info()}")
    logger.info(f"seed={seed}")

    # data
    use_copypaste = bool(cfg.get("copypaste", False))
    train_dataset = CocoDetection(
        cfg.train_img_folder, cfg.train_ann_file,
        transforms=PRESETS[cfg.get("train_transform", "detr")], train=True,
        return_masks=use_copypaste,  # SimpleCopyPaste composites by masks
    )
    test_dataset = CocoDetection(cfg.test_img_folder, cfg.test_ann_file)
    batch_transform = None
    if use_copypaste:
        from salience_detr_tpu.data.transforms import simple_copy_paste

        batch_transform = simple_copy_paste
    train_loader = DetectionLoader(
        train_dataset, cfg.batch_size, canvas_hw=tuple(cfg.get("train_canvas", (800, 1344))),
        max_gt=cfg.get("max_gt", 100), shuffle=True, seed=seed,
        num_workers=cfg.get("num_workers", 8),
        batch_transform=batch_transform,
    )
    test_loader = DetectionLoader(
        test_dataset, cfg.batch_size, canvas_hw=tuple(cfg.get("train_canvas", (800, 1344))),
        max_gt=cfg.get("max_gt", 100), shuffle=False, drop_last=False,
        num_workers=cfg.get("num_workers", 8),
        eval_min_size=model_cfg.min_size, eval_max_size=model_cfg.max_size,
    )
    steps_per_epoch = len(train_loader)

    # class vocabulary rides with the run (the reference stores int-encoded
    # class names in the checkpoint + label_names.txt, main.py:139-168)
    names = {c["id"]: c["name"] for c in train_dataset.coco.cats.values()}
    with open(os.path.join(output_dir, "label_names.txt"), "w") as f:
        for i in range(max(names, default=0) + 1):
            f.write(names.get(i, str(i)) + "\n")

    # model + optimizer
    model, criterion, sal_criterion, postprocess = build_salience_detr(model_cfg)
    schedule = make_lr_schedule(
        cfg.learning_rate, steps_per_epoch,
        milestones=cfg.get("lr_milestones", [10]), gamma=cfg.get("lr_gamma", 0.1),
        warmup_factor=cfg.get("warmup_factor", 1e-3),
        warmup_steps=min(cfg.get("warmup_steps", 1000), steps_per_epoch),
    )

    mesh = make_mesh(args.num_devices)
    B = cfg.batch_size
    H, W = cfg.get("train_canvas", (800, 1344))
    M = cfg.get("max_gt", 100)
    dummy_images = jnp.zeros((B, H, W, 3), jnp.float32)
    dummy_sizes = jnp.full((B, 2), jnp.int32(32))
    dummy_targets = Targets(
        jnp.zeros((B, M), jnp.int32), jnp.full((B, M, 4), 0.5, jnp.float32),
        jnp.zeros((B, M), bool),
    )

    with mesh:
        params0 = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(seed), "denoising": jax.random.PRNGKey(seed + 1)},
                dummy_images, dummy_sizes, dummy_targets, train=True,
            )
        )()["params"]
        tx = build_optimizer(
            params0, schedule, weight_decay=cfg.get("weight_decay", 1e-4),
            betas=tuple(cfg.get("betas", (0.9, 0.999))),
            max_norm=cfg.get("max_norm", 0.1),
            frozen_predicate=frozen_param_predicate(model_cfg.backbone_freeze_indices),
            grouping=cfg.get(
                "param_dicts", "finetune_backbone_and_linear_projection"
            ),
        )
        state = create_train_state(
            model, tx, dummy_images, dummy_sizes, dummy_targets, seed=seed
        )

        backbone_weights = args.pretrained_backbone or cfg.get("backbone_weights")
        if backbone_weights:
            from salience_detr_tpu.utils.weight_converter import (
                load_pretrained_backbone,
            )

            updated = load_pretrained_backbone(
                jax.device_get(
                    {"params": state.params, "frozen": state.frozen,
                     "batch_stats": state.batch_stats}
                ),
                backbone_weights,
                backbone=model_cfg.backbone,
                stage_with_dcn=tuple(model_cfg.stage_with_dcn),
                logger=logger,
            )
            state = state.replace(
                params=updated["params"], frozen=updated.get("frozen", {}),
                batch_stats=updated.get("batch_stats", {}),
            )
            logger.info(f"Loaded pretrained backbone from {backbone_weights}")

        # full-detector fine-tune init (the reference's weights-only resume:
        # a .pth resume_from_checkpoint goes through load_checkpoint + the
        # tolerant strict=False load_state_dict, util/utils.py:370-423 —
        # shape-mismatched heads, e.g. a different class count, are skipped).
        # Accepts a reference/exported torch .pth (converter route) or an
        # orbax checkpoint dir (weights-only restore + tolerant merge).
        finetune_weights = cfg.get("finetune_weights")
        if finetune_weights:
            current = jax.device_get(
                {"params": state.params, "frozen": state.frozen,
                 "batch_stats": state.batch_stats or {}}
            )
            if str(finetune_weights).endswith(".pth"):
                from salience_detr_tpu.utils.weight_converter import (
                    load_reference_checkpoint,
                    salience_detr_rules,
                )

                rules = salience_detr_rules(
                    model_cfg.backbone, tuple(model_cfg.stage_with_dcn),
                    num_encoder_layers=model_cfg.num_encoder_layers,
                    num_decoder_layers=model_cfg.num_decoder_layers,
                    num_levels=model_cfg.num_feature_levels,
                    num_channel_mapper_convs=model_cfg.num_feature_levels,
                )
                updated = load_reference_checkpoint(
                    current, finetune_weights, rules=rules, logger=logger
                )
            else:
                from salience_detr_tpu.utils.checkpoint import tolerant_update
                from salience_detr_tpu.utils.weight_converter import (
                    flatten_variables,
                )

                restored = CheckpointManager(finetune_weights).restore_weights()
                if restored is None:
                    raise SystemExit(
                        f"finetune_weights: no checkpoint under {finetune_weights}"
                    )
                updated = {}
                total_applied = 0
                for coll in ("params", "frozen", "batch_stats"):
                    src = restored.get(coll) or {}
                    merged, applied, _ = tolerant_update(
                        current[coll], flatten_variables(src), logger=logger
                    )
                    updated[coll] = merged
                    total_applied += applied
                if total_applied == 0:
                    raise SystemExit(
                        "finetune_weights applied 0 tensors — wrong model?"
                    )
                logger.info(
                    f"finetune init: applied {total_applied} tensors from "
                    f"{finetune_weights}"
                )
            state = state.replace(
                params=updated["params"], frozen=updated.get("frozen", {}),
                batch_stats=updated.get("batch_stats", {}),
            )

        ckpt = CheckpointManager(os.path.join(output_dir, "checkpoints"))
        best = HighestCheckpoint(ckpt)
        starting_epoch = cfg.get("starting_epoch", 0)
        if cfg.get("resume_from_checkpoint"):
            restored = ckpt.restore(state)
            if restored is not None:
                state = restored
                starting_epoch = int(state.step) // max(steps_per_epoch, 1)
                logger.info(f"Resumed at epoch {starting_epoch}")

        weight_dict = default_weight_dict(model_cfg.num_decoder_layers)
        train_step = make_train_step(
            model, criterion, sal_criterion, tx, weight_dict, mesh=mesh,
            accumulate_steps=max(args.accumulate_steps, 1),
        )
        eval_step = make_eval_step(model, postprocess, mesh=mesh)
        tracker = TensorBoardTracker(output_dir)

        def device_put(batch):
            batch = dict(batch)
            batch["images"] = normalize_images(
                jnp.asarray(batch["images"], jnp.float32) / 255.0
            )
            return shard_batch(batch, mesh)

        rng = jax.random.PRNGKey(seed + 7)
        global_step = 0
        ckpt_metadata = {"class_names": names, "model_path": cfg.model_path,
                         "seed": seed}
        with GracefulShutdown(logger=logger) as stop:
            for epoch in range(starting_epoch, cfg.num_epochs):
                train_loader.set_epoch(epoch)
                loader = DevicePrefetcher(train_loader, device_put)
                if args.dry_run_steps:
                    import itertools

                    loader = itertools.islice(iter(loader), args.dry_run_steps)
                # fold the epoch into the key: each epoch draws a fresh noise
                # stream (denoising groups, dropout), and resume at epoch E
                # replays E's stream exactly regardless of how many epochs ran
                # in the previous process
                state, global_step = train_one_epoch(
                    train_step, state, loader, jax.random.fold_in(rng, epoch),
                    epoch, print_freq=cfg.get("print_freq", 50), logger=logger,
                    tracker=tracker.log, global_step=global_step,
                    stop_requested=stop,
                )
                if stop.requested:
                    # preemption: checkpoint the partial epoch and exit
                    # cleanly; resume replays this epoch from its start with
                    # the exact same per-epoch noise/shuffle streams
                    ckpt.save(epoch, jax.device_get(state), force=True,
                              metadata=ckpt_metadata)
                    logger.warning(
                        f"preemption checkpoint saved at epoch {epoch} "
                        f"(step {int(state.step)}); exiting"
                    )
                    break
                ckpt.save(
                    epoch, jax.device_get(state), force=True,
                    metadata=ckpt_metadata,
                )

                # get_coco_index_from_dataset short-circuits to the JSON
                # index when present and synthesizes one via
                # convert_to_coco_api for JSON-less custom datasets
                # (reference coco_utils.py:80-88)
                evaluator = CocoEvaluator(get_coco_index_from_dataset(test_dataset))
                eval_loader = DevicePrefetcher(test_loader, device_put)
                stats = evaluate(
                    eval_step, state, eval_loader, evaluator, logger=logger,
                    tracker=tracker.log, epoch=epoch,
                )
                best.update(jax.device_get(state), stats["AP"], stats["AP50"])
                if args.dry_run_steps:
                    break
    logger.info("Training done")


if __name__ == "__main__":
    main()
