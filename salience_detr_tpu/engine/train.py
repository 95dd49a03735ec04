"""Training and evaluation loops.

Behavioral spec: /root/reference/util/engine.py:19-192 (train_one_epoch_acc:
prefetch, loss, clip, warmup, NaN abort, metric logging; evaluate_acc: eval
forward -> CocoEvaluator -> 12-metric summary + per-category table).

TPU design: the train step is one compiled program (forward + matching +
losses + update); metrics stay on device and are fetched only every
``print_freq`` steps, so there is no per-iteration host sync (the reference
calls .item() every step, util/engine.py:70)."""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.logging_utils import MetricLogger, setup_logger


def train_one_epoch(
    train_step: Callable,
    state,
    loader,
    rng: jax.Array,
    epoch: int,
    print_freq: int = 50,
    logger=None,
    tracker: Optional[Callable[[Dict[str, float], int], None]] = None,
    global_step: int = 0,
    stop_requested: Optional[Callable[[], bool]] = None,
):
    """Runs one epoch; returns (state, global_step).

    ``stop_requested`` (e.g. utils.env.GracefulShutdown) is polled once per
    step: when it fires, the epoch returns early with the post-step state so
    the caller can checkpoint and exit (preemption handling)."""
    logger = logger or setup_logger()
    metric_logger = MetricLogger(logger=logger)
    header = f"Epoch: [{epoch}]"

    steps = 0
    for i, batch in enumerate(metric_logger.log_every(loader, print_freq, header)):
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, batch, step_rng)
        steps += 1
        if stop_requested is not None and stop_requested():
            logger.warning(
                f"stop requested at epoch {epoch} step {i}: ending epoch early"
            )
            break

        if i % print_freq == 0:
            # fetch the (async) metrics; one device sync per interval
            host_metrics = {k: float(v) for k, v in metrics.items()}
            loss = host_metrics["loss"]
            if not math.isfinite(loss):
                logger.error(f"Loss is {loss}, stopping training\n{host_metrics}")
                raise FloatingPointError(f"non-finite loss: {host_metrics}")
            metric_logger.update(**host_metrics)
            if tracker is not None:
                tracker(
                    {f"loss/{k}": v for k, v in host_metrics.items()},
                    global_step + i,
                )
    return state, global_step + steps


def evaluate(
    eval_step: Callable,
    state,
    loader,
    evaluator,
    logger=None,
    print_freq: int = 50,
    tracker: Optional[Callable[[Dict[str, float], int], None]] = None,
    epoch: int = 0,
):
    """COCO evaluation loop; returns the 12-metric dict."""
    logger = logger or setup_logger()
    metric_logger = MetricLogger(logger=logger)

    for batch in metric_logger.log_every(loader, print_freq, "Test:"):
        dets = eval_step(state, batch)
        dets = jax.device_get(dets)
        image_ids = np.asarray(batch["image_ids"])
        preds = {}
        for i, img_id in enumerate(image_ids):
            valid = dets["valid"][i].astype(bool)
            preds[int(img_id)] = {
                "boxes": dets["boxes"][i][valid],
                "scores": dets["scores"][i][valid],
                "labels": dets["labels"][i][valid],
            }
        evaluator.update(preds)

    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    stats = evaluator.summarize()
    logger.info(
        " ".join(f"{k}={v:.4f}" for k, v in stats.items())
    )
    logger.info("\n" + evaluator.per_category_table())
    if tracker is not None:
        tracker({f"val/{k}": v for k, v in stats.items()}, epoch)
    return stats
