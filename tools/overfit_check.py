"""Training-correctness check: overfit a single synthetic batch with a small
model and verify the loss drops substantially.  The reference has no training
tests (SURVEY.md §4); this is the convergence smoke for the whole stack
(CDN + Hungarian + losses + optimizer)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(steps: int = 150):
    from salience_detr_tpu.engine.optim import build_optimizer, make_lr_schedule
    from salience_detr_tpu.models.backbones.resnet import frozen_param_predicate
    from salience_detr_tpu.models.bricks.criterion import Targets, default_weight_dict
    from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr
    from salience_detr_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = SalienceDETRConfig(
        backbone="resnet18",
        embed_dim=64,
        num_classes=7,
        num_queries=60,
        num_encoder_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        dim_feedforward=128,
        topk_sa=30,
        layer_filter_ratio=(1.0, 0.5),
        denoising_nums=8,
        dn_max_gt=4,
        max_num_embedding=32,
        shared_sampling_locations=True,
        backbone_freeze_indices=(),  # train everything for overfitting
    )
    model, crit, sal, _ = build_salience_detr(cfg)

    B, H, W, M = 2, 256, 256, 6
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))
    sizes = jnp.asarray([[H, W]] * B, np.int32)
    boxes = np.concatenate(
        [rng.uniform(0.25, 0.75, (B, M, 2)), rng.uniform(0.1, 0.25, (B, M, 2))], -1
    ).astype(np.float32)
    labels = rng.integers(0, 7, (B, M)).astype(np.int32)
    valid = np.ones((B, M), bool)
    targets = Targets(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))

    schedule = make_lr_schedule(2e-4, steps_per_epoch=10**6, warmup_steps=20)
    params0 = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "denoising": jax.random.PRNGKey(1)},
            images, sizes, targets, train=True,
        )
    )["params"]
    tx = build_optimizer(params0, schedule, max_norm=0.5,
                         frozen_predicate=frozen_param_predicate(()))
    state = create_train_state(model, tx, images, sizes, targets)
    step = make_train_step(model, crit, sal, tx, default_weight_dict(cfg.num_decoder_layers))

    batch = dict(images=images, image_sizes=sizes, labels=targets.labels,
                 boxes=targets.boxes, gt_valid=targets.valid)
    losses = []
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        if i % 10 == 0 or i == steps - 1:
            l = float(jax.device_get(metrics["loss"]))
            losses.append(l)
            print(f"step {i:4d}: loss {l:.4f}", flush=True)

    first, last = losses[0], losses[-1]
    print(f"loss {first:.3f} -> {last:.3f} ({last / first:.2%})")
    assert last < 0.5 * first, "loss did not drop by 2x — training is broken"
    print("OVERFIT CHECK PASSED")


if __name__ == "__main__":
    main()
