"""Capture a jax.profiler device trace of the model forward / train step
(SURVEY.md §5.1: the reference has only wall-clock meters; the TPU-native
equivalent is a real XLA trace viewable in TensorBoard / Perfetto).

Usage:
    python tools/profile_trace.py --mode inference --logdir /tmp/trace
    tensorboard --logdir /tmp/trace   # or upload trace.json.gz to Perfetto
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["inference", "train"], default="inference")
    p.add_argument("--logdir", default="/tmp/salience_detr_trace")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--model-config",
                   default="configs/salience_detr/salience_detr_resnet50_800_1333.py")
    p.add_argument(
        "--sampling", default="shared_dec0",
        help="deformable-sampling variant, same grammar as bench.py's "
        "BENCH_SAMPLING: shared | groups<G> | exact, with optional _dec<D> "
        "decoder override; default = the shipping hybrid flagship",
    )
    return p.parse_args()


def sampling_cfg(sampling: str):
    """BENCH_SAMPLING grammar -> (sampling_groups, decoder_sampling_groups)
    (bench.py keeps the same parse)."""
    dec_groups = -1
    if "_dec" in sampling:
        sampling, dec = sampling.split("_dec")
        dec_groups = int(dec)
    if sampling.startswith("groups"):
        groups = int(sampling[len("groups"):])
    elif sampling == "shared":
        groups = 1
    else:
        groups = 0
    return groups, dec_groups


def main():
    args = parse_args()
    from salience_detr_tpu.models.bricks.criterion import Targets, default_weight_dict
    from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr

    groups, dec_groups = sampling_cfg(args.sampling)
    cfg = SalienceDETRConfig(
        dtype=jnp.bfloat16,
        shared_sampling_locations=groups > 0,
        sampling_groups=groups,
        decoder_sampling_groups=dec_groups,
    )
    model, criterion, sal_criterion, _ = build_salience_detr(cfg)

    B, H, W = args.batch, args.height, args.width
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-2, 2, size=(B, H, W, 3)).astype(np.float32))
    sizes = jnp.asarray([[H, W]] * B, np.int32)

    if args.mode == "inference":
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes, train=False)
        )()
        step = jax.jit(lambda im: model.apply(variables, im, sizes, train=False))
        # dump THIS compile's HLO so tools/trace_report.py can map op names
        # to named scopes (op names only match within the same compile)
        compiled = step.lower(images).compile()
        os.makedirs(args.logdir, exist_ok=True)
        with open(os.path.join(args.logdir, "hlo.txt"), "w") as f:
            f.write(compiled.as_text())
        out = step(images)  # compile outside the trace
        jax.block_until_ready(out)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.iters):
                out = step(images)
            jax.block_until_ready(out)
    else:
        import optax

        from salience_detr_tpu.parallel.train_step import (
            create_train_state,
            make_train_step,
        )

        M = 24
        targets = Targets(
            jnp.zeros((B, M), jnp.int32),
            jnp.full((B, M, 4), 0.5, jnp.float32),
            jnp.ones((B, M), bool),
        )
        tx = optax.adamw(1e-4)
        state = create_train_state(model, tx, images, sizes, targets)
        train_step = make_train_step(
            model, criterion, sal_criterion, tx, default_weight_dict(), donate=False
        )
        batch = {
            "images": images, "image_sizes": sizes, "labels": targets.labels,
            "boxes": targets.boxes, "gt_valid": targets.valid,
        }
        key = jax.random.PRNGKey(0)
        compiled = train_step.lower(state, batch, key).compile()
        os.makedirs(args.logdir, exist_ok=True)
        with open(os.path.join(args.logdir, "hlo.txt"), "w") as f:
            f.write(compiled.as_text())
        state, metrics = train_step(state, batch, key)  # compile outside
        jax.block_until_ready(metrics)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.iters):
                state, metrics = train_step(state, batch, key)
            jax.block_until_ready(metrics)
    print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
