"""Model export to StableHLO (the TPU-world replacement for the reference's
ONNX export, /root/reference/tools/pytorch2onnx.py:83-143), with numerical
verification of the exported function against the live model at the
reference's tolerances (rtol 1e-3 / atol 1e-5, pytorch2onnx.py:136-138)."""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", default="configs/salience_detr/salience_detr_resnet50_800_1333.py")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--output", default="exported_model.stablehlo")
    p.add_argument("--verify", action="store_true", default=True)
    return p.parse_args()


def main():
    args = parse_args()
    from jax import export as jax_export

    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.utils.config import Config

    cfg = Config(args.model_config).model_config
    model, _, _, postprocess = build_salience_detr(cfg)

    B, H, W = args.batch, args.height, args.width
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W]] * B, jnp.int32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes, train=False)
    )()
    if args.checkpoint:
        # restore a trained orbax checkpoint into the variable collections
        # (the reference exports a trained model, pytorch2onnx.py:99-107)
        from salience_detr_tpu.utils.checkpoint import CheckpointManager

        restored = CheckpointManager(args.checkpoint).restore_weights()
        if restored is None:
            raise SystemExit(f"no checkpoint found under {args.checkpoint}")
        variables = {"params": restored["params"]}
        if restored["frozen"]:
            variables["frozen"] = restored["frozen"]
        if restored["batch_stats"]:
            variables["batch_stats"] = restored["batch_stats"]
        print(f"restored checkpoint from {args.checkpoint}")

    def fwd(images, sizes):
        out = model.apply(variables, images, sizes, train=False)
        return out["pred_class"][-1], out["pred_coord"][-1]

    exported = jax_export.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, 2), jnp.int32),
    )
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 2**20:.1f} MiB StableHLO to {args.output}")

    if args.verify:
        rng = np.random.default_rng(0)
        test_images = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
        want = jax.jit(fwd)(test_images, sizes)
        reloaded = jax_export.deserialize(blob)
        got = reloaded.call(test_images, sizes)
        for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(w, np.float32),
                rtol=1e-3, atol=1e-5,
            )
        print("verification passed (rtol=1e-3, atol=1e-5)")


if __name__ == "__main__":
    main()
