"""Model benchmark: FLOPs (XLA HLO cost analysis), parameter count, peak
memory estimate, and compiled step latency.

Behavioral spec: /root/reference/tools/benchmark_model.py:26-66 (fvcore FLOP
analysis + CUDA-event latency); here FLOPs come from the compiled XLA
executable's cost analysis and latency from wall-clock around blocked
dispatches."""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", default="configs/salience_detr/salience_detr_resnet50_800_1333.py")
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--bf16", action="store_true", default=True)
    return p.parse_args()


def main():
    args = parse_args()
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.utils.config import Config

    cfg = Config(args.model_config).model_config
    if args.bf16:
        cfg.dtype = jnp.bfloat16
    model, _, _, _ = build_salience_detr(cfg)

    B, H, W = args.batch, args.height, args.width
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W]] * B, jnp.int32)

    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes, train=False)
    )()
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))

    def fwd(images, sizes):
        out = model.apply(variables, images, sizes, train=False)
        return out["pred_class"][-1], out["pred_coord"][-1]

    lowered = jax.jit(fwd).lower(images, sizes)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    mem = compiled.memory_analysis()

    out = compiled(images, sizes)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        out = compiled(images, sizes)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.repeats

    print(f"params:        {n_params / 1e6:.2f} M")
    print(f"flops/forward: {flops / 1e9:.2f} GFLOPs (XLA cost analysis)")
    if mem is not None:
        try:
            print(f"peak memory:   {mem.temp_size_in_bytes / 2**20:.1f} MiB temp, "
                  f"{mem.argument_size_in_bytes / 2**20:.1f} MiB args")
        except Exception:
            pass
    print(f"latency:       {dt * 1e3:.2f} ms / batch{B}  ({B / dt:.2f} img/s)")


if __name__ == "__main__":
    main()
