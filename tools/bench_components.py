"""Component-level microbenchmarks on the real chip: pinpoints the hot spot
among backbone, deformable-attention sampling, grid NMS, salience scoring.
Uses utils/timing.device_time (in-program loop) — wall-clock around
dispatches is meaningless on the tunnel platform."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.timing import device_time


def main():
    B = 4
    H, W = 800, 1344
    SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
    S = sum(h * w for h, w in SHAPES)
    C, HEADS, D, P, L = 256, 8, 32, 4, 4
    rng = np.random.default_rng(0)

    print(f"S={S} B={B}")

    # --- backbone
    from salience_detr_tpu.models.backbones.resnet import ResNetBackbone

    bb = ResNetBackbone(arch="resnet50", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    vb = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), x))()
    t = device_time(lambda x: bb.apply(vb, x), (x,))
    print(f"backbone R50:          {t * 1e3:8.2f} ms")

    # --- deformable attention core at encoder scale (layer 0: Q~11.4k)
    from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core

    for Q in (11403, 1100):
        value = jnp.asarray(rng.normal(size=(B, S, HEADS, D)).astype(np.float32), jnp.bfloat16)
        locs = jnp.asarray(rng.uniform(0, 1, (B, Q, HEADS, L, P, 2)).astype(np.float32))
        w = jnp.asarray(rng.uniform(size=(B, Q, HEADS, L, P)).astype(np.float32))
        w = w / w.sum(axis=(-2, -1), keepdims=True)
        t = device_time(
            lambda v, l, w: ms_deform_attn_core(v, SHAPES, l, w), (value, locs, w)
        )
        print(f"msda core Q={Q:6d}:    {t * 1e3:8.2f} ms  (x12 layers -> {12 * t * 1e3:.1f} ms)")

    # --- grid NMS
    from salience_detr_tpu.ops.nms import grid_nms_topk

    scores = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))

    def nms_fn(scores):
        _, topk_index = jax.lax.top_k(scores, 3600)
        idx = jax.vmap(lambda ti: grid_nms_topk(ti, SHAPES, 900))(topk_index)
        return idx.astype(jnp.float32)

    t = device_time(nms_fn, (scores,))
    print(f"topk+grid NMS:         {t * 1e3:8.2f} ms")

    # --- MaskPredictor over level-0 tokens
    from salience_detr_tpu.models.bricks.salience_transformer import MaskPredictor

    mp = MaskPredictor(C, dtype=jnp.bfloat16)
    tok = jnp.asarray(rng.normal(size=(B, 16800, C)).astype(np.float32), jnp.bfloat16)
    vm = jax.jit(lambda: mp.init(jax.random.PRNGKey(0), tok))()
    t = device_time(lambda t_: mp.apply(vm, t_), (tok,))
    print(f"MaskPredictor 16.8k:   {t * 1e3:8.2f} ms")

    # --- dense FFN cost proxy
    w1 = jnp.asarray(rng.normal(size=(C, 2048)).astype(np.float32), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(2048, C)).astype(np.float32), jnp.bfloat16)
    tk = jnp.asarray(rng.normal(size=(B, 11403, C)).astype(np.float32), jnp.bfloat16)
    t = device_time(lambda a: (a @ w1) @ w2, (tk,))
    print(f"FFN 11.4k tokens:      {t * 1e3:8.2f} ms")

    # --- Hungarian at loss scale
    from salience_detr_tpu.ops.hungarian import batched_assignment

    cost = jnp.asarray(rng.normal(size=(7 * B, 900, 25)).astype(np.float32))
    valid = jnp.ones((7 * B, 25), bool)
    t = device_time(
        lambda c, v: batched_assignment(c, v).astype(jnp.float32), (cost, valid)
    )
    print(f"Hungarian 28x(900x25): {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
