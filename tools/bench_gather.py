"""Gather-strategy experiments for the deformable-attention bottleneck."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.timing import device_time

B, H, D = 4, 8, 32
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
S = sum(h * w for h, w in SHAPES)
L, P = 4, 4
Q = 11403
rng = np.random.default_rng(0)


def main():
    value = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32), jnp.bfloat16)
    # random flat indices standing in for the corner indices
    idx = jnp.asarray(rng.integers(0, S, (B, Q, H, L * P * 4)).astype(np.int32))

    # (a) current: take_along_axis with (B, H) batch dims
    def gather_a(value, idx):
        vb = jnp.swapaxes(value, 1, 2)  # (B, H, S, D)
        ib = jnp.transpose(idx, (0, 2, 1, 3)).reshape(B, H, Q * L * P * 4)
        out = jnp.take_along_axis(vb, ib[..., None], axis=2)
        return out.sum(axis=2)

    t = device_time(lambda v: gather_a(v, idx), (value,), iters=3)
    print(f"a) take_along_axis batched: {t * 1e3:9.2f} ms")

    # (b) flat 2-D row gather
    def gather_b(value, idx):
        vb = jnp.swapaxes(value, 1, 2).reshape(B * H * S, D)
        base = (jnp.arange(B)[:, None, None] * H + jnp.arange(H)[None, :, None]) * S
        ib = jnp.transpose(idx, (0, 2, 1, 3)).reshape(B, H, -1) + base
        out = jnp.take(vb, ib.reshape(-1), axis=0)
        return out.reshape(B, H, -1, D).sum(axis=2)

    t = device_time(lambda v: gather_b(v, idx), (value,), iters=3)
    print(f"b) flat row take:           {t * 1e3:9.2f} ms")

    # (c) pallas VMEM-resident gather per (b, h)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        QT = 512  # query tile
        G = L * P * 4  # gathers per query

        def kernel(v_ref, i_ref, o_ref):
            v = v_ref[0, 0]  # (S, D)
            ix = i_ref[0, 0]  # (QT, G)
            g = jnp.take(v, ix.reshape(-1), axis=0)  # (QT*G, D)
            o_ref[0, 0] = g.reshape(QT, G, D).sum(axis=1)

        QPAD = ((Q + QT - 1) // QT) * QT
        idx_p = jnp.transpose(idx, (0, 2, 1, 3))  # (B,H,Q,G)
        idx_p = jnp.pad(idx_p, ((0, 0), (0, 0), (0, QPAD - Q), (0, 0)))

        def gather_c(value, idx_p):
            vb = jnp.swapaxes(value, 1, 2)  # (B,H,S,D)
            out = pl.pallas_call(
                kernel,
                grid=(B, H, QPAD // QT),
                in_specs=[
                    pl.BlockSpec((1, 1, S, D), lambda b, h, q: (b, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, QT, G), lambda b, h, q: (b, h, q, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, QT, D), lambda b, h, q: (b, h, q, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, QPAD, D), value.dtype),
            )(vb, idx_p)
            return out

        t = device_time(lambda v: gather_c(v, idx_p), (value,), iters=3)
        print(f"c) pallas vmem take:        {t * 1e3:9.2f} ms")
    except Exception as e:
        print(f"c) pallas failed: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
