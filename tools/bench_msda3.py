"""MSDA perf decomposition on the real chip.

Pieces (Q=11403 hot-layer scale, B=4):
  width scan    fixed 1.5GB gathered, rows of 512B/1KB/2KB/4KB
  quad_build    the (B,S,4C) quad-row construction alone
  gather_mat    quad gather forced to materialize (optimization_barrier)
  kernel_only   Pallas weighted-reduce on a pre-gathered array, QT 32/64/128
  kernel_bf16w  same with bf16 weights
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.timing import device_time
import tools.bench_msda2 as m2

B, C, H, P, L, D = m2.B, m2.C, m2.H, m2.P, m2.L, m2.D
S = m2.S
Q = 11403
rng = np.random.default_rng(0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_reduce(QT, I, K, wdtype):
    def kernel(g_ref, w_ref, e_ref, o_ref):
        qt, I_, KC = g_ref.shape
        KH = w_ref.shape[-1]
        w2 = w_ref[:].reshape(qt * I_, KH)
        wb = jnp.dot(w2, e_ref[:], preferred_element_type=jnp.float32)
        g2 = g_ref[:].reshape(qt * I_, KC)
        prod = g2.astype(jnp.float32) * wb
        s = prod.reshape(qt, I_, KC).sum(axis=1)
        acc = s[:, :C]
        for k in range(1, K):
            acc = acc + s[:, k * C : (k + 1) * C]
        o_ref[:] = acc

    def run(g, wt, e):
        N = g.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(N // QT,),
            in_specs=[
                pl.BlockSpec((QT, I, K * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((QT, I, K * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K * H, K * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((QT, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(g, wt, e)

    return run


def main():
    total_bytes = B * Q * L * P * 4 * C * 2  # what the quad path gathers
    print(f"gathered bytes: {total_bytes/1e9:.2f} GB")

    # --- width scan: same total bytes, varying row width
    for row_elems, label in ((256, "512B"), (512, "1KB"), (1024, "2KB"), (2048, "4KB")):
        n_rows = total_bytes // (row_elems * 2)
        per_b = int(n_rows) // B
        src = jnp.asarray(
            rng.normal(size=(B * S, row_elems)).astype(np.float32), jnp.bfloat16
        )
        idx = jnp.asarray(rng.integers(0, B * S, (B * per_b,)).astype(np.int32))

        def g_only(idx):
            g = jnp.take(src, idx, axis=0)
            return g.astype(jnp.float32).sum(0)

        t = device_time(lambda s_: jnp.take(s_, idx, axis=0).astype(jnp.float32).sum(0),
                        (src,), iters=5)
        print(f"width {label}: rows={int(n_rows):8d}  {t*1e3:8.2f} ms "
              f"({total_bytes/t/1e9:.0f} GB/s eq)", flush=True)

    # --- quad build alone
    value = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32), jnp.bfloat16)
    t = device_time(lambda v: m2.build_quad(v), (value,), iters=10)
    print(f"quad_build:     {t*1e3:8.2f} ms", flush=True)

    # --- gather with forced materialization + fused sum for reference
    locs = jnp.asarray(rng.uniform(0.02, 0.98, (B, Q, L, P, 2)).astype(np.float32))
    w = jnp.asarray(rng.uniform(size=(B, Q, H, L, P)).astype(np.float32))
    w = w / w.sum(axis=(-2, -1), keepdims=True)
    vq = m2.build_quad(value)
    base, wt = m2.quad_base_and_weights(locs, w)
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    flat_idx = (base + off).reshape(-1)

    def gather_fused(vq):
        g = jnp.take(vq.reshape(B * S, 4 * C), flat_idx, axis=0)
        return g.astype(jnp.float32).sum(0)

    t = device_time(gather_fused, (vq,), iters=5)
    print(f"gather+fused sum:   {t*1e3:8.2f} ms", flush=True)

    def gather_mat(vq):
        g = jnp.take(vq.reshape(B * S, 4 * C), flat_idx, axis=0)
        g = jax.lax.optimization_barrier(g)
        return g.astype(jnp.float32).sum(0)

    t = device_time(gather_mat, (vq,), iters=5)
    print(f"gather+mat+sum:     {t*1e3:8.2f} ms", flush=True)

    # --- kernel-only on pre-gathered input
    N = B * Q
    n_pad = (-N) % 128
    Npad = N + n_pad
    g = jnp.asarray(rng.normal(size=(Npad, L * P, 4 * C)).astype(np.float32), jnp.bfloat16)
    wt_f32 = jnp.asarray(rng.normal(size=(Npad, L * P, 4 * H)).astype(np.float32))
    e = m2._expansion(4)
    for QT in (32, 64, 128):
        run = make_reduce(QT, L * P, 4, jnp.float32)
        t = device_time(lambda g_: run(g_, wt_f32, e), (g,), iters=5)
        print(f"kernel_only QT={QT:3d}: {t*1e3:8.2f} ms", flush=True)

    wt_bf16 = wt_f32.astype(jnp.bfloat16)
    for QT in (64, 128):
        run = make_reduce(QT, L * P, 4, jnp.bfloat16)
        t = device_time(lambda g_: run(g_, wt_bf16, e.astype(jnp.bfloat16)), (g,), iters=5)
        print(f"kernel_bf16w QT={QT:3d}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
