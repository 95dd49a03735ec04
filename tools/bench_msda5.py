"""Round-3 MSDA decomposition probes: where do pl_nat's 42 ms actually go?

Times each pipeline stage in isolation on the real chip:
  prep       corner index/weight computation only
  gather_cm  gather in corner-major order (cur's order) + scalar sum
  gather_pm  gather in pmajor order (pl_nat's order) + scalar sum
  kernel512 / kernel2048   the Pallas corner collapse alone on pre-gathered rows
  xla_reduce  the current einsum stage-1 (retile formulation) alone
  stage2     the per-head einsum alone on a pre-computed sampled tensor

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/bench_msda5.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.timing import device_time
import tools.bench_msda2 as m2

B, S, C, H, P, L = m2.B, m2.S, m2.C, m2.H, m2.P, m2.L
D = C // H
Q = int(os.environ.get("Q", "11403"))


def main():
    value, locs, w = m2.make_inputs(Q)
    vf = value.reshape(B * S, C)

    # --- prep only
    def prep(l):
        idx, cw = m2.corners_pmajor(l)
        return idx.astype(jnp.float32).sum() * 1e-30 + cw.sum()

    print(f"prep      : {device_time(prep, (locs,), 5)*1e3:8.2f} ms", flush=True)

    # --- gathers (both orders), summed to a scalar so the output pass is
    # identical between the two
    def gather_cm(l):
        idx, _ = m2.corners_flat(l)  # (B,Q,L*4,P)
        base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
        g = vf.at[(idx + base).reshape(-1)].get(mode="promise_in_bounds")
        return g.astype(jnp.float32).sum()

    def gather_pm(l):
        idx, _ = m2.corners_pmajor(l)  # (B,Q,L,P,4)
        base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
        g = vf.at[(idx + base).reshape(-1)].get(mode="promise_in_bounds")
        return g.astype(jnp.float32).sum()

    print(f"gather_cm : {device_time(gather_cm, (locs,), 5)*1e3:8.2f} ms", flush=True)
    print(f"gather_pm : {device_time(gather_pm, (locs,), 5)*1e3:8.2f} ms", flush=True)

    # --- pallas kernel alone on pre-gathered rows
    idx_pm, cw_pm = m2.corners_pmajor(locs)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
    idx_flat = (idx_pm + base).reshape(-1, 4)
    cw_flat = cw_pm.reshape(-1, 4)
    n_items = idx_flat.shape[0]

    for blk in (512, 2048):
        n_pad = (-n_items) % blk
        idxp = jnp.pad(idx_flat, ((0, n_pad), (0, 0))) if n_pad else idx_flat
        cwp = jnp.pad(cw_flat, ((0, n_pad), (0, 0))) if n_pad else cw_flat
        G = (n_items + n_pad) // blk
        g = vf.at[idxp.reshape(-1)].get(mode="promise_in_bounds")
        g = jax.block_until_ready(g.reshape(G, blk, 4 * C))
        cw3 = cwp.reshape(G, blk, 4)

        def kern(g_, cw_):
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            out = pl.pallas_call(
                m2._make_nat_kernel(blk),
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((1, blk, 4 * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, blk, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, blk, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((G, blk, C), jnp.bfloat16),
                interpret=m2.INTERPRET,
            )(g_, cw_)
            return out.astype(jnp.float32).sum()

        print(
            f"kernel{blk:<4d}: {device_time(kern, (g, cw3), 5)*1e3:8.2f} ms",
            flush=True,
        )

    # --- current einsum stage-1 alone (retile formulation), same pre-gathered
    # rows in cur's corner-major order
    idx_cm, cw_cm = m2.corners_flat(locs)
    base4 = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g_cm = vf.at[(idx_cm + base4).reshape(-1)].get(mode="promise_in_bounds")
    g_cm = jax.block_until_ready(g_cm)

    def xla_reduce(g_, cw_):
        g6 = g_.reshape(B, Q, L, 4, P, C)
        cw5 = cw_.reshape(B, Q, L, 4, P).astype(g6.dtype)
        sampled = jnp.einsum(
            "bqlcp,bqlcpe->bqlpe", cw5, g6, preferred_element_type=jnp.float32
        )
        return sampled.sum()

    print(
        f"xla_reduce: {device_time(xla_reduce, (g_cm, cw_cm), 5)*1e3:8.2f} ms",
        flush=True,
    )

    # --- stage 2 alone
    sampled = jax.block_until_ready(
        jnp.asarray(np.random.default_rng(0).normal(size=(B, Q, L, P, H, D)), jnp.float32)
    )

    def stage2(s_, w_):
        return jnp.einsum("bqhlp,bqlphd->bqhd", w_, s_).sum()

    print(
        f"stage2    : {device_time(stage2, (sampled, w), 5)*1e3:8.2f} ms",
        flush=True,
    )


def extra_probes():
    """Second wave: bf16 retile path, 2D-block parallel Pallas, pair gather."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    value, locs, w = m2.make_inputs(Q)
    vf = value.reshape(B * S, C)

    idx_cm, cw_cm = m2.corners_flat(locs)
    base4 = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g_cm = vf.at[(idx_cm + base4).reshape(-1)].get(mode="promise_in_bounds")
    g_cm = jax.block_until_ready(g_cm)

    def xla_reduce_bf16(g_, cw_):
        g6 = g_.reshape(B, Q, L, 4, P, C)
        cw5 = cw_.reshape(B, Q, L, 4, P).astype(jnp.bfloat16)
        sampled = jnp.einsum("bqlcp,bqlcpe->bqlpe", cw5, g6)  # bf16 out
        return sampled.astype(jnp.float32).sum()

    print(f"xla_reduce_bf16: {device_time(xla_reduce_bf16, (g_cm, cw_cm.astype(jnp.bfloat16)), 5)*1e3:8.2f} ms", flush=True)

    # 2D-block pallas with parallel grid semantics + bf16 weights
    idx_pm, cw_pm = m2.corners_pmajor(locs)
    base5 = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
    idx_flat = (idx_pm + base5).reshape(-1, 4)
    cw_flat = cw_pm.reshape(-1, 4)
    n_items = idx_flat.shape[0]
    blk = 1024
    n_pad = (-n_items) % blk
    idxp = jnp.pad(idx_flat, ((0, n_pad), (0, 0)))
    cwp = jnp.pad(cw_flat, ((0, n_pad), (0, 0)))
    G = (n_items + n_pad) // blk
    g2 = vf.at[idxp.reshape(-1)].get(mode="promise_in_bounds")
    g2 = jax.block_until_ready(g2.reshape(-1, 4 * C))  # (G*blk, 4C)
    cw2 = cwp.astype(jnp.bfloat16)  # (G*blk, 4)

    def kern2d(g_, cw_):
        def body(g_ref, w_ref, o_ref):
            g = g_ref[:]
            w4 = w_ref[:].astype(jnp.float32)
            acc = g[:, 0:C].astype(jnp.float32) * w4[:, 0:1]
            acc += g[:, C : 2 * C].astype(jnp.float32) * w4[:, 1:2]
            acc += g[:, 2 * C : 3 * C].astype(jnp.float32) * w4[:, 2:3]
            acc += g[:, 3 * C : 4 * C].astype(jnp.float32) * w4[:, 3:4]
            o_ref[:] = acc.astype(o_ref.dtype)

        out = pl.pallas_call(
            body,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((blk, 4 * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * blk, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
            interpret=m2.INTERPRET,
        )(g_, cw_)
        return out.astype(jnp.float32).sum()

    print(f"kern2d_bf16w   : {device_time(kern2d, (g2, cw2), 5)*1e3:8.2f} ms", flush=True)

    # pair gather: one (2, C) slice per (point, y-corner) — half the issues
    import functools

    x_starts = idx_flat[:, 0]  # corner (y0, x0) flat index (pmajor: y-major)
    y1_starts = idx_flat[:, 2]
    starts = jnp.stack([x_starts, y1_starts], 1).reshape(-1, 1)  # (2*items, 1)
    starts = jnp.minimum(starts, B * S - 2)

    def pair_gather(st):
        g = jax.lax.gather(
            vf, st,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(2, C), mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return g.astype(jnp.float32).sum()

    st = jax.block_until_ready(starts)
    print(f"pair_gather    : {device_time(pair_gather, (st,), 5)*1e3:8.2f} ms  (indices only, no prep)", flush=True)

    def row_gather(ix):
        g = vf.at[ix].get(mode="promise_in_bounds")
        return g.astype(jnp.float32).sum()

    ixf = jax.block_until_ready(idxp.reshape(-1))
    print(f"row_gather     : {device_time(row_gather, (ixf,), 5)*1e3:8.2f} ms  (indices only, no prep)", flush=True)


if __name__ == "__main__":
    if os.environ.get("EXTRA", "0") == "1":
        main = extra_probes
    main()
