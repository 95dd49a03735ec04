"""Decisive MSDA decomposition (v2 — timing harness no longer perturbs the
big input, see utils/timing.py).

  ceil_sum       contiguous 1.5GB bf16 .sum() — HBM read ceiling
  ceil_mulsum    contiguous (x * row).sum() — fused elementwise+reduce ceiling
  width scan     same 1.5GB gathered, rows of 512B/1KB/2KB (+ int8 1KB)
  s1c/s1a        pair gather + plain / scalar-weighted corner partial sum
  s1a_bf16out    same, bf16 output (halve the 370MB write)
  s2             per-head attention reduce alone
  kernel_only    Pallas weighted reduce on pre-gathered rows
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

EPS = jnp.float32(0.0)  # tiny float arg for the timing perturbation


def main():
    GB = 1.49

    big = jnp.asarray(rng.normal(size=(729792, 1024)).astype(np.float32), jnp.bfloat16)
    t = device_time(lambda e, x: (x.astype(jnp.float32) + e).sum(), (EPS, big), iters=5)
    print(f"ceil_sum (contig 1.5GB bf16): {t*1e3:8.2f} ms ({GB/t:.0f} GB/s)", flush=True)

    row = jnp.asarray(rng.normal(size=(1024,)).astype(np.float32), jnp.bfloat16)
    t = device_time(
        lambda e, x: ((x * row[None, :]).astype(jnp.float32) + e).sum(), (EPS, big),
        iters=5,
    )
    print(f"ceil_mulsum (bcast row):      {t*1e3:8.2f} ms ({GB/t:.0f} GB/s)", flush=True)

    colw = jnp.asarray(rng.normal(size=(729792, 1)).astype(np.float32), jnp.bfloat16)
    t = device_time(
        lambda e, x: ((x * colw).astype(jnp.float32) + e).sum(), (EPS, big), iters=5
    )
    print(f"ceil_mulsum (bcast col):      {t*1e3:8.2f} ms ({GB/t:.0f} GB/s)", flush=True)

    # --- width scan (src NOT perturbed; eps rides on the output)
    total_bytes = int(GB * 1e9)
    for row_elems, label in ((256, "512B"), (512, "1KB"), (1024, "2KB")):
        n_rows = total_bytes // (row_elems * 2)
        src = jnp.asarray(
            rng.normal(size=(B * S, row_elems)).astype(np.float32), jnp.bfloat16
        )
        idx = jnp.asarray(rng.integers(0, B * S, (int(n_rows),)).astype(np.int32))
        t = device_time(
            lambda e, s_: (jnp.take(s_, idx, axis=0).astype(jnp.float32) + e).sum(0),
            (EPS, src), iters=5,
        )
        print(f"width {label}: rows={int(n_rows):8d}  {t*1e3:8.2f} ms "
              f"({GB/t:.0f} GB/s eq)", flush=True)

    # int8, 1KB rows (the quad layout quantized)
    src8 = jnp.asarray(rng.integers(-127, 127, (B * S, 1024)), jnp.int8)
    idx8 = jnp.asarray(rng.integers(0, B * S, (729792,)).astype(np.int32))
    t = device_time(
        lambda e, s_: (jnp.take(s_, idx8, axis=0).astype(jnp.float32) + e).sum(0),
        (EPS, src8), iters=5,
    )
    print(f"width 1KB-int8 (quad quantized): {t*1e3:8.2f} ms", flush=True)

    # --- stage-1 fusion on the pair layout
    value, locs, w = m2.make_inputs(Q)
    vp = m2.build_pairs(value)
    base, cw = m2.pair_base_and_weights(locs)
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
    idxp = (base + off).reshape(-1)
    cw_b = cw.astype(jnp.bfloat16)

    def s1c(e, vp):
        g = jnp.take(vp.reshape(B * S, 2 * C), idxp, axis=0)
        g = g.reshape(B, Q, L, P, 2, 2, C)
        return g.sum(axis=(4, 5), dtype=jnp.float32) + e

    t = device_time(s1c, (EPS, vp), iters=5)
    print(f"s1c gather+plain partial sum: {t*1e3:8.2f} ms", flush=True)

    def s1a(e, vp):
        g = jnp.take(vp.reshape(B * S, 2 * C), idxp, axis=0)
        g = g.reshape(B, Q, L, P, 2, 2, C)
        return (g * cw_b[..., None]).sum(axis=(4, 5), dtype=jnp.float32) + e

    t = device_time(s1a, (EPS, vp), iters=5)
    print(f"s1a gather+weighted f32 out:  {t*1e3:8.2f} ms", flush=True)

    def s1a16(e, vp):
        g = jnp.take(vp.reshape(B * S, 2 * C), idxp, axis=0)
        g = g.reshape(B, Q, L, P, 2, 2, C)
        out = (g * cw_b[..., None]).sum(axis=(4, 5), dtype=jnp.float32)
        return out.astype(jnp.bfloat16) + e.astype(jnp.bfloat16)

    t = device_time(s1a16, (EPS, vp), iters=5)
    print(f"s1a gather+weighted bf16 out: {t*1e3:8.2f} ms", flush=True)

    # --- stage 2 alone (bf16 in, mult+sum)
    sampled = jnp.asarray(
        rng.normal(size=(B, Q, L, P, C)).astype(np.float32), jnp.bfloat16
    )
    attnT = jnp.transpose(w, (0, 1, 3, 4, 2)).astype(jnp.bfloat16)

    def s2(e, sampled):
        sm = sampled.reshape(B, Q, L, P, H, D)
        return (sm * attnT[..., None]).sum(axis=(2, 3), dtype=jnp.float32) + e

    t = device_time(s2, (EPS, sampled), iters=5)
    print(f"s2 per-head reduce (370MB):   {t*1e3:8.2f} ms", flush=True)

    # --- pallas kernel on pre-gathered rows (quad layout)
    N = B * Q
    n_pad = (-N) % 64
    Npad = N + n_pad
    g = jnp.asarray(rng.normal(size=(Npad, L * P, 4 * C)).astype(np.float32), jnp.bfloat16)
    wt_f32 = jnp.asarray(rng.normal(size=(Npad, L * P, 4 * H)).astype(np.float32))
    import tools.bench_msda3 as m3

    run = m3.make_reduce(64, L * P, 4, jnp.float32)
    e_mat = m2._expansion(4)
    t = device_time(lambda w_, g_: run(g_, w_, e_mat), (wt_f32, g), iters=5)
    print(f"kernel_only QT=64 (no big-copy): {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
