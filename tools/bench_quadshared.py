"""Quad-packed bf16 gather A/B for the HEAD-SHARED encoder core (round 5).

The shared core currently gathers the 4 bilinear corners of every sampling
point as 4 SEPARATE C-wide row issues (B*Q*L*P*4 issues).  The int8 q8 core
proved quad packing (1 row of 4C per point) works numerically, but its
measured end-to-end bench REGRESSED (22.6 vs 26.4 img/s) — confounding the
packing change with the int8 quant/dequant cost.  This bench separates them
at the encoder's real layer-0 geometry:

  a) corner-wise C-wide bf16 gather (current shared core forward)
  b) quad-packed 4C-wide bf16 gather, incl. per-call quad-table build
  c) quad-packed 4C-wide bf16 gather with the table PREBUILT (amortized —
     what a table-reuse API across decoder layers would see)
  d) quad-packed int8 (the q8 core's gather), incl. quantize+table build

Each variant runs the same two-stage reduce to (B, Q, C) so the number is
end-to-end per-layer cost, not just the gather.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.timing import device_time

B, C, H = 4, 256, 8
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
S = sum(h * w for h, w in SHAPES)
L, P = 4, 4
Q = 17649  # encoder layer-0 token budget at 800x1344 (all selected tokens)


def main():
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32), jnp.bfloat16)
    # stand-in corner indices/weights with realistic locality (points cluster
    # near their query): random base + small offsets
    base = rng.integers(0, S - 200, (B, Q, 1, 1))
    off = rng.integers(0, 170, (B, Q, L * P, 4))
    idx = jnp.asarray((base + off).reshape(B, Q, L * P * 4).astype(np.int32))
    idx_q = jnp.asarray(base.reshape(B, Q, 1) + off[..., 0].astype(np.int64),
                        jnp.int32)  # (B, Q, L*P) quad-row indices
    cw = jnp.asarray(
        rng.uniform(0, 1, (B, Q, L * P * 4)).astype(np.float32), jnp.bfloat16)
    aw = jnp.asarray(
        rng.uniform(0, 1, (B, Q, H, L * P)).astype(np.float32), jnp.bfloat16)

    bflat = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None]

    def reduce2(sampled, weights):
        # sampled: (B, Q, L*P, C); stage-2 per-head attention reduce
        s = sampled.reshape(B, Q, L * P, H, C // H)
        return jnp.einsum(
            "bqhi,bqihd->bqhd", weights, s, preferred_element_type=jnp.float32
        ).reshape(B, Q, C).astype(jnp.bfloat16)

    # a) corner-wise C-wide rows: 4 issues per point
    def var_a(value):
        vf = value.reshape(B * S, C)
        g = vf.at[(idx + bflat).reshape(-1)].get(mode="promise_in_bounds")
        g = g.reshape(B, Q, L * P, 4, C)
        sampled = jnp.einsum(
            "bqis,bqisc->bqic", cw.reshape(B, Q, L * P, 4), g,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return reduce2(sampled, aw)

    t = device_time(var_a, (value,), iters=5)
    print(f"a) corner-wise bf16 (4 issues/pt): {t*1e3:8.2f} ms", flush=True)

    def build_quad(v):
        segs = []
        start = 0
        for h, w in SHAPES:
            seg = jax.lax.slice_in_dim(v, start, start + h * w, axis=1)
            segs.append(jnp.concatenate(
                [seg, jnp.roll(seg, -1, 1), jnp.roll(seg, -w, 1),
                 jnp.roll(seg, -(w + 1), 1)], -1))
            start += h * w
        return jnp.concatenate(segs, 1).reshape(B * S, 4 * C)

    # b) quad-packed bf16 incl. table build
    def var_b(value):
        quad = build_quad(value)
        g = quad.at[(idx_q + bflat).reshape(-1)].get(mode="promise_in_bounds")
        g = g.reshape(B, Q, L * P, 4, C)
        sampled = jnp.einsum(
            "bqis,bqisc->bqic", cw.reshape(B, Q, L * P, 4), g,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return reduce2(sampled, aw)

    t = device_time(var_b, (value,), iters=5)
    print(f"b) quad bf16 (1 issue/pt)+build:   {t*1e3:8.2f} ms", flush=True)

    # c) quad-packed bf16, table prebuilt
    quad_pre = jax.jit(build_quad)(value)
    jax.device_get(quad_pre[0, 0])

    def var_c(quad):
        g = quad.at[(idx_q + bflat).reshape(-1)].get(mode="promise_in_bounds")
        g = g.reshape(B, Q, L * P, 4, C)
        sampled = jnp.einsum(
            "bqis,bqisc->bqic", cw.reshape(B, Q, L * P, 4), g,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return reduce2(sampled, aw)

    t = device_time(var_c, (quad_pre,), iters=5)
    print(f"c) quad bf16 prebuilt table:       {t*1e3:8.2f} ms", flush=True)

    # d) quad-packed int8 incl. quantize + table build (the q8 economics)
    def var_d(value):
        vf = value.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(vf), axis=(0, 1)) / 127.0, 1e-20)
        vq = jnp.clip(jnp.round(vf / scale), -127, 127).astype(jnp.int8)
        segs = []
        start = 0
        for h, w in SHAPES:
            seg = jax.lax.slice_in_dim(vq, start, start + h * w, axis=1)
            segs.append(jnp.concatenate(
                [seg, jnp.roll(seg, -1, 1), jnp.roll(seg, -w, 1),
                 jnp.roll(seg, -(w + 1), 1)], -1))
            start += h * w
        quad = jnp.concatenate(segs, 1).reshape(B * S, 4 * C)
        g = quad.at[(idx_q + bflat).reshape(-1)].get(mode="promise_in_bounds")
        g = g.reshape(B, Q, L * P, 4, C)
        sampled = jnp.einsum(
            "bqis,bqisc->bqic",
            cw.reshape(B, Q, L * P, 4), g.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        out = reduce2(sampled, aw)
        return out * scale[None, None, :].astype(jnp.bfloat16)

    t = device_time(var_d, (value,), iters=5)
    print(f"d) quad int8 + quant + build:      {t*1e3:8.2f} ms", flush=True)

    # e) decoder-geometry probe: exact per-head quad rows (4D wide) at
    # Q=900 — the hybrid flagship's decoder cross-attn gather shape
    Qd, D = 900, C // H
    idx_d = jnp.asarray(
        rng.integers(0, S, (B, Qd, H, L * P)).astype(np.int32))
    vh = value.reshape(B, S, H, D)

    def var_e(vh):
        # per-head flat table (B*S*H rows of 4D) mimicking the quad core
        quad = jnp.concatenate(
            [vh, jnp.roll(vh, -1, 1), jnp.roll(vh, -168, 1),
             jnp.roll(vh, -169, 1)], -1)  # (B, S, H, 4D) approx table
        flat = quad.reshape(B * S * H, 4 * D)
        bi = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
        hi = jnp.arange(H, dtype=jnp.int32)[None, None, :, None]
        rows = (idx_d + bi) * H + hi
        g = flat.at[rows.reshape(-1)].get(mode="promise_in_bounds")
        g = g.reshape(B, Qd, H, L * P, 4, D)
        sampled = jnp.einsum(
            "bqis,bqhisd->bqhid",
            cw[:, :Qd].reshape(B, Qd, L * P, 4), g,
            preferred_element_type=jnp.float32)
        out = jnp.einsum(
            "bqhi,bqhid->bqhd", aw[:, :Qd], sampled.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        return out.reshape(B, Qd, C).astype(jnp.bfloat16)

    t = device_time(var_e, (vh,), iters=5)
    print(f"e) decoder per-head quad (Q=900):  {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
