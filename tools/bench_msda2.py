"""Deformable-attention (shared-locations) variant shootout on the real chip.

Round-2 perf levers for ms_deform_attn_core_shared
(salience_detr_tpu/ops/deform_attn.py): round-1 measured the fused-gather
einsum at ~18ms/hot-layer vs a 2-4ms memory floor (ROADMAP).

Variants:
  cur      current ms_deform_attn_core_shared (einsum reduce)
  gsum     1-wide gather + plain item sum (bound incl. gather)
  gq       quad gather + plain sum (bound for the quad layout)
  mulsum   1-wide gather + broadcast-multiply-sum instead of einsum
  quad     ONE gather per point from a (S, 4C) quad-row value layout
           (4x fewer gather issues; exact bilinear via base clamping +
           corner-weight reassignment) + mult-sum reduce
  quad_pl  quad gather + Pallas streaming weighted-reduce kernel
  flat_pl  1-wide gather + the same Pallas kernel (p-major grouping)

Run on TPU: python tools/bench_msda2.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.timing import device_time

B = 4
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
S = sum(h * w for h, w in SHAPES)
C, H, P, L = 256, 8, 4, 4
D = C // H
rng = np.random.default_rng(0)


def make_inputs(Q):
    value = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32), jnp.bfloat16)
    locs = jnp.asarray(rng.uniform(0.02, 0.98, (B, Q, L, P, 2)).astype(np.float32))
    w = jnp.asarray(rng.uniform(size=(B, Q, H, L, P)).astype(np.float32))
    w = w / w.sum(axis=(-2, -1), keepdims=True)
    return value, locs, w


from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_shared


def corners_flat(locs):
    """Per-corner flat indices + bilinear weights (current formulation).
    returns idx (B,Q,L,4,P) int32, cw (B,Q,L,4,P) f32 — corner-major."""
    idx_parts, w_parts = [], []
    start = 0
    for lvl, (h, w_) in enumerate(SHAPES):
        loc = locs[:, :, lvl]
        x = loc[..., 0] * w_ - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                cx = x0i + dx; cy = y0i + dy
                valid = (cx >= 0) & (cx < w_) & (cy >= 0) & (cy < h)
                idx_parts.append(start + jnp.clip(cy, 0, h - 1) * w_ + jnp.clip(cx, 0, w_ - 1))
                w_parts.append(jnp.where(valid, wx * wy, 0.0))
        start += h * w_
    return jnp.stack(idx_parts, 2), jnp.stack(w_parts, 2)


def gsum(value, locs, w):
    Q = locs.shape[1]
    idx, cw = corners_flat(locs)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = jnp.take(value.reshape(B * S, C), (idx + base).reshape(-1), axis=0)
    return g.reshape(B, Q, -1, C).astype(jnp.float32).sum(2)


def mulsum(value, locs, w):
    Q = locs.shape[1]
    idx, cw = corners_flat(locs)  # (B,Q,L*4,P)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = jnp.take(value.reshape(B * S, C), (idx + base).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, 4, P, H, D)
    wt = (
        cw.reshape(B, Q, L, 4, P)[:, :, :, :, :, None]
        * jnp.transpose(w, (0, 1, 3, 4, 2))[:, :, :, None]
    ).astype(value.dtype)  # (B,Q,L,4,P,H)
    out = (g * wt[..., None]).astype(jnp.float32).sum(axis=(2, 3, 4))
    return out.reshape(B, Q, C)


# ---------------------------------------------------------------- quad
def build_quad(value):
    """(B,S,C) -> (B,S,4C): row s holds [v[s], v[s+1], v[s+w_lvl], v[s+w_lvl+1]].
    Shifts cross level boundaries harmlessly (those corners get zero weight)."""
    right = jnp.roll(value, -1, axis=1)
    segs = []
    start = 0
    for h, w_ in SHAPES:
        seg = jax.lax.dynamic_slice_in_dim(value, start, h * w_, axis=1)
        segs.append(jnp.roll(seg, -w_, axis=1))
        start += h * w_
    down = jnp.concatenate(segs, axis=1)
    downright = jnp.roll(down, -1, axis=1)
    return jnp.concatenate([value, right, down, downright], axis=-1)


def quad_base_and_weights(locs, attn):
    """Base flat index per point + per-corner-per-head weights.

    Exact bilinear: base = clip((x0,y0)) into [0, wh-2] so the 2x2 quad is
    always in-image; each quad corner's weight is re-derived from its TRUE
    coordinate (handles all clip cases incl. zero-padding outside the image).

    returns base (B,Q,L,P) int32, wt (B,Q,L,P,4,H) f32, corner order iy*2+jx.
    """
    bases, wts = [], []
    start = 0
    for lvl, (h, w_) in enumerate(SHAPES):
        loc = locs[:, :, lvl]
        x = loc[..., 0] * w_ - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        bx = jnp.clip(x0i, 0, w_ - 2)
        by = jnp.clip(y0i, 0, h - 2)
        bases.append(start + by * w_ + bx)  # (B,Q,P)
        cw = []
        for i in (0, 1):
            wy = jnp.where(by + i == y0i, 1 - fy, jnp.where(by + i == y0i + 1, fy, 0.0))
            for j in (0, 1):
                wx = jnp.where(bx + j == x0i, 1 - fx, jnp.where(bx + j == x0i + 1, fx, 0.0))
                cw.append(wx * wy)
        wts.append(jnp.stack(cw, -1))  # (B,Q,P,4)
        start += h * w_
    base = jnp.stack(bases, 2)  # (B,Q,L,P)
    cw = jnp.stack(wts, 2)  # (B,Q,L,P,4)
    wt = cw[..., None] * jnp.transpose(attn, (0, 1, 3, 4, 2))[:, :, :, :, None, :]
    return base, wt  # (B,Q,L,P,4,H)


def quad(value, locs, w):
    Q = locs.shape[1]
    vq = build_quad(value)  # (B,S,4C)
    base, wt = quad_base_and_weights(locs, w)
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = jnp.take(vq.reshape(B * S, 4 * C), (base + off).reshape(-1), axis=0)
    g = g.reshape(B, Q, L * P, 4, H, D)
    wt = wt.reshape(B, Q, L * P, 4, H).astype(value.dtype)
    out = (g * wt[..., None]).astype(jnp.float32).sum(axis=(2, 3))
    return out.reshape(B, Q, C)


def gq(value, locs, w):
    Q = locs.shape[1]
    vq = build_quad(value)
    base, wt = quad_base_and_weights(locs, w)
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = jnp.take(vq.reshape(B * S, 4 * C), (base + off).reshape(-1), axis=0)
    return g.reshape(B, Q, L * P, 4 * C).astype(jnp.float32).sum(2)


# ---------------------------------------------------------------- pallas reduce
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 32  # query rows per kernel step
INTERPRET = os.environ.get("PALLAS_INTERPRET", "0") == "1"


def _reduce_kernel(g_ref, w_ref, e_ref, o_ref):
    # g: (QT, I, K*C) bf16  — I items each of K sub-rows x C channels
    # w: (QT, I, K*H) f32   — per item, per sub-row, per head weight
    # e: (K*H, K*C) f32     — constant expansion: (k,h) -> lanes k*C+h*D..+D
    # o: (QT, C) f32
    qt, I, KC = g_ref.shape
    KH = w_ref.shape[-1]
    w2 = w_ref[:].reshape(qt * I, KH)
    wb = jnp.dot(w2, e_ref[:], preferred_element_type=jnp.float32)  # (QT*I, K*C)
    g2 = g_ref[:].reshape(qt * I, KC)
    prod = g2.astype(jnp.float32) * wb
    s = prod.reshape(qt, I, KC).sum(axis=1)  # (QT, K*C)
    K = KC // C
    acc = s[:, :C]
    for k in range(1, K):
        acc = acc + s[:, k * C : (k + 1) * C]
    o_ref[:] = acc


def _expansion(K):
    """E (K*H, K*C): row k*H+h -> ones at lanes k*C + h*D + [0,D)."""
    e = np.zeros((K * H, K * C), np.float32)
    for k in range(K):
        for h in range(H):
            e[k * H + h, k * C + h * D : k * C + (h + 1) * D] = 1.0
    return jnp.asarray(e)


def pallas_reduce(g, wt, K):
    """g (N, I, K*C) bf16, wt (N, I, K*H) f32 -> (N, C) f32.  N % QT == 0."""
    N, I, KC = g.shape
    return pl.pallas_call(
        _reduce_kernel,
        grid=(N // QT,),
        in_specs=[
            pl.BlockSpec((QT, I, KC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, I, K * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * H, KC), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QT, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        interpret=INTERPRET,
    )(g, wt, _expansion(K))


def _pad_rows(x, n_pad):
    if n_pad == 0:
        return x
    return jnp.pad(x, ((0, n_pad),) + ((0, 0),) * (x.ndim - 1))


def quad_pl(value, locs, w):
    Q = locs.shape[1]
    N = B * Q
    n_pad = (-N) % QT
    vq = build_quad(value)
    base, wt = quad_base_and_weights(locs, w)
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    idx = _pad_rows((base + off).reshape(N, L * P), n_pad)
    g = jnp.take(vq.reshape(B * S, 4 * C), idx.reshape(-1), axis=0)
    g = g.reshape(N + n_pad, L * P, 4 * C)
    wt = _pad_rows(wt.reshape(N, L * P, 4 * H), n_pad).astype(jnp.float32)
    out = pallas_reduce(g, wt, 4)
    return out[:N].reshape(B, Q, C)


def flat_pl(value, locs, w):
    Q = locs.shape[1]
    N = B * Q
    n_pad = (-N) % QT
    idx, cw = corners_flat(locs)  # (B,Q,L*4,P) — items (l,corner), sub-rows p
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    idx = _pad_rows((idx + base).reshape(N, L * 4 * P), n_pad)
    g = jnp.take(value.reshape(B * S, C), idx.reshape(-1), axis=0)
    g = g.reshape(N + n_pad, L * 4, P * C)  # I = L*4 items, K = P sub-rows
    # weights per (item=l*4+c, sub-row=p, head): cw * attn
    wt = cw.reshape(B, Q, L * 4, P)[..., None] * jnp.repeat(
        jnp.transpose(w, (0, 1, 3, 4, 2)), 4, axis=2
    ).reshape(B, Q, L * 4, P, H)
    wt = _pad_rows(wt.reshape(N, L * 4, P * H), n_pad).astype(jnp.float32)
    out = pallas_reduce(g, wt, P)
    return out[:N].reshape(B, Q, C)


def two_stage(value, locs, w):
    """Stage 1: corner-bilinear reduce with PER-ROW SCALAR weights (XLA can
    fuse this into the gather like the plain sum — no (B,Q,I,C) patch tensor
    in HBM).  Stage 2: small per-head attention reduce on (B,Q,L,P,C)."""
    Q = locs.shape[1]
    idx, cw = corners_flat(locs)  # (B,Q,L*4,P)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = jnp.take(value.reshape(B * S, C), (idx + base).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, 4, P, C).astype(jnp.float32)
    cw = cw.reshape(B, Q, L, 4, P)
    sampled = jnp.einsum("bqlcp,bqlcpe->bqlpe", cw, g)  # (B,Q,L,P,C)
    sampled = sampled.reshape(B, Q, L, P, H, D)
    attn = w  # (B,Q,H,L,P)
    out = jnp.einsum("bqhlp,bqlphd->bqhd", attn, sampled)
    return out.reshape(B, Q, C)


def two_stage_quad(value, locs, w):
    """Quad gather (1 issue/point) + scalar-weighted corner reduce + per-head."""
    Q = locs.shape[1]
    vq = build_quad(value)
    base, wt = quad_base_and_weights(locs, w)  # wt (B,Q,L,P,4,H)
    # recover the corner-only scalar weights: wt = cw[...,None]*attn; instead
    # rebuild cw directly (cheap) to keep stage-1 weights per-row scalars
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = jnp.take(vq.reshape(B * S, 4 * C), (base + off).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, P, 4, C).astype(jnp.float32)
    cw = _quad_corner_weights(locs)  # (B,Q,L,P,4)
    sampled = jnp.einsum("bqlpc,bqlpce->bqlpe", cw, g)  # (B,Q,L,P,C)
    sampled = sampled.reshape(B, Q, L, P, H, D)
    out = jnp.einsum("bqhlp,bqlphd->bqhd", w, sampled)
    return out.reshape(B, Q, C)


def _quad_corner_weights(locs):
    wts = []
    for lvl, (h, w_) in enumerate(SHAPES):
        loc = locs[:, :, lvl]
        x = loc[..., 0] * w_ - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        bx = jnp.clip(x0i, 0, w_ - 2)
        by = jnp.clip(y0i, 0, h - 2)
        cw = []
        for i in (0, 1):
            wy = jnp.where(by + i == y0i, 1 - fy, jnp.where(by + i == y0i + 1, fy, 0.0))
            for j in (0, 1):
                wx = jnp.where(bx + j == x0i, 1 - fx, jnp.where(bx + j == x0i + 1, fx, 0.0))
                cw.append(wx * wy)
        wts.append(jnp.stack(cw, -1))  # (B,Q,P,4)
    return jnp.stack(wts, 2)  # (B,Q,L,P,4)


def build_pairs(value):
    """(B,S,C) -> (B,S,2C): row s holds [v[s], v[s+1]] — the x-adjacent corner
    pair in ONE 1KB gather row (the measured gather sweet spot)."""
    return jnp.concatenate([value, jnp.roll(value, -1, axis=1)], axis=-1)


def pair_base_and_weights(locs, attn=None):
    """Per (l,p,y-corner) row base index + (x-half, y) scalar corner weights.

    x handled by base clamping to [0, w-2] + weight reassignment (exact,
    incl. zero padding); y by two rows with classic clamp + zero weight.

    returns base (B,Q,L,P,2) int32 [y-corner last], cw (B,Q,L,P,2,2) f32
    [y-corner, x-half]."""
    bases, wts = [], []
    start = 0
    for lvl, (h, w_) in enumerate(SHAPES):
        loc = locs[:, :, lvl]
        x = loc[..., 0] * w_ - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        bx = jnp.clip(x0i, 0, w_ - 2)
        wx = []
        for j in (0, 1):
            wx.append(jnp.where(bx + j == x0i, 1 - fx,
                                jnp.where(bx + j == x0i + 1, fx, 0.0)))
        lvl_base, lvl_w = [], []
        for dy, wy_val in ((0, 1 - fy), (1, fy)):
            cy = y0i + dy
            valid_y = (cy >= 0) & (cy < h)
            cyc = jnp.clip(cy, 0, h - 1)
            lvl_base.append(start + cyc * w_ + bx)
            wy = jnp.where(valid_y, wy_val, 0.0)
            lvl_w.append(jnp.stack([wy * wx[0], wy * wx[1]], -1))  # (B,Q,P,2)
        bases.append(jnp.stack(lvl_base, -1))  # (B,Q,P,2)
        wts.append(jnp.stack(lvl_w, -2))  # (B,Q,P,2,2)
        start += h * w_
    base = jnp.stack(bases, 2)  # (B,Q,L,P,2)
    cw = jnp.stack(wts, 2)  # (B,Q,L,P,2,2)
    return base, cw


def two_stage_pair(value, locs, w):
    """Pair gather (1KB rows) + fused scalar-weight corner reduce (stage 1)
    + small per-head reduce (stage 2), all XLA mult+sum."""
    Q = locs.shape[1]
    vp = build_pairs(value)  # (B,S,2C)
    base, cw = pair_base_and_weights(locs)  # (B,Q,L,P,2), (B,Q,L,P,2,2)
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
    g = jnp.take(vp.reshape(B * S, 2 * C), (base + off).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, P, 2, 2, C).astype(jnp.float32)
    sampled = (g * cw[..., None]).sum(axis=(4, 5))  # (B,Q,L,P,C)
    sampled = sampled.reshape(B, Q, L, P, H, D)
    attnT = jnp.transpose(w, (0, 1, 3, 4, 2))  # (B,Q,L,P,H)
    out = (sampled * attnT[..., None]).sum(axis=(2, 3))  # (B,Q,H,D)
    return out.reshape(B, Q, C)


def two_stage_pair2(value, locs, w):
    """Pair gather + scalar corner reduce (bf16 out) + LANE-FRIENDLY stage 2:
    attention expanded onto the C lanes via head-major repeat so the reduce
    keeps 256 lanes hot (D=32-minor layouts waste 4/5 of each vreg)."""
    Q = locs.shape[1]
    vp = build_pairs(value)  # (B,S,2C)
    base, cw = pair_base_and_weights(locs)
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
    g = jnp.take(vp.reshape(B * S, 2 * C), (base + off).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, P, 2, 2, C)
    sampled = (g * cw[..., None].astype(g.dtype)).sum(axis=(4, 5))  # (B,Q,L,P,C) f32? bf16*f32->f32
    attnT = jnp.transpose(w, (0, 1, 3, 4, 2))  # (B,Q,L,P,H)
    attn_c = jnp.repeat(attnT, D, axis=-1)  # (B,Q,L,P,C) head-major
    out = (sampled * attn_c).sum(axis=(2, 3))  # (B,Q,C)
    return out


def mulsum_pair(value, locs, w):
    """Pair gather + ONE fused multiply-reduce: weight = corner x head, heads
    expanded onto lanes (broadcasts fuse; g is read exactly once)."""
    Q = locs.shape[1]
    vp = build_pairs(value)
    base, cw = pair_base_and_weights(locs)  # (B,Q,L,P,2), (B,Q,L,P,2,2)
    off = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
    g = jnp.take(vp.reshape(B * S, 2 * C), (base + off).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, P, 2, 2, C)
    attnT = jnp.transpose(w, (0, 1, 3, 4, 2))  # (B,Q,L,P,H)
    attn_c = jnp.repeat(attnT, D, axis=-1)  # (B,Q,L,P,C)
    wt = cw[..., None] * attn_c[:, :, :, :, None, None, :]  # (B,Q,L,P,2,2,C)
    out = (g * wt.astype(g.dtype)).astype(jnp.float32).sum(axis=(2, 3, 4, 5))
    return out


def corners_pmajor(locs):
    """Flat corner indices/weights ordered (level, point, corner) so the
    gathered rows reshape to (B, Q, L, P*4, C) with a T(8,128)-compatible
    16-wide second-minor dim — NO retile copy (a (…,4,P,C) view forces a
    T(4,128) retile of the whole gather output, ~16 ms/layer in the trace).
    returns idx (B,Q,L,P,4), cw (B,Q,L,P,4)."""
    idx_parts, w_parts = [], []
    start = 0
    for lvl, (h, w_) in enumerate(SHAPES):
        loc = locs[:, :, lvl]
        x = loc[..., 0] * w_ - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        li, lw = [], []
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                cx = x0i + dx; cy = y0i + dy
                valid = (cx >= 0) & (cx < w_) & (cy >= 0) & (cy < h)
                li.append(start + jnp.clip(cy, 0, h - 1) * w_ + jnp.clip(cx, 0, w_ - 1))
                lw.append(jnp.where(valid, wx * wy, 0.0))
        idx_parts.append(jnp.stack(li, -1))  # (B,Q,P,4)
        w_parts.append(jnp.stack(lw, -1))
        start += h * w_
    return jnp.stack(idx_parts, 2), jnp.stack(w_parts, 2)  # (B,Q,L,P,4)


def fused16(value, locs, w):
    """ONE fused multiply-reduce over a (L, 16, C) tail: corner weights and
    lane-expanded per-head attention folded into a single weight broadcast,
    reduced over the 16 = P*4 axis per level, then the 4 levels summed."""
    Q = locs.shape[1]
    idx, cw = corners_pmajor(locs)  # (B,Q,L,P,4)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
    g = jnp.take(value.reshape(B * S, C), (idx + base).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, P * 4, C)
    attnT = jnp.transpose(w, (0, 1, 3, 4, 2))  # (B,Q,L,P,H)
    attn_c = jnp.repeat(attnT, D, axis=-1)  # (B,Q,L,P,C) head-major lanes
    attn16 = jnp.repeat(attn_c, 4, axis=3).reshape(B, Q, L, P * 4, C)
    w16 = cw.reshape(B, Q, L, P * 4, 1) * attn16  # broadcasts fuse
    out = (g * w16.astype(jnp.float32)).sum(axis=(2, 3))  # (B,Q,C) f32
    return out


def fused16_2(value, locs, w):
    """fused16 but per-level accumulation (keeps every reduce at a 16-wide
    second-minor dim; no (B,Q,L,C) T(4,128) intermediate)."""
    Q = locs.shape[1]
    idx, cw = corners_pmajor(locs)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None, None]
    g = jnp.take(value.reshape(B * S, C), (idx + base).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, P * 4, C)
    attnT = jnp.transpose(w, (0, 1, 3, 4, 2))  # (B,Q,L,P,H)
    out = jnp.zeros((B, Q, C), jnp.float32)
    for lvl in range(L):
        attn_c = jnp.repeat(attnT[:, :, lvl], D, axis=-1)  # (B,Q,P,C)
        attn16 = jnp.repeat(attn_c, 4, axis=2)  # (B,Q,P*4,C)
        w16 = cw[:, :, lvl].reshape(B, Q, P * 4, 1) * attn16
        out = out + (g[:, :, lvl] * w16.astype(jnp.float32)).sum(axis=2)
    return out


def two_stage_slices(value, locs, w):
    """Two-stage with NO 6-D view of the gathered rows: stage 1 multiplies by
    the 16 corner scalars on the (B,Q,L,16,C) view (T(8,128)-compatible) and
    collapses corners via 4 contiguous slice-adds (corner-major blocks of P),
    so the 1.5GB tensor is read once with no retile copy; stage 2 is the
    small per-head einsum."""
    Q = locs.shape[1]
    idx, cw = corners_flat(locs)  # (B,Q,L*4,P) — rows (l, corner, p)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = jnp.take(value.reshape(B * S, C), (idx + base).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, 16, C)
    gw = g.astype(jnp.float32) * cw.reshape(B, Q, L, 16)[..., None]
    sampled = gw[:, :, :, 0:4] + gw[:, :, :, 4:8] + gw[:, :, :, 8:12] + gw[:, :, :, 12:16]
    sampled = sampled.reshape(B, Q, L, P, H, D)  # (B,Q,L,p,C) -> heads
    attnT = jnp.transpose(w, (0, 1, 3, 4, 2))  # (B,Q,L,P,H)
    out = jnp.einsum(
        "bqlph,bqlphd->bqhd", attnT, sampled, preferred_element_type=jnp.float32
    )
    return out.reshape(B, Q, C)


def two_stage_slices2(value, locs, w):
    """Slice-add stage 1 + lane-expanded mult-sum stage 2 (no einsum)."""
    Q = locs.shape[1]
    idx, cw = corners_flat(locs)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = jnp.take(value.reshape(B * S, C), (idx + base).reshape(-1), axis=0)
    g = g.reshape(B, Q, L, 16, C)
    gw = g.astype(jnp.float32) * cw.reshape(B, Q, L, 16)[..., None]
    sampled = gw[:, :, :, 0:4] + gw[:, :, :, 4:8] + gw[:, :, :, 8:12] + gw[:, :, :, 12:16]
    sampled = sampled.reshape(B, Q, L * P, C)
    attn_flat = jnp.transpose(w, (0, 1, 3, 4, 2)).reshape(B, Q, L * P, H)
    attn_c = jnp.repeat(attn_flat, D, axis=-1)  # (B,Q,16,C) head-major
    return (sampled * attn_c).sum(axis=2)


def int8_rows(value, locs, w):
    """Channel-wise symmetric int8 value rows: halves the gathered bytes (the
    measured ~83 GB/s gather cap is byte-bound), dequant scale applied once on
    the tiny (B,Q,C) output."""
    Q = locs.shape[1]
    scale = jnp.max(jnp.abs(value.astype(jnp.float32)), axis=(0, 1)) / 127.0  # (C,)
    scale = jnp.maximum(scale, 1e-12)
    vq = jnp.clip(jnp.round(value.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    idx, cw = corners_flat(locs)  # (B,Q,L*4,P)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    g = vq.reshape(B * S, C).at[(idx + base).reshape(-1)].get(mode="promise_in_bounds")
    g = g.reshape(B, Q, L, 4, P, C).astype(jnp.float32)
    cw5 = cw.reshape(B, Q, L, 4, P)
    sampled = jnp.einsum("bqlcp,bqlcpe->bqlpe", cw5, g)
    sampled = sampled.reshape(B, Q, L, P, H, D)
    out = jnp.einsum("bqhlp,bqlphd->bqhd", w, sampled)
    return out.reshape(B, Q, C) * scale[None, None, :]


def four_gather(value, locs, w):
    """Four per-corner gathers, each viewed (B, Q, L*P, C) — every tensor in
    the chain keeps a >=8 second-minor dim, so no T(8,128)->T(4,128) retile
    copy of the gathered gigabytes ever happens (the 6-D single-gather view
    costs ~26 ms/iter of reshape copies in the device trace)."""
    Q = locs.shape[1]
    corner_idx, corner_w = [], []
    start = 0
    for lvl, (h, w_) in enumerate(SHAPES):
        loc = locs[:, :, lvl]
        x = loc[..., 0] * w_ - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        ci, cwl = [], []
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                cx = x0i + dx; cy = y0i + dy
                valid = (cx >= 0) & (cx < w_) & (cy >= 0) & (cy < h)
                ci.append(start + jnp.clip(cy, 0, h - 1) * w_ + jnp.clip(cx, 0, w_ - 1))
                cwl.append(jnp.where(valid, wx * wy, 0.0))
        corner_idx.append(ci)  # [corner][(B,Q,P)]
        corner_w.append(cwl)
        start += h * w_

    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    vf = value.reshape(B * S, C)
    sampled = None
    for c in range(4):
        idx_c = jnp.stack([corner_idx[l][c] for l in range(L)], 2)  # (B,Q,L,P)
        cw_c = jnp.stack([corner_w[l][c] for l in range(L)], 2)  # (B,Q,L,P)
        g_c = vf.at[(idx_c + base).reshape(-1)].get(mode="promise_in_bounds")
        g_c = g_c.reshape(B, Q, L * P, C).astype(jnp.float32)
        term = g_c * cw_c.reshape(B, Q, L * P, 1)
        sampled = term if sampled is None else sampled + term
    s6 = sampled.reshape(B, Q, L * P, H, D)
    attn16 = jnp.transpose(w, (0, 1, 3, 4, 2)).reshape(B, Q, L * P, H)
    out = jnp.einsum("bqih,bqihd->bqhd", attn16, s6)
    return out.reshape(B, Q, C)


def _corner_blocked(locs, blk=128):
    """Flat corner indices/weights PERMUTED so each group of 4*blk gathered
    rows holds blk items' corner-0 rows, then corner-1, -2, -3 (corner-major
    within a block).  The corner collapse then needs only CONTIGUOUS blk-row
    slice-adds on the 2D gather output — no 6-D view, so no T(8,128)->
    T(4,128) retile of the gathered gigabytes (the round-3 trace's 26 ms of
    reshape.41xx) and no strided/misaligned reads (what sank
    two_stage_slices).  returns idx (G*4*blk,) per batch-flat, cw same order,
    n_items, n_pad."""
    idx, cw = corners_pmajor(locs)  # (B,Q,L,P,4)
    B_, Q = idx.shape[:2]
    base = (jnp.arange(B_, dtype=jnp.int32) * S)[:, None, None, None, None]
    idx = (idx + base).reshape(-1, 4)  # (items, 4) item-major
    cw = cw.reshape(-1, 4)
    n_items = idx.shape[0]
    n_pad = (-n_items) % blk
    if n_pad:
        idx = jnp.pad(idx, ((0, n_pad), (0, 0)))
        cw = jnp.pad(cw, ((0, n_pad), (0, 0)))
    G = (n_items + n_pad) // blk
    idx = jnp.transpose(idx.reshape(G, blk, 4), (0, 2, 1))  # (G, 4, blk)
    cw = jnp.transpose(cw.reshape(G, blk, 4), (0, 2, 1))
    return idx.reshape(-1), cw.reshape(G, 4, blk), n_items, n_pad


def _blk128_sampled(value, locs, out_dtype, blk=128):
    """Corner-blocked gather + contiguous slice-add corner collapse.
    returns sampled (B, Q, L, P, C)."""
    Q = locs.shape[1]
    idx, cw, n_items, n_pad = _corner_blocked(locs, blk)
    vf = value.reshape(B * S, C)
    g = vf.at[idx].get(mode="promise_in_bounds")  # (G*4*blk, C) bf16
    G = cw.shape[0]
    g = g.reshape(G, 4, blk, C)
    gw = g.astype(jnp.float32) * cw[..., None]  # fused into the consumer
    sampled = gw[:, 0] + gw[:, 1] + gw[:, 2] + gw[:, 3]  # (G, blk, C)
    sampled = sampled.reshape(-1, C)
    if n_pad:
        sampled = sampled[:-n_pad]
    return sampled.reshape(B, Q, L, P, C).astype(out_dtype)


def blk128(value, locs, w):
    """Corner-blocked stage 1 (f32 sampled) + per-head einsum stage 2."""
    Q = locs.shape[1]
    sampled = _blk128_sampled(value, locs, jnp.float32)
    out = jnp.einsum("bqhlp,bqlphd->bqhd", w, sampled.reshape(B, Q, L, P, H, D))
    return out.reshape(B, Q, C)


def blk128_bf16(value, locs, w):
    """Corner-blocked stage 1 downcast to bf16 (halves stage-2 read traffic)."""
    Q = locs.shape[1]
    sampled = _blk128_sampled(value, locs, jnp.bfloat16)
    out = jnp.einsum(
        "bqhlp,bqlphd->bqhd", w.astype(jnp.bfloat16),
        sampled.reshape(B, Q, L, P, H, D), preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Q, C)


def _make_blk_kernel(blk):
    def _blk_kernel(g_ref, w_ref, o_ref):
        # g: (1, 4*blk, C) bf16 corner-major; w: (1, 4*blk, 1) f32; o: (1, blk, C)
        gw = g_ref[0].astype(jnp.float32) * w_ref[0]
        o_ref[0] = (
            (gw[0:blk] + gw[blk : 2 * blk])
            + (gw[2 * blk : 3 * blk] + gw[3 * blk : 4 * blk])
        ).astype(o_ref.dtype)

    return _blk_kernel


def _pl_blk_sampled(value, locs, out_dtype, blk=512):
    Q = locs.shape[1]
    idx, cw, n_items, n_pad = _corner_blocked(locs, blk)
    vf = value.reshape(B * S, C)
    g = vf.at[idx].get(mode="promise_in_bounds")
    G = cw.shape[0]
    sampled = pl.pallas_call(
        _make_blk_kernel(blk),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 4 * blk, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * blk, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, blk, C), out_dtype),
        interpret=INTERPRET,
    )(g.reshape(G, 4 * blk, C), cw.reshape(G, 4 * blk, 1))
    sampled = sampled.reshape(-1, C)
    if n_pad:
        sampled = sampled[:-n_pad]
    return sampled.reshape(B, Q, L, P, C)


def _make_nat_kernel(blk):
    def _nat_kernel(g_ref, w_ref, o_ref):
        # g: (1, blk, 4*C) bf16 — row = one (q,l,p) item, 4 corner rows packed
        #    into contiguous 256-lane blocks (a pure bitcast of the gather).
        # w: (1, blk, 4) f32 corner weights; o: (1, blk, C).
        g = g_ref[0]
        w4 = w_ref[0]
        acc = g[:, 0:C].astype(jnp.float32) * w4[:, 0:1]
        acc += g[:, C : 2 * C].astype(jnp.float32) * w4[:, 1:2]
        acc += g[:, 2 * C : 3 * C].astype(jnp.float32) * w4[:, 2:3]
        acc += g[:, 3 * C : 4 * C].astype(jnp.float32) * w4[:, 3:4]
        o_ref[0] = acc.astype(o_ref.dtype)

    return _nat_kernel


def _pl_nat_sampled(value, locs, out_dtype, blk=512):
    """Natural pmajor gather order (corner pairs stay memory-adjacent, unlike
    the corner-blocked permutation that cost the gather its locality), then a
    Pallas streaming corner collapse over contiguous lane slices."""
    Q = locs.shape[1]
    idx, cw = corners_pmajor(locs)  # (B,Q,L,P,4)
    B_ = idx.shape[0]
    base = (jnp.arange(B_, dtype=jnp.int32) * S)[:, None, None, None, None]
    idx = (idx + base).reshape(-1, 4)
    cw = cw.reshape(-1, 4)
    n_items = idx.shape[0]
    n_pad = (-n_items) % blk
    if n_pad:
        idx = jnp.pad(idx, ((0, n_pad), (0, 0)))
        cw = jnp.pad(cw, ((0, n_pad), (0, 0)))
    G = (n_items + n_pad) // blk
    vf = value.reshape(B * S, C)
    g = vf.at[idx.reshape(-1)].get(mode="promise_in_bounds")  # (G*blk*4, C)
    sampled = pl.pallas_call(
        _make_nat_kernel(blk),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, blk, 4 * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, blk, C), out_dtype),
        interpret=INTERPRET,
    )(g.reshape(G, blk, 4 * C), cw.reshape(G, blk, 4))
    sampled = sampled.reshape(-1, C)
    if n_pad:
        sampled = sampled[:-n_pad]
    return sampled.reshape(B, Q, L, P, C)


def pl_nat(value, locs, w):
    Q = locs.shape[1]
    sampled = _pl_nat_sampled(value, locs, jnp.float32)
    out = jnp.einsum("bqhlp,bqlphd->bqhd", w, sampled.reshape(B, Q, L, P, H, D))
    return out.reshape(B, Q, C)


def pl_nat_bf16(value, locs, w):
    Q = locs.shape[1]
    sampled = _pl_nat_sampled(value, locs, jnp.bfloat16)
    out = jnp.einsum(
        "bqhlp,bqlphd->bqhd", w.astype(jnp.bfloat16),
        sampled.reshape(B, Q, L, P, H, D), preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Q, C)


def pl_blk(value, locs, w):
    """Corner-blocked gather + Pallas streaming corner collapse (f32 out)."""
    Q = locs.shape[1]
    sampled = _pl_blk_sampled(value, locs, jnp.float32)
    out = jnp.einsum("bqhlp,bqlphd->bqhd", w, sampled.reshape(B, Q, L, P, H, D))
    return out.reshape(B, Q, C)


def pl_blk_bf16(value, locs, w):
    """Corner-blocked Pallas collapse with bf16 sampled (halves stage-2 read)."""
    Q = locs.shape[1]
    sampled = _pl_blk_sampled(value, locs, jnp.bfloat16)
    out = jnp.einsum(
        "bqhlp,bqlphd->bqhd", w.astype(jnp.bfloat16),
        sampled.reshape(B, Q, L, P, H, D), preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Q, C)


def check(fn, Q=256):
    value, locs, w = make_inputs(Q)
    ref = ms_deform_attn_core_shared(value, SHAPES, locs, w, H)
    got = fn(value, locs, w)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.02
    )


def main():
    for name, fn in [
        ("quad", quad),
        ("quad_pl", quad_pl),
        ("flat_pl", flat_pl),
        ("mulsum", mulsum),
        ("two_stage", two_stage),
        ("two_stage_quad", two_stage_quad),
        ("two_stage_pair", two_stage_pair),
    ]:
        try:
            check(fn)
            print(f"{name}: numerics OK", flush=True)
        except Exception as e:
            print(f"{name}: CHECK FAILED: {type(e).__name__} {str(e)[:400]}", flush=True)

    for Q in (11403, 2281):
        value, locs, w = make_inputs(Q)
        print(f"--- Q={Q}", flush=True)
        for name, fn in [
            ("cur    ", lambda v, l, w_: ms_deform_attn_core_shared(v, SHAPES, l, w_, H)),
            ("gsum   ", gsum),
            ("gq     ", gq),
            ("mulsum ", mulsum),
            ("quad   ", quad),
            ("quad_pl", quad_pl),
            ("flat_pl", flat_pl),
            ("two_stage     ", two_stage),
            ("two_stage_quad", two_stage_quad),
            ("two_stage_pair", two_stage_pair),
        ]:
            try:
                t = device_time(lambda l: fn(value, l, w), (locs,), iters=5)
                print(f"  {name}: {t * 1e3:8.2f} ms", flush=True)
            except Exception as e:
                print(f"  {name}: FAILED {type(e).__name__} {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
