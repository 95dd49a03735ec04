"""Multi-scale deformable attention sampling core.

Numerical spec: the reference's pure-PyTorch fallback
``multi_scale_deformable_attn_pytorch`` (/root/reference/models/bricks/
ms_deform_attn.py:159-212): per-level bilinear grid_sample with
align_corners=False and zero padding, weighted-summed over levels x points.

This module provides the XLA formulation (explicit corner gathers via
take_along_axis — differentiable, fuses well).  Pallas kernel variants were
built, measured on-chip, and rejected with data (see tools/bench_msda2.py and
ROADMAP.md): XLA's native gather already sits at the chip's issue/bandwidth
floor for this access pattern.

Layout: channel-last / head-separated, value is (B, S, H, D) with S the total
flattened multi-level token count.  Spatial shapes are STATIC python tuples —
everything here compiles to fixed-shape gathers.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

# A/B experiment knob (tools/bench_msda_focus.py): checkpoint_name is inert in
# eval but can fence fusions
_SKIP_CKPT_NAME = os.environ.get("MSDA_SKIP_CKPT_NAME", "0") == "1"

# Corner/attention reduce formulation for the head-shared core.  "einsum"
# lowers both reduction stages as value-dtype dot_generals with f32
# accumulation.  "unrolled" expresses them as elementwise multiply-adds —
# it was briefly the default at the end of round 3 on the theory that it
# avoids dot_general layout retiles, but the driver A/B settled it: the
# unrolled form's per-slice f32 upcasts double the traffic over the gathered
# gigabytes and REGRESSED the measured bench (20.7 vs 30.4 img/s inference,
# 5.1 vs 6.3 img/s train — BENCH_r03.json vs the 2026-08-19 einsum re-run
# under identical driver conditions).  "mulsum" keeps the stage-1 corner
# collapse as the einsum dot (it reads the gathered gigabytes exactly once)
# but lowers stage 2 — the small per-head attention reduce over L*P=16
# items — as a broadcast multiply + sum, on the theory that the dot_general
# there forced a layout retile of the full f32 stage-1 output between the
# two dots (the r5 trace's unattributed ~6ms/iter of f32[B,Qc,L,P,C]
# copies).  The on-chip A/B was a wash (26.30 vs 26.38 img/s inference,
# 2026-08-20 driver-condition runs): the elementwise stage 2 costs what the
# retile cost.  einsum stays the default; mulsum is kept as an A/B knob.
# "fused" (round 5) collapses BOTH stages into one pass: the bilinear corner
# weights and the per-head attention weights are folded into a single
# (B, Q, items, H) weight tensor (tiny — no C axis), which is broadcast-
# multiplied against the gathered rows viewed as (B, Q, items, H, D) — a
# pure bitcast of the gather output, C minor end to end — and summed over
# the items axis with f32 accumulation.  One loop fusion, zero dot_generals,
# zero layout retiles: built to remove the r5 trace's 5 ms/layer reshape
# copy and the 75%-lane-wasted T(4,128) stage-1 contraction (the corners
# axis is only 4 wide, so the stage-1 dot tiles at a quarter-full lane
# grid).  MEASURED AND REJECTED on chip (2026-08-20 driver conditions):
# 14.60 img/s inference vs 26.38 einsum — XLA does NOT keep the broadcast
# multiply + 3-axis reduce in registers at this size; the product path
# costs far more than the dot retiles it saves (same failure family as the
# r3 "unrolled" flip).  einsum stays the default; fused is kept as the
# recorded negative result.
_REDUCE_MODE = os.environ.get("MSDA_REDUCE", "einsum")

# Reduce dtype for the EXACT per-head quad core: "value" (default) consumes
# the gathered rows in the value dtype with f32 dot accumulation — the same
# economics as the shared/grouped cores, and the same semantics as the
# reference CUDA kernel under AMP (ms_deform_im2col computes in scalar_t =
# the value dtype, ms_deform_attn_cuda.cu); "f32" upcasts every gathered row
# before reducing (the r1-r3 behavior — doubles the traffic over the
# gathered gigabytes, kept for A/B).  In f32 runs the two are identical, so
# CPU parity tests are unaffected.
_EXACT_REDUCE = os.environ.get("MSDA_EXACT_REDUCE", "value")

# HBM budget for the materialized gathered corner rows per query chunk.
# 1.5 GB is the known-good batch-4 hot-layer working set for the SHARED core
# (ROADMAP r3): the largest that never OOMed alongside the rest of the
# program's live set (batch-8 inference OOMed unchunked).  The per-head
# quad/grouped cores default to a smaller 0.5 GB budget: their custom-VJP
# backward keeps ~3x the forward chunk live (gathered rows + their cotangent
# + the per-level quad scatter target), and 1.5 GB OOMed the exact-mode
# B=4 800x1344 TRAIN step on a 16 GB v5e while 0.5 GB trains at 2.86 img/s
# with bit-identical inference throughput (14.85 vs 14.80 img/s measured —
# the exact path is gather-issue-bound, not chunk-bound).
_GATHER_BUDGET_BYTES = float(os.environ.get("MSDA_GATHER_BUDGET_BYTES", 1.5e9))
# MSDA_GATHER_BUDGET_BYTES overrides both budgets (one knob for dryruns);
# MSDA_QUAD_GATHER_BUDGET_BYTES pins the quad/grouped budget independently.
_QUAD_GATHER_BUDGET_BYTES = float(
    os.environ.get(
        "MSDA_QUAD_GATHER_BUDGET_BYTES",
        os.environ.get("MSDA_GATHER_BUDGET_BYTES", 5e8),
    )
)

# Stage-1 (slot-weight) reduce formulation for the INT8 quad-gather eval core
# (ms_deform_attn_core_shared_q8): "einsum" lowers it as a dot_general over
# the int8 rows (XLA inserts the int8->bf16 convert, usually fused into the
# dot operand stream); "unrolled" consumes the rows slot-by-slot with
# elementwise multiply-adds.  A/B knob, settled on-chip like MSDA_REDUCE.
_Q8_REDUCE = os.environ.get("MSDA_Q8_REDUCE", "einsum")


def derive_q_chunk(
    B: int, Q: int, L: int, P: int, C: int, itemsize: int,
    budget: float = None,
) -> int:
    """Largest per-batch query-chunk size whose gathered corner buffer
    (B * Qc rows of L*4*P corner items, C channels each, ``itemsize`` bytes)
    stays within ``budget`` (default _GATHER_BUDGET_BYTES).  Shared and
    quad-packed cores gather the same total bytes per query (quad packs the
    4 corners of each of the L*P points into one 4*C-wide row), so one
    formula serves both; only the budget differs (see above)."""
    if budget is None:
        budget = _GATHER_BUDGET_BYTES
    per_q_bytes = L * 4 * P * C * itemsize
    max_bq = max(int(budget // per_q_bytes), 1)
    return max(min(Q, max_bq // max(B, 1)), 1)


def ms_deform_attn_core(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Deformable attention sampling.

    value: (B, S, H, D) — padded positions must already be zeroed.
    spatial_shapes: static [(h, w)] per level, sum(h*w) == S.
    sampling_locations: (B, Q, H, L, P, 2) normalized [0, 1] (x, y).
    attention_weights: (B, Q, H, L, P), softmaxed over L*P.
    returns: (B, Q, H*D).
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert sum(h * w for h, w in spatial_shapes) == S

    compute_dtype = value.dtype
    # (B, H, S, D) so the gather axis is contiguous per (batch, head).
    value_bh = jnp.swapaxes(value, 1, 2)

    out = jnp.zeros((B, H, Q, D), dtype=jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # (B, Q, H, P, 2)
        w_attn = attention_weights[:, :, :, lvl].astype(jnp.float32)  # (B, Q, H, P)

        # grid_sample(align_corners=False): pixel centers at (i + 0.5).
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        acc = jnp.zeros((B, H, Q, P), dtype=jnp.float32)
        idxs = []
        cws = []
        for dy, wy in ((0, 1.0 - fy), (1, fy)):
            for dx, wx in ((0, 1.0 - fx), (1, fx)):
                cx = x0i + dx
                cy = y0i + dy
                valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
                cxc = jnp.clip(cx, 0, w - 1)
                cyc = jnp.clip(cy, 0, h - 1)
                flat = start + cyc * w + cxc  # (B, Q, H, P)
                corner_w = jnp.where(valid, wx * wy, 0.0)
                idxs.append(flat)
                cws.append(corner_w)

        # Gather all 4 corners at once: (B, H, Q*P*4)
        idx = jnp.stack(idxs, axis=-1)  # (B, Q, H, P, 4)
        cw = jnp.stack(cws, axis=-1)  # (B, Q, H, P, 4)
        idx_bh = jnp.transpose(idx, (0, 2, 1, 3, 4)).reshape(B, H, Q * P * 4)
        gathered = jnp.take_along_axis(
            value_bh, idx_bh[..., None], axis=2
        )  # (B, H, Q*P*4, D)
        gathered = gathered.reshape(B, H, Q, P, 4, D).astype(jnp.float32)
        cw_bh = jnp.transpose(cw, (0, 2, 1, 3, 4))  # (B, H, Q, P, 4)
        sampled = jnp.einsum("bhqpc,bhqpcd->bhqpd", cw_bh, gathered)

        w_bh = jnp.transpose(w_attn, (0, 2, 1, 3))  # (B, H, Q, P)
        out = out + jnp.einsum("bhqp,bhqpd->bhqd", w_bh, sampled)
        start += h * w

    # (B, H, Q, D) -> (B, Q, H*D)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(compute_dtype)


def ms_deform_attn_core_quad(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Exact per-head deformable attention via a quad-packed value layout.

    Numerically identical to :func:`ms_deform_attn_core` (same corners, same
    weights — only the addressing changes), but ~4x faster on v5e for the
    per-head case: the exact path is ISSUE-bound (B*Q*H*L*P*4 gathers of
    64-byte head rows; the chip charges ~max(6ns/issue, bytes/83GB/s) per
    gather — ROADMAP r2 cost model), so packing each pixel's 2x2 bilinear
    neighbourhood into one (4*D)-wide row lets ONE gather issue fetch all
    four corners: 4x fewer issues at identical gathered bytes.  The same
    trick measured *slower* for the head-shared core (bench_msda2 "quad"),
    whose 512-byte rows already sit at the bandwidth crossover — packing
    only pays when issues, not bytes, are the binding constraint.

    The backward inherits the win: grad-of-gather is a scatter-add of
    (4*D)-wide minor-dim rows at 4x fewer indices (flat rows are the only
    fast scatter shape on this chip — ROADMAP r3), and spatially-adjacent
    sampling points now write *different* quad rows, cutting the collision
    serialization the plain per-corner scatter suffers.

    Layout per level (h, w): quad[i] = concat(v[i], v[i+1], v[i+w],
    v[i+w+1]) built with in-level rolls (wrapped rows are fetched but
    receive zero weight).  The gather base is clip((y0, x0)) into
    [0, (h-2, w-2)] so slots can shift off the true corners at the image
    border; each slot's weight is re-derived from the TRUE bilinear corner
    it holds (zero when the slot pixel is not one of the point's corners or
    lies outside the level), which keeps zero-padding grid_sample semantics
    exactly.

    Args/returns: identical to ms_deform_attn_core.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert sum(h * w for h, w in spatial_shapes) == S

    compute_dtype = value.dtype
    value_bh = jnp.swapaxes(value, 1, 2)  # (B, H, S, D)

    # Per-level quad-packed value buffers and chunk-invariant addressing.
    # The quads are query-independent (XLA hoists them out of the chunk
    # loop); the gathered rows are what must be chunked — unchunked, the
    # train-mode backward materialized every level's (B, H, Q*P, 4D) gather
    # + its scatter-add target simultaneously and exhausted HBM at B=4
    # (ROADMAP r3); chunking bounds the live set exactly like the shared core.
    quads = []  # (B*H*h*w, 4D) per level
    idx_levels = []  # (B, H, Q, P) flat row index incl. batch/head base
    slotw_levels = []  # (B, H, Q, P, 4) f32
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        seg = jax.lax.slice_in_dim(value_bh, start, start + h * w, axis=2)
        quad = jnp.concatenate(
            [
                seg,
                jnp.roll(seg, -1, axis=2),
                jnp.roll(seg, -w, axis=2),
                jnp.roll(seg, -(w + 1), axis=2),
            ],
            axis=-1,
        )  # (B, H, h*w, 4D)
        quads.append(quad.reshape(B * H * h * w, 4 * D))

        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # (B, Q, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        bx = jnp.clip(x0i, 0, max(w - 2, 0))
        by = jnp.clip(y0i, 0, max(h - 2, 0))

        # slot weights: slot (sy, sx) holds pixel (by+sy, bx+sx); its weight
        # is the TRUE bilinear corner weight of that pixel (0 when the pixel
        # is not one of this point's corners, or out of the level)
        slot_ws = []
        for sy in (0, 1):
            py = by + sy
            wy = jnp.where(py == y0i, 1.0 - fy, jnp.where(py == y0i + 1, fy, 0.0))
            wy = jnp.where(py < h, wy, 0.0)
            for sx in (0, 1):
                px = bx + sx
                wx = jnp.where(px == x0i, 1.0 - fx, jnp.where(px == x0i + 1, fx, 0.0))
                wx = jnp.where(px < w, wx, 0.0)
                slot_ws.append(wx * wy)
        slot_w = jnp.stack(slot_ws, axis=-1)  # (B, Q, H, P, 4)
        slotw_levels.append(jnp.transpose(slot_w, (0, 2, 1, 3, 4)))

        base = (
            jnp.arange(B, dtype=jnp.int32)[:, None, None, None] * H
            + jnp.arange(H, dtype=jnp.int32)[None, :, None, None]
        ) * (h * w)  # (B, H, 1, 1)
        idx = by * w + bx  # (B, Q, H, P)
        idx_levels.append(jnp.transpose(idx, (0, 2, 1, 3)) + base)  # (B, H, Q, P)
        start += h * w

    attn_bh = jnp.transpose(
        attention_weights.astype(jnp.float32), (0, 2, 1, 3, 4)
    )  # (B, H, Q, L, P)

    def run_chunk(s0, s1):
        qc = s1 - s0
        out_c = jnp.zeros((B, H, qc, D), dtype=jnp.float32)
        for lvl in range(L):
            g = quads[lvl].at[
                idx_levels[lvl][:, :, s0:s1].reshape(-1)
            ].get(mode="promise_in_bounds")
            if not _SKIP_CKPT_NAME:
                g = checkpoint_name(g, "msda_gather")
            g = g.reshape(B, H, qc, P, 4, D)
            if _REDUCE_MODE == "fused":
                # one-pass reduce (see _collapse_gathered): slot weights and
                # attention weights fold into one (B, H, qc, P, 4) tensor;
                # the gathered (..., P, 4, D) view is a bitcast of the
                # (4*D)-wide quad rows, so the multiply+reduce is a single
                # loop fusion with no dot_general and no retile.
                a = attn_bh[:, :, s0:s1, lvl]  # (B, H, qc, P) f32
                w_full = slotw_levels[lvl][:, :, s0:s1] * a[..., None]
                out_c = out_c + jnp.sum(
                    g.astype(jnp.float32) * w_full[..., None], axis=(3, 4)
                )
                continue
            if _EXACT_REDUCE == "f32":
                # legacy fp32-island reduce: upcasts the gathered rows first
                g = g.astype(jnp.float32)
            # in "value" mode both stages consume the gathered bytes in the
            # value dtype; the level accumulator carries f32 (see _EXACT_REDUCE)
            sampled = jnp.einsum(
                "bhqpc,bhqpcd->bhqpd",
                slotw_levels[lvl][:, :, s0:s1].astype(g.dtype), g,
            )
            a = attn_bh[:, :, s0:s1, lvl]
            if _REDUCE_MODE == "mulsum":
                # stage 2 elementwise (see _collapse_gathered): a dot_general
                # here retiles stage 1's full output between the two dots
                out_c = out_c + jnp.sum(
                    sampled.astype(jnp.float32) * a[..., None], axis=3
                )
            else:
                out_c = out_c + jnp.einsum(
                    "bhqp,bhqpd->bhqd", a.astype(g.dtype), sampled,
                    preferred_element_type=jnp.float32,
                )
        return out_c

    q_chunk = derive_q_chunk(
        B, Q, L, P, H * D, jnp.dtype(compute_dtype).itemsize,
        budget=_QUAD_GATHER_BUDGET_BYTES,
    )
    if Q <= q_chunk:
        out = run_chunk(0, Q)
    else:
        out = jnp.concatenate(
            [run_chunk(s0, min(s0 + q_chunk, Q)) for s0 in range(0, Q, q_chunk)],
            axis=2,
        )

    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(compute_dtype)


def ms_deform_attn_core_grouped(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """GROUP-shared deformable attention: G sampling-location groups, each
    shared by H/G heads — the intermediate points on the speed/quality
    frontier between the head-shared core (G=1, fastest) and the exact
    per-head core (G=H, reference numerics).

    Motivation (quality campaign, ROADMAP r4): fully-shared sampling trails
    exact per-head sampling beyond seed noise on the paired synthetic-quality
    runs — heads lose spatial diversity when all sample the same 16 points.
    Grouped sampling restores diversity in controlled steps while keeping the
    quad-packed gather economics: per point each group issues ONE gather of a
    (4*C/G)-wide quad row (the 2x2 bilinear neighbourhood of the group's
    channel slice), so at H=8, C=256:

      G=1: 1 issue/point of 4C rows    (quad variant of the shared core)
      G=2: 2 issues/point of 2C rows
      G=4: 4 issues/point of C rows    (same issue count and row width as
                                        the head-shared core's 4 corner rows)
      G=8: 8 issues/point of C/2 rows  (== ms_deform_attn_core_quad)

    Total gathered bytes are G-independent; only the issue count scales, and
    the v5e charges ~max(issue cost, bytes/bandwidth) per gather (measured in
    tools/bench_gather.py).  The backward needs no custom VJP: autodiff of
    the quad-row gather IS the quad-packed scatter-add (the fast scatter
    shape, ROADMAP r3), with three in-level rolls to unpack.

    Args: value (B, S, C) channel-packed, padding zeroed; sampling_locations
    (B, Q, G, L, P, 2) normalized; attention_weights (B, Q, H, L, P)
    softmaxed over L*P.  Heads h in [g*H/G, (g+1)*H/G) use location group g
    — the channel slice [g*C/G, (g+1)*C/G) is contiguous because value is
    head-major.  Returns (B, Q, C).

    Numerical spec: deform_attn_numpy_spec with each group's locations
    broadcast to its heads (tests/test_deform_attn.py::TestGroupedCore).
    """
    B, S, C = value.shape
    _, Q, G, L, P, _ = sampling_locations.shape
    H = num_heads
    assert H % G == 0 and C % G == 0, (H, C, G)
    Hg = H // G
    Cg = C // G
    D = C // H
    assert L == len(spatial_shapes)
    assert sum(h * w for h, w in spatial_shapes) == S

    compute_dtype = value.dtype
    value_bg = jnp.swapaxes(value.reshape(B, S, G, Cg), 1, 2)  # (B, G, S, Cg)

    # Per-level quad-packed group buffers + chunk-invariant addressing (the
    # same scheme as ms_deform_attn_core_quad, with the head axis replaced by
    # the group axis): quad[i] = concat(v[i], v[i+1], v[i+w], v[i+w+1]);
    # gather base clip((y0, x0)) into [0, (h-2, w-2)]; per-slot weights
    # re-derived from the TRUE bilinear corner each slot holds (zero when the
    # slot pixel is not one of the point's corners or lies outside the level)
    # keep zero-padding grid_sample semantics exactly.
    quads = []  # (B*G*h*w, 4*Cg) per level
    idx_levels = []  # (B, G, Q, P) flat row index incl. batch/group base
    slotw_levels = []  # (B, G, Q, P, 4) f32
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        seg = jax.lax.slice_in_dim(value_bg, start, start + h * w, axis=2)
        quad = jnp.concatenate(
            [
                seg,
                jnp.roll(seg, -1, axis=2),
                jnp.roll(seg, -w, axis=2),
                jnp.roll(seg, -(w + 1), axis=2),
            ],
            axis=-1,
        )  # (B, G, h*w, 4*Cg)
        quads.append(quad.reshape(B * G * h * w, 4 * Cg))

        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # (B, Q, G, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        bx = jnp.clip(x0i, 0, max(w - 2, 0))
        by = jnp.clip(y0i, 0, max(h - 2, 0))

        slot_ws = []
        for sy in (0, 1):
            py = by + sy
            wy = jnp.where(py == y0i, 1.0 - fy, jnp.where(py == y0i + 1, fy, 0.0))
            wy = jnp.where(py < h, wy, 0.0)
            for sx in (0, 1):
                px = bx + sx
                wx = jnp.where(px == x0i, 1.0 - fx, jnp.where(px == x0i + 1, fx, 0.0))
                wx = jnp.where(px < w, wx, 0.0)
                slot_ws.append(wx * wy)
        slot_w = jnp.stack(slot_ws, axis=-1)  # (B, Q, G, P, 4)
        slotw_levels.append(jnp.transpose(slot_w, (0, 2, 1, 3, 4)))

        base = (
            jnp.arange(B, dtype=jnp.int32)[:, None, None, None] * G
            + jnp.arange(G, dtype=jnp.int32)[None, :, None, None]
        ) * (h * w)  # (B, G, 1, 1)
        idx = by * w + bx  # (B, Q, G, P)
        idx_levels.append(jnp.transpose(idx, (0, 2, 1, 3)) + base)  # (B, G, Q, P)
        start += h * w

    # (B, Q, H, L, P) -> (B, G, Q, Hg, L, P)
    attn_g = jnp.transpose(
        attention_weights.reshape(B, Q, G, Hg, L, P), (0, 2, 1, 3, 4, 5)
    )

    def run_chunk(s0, s1):
        qc = s1 - s0
        out_c = jnp.zeros((B, G, qc, Hg, D), dtype=jnp.float32)
        for lvl in range(L):
            g = quads[lvl].at[
                idx_levels[lvl][:, :, s0:s1].reshape(-1)
            ].get(mode="promise_in_bounds")
            if not _SKIP_CKPT_NAME:
                g = checkpoint_name(g, "msda_gather")
            # fast-path reduce (mirrors the shared core's einsum mode): both
            # stages consume the gathered gigabytes in the value dtype, the
            # level accumulator carries f32
            g = g.reshape(B, G, qc, P, 4, Hg, D)
            sampled = jnp.einsum(
                "bgqps,bgqpshd->bgqphd",
                slotw_levels[lvl][:, :, s0:s1].astype(g.dtype), g,
            )
            out_c = out_c + jnp.einsum(
                "bgqhp,bgqphd->bgqhd",
                attn_g[:, :, s0:s1, :, lvl].astype(g.dtype), sampled,
                preferred_element_type=jnp.float32,
            )
        return out_c

    q_chunk = derive_q_chunk(
        B, Q, L, P, C, jnp.dtype(compute_dtype).itemsize,
        budget=_QUAD_GATHER_BUDGET_BYTES,
    )
    if Q <= q_chunk:
        out = run_chunk(0, Q)
    else:
        out = jnp.concatenate(
            [run_chunk(s0, min(s0 + q_chunk, Q)) for s0 in range(0, Q, q_chunk)],
            axis=2,
        )

    # (B, G, Q, Hg, D) -> (B, Q, G*Hg*D) == (B, Q, C), head-major
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(B, Q, C)
    return out.astype(compute_dtype)


def compute_sampling_locations(
    reference_points: jnp.ndarray,
    sampling_offsets: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    num_points: int,
) -> jnp.ndarray:
    """Reference-point handling of the reference module
    (/root/reference/models/bricks/ms_deform_attn.py:339-355).

    reference_points: (B, Q, L, 2) normalized points or (B, Q, L, 4) boxes.
    sampling_offsets: (B, Q, H, L, P, 2).
    returns sampling_locations (B, Q, H, L, P, 2).
    """
    if reference_points.shape[-1] == 2:
        # offsets are normalized by the per-level (w, h)
        wh = jnp.asarray(
            [(w, h) for h, w in spatial_shapes], dtype=sampling_offsets.dtype
        )  # (L, 2)
        return (
            reference_points[:, :, None, :, None, :]
            + sampling_offsets / wh[None, None, None, :, None, :]
        )
    elif reference_points.shape[-1] == 4:
        return (
            reference_points[:, :, None, :, None, :2]
            + sampling_offsets
            / num_points
            * reference_points[:, :, None, :, None, 2:]
            * 0.5
        )
    raise ValueError(
        f"reference_points last dim must be 2 or 4, got {reference_points.shape[-1]}"
    )


def _collapse_gathered(g, cw_c, attn_c, B, Qc, L, P, H, C):
    """Collapse gathered corner rows (B*Qc*L*4*P, C) with bilinear corner
    weights and per-head attention weights -> (B, Qc, C).

    Two formulations selected by MSDA_REDUCE (see module top): the unrolled
    elementwise form keeps C minor end to end (slices of the gathered buffer
    are contiguous (P, C) / (C,) blocks), accumulates stage 1 in f32
    registers, and writes no layout-retiled intermediates; the einsum form is
    the previous dot_general lowering, kept for A/B measurement.
    """
    D = C // H
    g = g.reshape(B, Qc, L, 4, P, C)
    if _REDUCE_MODE == "fused":
        # one-pass reduce: fold corner and attention weights into a single
        # (B, Qc, L, 4, P, H) tensor (no C axis — cheap to materialize),
        # then broadcast-multiply the gathered rows and reduce the L*4*P
        # items in one f32 loop fusion.  g's (B, Qc, L, 4, P, H, D) view is
        # a bitcast of the gather output (row-major, C minor), so no
        # layout copy and no dot_general is emitted.
        w_full = (
            cw_c.reshape(B, Qc, L, 4, P, 1)
            * jnp.transpose(attn_c, (0, 1, 3, 4, 2))[:, :, :, None]
        )  # (B, Qc, L, 4, P, H) f32
        g7 = g.reshape(B, Qc, L, 4, P, H, D)
        out = jnp.sum(
            g7.astype(jnp.float32) * w_full[..., None], axis=(2, 3, 4)
        )  # (B, Qc, H, D) f32
        return out.reshape(B, Qc, C)
    if _REDUCE_MODE == "unrolled":
        cw5 = cw_c.reshape(B, Qc, L, 4, P)
        sampled = None
        for c in range(4):
            term = g[:, :, :, c].astype(jnp.float32) * cw5[:, :, :, c][..., None]
            sampled = term if sampled is None else sampled + term
        sampled = sampled.astype(g.dtype).reshape(B, Qc, L, P, H, D)
        out = None
        for lvl in range(L):
            for p in range(P):
                a = attn_c[:, :, :, lvl, p].astype(jnp.float32)  # (B, Qc, H)
                t = sampled[:, :, lvl, p].reshape(B, Qc, H, D).astype(jnp.float32)
                t = t * a[..., None]
                out = t if out is None else out + t
        return out.reshape(B, Qc, C)
    cw5 = cw_c.reshape(B, Qc, L, 4, P).astype(g.dtype)
    sampled = jnp.einsum("bqlcp,bqlcpe->bqlpe", cw5, g)
    if _REDUCE_MODE == "mulsum":
        # stage 2 as broadcast-multiply + sum over the L*P=16 items: unlike a
        # dot_general it consumes stage 1's output in whatever layout the
        # stage-1 dot produced (no retile copy), and the f32 accumulate reads
        # `sampled` once
        sampled = sampled.reshape(B, Qc, L * P, H, D).astype(jnp.float32)
        a = attn_c.reshape(B, Qc, H, L * P).transpose(0, 1, 3, 2)
        out = jnp.sum(sampled * a[..., None], axis=2)
        return out.reshape(B, Qc, C)
    sampled = sampled.reshape(B, Qc, L, P, H, D)
    out = jnp.einsum(
        "bqhlp,bqlphd->bqhd", attn_c.astype(g.dtype), sampled,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Qc, C)


def _make_quadgrad_reduce(spatial_shapes, B, H, C):
    """Custom-VJP gather+reduce for the head-shared core: forward identical to
    the plain two-stage reduce; backward scatters grad-of-value in a
    QUAD-PACKED layout — one (4*C)-wide flat row per sampling point at the
    clipped top-left corner index instead of four C-wide corner rows.

    Why: the train step is scatter-bound (ROADMAP r3 — MSDA scatter-add is
    238 ms of the 706 ms step) and the v5e only scatters fast when the update
    window is exactly the minor row dim.  The quad layout keeps that shape
    while cutting scatter issues 4x, and spatially-adjacent sampling points
    now write DIFFERENT quad rows, removing the corner-overlap collisions
    that serialize the plain scatter (59 ms real vs 21.9 ms uniform-random at
    equal volume = collision cost).  The packed rows are unpacked with three
    in-level rolls (wrapped rows are provably never written: the clipped base
    index never exceeds h*w - w - 2).

    The backward re-gathers the corner rows for the corner-weight/attention
    grads — exactly what full remat already does for the autodiff backward,
    so gather volume is unchanged.

    slot weights (the corner weights routed to quad slots) ride in as an
    explicit input with a zero cotangent: the output does not depend on them
    given the corner weights, they only steer how d_value is packed.
    Differential-tested against the autodiff backward in
    tests/test_deform_attn.py::TestQuadScatterGrad.
    """
    L = len(spatial_shapes)
    D = C // H

    def _stage12(g, cw_c, attn_c, Qc, P):
        return _collapse_gathered(g, cw_c, attn_c, B, Qc, L, P, H, C)

    def _primal(value_flat, idx_c, cw_c, attn_c):
        Qc, P = idx_c.shape[1], idx_c.shape[3]
        g = value_flat.at[idx_c.reshape(-1)].get(mode="promise_in_bounds")
        if not _SKIP_CKPT_NAME:
            g = checkpoint_name(g, "msda_gather")
        return _stage12(g, cw_c, attn_c, Qc, P)

    @jax.custom_vjp
    def reduce_core(value_flat, idx_c, cw_c, attn_c, base_c, slotw_c):
        return _primal(value_flat, idx_c, cw_c, attn_c)

    def _fwd(value_flat, idx_c, cw_c, attn_c, base_c, slotw_c):
        out = _primal(value_flat, idx_c, cw_c, attn_c)
        return out, (value_flat, idx_c, cw_c, attn_c, base_c, slotw_c)

    def _bwd(res, d_out):
        value_flat, idx_c, cw_c, attn_c, base_c, slotw_c = res
        Qc, P = idx_c.shape[1], idx_c.shape[3]
        g = value_flat.at[idx_c.reshape(-1)].get(mode="promise_in_bounds")
        g6 = g.reshape(B, Qc, L, 4, P, C)
        gdt = g6.dtype
        cw5 = cw_c.reshape(B, Qc, L, 4, P).astype(gdt)
        d_out6 = d_out.reshape(B, Qc, H, D).astype(gdt)
        if _REDUCE_MODE == "unrolled":
            # Same layout story as the forward (_collapse_gathered): express
            # every contraction that touches the gathered gigabytes as
            # elementwise multiply-adds / minor-dim row reductions so the
            # buffer is consumed in its natural T(8,128) gather layout —
            # the dot_general forms below retile it first (measured as
            # pure layout-churn copies in the round-3 trace).
            sampled6 = None
            for c in range(4):
                term = g6[:, :, :, c].astype(jnp.float32) * cw5[
                    :, :, :, c
                ].astype(jnp.float32)[..., None]
                sampled6 = term if sampled6 is None else sampled6 + term
            sampled6 = sampled6.astype(gdt).reshape(B, Qc, L, P, H, D)
            # d_attn[b,q,h,l,p] = sum_d d_out6[b,q,h,d] * sampled6[b,q,l,p,h,d]
            d_attn = jnp.sum(
                sampled6 * d_out6[:, :, None, None],
                axis=-1,
                dtype=jnp.float32,
            ).transpose(0, 1, 4, 2, 3)
            # d_sampled[b,q,l,p,(h d)] = d_out6[b,q,h,d] * attn[b,q,h,l,p]
            d_sampled = (
                d_out6[:, :, None, None]
                * attn_c.astype(gdt).transpose(0, 1, 3, 4, 2)[..., None]
            ).reshape(B, Qc, L, P, C)
            d_cw_parts = []
            for c in range(4):
                d_cw_parts.append(
                    jnp.sum(
                        d_sampled * g6[:, :, :, c], axis=-1, dtype=jnp.float32
                    )
                )
            d_cw = (
                jnp.stack(d_cw_parts, axis=3).reshape(cw_c.shape).astype(cw_c.dtype)
            )
        else:
            sampled6 = jnp.einsum("bqlcp,bqlcpe->bqlpe", cw5, g6).reshape(
                B, Qc, L, P, H, D
            )
            d_attn = jnp.einsum("bqhd,bqlphd->bqhlp", d_out6, sampled6)
            d_sampled = jnp.einsum(
                "bqhd,bqhlp->bqlphd", d_out6, attn_c.astype(gdt)
            ).reshape(B, Qc, L, P, C)
            d_cw = (
                jnp.einsum("bqlpe,bqlcpe->bqlcp", d_sampled, g6)
                .reshape(cw_c.shape)
                .astype(cw_c.dtype)
            )

        slotw5 = slotw_c.reshape(B, Qc, L, 4, P).astype(gdt)
        segs = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            # packed[b, q, p] = concat_s(slot_w[s] * d_sampled): one flat
            # (4*C)-wide row per sampling point
            packed = jnp.einsum(
                "bqsp,bqpe->bqpse", slotw5[:, :, lvl], d_sampled[:, :, lvl]
            ).reshape(B, Qc * P, 4 * C)
            bofs = (jnp.arange(B, dtype=jnp.int32) * (h * w))[:, None]
            rows = (base_c[:, :, lvl].reshape(B, Qc * P) + bofs).reshape(-1)
            quad = jnp.zeros((B * h * w, 4 * C), dtype=packed.dtype)
            quad = quad.at[rows].add(
                packed.reshape(-1, 4 * C), mode="promise_in_bounds"
            )
            quad = quad.reshape(B, h * w, 4, C)
            # quad row i, slot s holds the grad for pixel i + (0, 1, w, w+1)[s]
            dseg = (
                quad[:, :, 0]
                + jnp.roll(quad[:, :, 1], 1, axis=1)
                + jnp.roll(quad[:, :, 2], w, axis=1)
                + jnp.roll(quad[:, :, 3], w + 1, axis=1)
            )
            segs.append(dseg)
        dvalue = (
            jnp.concatenate(segs, axis=1)
            .reshape(value_flat.shape)
            .astype(value_flat.dtype)
        )

        def f0(a):
            return np.zeros(a.shape, dtype=jax.dtypes.float0)

        return (
            dvalue,
            f0(idx_c),
            d_cw,
            d_attn.astype(attn_c.dtype),
            f0(base_c),
            jnp.zeros_like(slotw_c),
        )

    reduce_core.defvjp(_fwd, _bwd)
    return reduce_core


def ms_deform_attn_core_shared(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_heads: int,
    quad_scatter: bool = False,
) -> jnp.ndarray:
    """TPU-native deformable attention with HEAD-SHARED sampling locations.

    XLA's TPU gather lowering is issue-bound (~10ns per gathered slice
    regardless of slice width — measured in tools/bench_gather.py), so the
    per-head 32-float corner gathers of the reference formulation
    (B*Q*H*L*P*4 issues) are the model's dominant cost.  Sharing sampling
    locations across heads (attention weights stay per-head, in the spirit of
    DCNv4's grouped sampling) lets one gather fetch a full 2x2xC bilinear
    patch: B*Q*L*P issues — 32x fewer — at the same issue rate.

    value: (B, S, C) channel-packed (NOT head-split), padding already zeroed.
    sampling_locations: (B, Q, L, P, 2) normalized, shared across heads.
    attention_weights: (B, Q, H, L, P) softmaxed over L*P.
    returns: (B, Q, C).

    Implementation: ONE flat row gather for all L*P*4 corner items per query
    (2.9M issues at ~7ns each for the encoder's first layer — measured in
    tools/bench_gather.py) followed by a single fused weighted reduction with
    the bilinear corner weights and per-head attention weights folded into
    one (B, Q, items, H) weight tensor, so the 1.5GB of gathered rows is read
    exactly once.
    """
    B, S, C = value.shape
    _, Q, L, P, _ = sampling_locations.shape
    H = num_heads
    D = C // H
    compute_dtype = value.dtype
    # quad-packed backward scatter (see _make_quadgrad_reduce): callers
    # request it for TRAIN only (the custom-vjp wrapper costs eval ~3% by
    # fencing fusions, and its win is all in the backward); the env knob
    # stays the master kill switch for A/B measurement
    quad_scatter = quad_scatter and os.environ.get("MSDA_QUAD_SCATTER", "1") == "1"

    idx_parts, w_parts = [], []
    base_parts, slotw_parts = [], []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, lvl].astype(jnp.float32)  # (B, Q, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                cx = x0i + dx
                cy = y0i + dy
                valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
                idx_parts.append(
                    start + jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
                )  # (B, Q, P)
                w_parts.append(jnp.where(valid, wx * wy, 0.0))
        if quad_scatter:
            # quad-slot addressing for the backward scatter: clipped base +
            # per-slot weights re-derived from the TRUE corner each slot
            # holds (same scheme as ms_deform_attn_core_quad, zero off-corner)
            bx = jnp.clip(x0i, 0, max(w - 2, 0))
            by = jnp.clip(y0i, 0, max(h - 2, 0))
            base_parts.append(by * w + bx)  # (B, Q, P) level-local
            for sy in (0, 1):
                py = by + sy
                swy = jnp.where(
                    py == y0i, 1 - fy, jnp.where(py == y0i + 1, fy, 0.0)
                )
                swy = jnp.where(py < h, swy, 0.0)
                for sx in (0, 1):
                    px = bx + sx
                    swx = jnp.where(
                        px == x0i, 1 - fx, jnp.where(px == x0i + 1, fx, 0.0)
                    )
                    swx = jnp.where(px < w, swx, 0.0)
                    slotw_parts.append(swx * swy)
        start += h * w

    idx_all = jnp.stack(idx_parts, 2)  # (B, Q, L*4, P)
    cw_all = jnp.stack(w_parts, 2)  # (B, Q, L*4, P)
    base = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    idx_flat = idx_all + base
    value_flat = value.reshape(B * S, C)
    attn_t = attention_weights.astype(jnp.float32)  # (B, Q, H, L, P)
    if quad_scatter:
        base_all = jnp.stack(base_parts, 2)  # (B, Q, L, P)
        slotw_all = jnp.stack(slotw_parts, 2)  # (B, Q, L*4, P)
        quad_reduce = _make_quadgrad_reduce(spatial_shapes, B, H, C)

    def reduce_chunk(idx_c, cw_c, attn_c):
        """Two-stage reduce: stage 1 collapses the 4 bilinear corners with
        per-row scalar weights, stage 2 applies the per-head attention (see
        _collapse_gathered for the MSDA_REDUCE formulations and the layout
        story; tools/bench_msda2.py / bench_msda5.py hold the earlier
        einsum-variant shootouts).  Gather width does not matter on this chip
        (512B to 2KB rows time identically), so plain corner rows are
        gathered.  Stage-1 corner sums accumulate f32 in registers and round
        once to the value dtype (~2^-8 relative in bf16 — inside every
        quality tolerance used here; the exact per-head path stays f32)."""
        Qc = idx_c.shape[1]
        # indices are clamped in-bounds above; the default fill-mode take adds
        # a compare+select pass over the gathered gigabytes (seen as 12ms
        # select_convert fusions in the device trace)
        g = value_flat.at[idx_c.reshape(-1)].get(mode="promise_in_bounds")
        if not _SKIP_CKPT_NAME:
            # named for the remat policy: the gathered rows (~1.5GB/layer) are
            # the one activation we always recompute instead of saving
            g = checkpoint_name(g, "msda_gather")
        return _collapse_gathered(g, cw_c, attn_c, B, Qc, L, P, H, C)

    def run_chunk(s0, s1):
        if quad_scatter:
            return quad_reduce(
                value_flat, idx_flat[:, s0:s1], cw_all[:, s0:s1],
                attn_t[:, s0:s1], base_all[:, s0:s1], slotw_all[:, s0:s1],
            )
        return reduce_chunk(
            idx_flat[:, s0:s1], cw_all[:, s0:s1], attn_t[:, s0:s1]
        )

    # chunk over queries so the materialized corner rows stay bounded
    # (g is B*Qc * L*4*P rows of C: 32 KB per (b, q) at C=256, bf16): batch-8
    # inference OOMed HBM unchunked; the chunk size is derived from the
    # _GATHER_BUDGET_BYTES HBM budget and the actual (L, P, C, dtype)
    q_chunk = derive_q_chunk(B, Q, L, P, C, jnp.dtype(compute_dtype).itemsize)
    if Q <= q_chunk:
        out = run_chunk(0, Q)
    else:
        outs = []
        for s0 in range(0, Q, q_chunk):
            outs.append(run_chunk(s0, min(s0 + q_chunk, Q)))
        out = jnp.concatenate(outs, axis=1)
    return out.astype(compute_dtype)


def ms_deform_attn_core_shared_q8(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Head-shared deformable attention over an INT8 quad-packed value table
    (inference only).

    The head-shared core is bandwidth-bound on its gathered corner rows
    (ROADMAP r3 trace: ~29.5 ms of gathers + corner reduces per step at B=4,
    512-byte bf16 rows), so the remaining lever is gathering FEWER BYTES.
    Two changes relative to :func:`ms_deform_attn_core_shared`, both
    byte-reduction only — corners, bilinear weights, and attention weights
    are identical:

    * the value tensor is quantized once per call to symmetric per-channel
      int8 (scale = per-channel absmax / 127).  Per-channel scales commute
      through both weighted reductions (corner weights and attention weights
      multiply rows channel-wise), so dequantization is ONE multiply by the
      (C,) scale vector on the collapsed (B, Q, C) output — no per-row
      dequant pass over the gathered gigabytes;
    * each sampling point's 2x2 bilinear neighbourhood is fetched as ONE
      quad-packed (4*C)-wide int8 row (1 KB at C=256) instead of four C-wide
      bf16 rows (4 x 512 B): half the gathered bytes AND 4x fewer gather
      issues.  Quad addressing (clipped base + per-slot TRUE-corner weight
      re-derivation, zero-padding semantics preserved exactly) is the scheme
      proven in :func:`ms_deform_attn_core_quad`.

    Quantization error is bounded by absmax/254 per channel (~0.4% of the
    channel's max), applied to the ENCODER value stream only — callers keep
    the exact bf16 path for training and for checkpoint-exact eval
    (`MSDA_GATHER_QUANT=none`, and test.py --torch-checkpoint always runs
    exact mode).  Differential-tested in tests/test_deform_attn.py: lossless
    on integer-valued channels (scale 1.0) and within the int8 error bound
    on random inputs.

    value: (B, S, C) channel-packed, padding already zeroed.
    sampling_locations: (B, Q, L, P, 2) normalized, shared across heads.
    attention_weights: (B, Q, H, L, P) softmaxed over L*P.
    returns: (B, Q, C).
    """
    B, S, C = value.shape
    _, Q, L, P, _ = sampling_locations.shape
    H = num_heads
    D = C // H
    compute_dtype = value.dtype

    # symmetric per-channel int8: zeros stay exactly zero (padding rows and
    # the wrapped quad slots keep grid_sample zero-padding semantics)
    vf = value.astype(jnp.float32)
    scale = jnp.max(jnp.abs(vf), axis=(0, 1)) / 127.0  # (C,)
    scale = jnp.maximum(scale, 1e-20)
    vq = jnp.clip(jnp.round(vf / scale), -127.0, 127.0).astype(jnp.int8)

    # one flat quad table over all levels: row i = concat(v[i], v[i+1],
    # v[i+w], v[i+w+1]) with in-level rolls (wrapped rows are fetched but
    # receive zero slot weight)
    quad_segs = []
    idx_parts = []  # (B, Q, P) per level: level-local clipped base
    slotw_parts = []  # (B, Q, P, 4) f32 per level
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        seg = jax.lax.slice_in_dim(vq, start, start + h * w, axis=1)
        quad_segs.append(
            jnp.concatenate(
                [
                    seg,
                    jnp.roll(seg, -1, axis=1),
                    jnp.roll(seg, -w, axis=1),
                    jnp.roll(seg, -(w + 1), axis=1),
                ],
                axis=-1,
            )
        )  # (B, h*w, 4C)

        loc = sampling_locations[:, :, lvl].astype(jnp.float32)  # (B, Q, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        bx = jnp.clip(x0i, 0, max(w - 2, 0))
        by = jnp.clip(y0i, 0, max(h - 2, 0))
        idx_parts.append(start + by * w + bx)

        slot_ws = []
        for sy in (0, 1):
            py = by + sy
            wy = jnp.where(py == y0i, 1.0 - fy, jnp.where(py == y0i + 1, fy, 0.0))
            wy = jnp.where(py < h, wy, 0.0)
            for sx in (0, 1):
                px = bx + sx
                wx = jnp.where(px == x0i, 1.0 - fx, jnp.where(px == x0i + 1, fx, 0.0))
                wx = jnp.where(px < w, wx, 0.0)
                slot_ws.append(wx * wy)
        slotw_parts.append(jnp.stack(slot_ws, axis=-1))
        start += h * w

    quad_flat = jnp.concatenate(quad_segs, axis=1).reshape(B * S, 4 * C)
    bbase = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None, None]
    idx_all = jnp.stack(idx_parts, 2) + bbase  # (B, Q, L, P) flat incl. batch
    slotw_all = jnp.stack(slotw_parts, 2)  # (B, Q, L, P, 4)
    attn_t = attention_weights.astype(jnp.float32)  # (B, Q, H, L, P)

    def run_chunk(s0, s1):
        qc = s1 - s0
        g = quad_flat.at[idx_all[:, s0:s1].reshape(-1)].get(
            mode="promise_in_bounds"
        )
        g = g.reshape(B, qc, L, P, 4, C)
        sw = slotw_all[:, s0:s1]  # (B, qc, L, P, 4)
        if _Q8_REDUCE == "unrolled":
            sampled = None
            for s in range(4):
                term = g[:, :, :, :, s].astype(jnp.float32) * sw[..., s][..., None]
                sampled = term if sampled is None else sampled + term
        else:
            sampled = jnp.einsum(
                "bqlps,bqlpsc->bqlpc",
                sw.astype(compute_dtype),
                g.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
        sampled = sampled.reshape(B, qc, L, P, H, D)
        out_c = jnp.einsum(
            "bqhlp,bqlphd->bqhd",
            attn_t[:, s0:s1].astype(compute_dtype),
            sampled.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return out_c.reshape(B, qc, C)

    # same per-query gathered bytes as the quad-packed bf16 layout at half
    # the itemsize; reuse the shared-core HBM budget
    q_chunk = derive_q_chunk(B, Q, L, P, C, 1)
    if Q <= q_chunk:
        out = run_chunk(0, Q)
    else:
        out = jnp.concatenate(
            [run_chunk(s0, min(s0 + q_chunk, Q)) for s0 in range(0, Q, q_chunk)],
            axis=1,
        )
    # per-channel dequant once on the collapsed output
    out = out * scale[None, None, :]
    return out.astype(compute_dtype)


def deform_attn_numpy_spec(value, spatial_shapes, sampling_locations, attention_weights):
    """Slow numpy executable spec for differential testing (mirrors grid_sample
    semantics directly; independent of the JAX implementation above)."""
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    out = np.zeros((B, Q, H, D), dtype=np.float64)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start : start + h * w].reshape(B, h, w, H, D).astype(np.float64)
        for b in range(B):
            for q in range(Q):
                for hd in range(H):
                    for p in range(P):
                        lx, ly = sampling_locations[b, q, hd, lvl, p]
                        x = lx * w - 0.5
                        y = ly * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        acc = np.zeros(D)
                        for dy, wy in ((0, 1 - fy), (1, fy)):
                            for dx, wx in ((0, 1 - fx), (1, fx)):
                                cx, cy = x0 + dx, y0 + dy
                                if 0 <= cx < w and 0 <= cy < h:
                                    acc += wx * wy * v[b, cy, cx, hd]
                        out[b, q, hd] += attention_weights[b, q, hd, lvl, p] * acc
        start += h * w
    return out.reshape(B, Q, H * D)
