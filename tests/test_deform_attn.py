"""Differential tests for the deformable-attention sampling core.

Three-way check: JAX XLA implementation vs (a) the slow numpy spec and
(b) torch.nn.functional.grid_sample (the reference fallback's backbone,
/root/reference/models/bricks/ms_deform_attn.py:159-212), at the reference's
ONNX-verification tolerances (rtol 1e-3 / atol 1e-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from salience_detr_tpu.ops.deform_attn import (
    compute_sampling_locations,
    deform_attn_numpy_spec,
    ms_deform_attn_core,
    ms_deform_attn_core_shared,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane

SHAPES = [(8, 12), (4, 6), (2, 3)]
S = sum(h * w for h, w in SHAPES)


def make_inputs(seed, B=2, Q=7, H=2, D=4, P=3, loc_range=(-0.2, 1.2)):
    rng = np.random.default_rng(seed)
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = rng.uniform(*loc_range, size=(B, Q, H, len(SHAPES), P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, H, len(SHAPES), P)).astype(np.float32)
    w = w / w.sum(axis=(-2, -1), keepdims=True)
    return value, locs, w


def torch_msda(value, shapes, locs, weights):
    """Independent torch expression of the reference fallback via grid_sample."""
    B, S_, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    value = torch.tensor(value)
    locs = torch.tensor(locs)
    weights = torch.tensor(weights)
    splits = [h * w for h, w in shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lvl, (h, w) in enumerate(shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(B * H * D, 1, h, w)
        # expand grid per (head); grid_sample wants (N, Hout, Wout, 2)
        g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
        v2 = value_list[lvl].permute(0, 2, 3, 1).reshape(B * H, D, -1).reshape(B * H, D, h * w)
        v2 = v2.reshape(B * H, D, h, w)
        out = F.grid_sample(v2, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        sampled.append(out)  # (B*H, D, Q, P)
    attn = weights.permute(0, 2, 1, 3, 4).reshape(B * H, 1, Q, L * P)
    out = torch.stack(sampled, dim=-2).flatten(-2)  # (B*H, D, Q, L*P)
    out = (out * attn).sum(-1).view(B, H * D, Q).transpose(1, 2)
    return out.numpy()


class TestDeformAttnCore:
    def test_vs_numpy_spec(self):
        value, locs, w = make_inputs(0)
        got = np.asarray(ms_deform_attn_core(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        want = deform_attn_numpy_spec(value, SHAPES, locs, w)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_vs_torch_grid_sample(self):
        value, locs, w = make_inputs(1)
        got = np.asarray(ms_deform_attn_core(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        want = torch_msda(value, SHAPES, locs, w)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_out_of_bounds_zero(self):
        value, locs, w = make_inputs(2)
        locs_far = np.full_like(locs, 5.0)  # fully outside -> zeros
        got = np.asarray(
            ms_deform_attn_core(jnp.asarray(value), SHAPES, jnp.asarray(locs_far), jnp.asarray(w))
        )
        np.testing.assert_allclose(got, 0.0, atol=1e-6)

    def test_gradients_flow(self):
        value, locs, w = make_inputs(3, B=1, Q=3)

        def f(v, l, a):
            return jnp.sum(ms_deform_attn_core(v, SHAPES, l, a) ** 2)

        grads = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
        )
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(grads[0]).sum()) > 0

    def test_shared_core_matches_exact_with_equal_heads(self):
        # when all heads share locations, the TPU-native patch-gather core must
        # equal the exact per-head core
        B, Q, H, D, P = 2, 9, 2, 4, 3
        rng = np.random.default_rng(7)
        value = rng.normal(size=(B, S, H, D)).astype(np.float32)
        locs_shared = rng.uniform(-0.2, 1.2, size=(B, Q, len(SHAPES), P, 2)).astype(np.float32)
        w = rng.uniform(size=(B, Q, H, len(SHAPES), P)).astype(np.float32)
        w = w / w.sum(axis=(-2, -1), keepdims=True)

        locs_full = np.broadcast_to(
            locs_shared[:, :, None], (B, Q, H, len(SHAPES), P, 2)
        )
        want = np.asarray(
            ms_deform_attn_core(jnp.asarray(value), SHAPES, jnp.asarray(locs_full), jnp.asarray(w))
        )
        got = np.asarray(
            ms_deform_attn_core_shared(
                jnp.asarray(value.reshape(B, S, H * D)), SHAPES,
                jnp.asarray(locs_shared), jnp.asarray(w), H,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_shared_core_gradients(self):
        B, Q, H, D, P = 1, 5, 2, 4, 2
        rng = np.random.default_rng(8)
        value = jnp.asarray(rng.normal(size=(B, S, H * D)).astype(np.float32))
        locs = jnp.asarray(rng.uniform(0, 1, (B, Q, len(SHAPES), P, 2)).astype(np.float32))
        w = rng.uniform(size=(B, Q, H, len(SHAPES), P)).astype(np.float32)
        w = jnp.asarray(w / w.sum(axis=(-2, -1), keepdims=True))

        def f(v, l, a):
            return jnp.sum(ms_deform_attn_core_shared(v, SHAPES, l, a, H) ** 2)

        grads = jax.grad(f, argnums=(0, 1, 2))(value, locs, w)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(grads[0]).sum()) > 0

    def test_sampling_locations_point_and_box(self):
        B, Q, H, L, P = 1, 4, 2, 3, 2
        rng = np.random.default_rng(4)
        offsets = jnp.asarray(rng.normal(size=(B, Q, H, L, P, 2)).astype(np.float32))
        ref2 = jnp.asarray(rng.uniform(size=(B, Q, L, 2)).astype(np.float32))
        loc2 = compute_sampling_locations(ref2, offsets, SHAPES, P)
        # level 0 normalizer is (w=12, h=8)
        want = (
            np.asarray(ref2)[:, :, 0][:, :, None, None, :]
            + np.asarray(offsets)[:, :, :, 0] / np.array([12.0, 8.0])
        )
        np.testing.assert_allclose(np.asarray(loc2)[:, :, :, 0], want, atol=1e-6)

        ref4 = jnp.asarray(rng.uniform(size=(B, Q, L, 4)).astype(np.float32))
        loc4 = compute_sampling_locations(ref4, offsets, SHAPES, P)
        want4 = (
            np.asarray(ref4)[:, :, None, :, None, :2]
            + np.asarray(offsets) / P * np.asarray(ref4)[:, :, None, :, None, 2:] * 0.5
        )
        np.testing.assert_allclose(np.asarray(loc4), want4, atol=1e-6)


class TestQuadCore:
    """ms_deform_attn_core_quad must be numerically identical to the plain
    exact core (same corners/weights, quad-packed addressing)."""

    def test_matches_exact_core(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_quad

        value, locs, w = make_inputs(11)
        a = np.asarray(
            ms_deform_attn_core(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w))
        )
        b = np.asarray(
            ms_deform_attn_core_quad(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w))
        )
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)

    def test_fused_reduce_matches_default(self, monkeypatch):
        # MSDA_REDUCE=fused must be numerically equivalent (f32 register
        # accumulate vs f32-accumulated dots) in the quad core's level loop
        import salience_detr_tpu.ops.deform_attn as da

        value, locs, w = make_inputs(12)
        base = np.asarray(
            da.ms_deform_attn_core_quad(
                jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w))
        )
        monkeypatch.setattr(da, "_REDUCE_MODE", "fused")
        fused = np.asarray(
            da.ms_deform_attn_core_quad(
                jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w))
        )
        np.testing.assert_allclose(fused, base, rtol=1e-5, atol=1e-6)

    def test_matches_numpy_spec_at_borders(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_quad

        # stress the base-clamping/slot-reassignment: locations straddling
        # every border, plus far out-of-image points (zero contribution)
        value, _, w = make_inputs(12)
        rng = np.random.default_rng(13)
        locs = rng.uniform(-0.5, 1.5, size=(2, 7, 2, len(SHAPES), 3, 2)).astype(np.float32)
        locs[0, 0] = -3.0   # fully outside
        locs[0, 1] = 0.999  # bottom-right corner pixel
        locs[0, 2] = 0.001  # top-left corner pixel
        got = np.asarray(
            ms_deform_attn_core_quad(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w))
        )
        want = deform_attn_numpy_spec(value, SHAPES, locs, w)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_single_row_and_column_levels(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_quad

        # h==1 / w==1 levels: the quad's second row/col never exists, the
        # clip lower bound max(w-2, 0) must not go negative
        shapes = [(1, 5), (3, 1), (1, 1)]
        s = sum(h * w for h, w in shapes)
        rng = np.random.default_rng(14)
        value = rng.normal(size=(1, s, 2, 4)).astype(np.float32)
        locs = rng.uniform(-0.2, 1.2, size=(1, 5, 2, 3, 2, 2)).astype(np.float32)
        w = rng.uniform(size=(1, 5, 2, 3, 2)).astype(np.float32)
        w = w / w.sum(axis=(-2, -1), keepdims=True)
        got = np.asarray(
            ms_deform_attn_core_quad(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
        )
        want = deform_attn_numpy_spec(value, shapes, locs, w)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_gradients_match_exact_core(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_quad

        value, locs, w = make_inputs(15)

        def loss(core, v, l, a):
            return jnp.sum(core(v, SHAPES, l, a) ** 2)

        args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        g_exact = jax.grad(lambda v, l, a: loss(ms_deform_attn_core, v, l, a), (0, 1, 2))(*args)
        g_quad = jax.grad(lambda v, l, a: loss(ms_deform_attn_core_quad, v, l, a), (0, 1, 2))(*args)
        for ge, gq in zip(g_exact, g_quad):
            np.testing.assert_allclose(np.asarray(gq), np.asarray(ge), rtol=1e-4, atol=1e-5)


class TestQ8Core:
    """ms_deform_attn_core_shared_q8 (int8 quad-gather eval core): identical
    addressing/weights to the head-shared core, with per-channel symmetric
    int8 value quantization as the ONLY numerical difference.  On
    integer-valued channels with absmax 127 the quantization is lossless, so
    the core must match the f32 shared core exactly — that isolates the
    addressing (quad base clipping, slot weight re-derivation, level/batch
    offsets) from the quantization error."""

    @staticmethod
    def _shared_inputs(seed, B=2, Q=7, H=2, D=4, P=3, shapes=None,
                       loc_range=(-0.2, 1.2), integer_value=False):
        shapes = shapes or SHAPES
        s = sum(h * w for h, w in shapes)
        rng = np.random.default_rng(seed)
        C = H * D
        if integer_value:
            value = rng.integers(-127, 128, size=(B, s, C)).astype(np.float32)
            value[0, 0, :] = 127.0  # per-channel absmax exactly 127 -> scale 1.0
        else:
            value = rng.normal(size=(B, s, C)).astype(np.float32)
        locs = rng.uniform(*loc_range, size=(B, Q, len(shapes), P, 2)).astype(np.float32)
        w = rng.uniform(size=(B, Q, H, len(shapes), P)).astype(np.float32)
        w = w / w.sum(axis=(-2, -1), keepdims=True)
        return value, locs, w

    def test_lossless_matches_shared_core(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_shared_q8

        H = 2
        value, locs, w = self._shared_inputs(21, H=H, integer_value=True)
        a = np.asarray(ms_deform_attn_core_shared(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w), H))
        b = np.asarray(ms_deform_attn_core_shared_q8(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w), H))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)

    def test_lossless_matches_numpy_spec_at_borders(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_shared_q8

        # stress the quad base clamping at every border with lossless
        # quantization: semantics must match grid_sample zero padding exactly
        B, Q, H, D, P = 2, 9, 2, 4, 3
        value, _, w = self._shared_inputs(22, B=B, Q=Q, H=H, D=D, P=P,
                                          integer_value=True)
        rng = np.random.default_rng(23)
        locs = rng.uniform(-0.5, 1.5, size=(B, Q, len(SHAPES), P, 2)).astype(np.float32)
        locs[0, 0] = -3.0   # fully outside
        locs[0, 1] = 0.999  # bottom-right corner pixel
        locs[0, 2] = 0.001  # top-left corner pixel
        got = np.asarray(ms_deform_attn_core_shared_q8(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w), H))
        locs_full = np.broadcast_to(
            locs[:, :, None], (B, Q, H, len(SHAPES), P, 2)
        ).transpose(0, 1, 2, 3, 4, 5)
        want = deform_attn_numpy_spec(
            value.reshape(B, -1, H, D), SHAPES, locs_full, w
        ).reshape(B, Q, H * D)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_single_row_and_column_levels(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_shared_q8

        shapes = [(1, 5), (3, 1), (1, 1)]
        H, D, P = 2, 4, 2
        value, locs, w = self._shared_inputs(24, Q=5, H=H, D=D, P=P,
                                             shapes=shapes, integer_value=True)
        got = np.asarray(ms_deform_attn_core_shared_q8(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w), H))
        B = value.shape[0]
        locs_full = np.broadcast_to(
            locs[:, :, None], (B, 5, H, len(shapes), P, 2))
        want = deform_attn_numpy_spec(
            value.reshape(B, -1, H, D), shapes, locs_full, w
        ).reshape(B, 5, H * D)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_quantization_error_bound(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_shared_q8

        # random (non-integer) values: the output error per channel is bounded
        # by the rounding error scale[c]/2 (corner weights sum to <= 1 per
        # point, attention weights sum to 1 over L*P)
        H = 2
        value, locs, w = self._shared_inputs(25, H=H, integer_value=False)
        a = np.asarray(ms_deform_attn_core_shared(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w), H))
        b = np.asarray(ms_deform_attn_core_shared_q8(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w), H))
        scale = np.abs(value).max(axis=(0, 1)) / 127.0  # (C,)
        bound = scale[None, None, :] * 0.5 + 1e-5
        assert np.all(np.abs(b - a) <= bound), np.abs(b - a).max()

    def test_module_uses_q8_in_eval_when_enabled(self, monkeypatch):
        """MSDA_GATHER_QUANT=int8 routes the shared-mode module through the
        q8 core in eval (output differs from bf16-exact by at most the int8
        bound) and NEVER in training."""
        import salience_detr_tpu.models.bricks.attention as attn_mod

        rng = np.random.default_rng(26)
        B, Q, C = 1, 4, 16
        s = sum(h * w for h, w in SHAPES)
        module = attn_mod.MultiScaleDeformableAttention(
            embed_dim=C, num_levels=len(SHAPES), num_heads=2, num_points=2,
            shared_locations=True,
        )
        query = jnp.asarray(rng.normal(size=(B, Q, C)).astype(np.float32))
        ref = jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, len(SHAPES), 2)).astype(np.float32))
        value = jnp.asarray(rng.normal(size=(B, s, C)).astype(np.float32))
        params = module.init(jax.random.PRNGKey(0), query, ref, value, SHAPES)
        out_exact = module.apply(params, query, ref, value, SHAPES)

        monkeypatch.setenv("MSDA_GATHER_QUANT", "int8")
        out_q8 = module.apply(params, query, ref, value, SHAPES)
        out_train = module.apply(params, query, ref, value, SHAPES, train=True)
        # train path must be bit-identical to the unquantized eval path
        # (quad_scatter only changes the backward)
        np.testing.assert_allclose(
            np.asarray(out_train), np.asarray(out_exact), rtol=1e-5, atol=1e-6)
        # q8 eval path close to exact but not (generically) identical
        np.testing.assert_allclose(
            np.asarray(out_q8), np.asarray(out_exact), rtol=0.05, atol=0.05)


class TestQuadScatterGrad:
    """The quad-packed backward scatter (MSDA_QUAD_SCATTER=1, the default)
    must produce gradients identical to the plain autodiff backward
    (MSDA_QUAD_SCATTER=0) for the head-shared core — value, sampling
    locations, and attention weights alike."""

    def _grads(self, quad, seed, shapes, B=2, Q=6, P=2, H=2, C=8,
               loc_range=(-0.2, 1.2), special_locs=None):
        import os

        s = sum(h * w for h, w in shapes)
        rng = np.random.default_rng(seed)
        value = jnp.asarray(rng.normal(size=(B, s, C)).astype(np.float32))
        locs_np = rng.uniform(
            *loc_range, size=(B, Q, len(shapes), P, 2)
        ).astype(np.float32)
        if special_locs is not None:
            for (b, q), v in special_locs.items():
                locs_np[b, q] = v
        locs = jnp.asarray(locs_np)
        w = rng.uniform(size=(B, Q, H, len(shapes), P)).astype(np.float32)
        attn = jnp.asarray(w / w.sum(axis=(-2, -1), keepdims=True))

        assert os.environ.get("MSDA_QUAD_SCATTER", "1") == "1"

        def loss(v, l, a):
            out = ms_deform_attn_core_shared(v, shapes, l, a, H, quad_scatter=quad)
            # non-uniform cotangent so corner structure matters
            cot = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape)
            return jnp.vdot(out, jnp.sin(cot * 0.1)) + jnp.sum(out**2)

        return jax.value_and_grad(loss, (0, 1, 2))(value, locs, attn)

    def test_grads_match_autodiff(self):
        va, ga = self._grads(False, 21, SHAPES)
        vq, gq = self._grads(True, 21, SHAPES)
        np.testing.assert_allclose(float(vq), float(va), rtol=1e-6)
        for name, a, q in zip(("value", "locs", "attn"), ga, gq):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(a), rtol=1e-5, atol=1e-6,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grads_match_at_borders(self):
        # straddle every border + far-outside points: the slot routing must
        # send clipped-base contributions to the right pixels
        special = {
            (0, 0): -3.0, (0, 1): 3.0, (0, 2): 0.999, (0, 3): 0.001,
            (1, 0): -0.01, (1, 1): 1.01,
        }
        va, ga = self._grads(False, 22, SHAPES, loc_range=(-0.6, 1.6),
                             special_locs=special)
        vq, gq = self._grads(True, 22, SHAPES, loc_range=(-0.6, 1.6),
                             special_locs=special)
        np.testing.assert_allclose(float(vq), float(va), rtol=1e-6)
        for name, a, q in zip(("value", "locs", "attn"), ga, gq):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(a), rtol=1e-5, atol=1e-6,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grads_match_single_row_col_levels(self):
        shapes = [(1, 5), (3, 1), (1, 1)]
        va, ga = self._grads(False, 23, shapes)
        vq, gq = self._grads(True, 23, shapes)
        np.testing.assert_allclose(float(vq), float(va), rtol=1e-6)
        for name, a, q in zip(("value", "locs", "attn"), ga, gq):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(a), rtol=1e-5, atol=1e-6,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grads_match_both_reduce_modes(self, monkeypatch):
        # the MSDA_REDUCE knob selects between the einsum (default; the
        # unrolled form regressed the driver bench — see deform_attn.py),
        # unrolled, mulsum (elementwise stage 2), and fused (single-pass
        # multiply+reduce, round 5) formulations of BOTH the forward reduce
        # and the custom-VJP backward; each must match the autodiff backward
        # under the same mode
        import salience_detr_tpu.ops.deform_attn as da

        for mode in ("unrolled", "einsum", "mulsum", "fused"):
            monkeypatch.setattr(da, "_REDUCE_MODE", mode)
            va, ga = self._grads(False, 24, SHAPES)
            vq, gq = self._grads(True, 24, SHAPES)
            np.testing.assert_allclose(float(vq), float(va), rtol=1e-6)
            for name, a, q in zip(("value", "locs", "attn"), ga, gq):
                np.testing.assert_allclose(
                    np.asarray(q), np.asarray(a), rtol=1e-5, atol=1e-6,
                    err_msg=f"grad mismatch for {name} under MSDA_REDUCE={mode}",
                )


class TestGroupedCore:
    """ms_deform_attn_core_grouped: G sampling-location groups, each shared
    by H/G heads.  Spec = deform_attn_numpy_spec with each group's locations
    broadcast to its heads."""

    def _inputs(self, seed, B=2, Q=6, H=4, D=3, G=2, P=3, shapes=SHAPES,
                loc_range=(-0.2, 1.2)):
        s = sum(h * w for h, w in shapes)
        rng = np.random.default_rng(seed)
        value = rng.normal(size=(B, s, H * D)).astype(np.float32)
        locs_g = rng.uniform(
            *loc_range, size=(B, Q, G, len(shapes), P, 2)
        ).astype(np.float32)
        w = rng.uniform(size=(B, Q, H, len(shapes), P)).astype(np.float32)
        w = w / w.sum(axis=(-2, -1), keepdims=True)
        return value, locs_g, w

    def _spec(self, value, shapes, locs_g, w, H):
        B, s, C = value.shape
        G = locs_g.shape[2]
        D = C // H
        # broadcast group locations to their heads: head h uses group h//(H/G)
        locs_h = np.repeat(locs_g, H // G, axis=2)  # (B, Q, H, L, P, 2)
        return deform_attn_numpy_spec(value.reshape(B, s, H, D), shapes, locs_h, w)

    @pytest.mark.parametrize("G", [1, 2, 4])
    def test_matches_numpy_spec(self, G):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_grouped

        value, locs_g, w = self._inputs(21 + G, G=G)
        got = np.asarray(
            ms_deform_attn_core_grouped(
                jnp.asarray(value), SHAPES, jnp.asarray(locs_g), jnp.asarray(w), 4
            )
        )
        want = self._spec(value, SHAPES, locs_g, w, H=4)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_g_equals_h_matches_exact_core(self):
        value, locs_g, w = self._inputs(31, G=4)
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_grouped

        got = np.asarray(
            ms_deform_attn_core_grouped(
                jnp.asarray(value), SHAPES, jnp.asarray(locs_g), jnp.asarray(w), 4
            )
        )
        B, s, C = value.shape
        want = np.asarray(
            ms_deform_attn_core(
                jnp.asarray(value.reshape(B, s, 4, C // 4)), SHAPES,
                jnp.asarray(locs_g), jnp.asarray(w),
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_borders_and_outside(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_grouped

        value, locs_g, w = self._inputs(41, G=2, loc_range=(-0.5, 1.5))
        locs_g[0, 0] = -3.0
        locs_g[0, 1] = 0.999
        locs_g[0, 2] = 0.001
        got = np.asarray(
            ms_deform_attn_core_grouped(
                jnp.asarray(value), SHAPES, jnp.asarray(locs_g), jnp.asarray(w), 4
            )
        )
        want = self._spec(value, SHAPES, locs_g, w, H=4)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_single_row_col_levels(self):
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_grouped

        shapes = [(1, 5), (3, 1), (1, 1)]
        value, locs_g, w = self._inputs(43, G=2, shapes=shapes)
        got = np.asarray(
            ms_deform_attn_core_grouped(
                jnp.asarray(value), shapes, jnp.asarray(locs_g), jnp.asarray(w), 4
            )
        )
        want = self._spec(value, shapes, locs_g, w, H=4)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_gradients_match_broadcast_exact(self):
        """Autodiff through the grouped core == autodiff through the exact
        core with broadcast locations (group-location grads summed over the
        group's heads)."""
        from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_grouped

        H, G = 4, 2
        value, locs_g, w = self._inputs(53, H=H, G=G)
        B, s, C = value.shape

        def loss_grouped(v, lg, a):
            return jnp.sum(ms_deform_attn_core_grouped(v, SHAPES, lg, a, H) ** 2)

        def loss_exact(v, lg, a):
            lh = jnp.repeat(lg, H // G, axis=2)
            out = ms_deform_attn_core(v.reshape(B, s, H, C // H), SHAPES, lh, a)
            return jnp.sum(out ** 2)

        args = (jnp.asarray(value), jnp.asarray(locs_g), jnp.asarray(w))
        gg = jax.grad(loss_grouped, (0, 1, 2))(*args)
        ge = jax.grad(loss_exact, (0, 1, 2))(*args)
        for a, b in zip(gg, ge):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_chunked_matches_unchunked(self, monkeypatch):
        import salience_detr_tpu.ops.deform_attn as da

        value, locs_g, w = self._inputs(61, G=2)
        args = (jnp.asarray(value), SHAPES, jnp.asarray(locs_g), jnp.asarray(w), 4)
        full = np.asarray(da.ms_deform_attn_core_grouped(*args))
        monkeypatch.setattr(da, "_QUAD_GATHER_BUDGET_BYTES", 4096.0)
        chunked = np.asarray(da.ms_deform_attn_core_grouped(*args))
        np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-6)


class TestGroupedModule:
    """MultiScaleDeformableAttention with sampling_groups wired through."""

    def _module_inputs(self, seed, B=2, Q=5, C=8):
        rng = np.random.default_rng(seed)
        value = rng.normal(size=(B, S, C)).astype(np.float32)
        query = rng.normal(size=(B, Q, C)).astype(np.float32)
        ref = rng.uniform(0.2, 0.8, size=(B, Q, len(SHAPES), 2)).astype(np.float32)
        return jnp.asarray(query), jnp.asarray(ref), jnp.asarray(value)

    def test_groups_equal_heads_matches_exact_module(self):
        """sampling_groups=H and the legacy exact module share param shapes,
        init, and numerics — a checkpoint trained either way loads in both."""
        from salience_detr_tpu.models.bricks.attention import (
            MultiScaleDeformableAttention,
        )

        H = 4
        query, ref, value = self._module_inputs(71)
        exact = MultiScaleDeformableAttention(8, len(SHAPES), H, 2)
        grouped = MultiScaleDeformableAttention(
            8, len(SHAPES), H, 2, sampling_groups=H
        )
        variables = exact.init(
            {"params": jax.random.PRNGKey(0)}, query, ref, value, tuple(SHAPES)
        )
        a = exact.apply(variables, query, ref, value, tuple(SHAPES))
        b = grouped.apply(variables, query, ref, value, tuple(SHAPES))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)

    def test_groups_two_runs_and_differs_from_shared(self):
        from salience_detr_tpu.models.bricks.attention import (
            MultiScaleDeformableAttention,
        )

        query, ref, value = self._module_inputs(73)
        g2 = MultiScaleDeformableAttention(8, len(SHAPES), 4, 2, sampling_groups=2)
        variables = g2.init(
            {"params": jax.random.PRNGKey(0)}, query, ref, value, tuple(SHAPES)
        )
        out = g2.apply(variables, query, ref, value, tuple(SHAPES))
        assert out.shape == (2, 5, 8)
        assert np.isfinite(np.asarray(out)).all()
        # offsets head-dim is the group count
        k = variables["params"]["sampling_offsets"]["kernel"]
        assert k.shape == (8, 2 * len(SHAPES) * 2 * 2)


class TestDerivedChunking:
    """The MSDA query-chunk size is derived from shapes + an HBM budget
    (replacing the round-3 magic constant max_bq = 4 * 11403 that silently
    mis-sized any non-flagship canvas/embed-dim)."""

    def test_budget_bound_across_combos(self):
        from salience_detr_tpu.ops.deform_attn import (
            _GATHER_BUDGET_BYTES,
            derive_q_chunk,
        )

        combos = [
            # (B, Q, L, P, C, itemsize): flagship + 5-scale + small/odd shapes
            (4, 22400, 4, 4, 256, 2),
            (8, 22400, 4, 4, 256, 2),
            (1, 91000, 5, 4, 256, 2),
            (2, 7, 3, 2, 8, 4),
            (16, 300, 4, 4, 512, 4),
            (1, 1, 4, 4, 256, 2),
        ]
        for B, Q, L, P, C, it in combos:
            qc = derive_q_chunk(B, Q, L, P, C, it)
            assert 1 <= qc <= Q
            buf = B * qc * L * 4 * P * C * it
            if qc > 1:
                assert buf <= _GATHER_BUDGET_BYTES, (B, Q, L, P, C, it, buf)
            if qc < Q:
                # maximal: one more query per batch row would bust the budget
                assert B * (qc + 1) * L * 4 * P * C * it > _GATHER_BUDGET_BYTES

    def test_flagship_point_matches_known_good(self):
        from salience_detr_tpu.ops.deform_attn import derive_q_chunk

        # B=4, 800x1344 canvas, L=4/P=4/C=256 bf16: the derived chunk must be
        # within 1% of the round-3 measured-good 11403 (same compiled shape
        # class, no OOM, no extra serialization)
        qc = derive_q_chunk(4, 22400, 4, 4, 256, 2)
        assert abs(qc - 11403) / 11403 < 0.01, qc

    def test_quad_core_chunked_matches_unchunked(self, monkeypatch):
        import salience_detr_tpu.ops.deform_attn as da

        value, locs, w = make_inputs(31)
        args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        want = np.asarray(da.ms_deform_attn_core_quad(args[0], SHAPES, args[1], args[2]))
        # budget for ~3 queries per chunk at these shapes
        B, Q, L, P = 2, 7, len(SHAPES), 3
        C, it = 8, 4
        budget = float(B * 3 * L * 4 * P * C * it)
        monkeypatch.setattr(da, "_QUAD_GATHER_BUDGET_BYTES", budget)
        assert da.derive_q_chunk(B, Q, L, P, C, it, budget=budget) == 3
        got = np.asarray(da.ms_deform_attn_core_quad(args[0], SHAPES, args[1], args[2]))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_quad_core_chunked_grads_match_exact(self, monkeypatch):
        import salience_detr_tpu.ops.deform_attn as da

        value, locs, w = make_inputs(32)
        args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))

        def loss(core, v, l, a):
            return jnp.sum(core(v, SHAPES, l, a) ** 2)

        g_exact = jax.grad(
            lambda v, l, a: loss(ms_deform_attn_core, v, l, a), (0, 1, 2)
        )(*args)
        B, L, P, C, it = 2, len(SHAPES), 3, 8, 4
        monkeypatch.setattr(
            da, "_QUAD_GATHER_BUDGET_BYTES", float(B * 2 * L * 4 * P * C * it)
        )
        g_quad = jax.grad(
            lambda v, l, a: loss(da.ms_deform_attn_core_quad, v, l, a), (0, 1, 2)
        )(*args)
        for name, ge, gq in zip(("value", "locs", "attn"), g_exact, g_quad):
            np.testing.assert_allclose(
                np.asarray(gq), np.asarray(ge), rtol=1e-4, atol=1e-5,
                err_msg=f"chunked-quad grad mismatch for {name}",
            )

    def test_shared_core_chunked_matches_unchunked(self, monkeypatch):
        import salience_detr_tpu.ops.deform_attn as da

        rng = np.random.default_rng(33)
        B, Q, H, C, P = 2, 7, 2, 8, 3
        value = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32))
        locs = jnp.asarray(
            rng.uniform(-0.2, 1.2, size=(B, Q, len(SHAPES), P, 2)).astype(np.float32)
        )
        w = rng.uniform(size=(B, Q, H, len(SHAPES), P)).astype(np.float32)
        attn = jnp.asarray(w / w.sum(axis=(-2, -1), keepdims=True))
        want = np.asarray(
            da.ms_deform_attn_core_shared(value, SHAPES, locs, attn, H)
        )
        monkeypatch.setattr(
            da, "_GATHER_BUDGET_BYTES", float(B * 3 * len(SHAPES) * 4 * P * C * 4)
        )
        got = np.asarray(
            da.ms_deform_attn_core_shared(value, SHAPES, locs, attn, H)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
