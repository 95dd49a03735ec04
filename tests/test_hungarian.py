"""On-device auction assignment vs scipy's exact linear_sum_assignment.

Exactness matters (the assignment defines which queries get positive
gradients, SURVEY.md §7.3.2): we require the auction total cost to match the
scipy optimum to tight tolerance on random and DETR-like cost matrices."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from salience_detr_tpu.ops.hungarian import auction_assignment, batched_assignment


def total_cost(cost, gt_to_query, valid):
    c = 0.0
    used = set()
    for j in range(cost.shape[1]):
        if valid[j]:
            q = int(gt_to_query[j])
            assert q >= 0, "valid gt left unassigned"
            assert q not in used, "query assigned twice"
            used.add(q)
            c += cost[q, j]
    return c


class TestAuction:
    def test_random_square(self):
        rng = np.random.default_rng(0)
        for trial in range(5):
            N, M = 40, 40
            cost = rng.normal(size=(N, M)).astype(np.float32) * 10
            valid = np.ones(M, bool)
            got = np.asarray(auction_assignment(jnp.asarray(cost), jnp.asarray(valid)))
            r, c = linear_sum_assignment(cost)
            want = cost[r, c].sum()
            assert abs(total_cost(cost, got, valid) - want) < 1e-2

    def test_rectangular_with_padding(self):
        rng = np.random.default_rng(1)
        N, M = 120, 25
        cost = rng.uniform(-10, 30, size=(N, M)).astype(np.float32)
        valid = np.zeros(M, bool)
        valid[:17] = True
        got = np.asarray(auction_assignment(jnp.asarray(cost), jnp.asarray(valid)))
        r, c = linear_sum_assignment(cost[:, :17])
        want = cost[r, c].sum()
        assert abs(total_cost(cost, got, valid) - want) < 1e-2

    def test_detr_like_costs(self):
        # class cost ~[-2, 2]*2, l1 in [0, 4]*5, giou in [-1, 1]*2 over 900 queries
        rng = np.random.default_rng(2)
        N, M = 300, 12
        cost = (
            2 * rng.uniform(-2, 2, (N, M))
            + 5 * rng.uniform(0, 4, (N, M))
            + 2 * rng.uniform(-1, 1, (N, M))
        ).astype(np.float32)
        valid = np.ones(M, bool)
        got = np.asarray(auction_assignment(jnp.asarray(cost), jnp.asarray(valid)))
        r, c = linear_sum_assignment(cost)
        assert abs(total_cost(cost, got, valid) - cost[r, c].sum()) < 1e-2

    def test_no_valid_gt(self):
        cost = jnp.ones((10, 5))
        valid = jnp.zeros((5,), bool)
        got = np.asarray(auction_assignment(cost, valid))
        assert (got == -1).all()

    def test_batched(self):
        rng = np.random.default_rng(3)
        B, N, M = 3, 50, 10
        cost = rng.normal(size=(B, N, M)).astype(np.float32)
        valid = np.ones((B, M), bool)
        valid[1, 6:] = False
        got = np.asarray(batched_assignment(jnp.asarray(cost), jnp.asarray(valid)))
        for b in range(B):
            m = valid[b].sum()
            r, c = linear_sum_assignment(cost[b][:, :m])
            assert abs(total_cost(cost[b], got[b], valid[b]) - cost[b][r, c].sum()) < 1e-2


class TestMixedAssignment:
    """Align-DETR mixed assignment (reference hungarian_matcher.py:83-91)."""

    def test_matches_scipy_on_tiled_cost(self):
        from salience_detr_tpu.ops.hungarian import mixed_assignment

        rng = np.random.default_rng(3)
        N, M, C = 24, 4, 3
        cost = rng.normal(size=(N, M)).astype(np.float32)
        got, copy_valid = mixed_assignment(
            jnp.asarray(cost), jnp.ones((M,), bool), C
        )
        got = np.asarray(got)
        assert np.asarray(copy_valid).all()  # cap 24//2//4 = 3 >= C

        rows, cols = linear_sum_assignment(np.tile(cost, (1, C)))
        want_cost = cost[rows, cols % M].sum()
        have_cost = sum(cost[got[c, j], j] for c in range(C) for j in range(M))
        # every gt gets C distinct queries
        assert len(set(got.flatten().tolist())) == C * M
        np.testing.assert_allclose(have_cost, want_cost, rtol=1e-5)

    def test_copy_cap_mirrors_reference(self):
        from salience_detr_tpu.ops.hungarian import mixed_assignment

        # reference: gt_copy = min(int(num_queries * 0.5 / gt_size), gt_copy)
        rng = np.random.default_rng(4)
        N, M, C = 10, 3, 4
        cost = rng.normal(size=(N, M)).astype(np.float32)
        got, copy_valid = mixed_assignment(jnp.asarray(cost), jnp.ones((M,), bool), C)
        allowed = min(int(N * 0.5 / M), C)
        np.testing.assert_array_equal(
            np.asarray(copy_valid),
            np.broadcast_to(np.arange(C)[:, None] < allowed, (C, M)),
        )
        got = np.asarray(got)
        assert (got[allowed:] == -1).all()
        assert (got[:allowed] >= 0).all()

    def test_invalid_gts_skipped(self):
        from salience_detr_tpu.ops.hungarian import mixed_assignment

        rng = np.random.default_rng(5)
        cost = rng.normal(size=(16, 4)).astype(np.float32)
        valid = jnp.asarray([True, False, True, False])
        got, copy_valid = mixed_assignment(jnp.asarray(cost), valid, 2)
        got = np.asarray(got)
        assert (got[:, 1] == -1).all() and (got[:, 3] == -1).all()
        assert (got[:, 0] >= 0).all() and (got[:, 2] >= 0).all()
