"""On-device batched linear-sum assignment (exact Hungarian matching).

The reference calls scipy's ``linear_sum_assignment`` per image inside the
loss (/root/reference/models/matcher/hungarian_matcher.py:80), forcing a
device->host sync per decoder layer per image.  Here the assignment runs
entirely on device via **successive shortest augmenting paths with
Bellman-Ford relaxation** — an exact min-cost matching:

* one augmentation per ground-truth box (static fori_loop over padded M);
* each shortest-path search is a Bellman-Ford fixpoint whose relaxation step
  is a dense (N x M) min-reduction — TPU-friendly vector work instead of the
  sequential heap of Dijkstra; paths alternate through matched gts so the
  fixpoint is reached in at most M+1 rounds (typically ~3);
* augmenting along a shortest path keeps the matching extreme (min-cost among
  matchings of its size), so the final matching is the exact optimum — the
  same optimum scipy returns, up to fp ties.

Convention matches the reference: cost is (num_queries, num_gt); every valid
gt column is assigned a distinct query row.  Padded gt columns
(``gt_valid`` False) are skipped and report -1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e15)
# improvements below this are fp32 ties; prevents fixpoint livelock
_TOL = 1e-6


def hungarian_assignment(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment for one (N_query, M_gt) cost matrix.

    Returns gt_to_query: (M,) int32 — matched query per gt, -1 for invalid gts.
    """
    cost = cost.astype(jnp.float32)
    N, M = cost.shape
    gt_ids = jnp.arange(M, dtype=jnp.int32)

    def augment(k, state):
        match_gt, match_q = state

        def do(state):
            match_gt, match_q = state
            d0 = cost[:, k]
            parent0 = jnp.full((N,), -1, jnp.int32)

            def bf_cond(c):
                _, _, changed, it = c
                return jnp.logical_and(changed, it <= M)

            def bf_body(c):
                d, parent, _, it = c
                matched = match_gt >= 0  # (M,)
                mq = jnp.where(matched, match_gt, 0)
                # cost of reaching gt i through its matched query, then on to q
                val = jnp.where(matched, d[mq] - cost[mq, gt_ids], _INF)  # (M,)
                cand = val[None, :] + cost  # (N, M)
                best = jnp.min(cand, axis=1)
                best_g = jnp.argmin(cand, axis=1).astype(jnp.int32)
                improve = best < d - _TOL
                return (
                    jnp.where(improve, best, d),
                    jnp.where(improve, best_g, parent),
                    jnp.any(improve),
                    it + 1,
                )

            d, parent, _, _ = lax.while_loop(
                bf_cond, bf_body, (d0, parent0, jnp.bool_(True), jnp.int32(0))
            )

            unmatched = match_q < 0
            q_star = jnp.argmin(jnp.where(unmatched, d, _INF)).astype(jnp.int32)

            def aug_body(_, s):
                match_gt, match_q, cur, done = s
                g = parent[cur]
                is_src = g < 0
                g_eff = jnp.where(is_src, jnp.int32(k), g)
                prev = match_gt[g_eff]
                match_gt2 = jnp.where(done, match_gt, match_gt.at[g_eff].set(cur))
                match_q2 = jnp.where(done, match_q, match_q.at[cur].set(g_eff))
                done2 = jnp.logical_or(done, is_src)
                cur2 = jnp.where(done2, cur, prev)
                return match_gt2, match_q2, cur2, done2

            match_gt, match_q, _, _ = lax.fori_loop(
                0, M + 1, aug_body, (match_gt, match_q, q_star, jnp.bool_(False))
            )
            return match_gt, match_q

        return lax.cond(gt_valid[k], do, lambda s: s, (match_gt, match_q))

    match_gt0 = jnp.full((M,), -1, jnp.int32)
    match_q0 = jnp.full((N,), -1, jnp.int32)
    match_gt, _ = lax.fori_loop(0, M, augment, (match_gt0, match_q0))
    return match_gt


def batched_assignment(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """vmapped assignment: cost (B, N, M), gt_valid (B, M) -> (B, M) int32."""
    return jax.vmap(hungarian_assignment)(cost, gt_valid)


def mixed_assignment(
    cost: jnp.ndarray, gt_valid: jnp.ndarray, gt_copy: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Align-DETR mixed assignment (/root/reference/models/matcher/
    hungarian_matcher.py:83-91): replicate the gt columns ``gt_copy`` times and
    solve ONE exact assignment, so each gt is matched to up to gt_copy
    distinct queries.  The reference's dynamic copy cap
    ``min(num_queries * 0.5 / num_gt, gt_copy)`` becomes a validity mask over
    the replica axis (static shapes).

    cost (N, M), gt_valid (M,) -> (match (gt_copy, M) int32 query per
    (copy, gt) with -1 for unused slots, copy_gt_valid (gt_copy, M) bool).
    """
    N, M = cost.shape
    num_valid = jnp.sum(gt_valid.astype(jnp.int32))
    allowed = jnp.minimum((N // 2) // jnp.maximum(num_valid, 1), gt_copy)
    copy_valid = jnp.arange(gt_copy, dtype=jnp.int32) < allowed  # (gt_copy,)
    tiled_valid = copy_valid[:, None] & gt_valid[None, :]  # (gt_copy, M)
    match = hungarian_assignment(
        jnp.tile(cost, (1, gt_copy)), tiled_valid.reshape(-1)
    )
    return match.reshape(gt_copy, M), tiled_valid


def batched_mixed_assignment(
    cost: jnp.ndarray, gt_valid: jnp.ndarray, gt_copy: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped: cost (B, N, M), gt_valid (B, M) ->
    ((B, gt_copy, M) int32, (B, gt_copy, M) bool)."""
    return jax.vmap(lambda c, v: mixed_assignment(c, v, gt_copy))(cost, gt_valid)


# Backwards-compatible alias (earlier revisions used an auction algorithm).
auction_assignment = hungarian_assignment
