"""Hungarian matching for mask classification, on device.

The reference matcher (``modeling/matcher.py:70-179``) builds a per-image cost matrix
(class + point-sampled sigmoid-CE + dice) and calls ``scipy.optimize.
linear_sum_assignment`` on CPU — a GPU->host sync per image per step. Here the costs
are computed batched on device and the assignment is solved by a Jonker-Volgonant
shortest-augmenting-path solver written in ``lax`` control flow (static shapes,
vmappable over the batch), so the train step stays a single XLA program.

Target representation (semantic segmentation): every train id 0..K-1 is a target slot;
``valid[b, t]`` marks classes present in the image. This matches the reference's
``np.unique``-derived per-image class list (``train_m2f.py:354-356``) with static
shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

BIG = 1e9


@jax.jit
def linear_sum_assignment(cost: jax.Array) -> jax.Array:
    """Solve min-cost assignment of R rows to C columns (R <= C).

    Args:
      cost: [R, C] cost matrix (finite).
    Returns:
      col4row: [R] assigned column per row (optimal, ties broken deterministically).

    Shortest-augmenting-path (Jonker-Volgenant) with dual potentials; O(R * C^2).
    """
    r, c = cost.shape
    assert r <= c, "needs rows <= cols"
    cost = cost.astype(jnp.float32)

    def solve_row(state, cur_row):
        u, v, col4row, row4col = state
        # Dijkstra over columns from cur_row.
        shortest = jnp.full((c,), jnp.inf, jnp.float32)
        parent_row = jnp.full((c,), cur_row, jnp.int32)
        visited = jnp.zeros((c,), bool)

        def cond(s):
            _, _, _, _, sink, _ = s
            return sink < 0

        def body(s):
            shortest, parent_row, visited, i, sink, minval = s
            reduced = cost[i] - u[i] - v + minval
            better = (reduced < shortest) & ~visited
            shortest = jnp.where(better, reduced, shortest)
            parent_row = jnp.where(better, i, parent_row)
            masked = jnp.where(visited, jnp.inf, shortest)
            j = jnp.argmin(masked)
            minval = masked[j]
            visited = visited.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt < 0, j, -1)
            i = jnp.where(nxt < 0, i, nxt)
            return shortest, parent_row, visited, i, sink, minval

        shortest, parent_row, visited, _, sink, minval = jax.lax.while_loop(
            cond, body, (shortest, parent_row, visited, cur_row, jnp.int32(-1), 0.0)
        )

        # Dual updates (scipy-style): u[cur_row] += minval; for other rows in the tree
        # u[i] += minval - shortest[col4row[i]]; for visited cols v[j] += shortest[j] - minval.
        u = u.at[cur_row].add(minval)
        in_tree_cols = visited & (row4col >= 0)
        delta = minval - shortest  # per column
        row_delta = jnp.zeros((r + 1,), jnp.float32).at[
            jnp.where(in_tree_cols, row4col, r)
        ].add(jnp.where(in_tree_cols, delta, 0.0))
        u = u + row_delta[:r]
        v = v + jnp.where(visited, -delta, 0.0)

        # Augment along alternating path ending at sink.
        def aug_cond(s):
            _, _, j, done = s
            return ~done

        def aug_body(s):
            col4row, row4col, j, _ = s
            i = parent_row[j]
            prev_j = col4row[i]
            row4col = row4col.at[j].set(i)
            col4row = col4row.at[i].set(j)
            done = i == cur_row
            return col4row, row4col, prev_j, done

        col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col4row, row4col, sink, False)
        )
        return (u, v, col4row, row4col), None

    init = (
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.full((c,), -1, jnp.int32),
    )
    (u, v, col4row, row4col), _ = jax.lax.scan(solve_row, init, jnp.arange(r))
    return col4row


def batch_sigmoid_ce_cost(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """[Q, P] logits x [T, P] binary targets -> [Q, T] mean BCE cost
    (reference ``batch_sigmoid_ce_loss``, matcher.py:38-62)."""
    p = inputs.shape[-1]
    pos = jax.nn.softplus(-inputs)  # BCE(inputs, 1)
    neg = jax.nn.softplus(inputs)  # BCE(inputs, 0)
    return (pos @ targets.T + neg @ (1.0 - targets).T) / p


def batch_dice_cost(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """[Q, P] logits x [T, P] targets -> [Q, T] dice cost
    (reference ``batch_dice_loss``, matcher.py:15-30)."""
    probs = jax.nn.sigmoid(inputs)
    numerator = 2.0 * (probs @ targets.T)
    denominator = probs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def compute_match_cost(
    pred_logits: jax.Array,  # [Q, K+1]
    out_points: jax.Array,  # [Q, P] point-sampled mask logits
    tgt_points: jax.Array,  # [T, P] point-sampled binary target masks
    valid: jax.Array,  # [T] bool
    cost_class_w: float,
    cost_mask_w: float,
    cost_dice_w: float,
    tgt_classes: jax.Array = None,  # [T] int class per slot (instance mode)
) -> jax.Array:
    """[Q, T] total matching cost; invalid targets get a large constant cost."""
    probs = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    t = tgt_points.shape[0]
    if tgt_classes is None:
        # semantic targets: slot t is class t
        cost_class = -probs[:, :t]
    else:
        # instance targets: slot t is class tgt_classes[t] (duplicates allowed,
        # reference matcher.py:118 ``-out_prob[:, tgt_ids]``); invalid (-1) slots
        # read class 0 and are masked to BIG below.
        cost_class = -probs[:, jnp.clip(tgt_classes, 0, probs.shape[1] - 1)]
    cost = (
        cost_class_w * cost_class
        + cost_mask_w * batch_sigmoid_ce_cost(out_points.astype(jnp.float32), tgt_points)
        + cost_dice_w * batch_dice_cost(out_points.astype(jnp.float32), tgt_points)
    )
    return jnp.where(valid[None, :], cost, BIG)


def match(
    pred_logits: jax.Array,  # [B, Q, K+1]
    out_points: jax.Array,  # [B, Q, P]
    tgt_points: jax.Array,  # [B, T, P]
    valid: jax.Array,  # [B, T]
    cost_class_w: float = 2.0,
    cost_mask_w: float = 5.0,
    cost_dice_w: float = 5.0,
    tgt_classes: jax.Array = None,  # [B, T] (instance mode)
) -> jax.Array:
    """Batched matching. Returns query index per target slot [B, T]."""

    def per_image(pl, op, tp, va, tc):
        cost = compute_match_cost(
            pl, op, tp, va, cost_class_w, cost_mask_w, cost_dice_w, tgt_classes=tc
        )
        return linear_sum_assignment(cost.T)  # rows = targets

    if tgt_classes is None:
        return jax.vmap(lambda pl, op, tp, va: per_image(pl, op, tp, va, None))(
            pred_logits, out_points, tgt_points, valid
        )
    return jax.vmap(per_image)(pred_logits, out_points, tgt_points, valid, tgt_classes)
