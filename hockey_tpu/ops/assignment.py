"""Linear assignment on device: a Jacobi ("all bidders at once") auction
solver in pure XLA ops, for ByteTrack association inside jitted programs.

The host tracker (tracking/bytetrack.py:62-74) solves the same problem
with scipy/native Hungarian: minimize total (1 - IoU) over a dense
bipartite matrix, then reject matched pairs above the gate. This is the
device equivalent: maximize total IoU with an auction (Bertsekas 1988),
which fits XLA's static-shape model — each round is one (T, D) matrix of
vector ops inside a `lax.while_loop` with a fixed iteration bound, and a
greedy completion pass guarantees a maximal matching if the bound is hit.

Optimality: on convergence the matching is within n * eps of the
Hungarian optimum (eps-complementary slackness). Tracker IoU matrices
are sparse and peaked (a detection overlaps 1-3 track predictions), where
the auction converges in tens of rounds and tests show exact agreement
with scipy (tests/test_device_tracker.py). Dense near-tie matrices can
exhaust the round bound and fall back to greedy completion — acceptable
here because near-ties are, by construction, the cases where either
assignment is (near-)equally good.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def auction_match(
    benefit: jnp.ndarray,   # (T, D) — e.g. IoU
    row_ok: jnp.ndarray,    # (T,) bool
    col_ok: jnp.ndarray,    # (D,) bool
    eps: float = 2e-3,
    max_rounds: int = 96,
) -> jnp.ndarray:
    """Maximum-total-benefit bipartite matching.

    Returns (T,) int32: column assigned to each row, -1 = unmatched.
    Masked rows/columns never match. No gating here — callers reject
    low-benefit pairs afterwards (host-Hungarian semantics: solve the
    full matrix, then filter)."""
    t, d = benefit.shape
    b = jnp.where(row_ok[:, None] & col_ok[None, :],
                  benefit.astype(jnp.float32), _NEG)
    can = (b > _NEG / 2).any(axis=1)  # row has >= 1 admissible column

    prices = jnp.zeros((d,), jnp.float32)
    owner = jnp.full((d,), -1, jnp.int32)   # column -> row
    assign = jnp.full((t,), -1, jnp.int32)  # row -> column
    rows = jnp.arange(t)
    cols = jnp.arange(d, dtype=jnp.int32)
    # priced-out rows stop bidding: prices never fall, so a row whose best
    # value went non-positive can never profit again — unmatched pays 0,
    # and IoU >= 0 makes max-weight match gated-Hungarian semantics
    gave_up = ~can

    def cond(c):
        _, _, assign, gave_up, it = c
        return (it < max_rounds) & ((assign < 0) & ~gave_up).any()

    def body(c):
        prices, owner, assign, gave_up, it = c
        values = b - prices[None, :]
        j1 = jnp.argmax(values, axis=1)
        v1 = jnp.take_along_axis(values, j1[:, None], 1)[:, 0]
        v2 = jnp.max(values.at[rows, j1].set(_NEG), axis=1)
        v2 = jnp.maximum(v2, 0.0)  # unmatched is the outside option
        gave_up = gave_up | (v1 <= 0.0)
        bid = prices[j1] + (v1 - v2) + eps
        bidder = (assign < 0) & ~gave_up
        # each column takes the highest bid among this round's bidders
        bid_mat = jnp.where(
            bidder[:, None] & (j1[:, None] == cols[None, :]),
            bid[:, None], _NEG)
        best_bid = jnp.max(bid_mat, axis=0)
        best_row = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        won = best_bid > _NEG / 2
        # evict previous owners of re-auctioned columns
        assign = assign.at[jnp.where(won & (owner >= 0), owner, t)].set(
            -1, mode="drop")
        assign = assign.at[jnp.where(won, best_row, t)].set(
            jnp.where(won, cols, -1), mode="drop")
        owner = jnp.where(won, best_row, owner)
        prices = jnp.where(won, best_bid, prices)
        return prices, owner, assign, gave_up, it + 1

    prices, owner, assign, gave_up, _ = jax.lax.while_loop(
        cond, body, (prices, owner, assign, gave_up, jnp.asarray(0)))

    # greedy completion: pair leftover (unassigned row, unowned column)
    # admissible pairs by descending benefit so the matching is maximal
    # even if the round bound was hit (also mops up zero-benefit pairs,
    # which Hungarian would match and the caller's gate then rejects).
    # while_loop, not fori: after a converged auction there is usually
    # nothing left, and this runs inside the per-frame tracker scan —
    # a fixed min(t, d)-iteration loop would dominate the megastep
    resid = jnp.where((assign < 0)[:, None] & (owner < 0)[None, :], b, _NEG)

    def fill_cond(carry):
        resid, assign, it = carry
        return (it < min(t, d)) & (jnp.max(resid) > _NEG / 2)

    def fill(carry):
        resid, assign, it = carry
        flat = jnp.argmax(resid)
        i, j = flat // d, flat % d
        assign = assign.at[i].set(j.astype(jnp.int32))
        resid = resid.at[i, :].set(_NEG).at[:, j].set(_NEG)
        return resid, assign, it + 1

    _, assign, _ = jax.lax.while_loop(
        fill_cond, fill, (resid, assign, jnp.asarray(0)))
    return assign
