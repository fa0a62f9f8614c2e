"""On-device linear sum assignment (Jonker-Volgenant shortest augmenting
path) for Hungarian matching inside jitted training steps.

The reference solves TransFusion's proposal<->GT matching with
scipy.optimize.linear_sum_assignment on host (bevfusion
mmdet3d/core/bbox/assigners/hungarian_assigner.py:120-124). Host callbacks
are unavailable on the axon TPU backend (and would serialize the train
step anyway), so this is a fixed-shape `lax` implementation of the same
O(G^2*P) augmenting-path algorithm: rows are the smaller side (G GT boxes),
columns the larger (P proposals). Row g's augmentation visits at most g+1
columns, each visit a vectorized O(P) relax step, so the whole solve is a
few thousand VPU ops for G<=64, P<=600.

Exactness: identical optimal cost to scipy (ties may resolve to a
different argmin but any optimum is a valid Hungarian match).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e30  # finite stand-in for +inf (keeps f32 arithmetic well-defined)


def linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Min-cost assignment of each row to a distinct column.

    cost: [G, P]. Returns col4row [G] int32: the column assigned to each
    row, or -1 when G > P and the row is one of the G-P left unmatched
    (scipy matches min(G, P) pairs on rectangular problems).

    Constant-valued rows (all entries equal) cannot change which columns the
    remaining rows take in an optimal solution, so callers may pad invalid
    rows with any LARGE constant and mask afterwards (large so that when
    rows outnumber columns, real rows win the scarce columns).
    """
    G, P = cost.shape
    if G > P:
        # solve the transposed problem (every column/former-row gets a match)
        row4col = linear_sum_assignment(cost.T)  # [P] -> row index
        return (
            jnp.full(G, -1, jnp.int32)
            .at[row4col]
            .set(jnp.arange(P, dtype=jnp.int32))
        )
    cost = cost.astype(jnp.float32)

    # 1-indexed bookkeeping with column 0 as the virtual source column:
    # p[j] = 1-indexed row assigned to column j (0 = free), potentials u/v.
    def solve_row(i, carry):
        u, v, p = carry
        p = p.at[0].set(i + 1)
        minv = jnp.full(P + 1, _BIG, jnp.float32)
        way = jnp.zeros(P + 1, jnp.int32)
        used = jnp.zeros(P + 1, bool)
        j0 = jnp.int32(0)

        def cond(s):
            j0, _, _, _, _, _, p, it = s
            return (p[j0] != 0) & (it <= i + 1)

        def body(s):
            j0, minv, way, used, u, v, p, it = s
            used = used.at[j0].set(True)
            i0 = p[j0]  # 1-indexed row whose edges we relax
            cur = jnp.concatenate(
                [jnp.full((1,), _BIG, jnp.float32), cost[i0 - 1] - u[i0] - v[1:]]
            )
            upd = (~used) & (cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used, _BIG, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u.at[jnp.where(used, p, 0)].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return j1, minv, way, used, u, v, p, it + 1

        j0, minv, way, used, u, v, p, _ = jax.lax.while_loop(
            cond, body, (j0, minv, way, used, u, v, p, jnp.int32(0))
        )

        # augment: walk predecessor columns back to the virtual source
        def aug_cond(s):
            j0, _ = s
            return j0 != 0

        def aug_body(s):
            j0, p = s
            j1 = way[j0]
            return j1, p.at[j0].set(p[j1])

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    u = jnp.zeros(G + 1, jnp.float32)
    v = jnp.zeros(P + 1, jnp.float32)
    p = jnp.zeros(P + 1, jnp.int32)
    u, v, p = jax.lax.fori_loop(0, G, solve_row, (u, v, p))

    # invert p: col4row[g] = j where p[j] == g+1
    rows = p[1:]  # [P] 1-indexed rows (0 = free column)
    idx = jnp.where(rows > 0, rows - 1, G)  # G = out of range -> dropped
    col4row = jnp.zeros(G, jnp.int32).at[idx].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop"
    )
    return col4row
