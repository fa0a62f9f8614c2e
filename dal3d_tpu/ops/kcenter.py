"""Greedy budget-capped farthest-point (k-center) selection — on device.

The shared selection kernel of every diversity selector (reference pattern at
det3d/selectors/spatial_temporal_selector.py:157-193): maintain
``fps_distances = min(fps_distances, D[last])``, pick argmax, accumulate the
annotation cost (cost_f per frame + cost_b per box), stop when the budget is
crossed (the crossing pick is NOT kept). The reference runs this as a python
loop over numpy rows; here it is a ``lax.while_loop`` whose body is one
argmax + one row-gather + one min — O(budget · N) on-device with zero host
sync, plus a feature-mode variant that computes distance rows on the fly
(never materializing N×N, SURVEY.md §5's "blockwise" requirement).

Exact reference semantics preserved, including the cost-accounting quirks:
- the first pick's cost is always paid (even if it already exceeds budget),
- subsequent picks: update fps with the last pick's row, argmax, pay cost,
  keep only if total cost <= budget, else stop.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -jnp.inf


@partial(jax.jit, static_argnames=("max_select",))
def kcenter_matrix(
    dist: jnp.ndarray,  # [N, N]
    frame_costs: jnp.ndarray,  # [N] = cost_f + cost_b * num_boxes
    budget: jnp.ndarray,  # scalar: remaining budget (current_budget - prior cost)
    init_fps: jnp.ndarray,  # [N] initial fps distances (inf if nothing selected)
    first_idx: jnp.ndarray,  # scalar int: first pick (argmax of init_fps or random)
    already: jnp.ndarray,  # [N] bool mask of previously selected (excluded)
    max_select: int,
):
    """Returns (selected [max_select] int32 padded with -1, count)."""
    N = dist.shape[0]

    def cond(s):
        fps, sel, count, cost, last, stop = s
        return (~stop) & (count < max_select)

    def body(s):
        fps, sel, count, cost, last, stop = s
        fps = jnp.minimum(fps, dist[last])
        fps = jnp.where(already, NEG, fps)
        fps = fps.at[last].set(NEG)
        nxt = jnp.argmax(fps)
        exhausted = ~jnp.isfinite(fps[nxt])  # pool empty: every candidate masked
        new_cost = cost + frame_costs[nxt]
        ok = (new_cost <= budget) & ~exhausted
        sel = jax.lax.cond(ok, lambda: sel.at[count].set(nxt.astype(jnp.int32)), lambda: sel)
        count = jnp.where(ok, count + 1, count)
        return fps, sel, count, jnp.where(ok, new_cost, cost), jnp.where(ok, nxt, last), ~ok

    fps0 = jnp.where(already, NEG, init_fps).at[first_idx].set(NEG)
    sel0 = jnp.full((max_select,), -1, jnp.int32).at[0].set(first_idx.astype(jnp.int32))
    cost0 = frame_costs[first_idx]
    state = (fps0, sel0, jnp.int32(1), cost0, first_idx, cost0 > budget)
    # note: reference keeps the first pick even when it exceeds budget only in
    # the no-prior-selection branch; with budget >= one frame this never binds.
    fps, sel, count, cost, last, stop = jax.lax.while_loop(cond, body, state)
    return sel, count, cost


@partial(jax.jit, static_argnames=("max_select", "metric"))
def kcenter_features(
    features: jnp.ndarray,  # [N, C]
    frame_costs: jnp.ndarray,
    budget: jnp.ndarray,
    init_fps: jnp.ndarray,
    first_idx: jnp.ndarray,
    already: jnp.ndarray,
    max_select: int,
    metric: str = "l2",
):
    """Streaming variant: distance rows computed on the fly (no N×N in HBM)."""
    N, C = features.shape

    def row(i):
        f = features[i]
        if metric == "l1":
            return jnp.abs(features - f[None, :]).sum(-1)
        d2 = jnp.sum((features - f[None, :]) ** 2, axis=-1)
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    def cond(s):
        fps, sel, count, cost, last, stop = s
        return (~stop) & (count < max_select)

    def body(s):
        fps, sel, count, cost, last, stop = s
        fps = jnp.minimum(fps, row(last))
        fps = jnp.where(already, NEG, fps)
        fps = fps.at[last].set(NEG)
        nxt = jnp.argmax(fps)
        exhausted = ~jnp.isfinite(fps[nxt])  # pool empty: every candidate masked
        new_cost = cost + frame_costs[nxt]
        ok = (new_cost <= budget) & ~exhausted
        sel = jax.lax.cond(ok, lambda: sel.at[count].set(nxt.astype(jnp.int32)), lambda: sel)
        count = jnp.where(ok, count + 1, count)
        return fps, sel, count, jnp.where(ok, new_cost, cost), jnp.where(ok, nxt, last), ~ok

    fps0 = jnp.where(already, NEG, init_fps).at[first_idx].set(NEG)
    sel0 = jnp.full((max_select,), -1, jnp.int32).at[0].set(first_idx.astype(jnp.int32))
    cost0 = frame_costs[first_idx]
    state = (fps0, sel0, jnp.int32(1), cost0, first_idx, cost0 > budget)
    fps, sel, count, cost, last, stop = jax.lax.while_loop(cond, body, state)
    return sel, count, cost


def kcenter_numpy(dist, frame_costs, budget, init_fps, first_idx, already):
    """Host oracle replicating the reference loop verbatim (for tests)."""
    import numpy as np

    fps = np.where(already, -np.inf, init_fps).astype(np.float64)
    sel = [int(first_idx)]
    cost = float(frame_costs[first_idx])
    fps[first_idx] = -np.inf
    last = int(first_idx)
    while True:
        fps = np.minimum(fps, dist[last])
        fps[np.asarray(already)] = -np.inf
        fps[last] = -np.inf
        nxt = int(np.argmax(fps))
        if not np.isfinite(fps[nxt]):
            break
        cost_next = cost + float(frame_costs[nxt])
        if cost_next > budget:
            break
        sel.append(nxt)
        cost = cost_next
        last = nxt
    return sel, cost
