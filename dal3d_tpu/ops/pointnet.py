"""PointNet++-family point ops.

TPU-native (pure jnp, fixed-shape) replacements for the reference's CUDA
point ops: det3d/ops/pointnet2 (three_nn + three_interpolate),
bevfusion/mmdet3d/ops/{ball_query, knn, gather_points, group_points,
furthest_point_sample, interpolate}. All are brute-force distance kernels —
on TPU the N*M distance matrices are MXU work, no spatial structures needed
at these sizes (N, M <= a few thousand).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import pairwise_l2


def knn(query: jnp.ndarray, points: jnp.ndarray, k: int):
    """query [M, 3], points [N, 3] -> (dists [M, k], idx [M, k])."""
    d = pairwise_l2(query, points)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def three_nn(query: jnp.ndarray, points: jnp.ndarray):
    """3 nearest neighbors (reference pointnet2/src/interpolate.cpp)."""
    return knn(query, points, 3)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray, dists: jnp.ndarray):
    """Inverse-distance-weighted 3-NN feature propagation.

    features [N, C], idx [M, 3], dists [M, 3] -> [M, C].
    """
    w = 1.0 / jnp.maximum(dists, 1e-8)
    w = w / w.sum(axis=1, keepdims=True)
    return (features[idx] * w[..., None]).sum(axis=1)


def ball_query(query: jnp.ndarray, points: jnp.ndarray, radius: float, nsample: int):
    """Indices of up to nsample points within radius per query
    (reference mmdet3d/ops/ball_query); short groups repeat the first hit."""
    d = pairwise_l2(query, points)
    inside = d <= radius
    # rank inside points first (stable order by index), take nsample
    score = jnp.where(inside, -jnp.arange(points.shape[0])[None, :].astype(jnp.float32), -jnp.inf)
    _, idx = jax.lax.top_k(score, nsample)
    has = jnp.take_along_axis(inside, idx, axis=1)
    first = idx[:, :1]
    return jnp.where(has, idx, first), has.any(axis=1)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray):
    """[N, C], [M] -> [M, C]."""
    return points[idx]


def group_points(features: jnp.ndarray, idx: jnp.ndarray):
    """[N, C], [M, S] -> [M, S, C]."""
    return features[idx]


@partial(jax.jit, static_argnames=("n_samples",))
def furthest_point_sample(points: jnp.ndarray, n_samples: int):
    """Iterative FPS over [N, 3] -> idx [n_samples]
    (reference mmdet3d/ops/furthest_point_sample)."""
    N = points.shape[0]

    def body(carry, _):
        min_d, last = carry
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d)
        return (min_d, nxt), nxt

    init = (jnp.full((N,), jnp.inf), jnp.int32(0))
    (_, _), idx = jax.lax.scan(body, init, None, length=n_samples - 1)
    return jnp.concatenate([jnp.zeros((1,), idx.dtype), idx])
