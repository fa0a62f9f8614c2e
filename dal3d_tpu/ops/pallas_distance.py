"""Pallas TPU kernel: blocked pairwise L1/L2 distance.

The N×N frame-distance map is the selectors' hot loop (SURVEY.md §5 calls it
this project's "blockwise attention"). The XLA gram-trick L2 is already
MXU-bound, but L1 (the reference's actual metric — see maps.feature_map) has
no matmul form: XLA materializes [block, M, C] broadcasts through HBM. This
kernel tiles both operands into VMEM and keeps the |xi - yj| reduction
on-chip, one [BN, BM] output tile per grid step.

Falls back to the jnp implementation off-TPU; correctness is tested in
interpret mode on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BN = 256
BM = 256


def _l1_kernel(x_ref, y_ref, o_ref):
    # x_ref [BN, C], y_ref [BM, C] -> o [BN, BM]
    x = x_ref[:]  # [BN, C]
    y = y_ref[:]  # [BM, C]
    acc = jnp.zeros((x.shape[0], y.shape[0]), jnp.float32)
    C = x.shape[1]
    CB = 128 if C % 128 == 0 else C

    def body(c, acc):
        xs = jax.lax.dynamic_slice(x, (0, c * CB), (x.shape[0], CB))
        ys = jax.lax.dynamic_slice(y, (0, c * CB), (y.shape[0], CB))
        d = jnp.abs(xs[:, None, :] - ys[None, :, :]).sum(-1)
        return acc + d

    acc = jax.lax.fori_loop(0, max(C // CB, 1), body, acc)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_l1_pallas(x: jnp.ndarray, y: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x [N, C], y [M, C] -> [N, M] L1 distances (N, M padded to block size)."""
    N, C = x.shape
    M = y.shape[0]
    pn, pm = (-N) % BN, (-M) % BM
    pc = (-C) % 128 if C > 128 else 0
    xp = jnp.pad(x, ((0, pn), (0, pc)))
    yp = jnp.pad(y, ((0, pm), (0, pc)))
    Np, Mp, Cp = xp.shape[0], yp.shape[0], xp.shape[1]

    out = pl.pallas_call(
        _l1_kernel,
        grid=(Np // BN, Mp // BM),
        in_specs=[
            pl.BlockSpec((BN, Cp), lambda i, j: (i, 0)),
            pl.BlockSpec((BM, Cp), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((BN, BM), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.float32),
        interpret=interpret,
    )(xp, yp)
    return out[:N, :M]


def _l2_kernel(x_ref, y_ref, o_ref):
    x = x_ref[:]
    y = y_ref[:]
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    xy = jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = jnp.sqrt(jnp.maximum(xx + yy - 2.0 * xy, 0.0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_l2_pallas(x: jnp.ndarray, y: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    N, C = x.shape
    M = y.shape[0]
    pn, pm = (-N) % BN, (-M) % BM
    pc = (-C) % 128 if C > 128 else 0
    xp = jnp.pad(x, ((0, pn), (0, pc)))
    yp = jnp.pad(y, ((0, pm), (0, pc)))
    Np, Mp, Cp = xp.shape[0], yp.shape[0], xp.shape[1]
    out = pl.pallas_call(
        _l2_kernel,
        grid=(Np // BN, Mp // BM),
        in_specs=[
            pl.BlockSpec((BN, Cp), lambda i, j: (i, 0)),
            pl.BlockSpec((BM, Cp), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((BN, BM), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.float32),
        interpret=interpret,
    )(xp, yp)
    return out[:N, :M]
