"""Shared flax building blocks for sparse + dense model parts."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse_backend import SparseBatch


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid sparse voxels.

    The reference applies torch BatchNorm1d(eps=1e-3, momentum=0.01) to the
    dense [ΣM, C] voxel feature rows (det3d/models/backbones/scn.py:74-77);
    here features live in fixed-capacity padded arrays so statistics are
    masked means over (batch, voxel) — padding rows contribute nothing.
    Under pjit with the batch sharded, the sums become cross-replica
    automatically (XLA inserts the collectives), which is the SyncBN
    equivalent (reference det3d/ops/syncbn) for free.

    torch momentum 0.01 == flax-convention momentum 0.99.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if train:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            var = (jnp.square(x - mean) * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class BatchNorm2d(nn.Module):
    """Dense NHWC batch norm matching torch BN (eps 1e-3, momentum 0.01)."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=None,
        )(x)


def kaiming_conv_init():
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) ~ uniform with
    bound sqrt(1/fan_in) * sqrt(3) * gain; variance_scaling approximation."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class SubMConv(nn.Module):
    """Submanifold sparse conv layer; expects a prebuilt shared rulebook."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, sb: SparseBatch, rulebook) -> SparseBatch:
        from ..ops import sparse_backend as sp

        K = rulebook[0].shape[1]
        cin = sb.features.shape[-1]
        w = self.param("kernel", kaiming_conv_init(), (K, cin, self.features))
        out = sp.subm_conv(sb, w, rulebook=rulebook, kernel_size=self.kernel_size)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out.replace(features=jnp.where(out.valid[..., None], out.features + b, 0.0))
        return out


class SparseConvDown(nn.Module):
    """Strided sparse conv layer (new output active set)."""

    features: int
    kernel_size: tuple = (3, 3, 3)
    stride: tuple = (2, 2, 2)
    padding: tuple = (1, 1, 1)
    out_cap: int = 60000
    use_bias: bool = False

    @nn.compact
    def __call__(self, sb: SparseBatch) -> SparseBatch:
        from ..ops import sparse_backend as sp
        import numpy as np

        K = int(np.prod(self.kernel_size))
        cin = sb.features.shape[-1]
        w = self.param("kernel", kaiming_conv_init(), (K, cin, self.features))
        out = sp.sparse_conv_downsample(
            sb, w, self.kernel_size, self.stride, self.padding, self.out_cap
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out.replace(features=jnp.where(out.valid[..., None], out.features + b, 0.0))
        return out
