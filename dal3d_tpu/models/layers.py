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
            xf = x.astype(jnp.float32)
            mean = (xf * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            var = (jnp.square(xf - mean) * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        # fold stats into one multiply-add in the input dtype: big f32
        # elementwise intermediates on the dense grids would otherwise
        # dominate the training-step HBM footprint
        inv = jax.lax.rsqrt(var + self.epsilon)
        scale_eff = (scale * inv).astype(x.dtype)
        bias_eff = (bias - mean * scale * inv).astype(x.dtype)
        y = x * scale_eff + bias_eff
        return jnp.where(mask[..., None], y, jnp.zeros((), x.dtype))


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
            dtype=x.dtype,
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
    dtype: str = "float32"  # compute dtype; params stay f32, matmul accumulates f32

    @nn.compact
    def __call__(self, sb, rulebook=None):
        """sb: SparseBatch (gather engine), BrickBatch (brick engine), or
        (dense, occ) tuple (dense engine)."""
        from ..ops import sparse_backend as sp
        from ..ops import sparse_brick as spb
        from ..ops.dense_sparse import subm_conv_dense

        import numpy as _np

        cdt = jnp.dtype(self.dtype)
        if isinstance(sb, spb.BrickBatch):
            ks = (self.kernel_size,) * 3 if isinstance(self.kernel_size, int) else self.kernel_size
            K = int(_np.prod(ks))
            cin = sb.channels
            w = self.param("kernel", kaiming_conv_init(), (K, cin, self.features))
            if cdt != sb.features.dtype:
                sb = sb.replace(features=sb.features.astype(cdt))
            out = spb.subm_conv(sb, w.astype(cdt), rulebook=rulebook, kernel_size=self.kernel_size)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.features,))
                bias_row = jnp.tile(b.astype(cdt), out.bw)
                f = jnp.where(
                    jnp.repeat(out.vmask, self.features, axis=-1), out.features + bias_row, 0.0
                )
                out = out.replace(features=f)
            return out
        if isinstance(sb, tuple):
            dense, occ = sb
            cin = dense.shape[-1]
            ks = (self.kernel_size,) * 3 if isinstance(self.kernel_size, int) else self.kernel_size
            K = int(_np.prod(ks))
            w = self.param("kernel", kaiming_conv_init(), (K, cin, self.features))
            if cdt != dense.dtype:
                dense = dense.astype(cdt)
            # conv-level remat: the depth-sliced conv's pad/plane transients
            # are recomputed in backward instead of stored (coarser remat
            # still OOMs — each stage's backward would hold ~5 convs of
            # [B,D,H,W,C] grid transients at once)
            out = jax.checkpoint(
                lambda d, o, ww: subm_conv_dense(d, o, ww, self.kernel_size)
            )(dense, occ.astype(cdt), w)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.features,))
                out = (out + b.astype(cdt)) * occ[..., None].astype(cdt)
            return out, occ
        K = rulebook[0].shape[1]
        cin = sb.features.shape[-1]
        w = self.param("kernel", kaiming_conv_init(), (K, cin, self.features))
        if cdt != sb.features.dtype:
            sb = sb.replace(features=sb.features.astype(cdt))
        out = sp.subm_conv(sb, w.astype(cdt), rulebook=rulebook, kernel_size=self.kernel_size)
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
    dtype: str = "float32"
    out_bw: int = 0  # brick engine only: output brick width (0 = keep input's)
    banded: bool = False  # brick engine: banded MXU gather (ops.banded)
    band: int = 1024  # banded: slab rows per 128-row output block
    fb_cap: int = 512  # banded: out-of-band fallback capacity per tap

    @nn.compact
    def __call__(self, sb, grid=None, train: bool = True, plan=None,
                 band_arrays=None):
        from ..ops import sparse_backend as sp
        from ..ops import sparse_brick as spb
        from ..ops.dense_sparse import sparse_conv_down_dense
        import numpy as np

        K = int(np.prod(self.kernel_size))
        cdt = jnp.dtype(self.dtype)
        if isinstance(sb, spb.BrickBatch):
            cin = sb.channels
            w = self.param("kernel", kaiming_conv_init(), (K, cin, self.features))
            if cdt != sb.features.dtype:
                sb = sb.replace(features=sb.features.astype(cdt))
            if self.banded:
                out = spb.downsample_conv_banded(
                    sb, w.astype(cdt), self.kernel_size, self.stride, self.padding,
                    out_bw=self.out_bw or sb.bw, out_cap=self.out_cap,
                    band=self.band, fb_cap=self.fb_cap, grid=grid,
                    symmetric_pad=train, plan=plan, band_arrays=band_arrays,
                )
            else:
                out = spb.downsample_conv(
                    sb, w.astype(cdt), self.kernel_size, self.stride, self.padding,
                    out_bw=self.out_bw or sb.bw, out_cap=self.out_cap, grid=grid,
                    plan=plan,
                )
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.features,))
                bias_row = jnp.tile(b.astype(cdt), out.bw)
                f = jnp.where(
                    jnp.repeat(out.vmask, self.features, axis=-1), out.features + bias_row, 0.0
                )
                out = out.replace(features=f)
            return out
        if isinstance(sb, tuple):
            dense, occ = sb
            cin = dense.shape[-1]
            w = self.param("kernel", kaiming_conv_init(), (K, cin, self.features))
            if cdt != dense.dtype:
                dense = dense.astype(cdt)
            out, occ_out = jax.checkpoint(
                lambda d, o, ww: sparse_conv_down_dense(
                    d, o, ww, self.kernel_size, self.stride, self.padding
                )
            )(dense, occ.astype(cdt), w)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.features,))
                out = (out + b.astype(cdt)) * occ_out[..., None].astype(cdt)
            return out, occ_out
        cin = sb.features.shape[-1]
        w = self.param("kernel", kaiming_conv_init(), (K, cin, self.features))
        if cdt != sb.features.dtype:
            sb = sb.replace(features=sb.features.astype(cdt))
        out = sp.sparse_conv_downsample(
            sb, w.astype(cdt), self.kernel_size, self.stride, self.padding, self.out_cap,
            grid=grid,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out.replace(features=jnp.where(out.valid[..., None], out.features + b, 0.0))
        return out
