"""LSS depth view transform: image features + lidar depth -> BEV.

Re-design of bevfusion/mmdet3d/models/vtransforms/{base,depth_lss}.py:
- frustum creation + camera->lidar geometry (base.py:53-124),
- DepthLSSTransform (depth_lss.py:15-110): a depth branch consumes the
  rasterized lidar depth image, the depthnet predicts D depth bins + C
  context channels, outer product -> frustum features,
- splat via ops.bev_pool (scatter-add; replaces the bev_pool CUDA kernel
  used at base.py:158).

NHWC layout; image batch folds (B, N_cam) into the leading dim.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.bev_pool import bev_pool_batched
from ..layers import BatchNorm2d, kaiming_conv_init


def gen_dx_bx(xbound, ybound, zbound):
    dx = np.array([row[2] for row in (xbound, ybound, zbound)], np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in (xbound, ybound, zbound)], np.float32)
    nx = np.array(
        [round((row[1] - row[0]) / row[2]) for row in (xbound, ybound, zbound)], np.int64
    )
    return dx, bx, nx


def create_frustum(image_size, feature_size, dbound) -> np.ndarray:
    """[D, fH, fW, 3] of (u, v, depth) image-plane sample points
    (reference base.py:53-75)."""
    iH, iW = image_size
    fH, fW = feature_size
    ds = np.arange(*dbound, dtype=np.float32)
    D = ds.shape[0]
    xs = np.linspace(0, iW - 1, fW, dtype=np.float32)
    ys = np.linspace(0, iH - 1, fH, dtype=np.float32)
    frustum = np.stack(
        np.broadcast_arrays(
            xs[None, None, :], ys[None, :, None], ds[:, None, None]
        ),
        axis=-1,
    )
    return frustum  # [D, fH, fW, 3]


def get_geometry(
    frustum: jnp.ndarray,  # [D, fH, fW, 3]
    camera2lidar_rots: jnp.ndarray,  # [B, N, 3, 3]
    camera2lidar_trans: jnp.ndarray,  # [B, N, 3]
    intrins: jnp.ndarray,  # [B, N, 3, 3]
    post_rots: jnp.ndarray,  # [B, N, 3, 3]
    post_trans: jnp.ndarray,  # [B, N, 3]
) -> jnp.ndarray:
    """[B, N, D, fH, fW, 3] lidar-frame xyz (reference base.py:79-124)."""
    B, N = camera2lidar_trans.shape[:2]
    points = frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    points = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, points)
    points = jnp.concatenate(
        [points[..., :2] * points[..., 2:3], points[..., 2:3]], axis=-1
    )
    combine = jnp.einsum("bnij,bnjk->bnik", camera2lidar_rots, jnp.linalg.inv(intrins))
    points = jnp.einsum("bnij,bndhwj->bndhwi", combine, points)
    points = points + camera2lidar_trans[:, :, None, None, None, :]
    return points


def _splat(feats, cam_geom_args, image_size, feature_size, dbound,
           xbound, ybound, zbound):
    """Depth-weighted frustum features [B,N,D,fH,fW,C] -> BEV [B,ny,nx,C*nz]
    via the frustum geometry + scatter-add bev_pool (shared by both LSS
    transforms; reference base.py:128-158)."""
    B, N = feats.shape[:2]
    C = feats.shape[-1]
    frustum = jnp.asarray(create_frustum(image_size, feature_size, dbound))
    geom = get_geometry(frustum, *cam_geom_args)  # [B,N,D,fH,fW,3]
    dx, bx, nx = gen_dx_bx(xbound, ybound, zbound)
    coords = (geom - (jnp.asarray(bx) - jnp.asarray(dx) / 2.0)) / jnp.asarray(dx)
    coords = jnp.floor(coords).astype(jnp.int32)
    Np = int(np.prod(feats.shape[1:-1]))
    coords = coords.reshape(B, Np, 3)
    feats = feats.reshape(B, Np, C)
    valid = jnp.all((coords >= 0) & (coords < jnp.asarray(nx.astype(np.int32))), axis=-1)
    return bev_pool_batched(feats, coords, valid, int(nx[0]), int(nx[1]), int(nx[2]))


def _bev_downsample2x(bev, oc, train):
    """Stride-2 BEV downsample block (3 bias-free convs + BN + ReLU; must be
    called from inside a module's compact scope — submodule creation order
    defines the Conv_/BatchNorm2d_ names the checkpoint converter targets)."""
    bev = nn.relu(BatchNorm2d()(nn.Conv(oc, (3, 3), padding=1, use_bias=False,
                                        kernel_init=kaiming_conv_init())(bev), train))
    bev = nn.relu(BatchNorm2d()(nn.Conv(oc, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                                        kernel_init=kaiming_conv_init())(bev), train))
    return nn.relu(BatchNorm2d()(nn.Conv(oc, (3, 3), padding=1, use_bias=False,
                                         kernel_init=kaiming_conv_init())(bev), train))


class DepthLSSTransform(nn.Module):
    in_channels: int = 256
    out_channels: int = 80
    image_size: Tuple[int, int] = (256, 704)
    feature_size: Tuple[int, int] = (32, 88)
    xbound: Tuple[float, float, float] = (-54.0, 54.0, 0.3)
    ybound: Tuple[float, float, float] = (-54.0, 54.0, 0.3)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    dbound: Tuple[float, float, float] = (1.0, 60.0, 0.5)
    downsample: int = 2

    @property
    def D(self) -> int:
        return len(np.arange(*self.dbound))

    @nn.compact
    def __call__(self, img_feats, depth_img, camera2lidar_rots, camera2lidar_trans,
                 intrins, post_rots, post_trans, train: bool = False):
        """img_feats [B, N, fH, fW, C_in]; depth_img [B, N, iH, iW, 1]
        (rasterized lidar depth) -> BEV [B, ny, nx, out_channels]."""
        B, N, fH, fW, Cin = img_feats.shape
        D, C = self.D, self.out_channels

        # depth branch (reference dtransform: 1->8 1x1, 8->32 5x5/4, 32->64 5x5/2)
        d = depth_img.reshape(B * N, *depth_img.shape[2:])
        d = nn.relu(BatchNorm2d()(nn.Conv(8, (1, 1), kernel_init=kaiming_conv_init())(d), train))
        d = nn.relu(BatchNorm2d()(nn.Conv(32, (5, 5), strides=(4, 4), padding=2,
                                          kernel_init=kaiming_conv_init())(d), train))
        d = nn.relu(BatchNorm2d()(nn.Conv(64, (5, 5), strides=(2, 2), padding=2,
                                          kernel_init=kaiming_conv_init())(d), train))

        x = img_feats.reshape(B * N, fH, fW, Cin)
        x = jnp.concatenate([d, x], axis=-1)
        # depthnet
        x = nn.relu(BatchNorm2d()(nn.Conv(Cin, (3, 3), padding=1, kernel_init=kaiming_conv_init())(x), train))
        x = nn.relu(BatchNorm2d()(nn.Conv(Cin, (3, 3), padding=1, kernel_init=kaiming_conv_init())(x), train))
        x = nn.Conv(D + C, (1, 1), kernel_init=kaiming_conv_init())(x)

        depth = jax.nn.softmax(x[..., :D], axis=-1)  # [B*N, fH, fW, D]
        ctx = x[..., D:]  # [B*N, fH, fW, C]
        feats = depth[..., None] * ctx[..., None, :]  # [B*N, fH, fW, D, C]
        feats = feats.reshape(B, N, fH, fW, D, C).transpose(0, 1, 4, 2, 3, 5)  # [B,N,D,fH,fW,C]

        bev = _splat(feats,
                     (camera2lidar_rots, camera2lidar_trans, intrins, post_rots, post_trans),
                     self.image_size, self.feature_size, self.dbound,
                     self.xbound, self.ybound, self.zbound)
        # [B, ny, nx, C*nz]; nz=1 for the standard config

        if self.downsample > 1:
            assert self.downsample == 2
            bev = _bev_downsample2x(bev, self.out_channels, train)
        return bev


class LSSTransform(nn.Module):
    """Camera-only LSS view transform (reference vtransforms/lss.py:14-60):
    no lidar depth branch — a single 1x1 depthnet predicts D depth bins + C
    context channels from the image features alone; same frustum geometry,
    bev_pool splat and optional stride-2 BEV downsample block."""

    in_channels: int = 256
    out_channels: int = 80
    image_size: Tuple[int, int] = (256, 704)
    feature_size: Tuple[int, int] = (32, 88)
    xbound: Tuple[float, float, float] = (-54.0, 54.0, 0.3)
    ybound: Tuple[float, float, float] = (-54.0, 54.0, 0.3)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    dbound: Tuple[float, float, float] = (1.0, 60.0, 0.5)
    downsample: int = 2

    @property
    def D(self) -> int:
        return len(np.arange(*self.dbound))

    @nn.compact
    def __call__(self, img_feats, camera2lidar_rots, camera2lidar_trans,
                 intrins, post_rots, post_trans, train: bool = False):
        """img_feats [B, N, fH, fW, C_in] -> BEV [B, ny, nx, out_channels]."""
        B, N, fH, fW, Cin = img_feats.shape
        D, C = self.D, self.out_channels

        x = img_feats.reshape(B * N, fH, fW, Cin)
        x = nn.Conv(D + C, (1, 1), kernel_init=kaiming_conv_init())(x)
        depth = jax.nn.softmax(x[..., :D], axis=-1)
        ctx = x[..., D:]
        feats = depth[..., None] * ctx[..., None, :]
        feats = feats.reshape(B, N, fH, fW, D, C).transpose(0, 1, 4, 2, 3, 5)

        bev = _splat(feats,
                     (camera2lidar_rots, camera2lidar_trans, intrins, post_rots, post_trans),
                     self.image_size, self.feature_size, self.dbound,
                     self.xbound, self.ybound, self.zbound)

        if self.downsample > 1:
            assert self.downsample == 2
            bev = _bev_downsample2x(bev, self.out_channels, train)
        return bev
