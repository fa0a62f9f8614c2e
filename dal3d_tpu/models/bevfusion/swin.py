"""Swin Transformer (Tiny) camera backbone — flax.

Re-design of the reference's mmdet SwinTransformer
(bevfusion/mmdet3d/models/backbones/ + configs swint_v0p075: embed 96,
depths [2,2,6,2], heads [3,6,12,24], window 7, out_indices [1,2,3]).
Windowed W-MSA/SW-MSA with relative position bias, patch merging between
stages. NHWC; inputs padded to window multiples.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x, ws: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(windows, ws: int, B: int, H: int, W: int):
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws*ws, ws*ws]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [nW, ws*ws, C]
        nW, L, C = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * C, use_bias=True)(x).reshape(nW, L, 3, h, C // h)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [nW,h,L,d]
        scale = (C // h) ** -0.5
        attn = jnp.einsum("whld,whmd->whlm", q * scale, k)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = rpb_table[idx.reshape(-1)].reshape(L, L, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:  # [nW_img, L, L] shifted-window mask
            nW_img = mask.shape[0]
            attn = attn.reshape(-1, nW_img, h, L, L) + mask[None, :, None]
            attn = attn.reshape(nW, h, L, L)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whlm,whmd->whld", attn, v).transpose(0, 2, 1, 3).reshape(nW, L, C)
        return nn.Dense(C)(out)


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample
    (timm drop_path; reference swint drop_path_rate 0.2,
    configs/.../swint_v0p075/default.yaml:18)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, 0.0)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm()(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            # attention mask for wrapped windows
            img_mask = np.zeros((1, H, W, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift), slice(-self.shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -self.shift), slice(-self.shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
            mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            mask = None
        windows = window_partition(x, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws)(windows, mask)
        x = window_reverse(attn, ws, B, H, W)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        dp = DropPath(self.drop_path)
        x = shortcut + dp(x, train)
        y = nn.LayerNorm()(x)
        y = nn.Dense(int(C * self.mlp_ratio))(y)
        y = nn.gelu(y)
        y = nn.Dense(C)(y)
        return x + dp(y, train)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # odd feature maps (non-square images) pad to even, as the reference
        # Swin does before merging
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm()(x)
        return nn.Dense(2 * self.dim, use_bias=False)(x)


class SwinTransformer(nn.Module):
    """Swin-T by default; returns the feature maps at ``out_indices``."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    out_indices: Sequence[int] = (1, 2, 3)
    patch_size: int = 4
    # stochastic depth, linearly scaled over all blocks (reference
    # swint_v0p075/default.yaml:18 drop_path_rate 0.2)
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patch embed
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2, strides=(self.patch_size,) * 2)(x)
        x = nn.LayerNorm()(x)
        total = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total)
        outs = []
        dim = self.embed_dim
        blk = 0
        for i, depth in enumerate(self.depths):
            if i > 0:
                dim *= 2
                x = PatchMerging(dim // 2)(x)
            # pad to window multiples
            B, H, W, C = x.shape
            ws = self.window_size
            ph, pw = (-H) % ws, (-W) % ws
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            for d in range(depth):
                xp = SwinBlock(
                    dim, self.num_heads[i], ws, shift=0 if d % 2 == 0 else ws // 2,
                    drop_path=float(dpr[blk]),
                )(xp, train)
                blk += 1
            x = xp[:, :H, :W]
            if i in self.out_indices:
                outs.append(nn.LayerNorm()(x))
        return outs
