"""SECOND sparse middle backbone — flax re-design of the reference's
spconv-based SpMiddleResNetFHD / FPNSpMiddleResNetFHD
(det3d/models/backbones/scn.py:316-457).

Channel plan (matches reference):
  stem SubM(cin->16) -> 2x SparseBasicBlock(16) -> SparseConv s2 (16->32)
  -> 2x block(32) -> s2 (32->64)
  -> 2x block(64) -> s2 pad(0,1,1) (64->128)
  -> 2x block(128) -> k(3,1,1) s(2,1,1) (128->128)
  -> dense [B, H/8, W/8, 128*2]

SubM rulebooks are built once per level and shared across all SubM convs at
that level (spconv's ``indice_key`` reuse). The FPN variant returns the four
post-downsample sparse tensors (consumed by the active-learning feature
selectors, reference scn.py:376-392).
"""
from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse_backend as sp
from ...parallel.mesh import bev_constraint
from ..layers import MaskedBatchNorm, SparseConvDown, SubMConv
from ..registry import BACKBONES

# Single source for the brick-engine default knobs: this module's dataclass
# defaults, models/builder.build_detector and builder.host_voxelize_cfg (the
# loader-side pack plan) must agree — duplicated literals would let the host
# plan silently diverge from the backbone's packing.
BRICK_WIDTHS_DEFAULT = (16, 16, 8, 4, 4)
BRICK_CAPS_DEFAULT = (48000, 17000, 10000, 6000, 6000)
BAND_WIDTHS_DEFAULT = (768, 512, 512, 512, 512)
DOWN_BANDS_DEFAULT = (2048, 1024, 512, 512)
BANDED_CAPS_DEFAULT = (48000, 17024, 9984, 6016, 6016)


def brick_level_widths(W: int, widths) -> Tuple[int, ...]:
    """Per-level brick widths clamped to each level's W extent (the input
    level plus the 4 downsample outputs; stage3 strides depth only)."""
    wexts = (W, W // 2, W // 4, W // 8, W // 8)
    return tuple(min(int(b), max(we, 1)) for b, we in zip(widths, wexts))


def l0_brick_knobs(backbone_cfg: dict, W: int):
    """L0 pack knobs {bw, mb_cap, spatial} for a backbone config dict, with
    the same W-extent clamp FPNSpMiddleResNetFHD applies; None for
    non-brick engines. The one place the loader-side brick_pack_plan and the
    device pack derive their shared parameters from."""
    impl = str(backbone_cfg.get("impl", "gather"))
    if impl not in ("brick", "banded"):
        return None
    widths = brick_level_widths(
        int(W), backbone_cfg.get("brick_widths", BRICK_WIDTHS_DEFAULT))
    caps = tuple(
        int(c) for c in (
            backbone_cfg.get("banded_caps", BANDED_CAPS_DEFAULT)
            if impl == "banded"
            else backbone_cfg.get("brick_caps", BRICK_CAPS_DEFAULT)
        )
    )
    out = dict(bw=widths[0], mb_cap=caps[0], spatial=impl == "banded",
               widths=widths, caps=caps)
    if impl == "banded":
        # BandPlan knobs (must match the _BrickL0/_BrickStage call sites)
        out["banded_knobs"] = dict(
            band_widths=tuple(
                int(b) for b in backbone_cfg.get("band_widths", BAND_WIDTHS_DEFAULT)),
            down_bands=tuple(
                int(b) for b in backbone_cfg.get("down_bands", DOWN_BANDS_DEFAULT)),
            fb_cap=int(backbone_cfg.get("band_fb_cap", 256)),
        )
    return out


# rematerialized blocks for the dense engine: each stage's activations are
# recomputed in backward instead of stored (the [B,D,H,W,C] grids otherwise
# blow HBM: measured 37 GB of saved activations for the train step)
def _remat_stage():
    return nn.remat(_Stage, static_argnums=(2,))


def _remat_block():
    return nn.remat(SparseBasicBlock, static_argnums=(3,))


class _L0GatherSection(nn.Module):
    """Stem + 2 basic blocks + first downsample on the gather engine
    (factored out so the hybrid path can rematerialize it as one unit)."""

    out_cap: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, sb: sp.SparseBatch, train: bool) -> sp.SparseBatch:
        # the L0 index grid is 344 MB — build once, share between the SubM
        # rulebook and the downsample plan
        grid = None
        if hasattr(sp, "build_index_grid"):
            grid = sp.build_index_grid(sb)
        rb0 = sp.subm_rulebook(sb, 3, grid) if grid is not None else sp.subm_rulebook(sb, 3)
        x = SubMConv(16, use_bias=False, dtype=self.dtype)(sb, rb0)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        x = x.replace(features=nn.relu(f))
        x = SparseBasicBlock(16, dtype=self.dtype)(x, rb0, train)
        x = SparseBasicBlock(16, dtype=self.dtype)(x, rb0, train)
        x = SparseConvDown(32, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.out_cap, use_bias=False, dtype=self.dtype)(x, grid=grid)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        return x.replace(features=nn.relu(f))


class SparseBasicBlock(nn.Module):
    """Residual block of two SubM 3x3x3 convs (reference scn.py:54-97)."""

    planes: int
    dtype: str = "float32"
    # det3d blocks carry conv biases (reference det3d scn.py:54-97); the
    # bevfusion encoder's mmcv BasicBlock convs are bias-free
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, rulebook, train: bool):
        from ...ops.sparse_brick import BrickBatch

        if isinstance(x, BrickBatch):
            identity = x.features
            out = SubMConv(self.planes, use_bias=self.use_bias, dtype=self.dtype)(x, rulebook)
            f = nn.relu(MaskedBatchNorm()(out.feat4(), out.vmask, train))
            out = out.replace(features=f.reshape(out.features.shape))
            out = SubMConv(self.planes, use_bias=self.use_bias, dtype=self.dtype)(out, rulebook)
            f = MaskedBatchNorm()(out.feat4(), out.vmask, train)
            f = nn.relu(f.reshape(out.features.shape) + identity)
            f = jnp.where(jnp.repeat(out.vmask, self.planes, axis=-1), f, 0.0)
            return out.replace(features=f)
        if isinstance(x, tuple):
            dense, occ = x
            identity = dense
            mask = occ > 0
            out, _ = SubMConv(self.planes, use_bias=self.use_bias, dtype=self.dtype)((dense, occ))
            f = nn.relu(MaskedBatchNorm()(out, mask, train))
            out, _ = SubMConv(self.planes, use_bias=self.use_bias, dtype=self.dtype)((f, occ))
            f = MaskedBatchNorm()(out, mask, train)
            f = nn.relu(f + identity.astype(f.dtype)) * occ[..., None].astype(f.dtype)
            return f, occ
        identity = x.features
        out = SubMConv(self.planes, use_bias=self.use_bias, dtype=self.dtype)(x, rulebook)
        f = MaskedBatchNorm()(out.features, out.valid, train)
        f = nn.relu(f)
        out = out.replace(features=f)
        out = SubMConv(self.planes, use_bias=self.use_bias, dtype=self.dtype)(out, rulebook)
        f = MaskedBatchNorm()(out.features, out.valid, train)
        f = nn.relu(f + identity)
        f = jnp.where(out.valid[..., None], f, 0.0)
        return out.replace(features=f)


class _Stage(nn.Module):
    """N basic blocks at the current level, then a strided downsample."""

    planes: int
    out_planes: int
    num_blocks: int
    down_kernel: Tuple[int, int, int]
    down_stride: Tuple[int, int, int]
    down_padding: Tuple[int, int, int]
    out_cap: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        dense_mode = isinstance(x, tuple)
        if self.num_blocks > 0:
            rb = None if dense_mode else sp.subm_rulebook(x, 3)
            for _ in range(self.num_blocks):
                x = SparseBasicBlock(self.planes, dtype=self.dtype)(x, rb, train)
        x = SparseConvDown(
            self.out_planes,
            kernel_size=self.down_kernel,
            stride=self.down_stride,
            padding=self.down_padding,
            out_cap=self.out_cap,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        if dense_mode:
            dense, occ = x
            f = nn.relu(MaskedBatchNorm()(dense, occ > 0, train))
            return f * occ[..., None].astype(f.dtype), occ
        f = MaskedBatchNorm()(x.features, x.valid, train)
        return x.replace(features=nn.relu(f))


class _BrickL0(nn.Module):
    """Stem + 2 basic blocks + first downsample on the brick engine
    (one remat unit; the shared subm rulebook is rebuilt in backward).

    banded=True runs every conv through the banded MXU gather (ops.banded):
    subm rulebooks carry BandPlans shared across the level's convs, the
    downsample uses the banded strided kernel."""

    bw_out: int
    out_cap: int
    dtype: str = "float32"
    banded: bool = False
    band: int = 768
    down_band: int = 2048
    fb_cap: int = 256

    @nn.compact
    def __call__(self, bb, train: bool, plan=None):
        from ...ops import sparse_brick as spb

        plan = plan or {}
        host_rb = spb.unpack_host_rulebook(plan["rb0"]) if "rb0" in plan else None
        has_ds = "ds1_lin" in plan and host_rb is not None
        # grid is only needed for the plans the host did NOT ship
        grid = None if (host_rb is not None and has_ds) else spb.build_brick_grid(bb)
        if self.banded:
            rb = spb.subm_rulebook_banded(bb, 3, grid, band=self.band,
                                          fb_cap=self.fb_cap, symmetric=train,
                                          rb=host_rb,
                                          host_arrays=spb.plan_subdict(plan, "bp_rb0_"))
        else:
            rb = host_rb if host_rb is not None else spb.subm_rulebook(bb, 3, grid)
        x = SubMConv(16, use_bias=False, dtype=self.dtype)(bb, rb)
        f = nn.relu(MaskedBatchNorm()(x.feat4(), x.vmask, train))
        x = x.replace(features=f.reshape(x.features.shape))
        x = SparseBasicBlock(16, dtype=self.dtype)(x, rb, train)
        x = SparseBasicBlock(16, dtype=self.dtype)(x, rb, train)
        ds_plan = None
        if has_ds:
            ds_plan = spb.host_downsample_plan(
                x, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.bw_out,
                plan["ds1_lin"], plan["ds1_idx"], plan["rb0"])
        x = SparseConvDown(
            32, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.out_cap,
            use_bias=False, dtype=self.dtype, out_bw=self.bw_out,
            banded=self.banded, band=self.down_band, fb_cap=self.fb_cap * 2,
        )(x, grid=grid, train=train, plan=ds_plan,
          band_arrays=spb.plan_subdict(plan, "bp_ds1_") if ds_plan is not None else None)
        f = nn.relu(MaskedBatchNorm()(x.feat4(), x.vmask, train))
        return x.replace(features=f.reshape(x.features.shape))


class _BrickStage(nn.Module):
    """N basic blocks at the current level, then a strided downsample."""

    planes: int
    out_planes: int
    num_blocks: int
    down_kernel: Tuple[int, int, int]
    down_stride: Tuple[int, int, int]
    down_padding: Tuple[int, int, int]
    bw_out: int
    out_cap: int
    dtype: str = "float32"
    banded: bool = False
    band: int = 512
    down_band: int = 1024
    fb_cap: int = 256
    level: int = 1  # pyramid level of the INPUT (host plan keys rb{level}, ds{level+1}_*)

    @nn.compact
    def __call__(self, x, train: bool, plan=None):
        from ...ops import sparse_brick as spb

        plan = plan or {}
        rb_key, ds_key = f"rb{self.level}", f"ds{self.level + 1}"
        host_rb = (spb.unpack_host_rulebook(plan[rb_key])
                   if rb_key in plan else None)
        has_ds = f"{ds_key}_lin" in plan and host_rb is not None
        grid = None if (host_rb is not None and has_ds) else spb.build_brick_grid(x)
        if self.num_blocks > 0:
            if self.banded:
                rb = spb.subm_rulebook_banded(
                    x, 3, grid, band=self.band, fb_cap=self.fb_cap,
                    symmetric=train, rb=host_rb,
                    host_arrays=spb.plan_subdict(plan, f"bp_{rb_key}_"))
            else:
                rb = host_rb if host_rb is not None else spb.subm_rulebook(x, 3, grid)
            for _ in range(self.num_blocks):
                x = SparseBasicBlock(self.planes, dtype=self.dtype)(x, rb, train)
        ds_plan = None
        if has_ds:
            ds_plan = spb.host_downsample_plan(
                x, self.down_kernel, self.down_stride, self.down_padding,
                self.bw_out, plan[f"{ds_key}_lin"], plan[f"{ds_key}_idx"],
                plan[rb_key])
        x = SparseConvDown(
            self.out_planes, self.down_kernel, self.down_stride, self.down_padding,
            self.out_cap, use_bias=False, dtype=self.dtype, out_bw=self.bw_out,
            banded=self.banded, band=self.down_band, fb_cap=self.fb_cap * 2,
        )(x, grid=grid, train=train, plan=ds_plan,
          band_arrays=spb.plan_subdict(plan, f"bp_{ds_key}_") if ds_plan is not None else None)
        f = nn.relu(MaskedBatchNorm()(x.feat4(), x.vmask, train))
        return x.replace(features=f.reshape(x.features.shape))


class FPNSpMiddleResNetFHD(nn.Module):
    """Sparse backbone returning (dense BEV map, 4 intermediate sparse tensors).

    voxel_caps: static per-level active-site capacities after each downsample.
    brick_widths / brick_caps: per-level brick widths and active-brick
    capacities for impl="brick" (5 entries: input level + 4 downsample
    outputs); widths are clamped to each level's W extent.
    """

    num_input_features: int = 5
    voxel_caps: Sequence[int] = (60000, 60000, 30000, 30000)
    ds_factor: int = 8
    dtype: str = "float32"  # "bfloat16" halves HBM traffic on the hot path
    # "hybrid" (default): gather engine at the huge 0.14%-dense L0 grid,
    # dense-compute sparse-semantics from L1 down (the dense L0 working set
    # blows HBM; the dense L1+ kills the gather rulebook/plan costs);
    # "dense": dense everywhere (small grids only); "gather": rulebook
    # gather-GEMM everywhere (lowest memory; BEVFusion's 1440x1440 grid);
    # "brick": W-run brick packing (tools/microbench-tuned; fastest, round 2)
    impl: str = "hybrid"
    brick_widths: Sequence[int] = BRICK_WIDTHS_DEFAULT
    brick_caps: Sequence[int] = BRICK_CAPS_DEFAULT
    # banded engine (impl="banded"): per-level subm band widths, downsample
    # band widths, fallback capacity; caps must be multiples of 128
    band_widths: Sequence[int] = BAND_WIDTHS_DEFAULT
    down_bands: Sequence[int] = DOWN_BANDS_DEFAULT
    band_fb_cap: int = 256
    banded_caps: Sequence[int] = BANDED_CAPS_DEFAULT

    @nn.compact
    def __call__(self, sb: sp.SparseBatch, train: bool = False):
        if self.impl in ("brick", "banded"):
            from ...ops import sparse_brick as spb

            banded = self.impl == "banded"
            raw = isinstance(sb, tuple)  # (vf, vc zyx, valid, shape[, plan])
            D, H, W = sb[3] if raw else sb.shape
            # W extent per level: stage3 strides depth only, W stays at W/8
            ws = list(brick_level_widths(W, self.brick_widths))
            caps = [int(c) for c in (self.banded_caps if banded else self.brick_caps)]
            plan = sb[4] if raw and len(sb) >= 5 and sb[4] else None
            if plan is not None and "brick_row" in plan:
                # host-precomputed plan pyramid (data/sparse_plans.py) — must
                # have been built with this engine's (widths, caps, spatial)
                assert plan["brick_lin"].shape[1] == caps[0], (
                    f"host brick plan capacity {plan['brick_lin'].shape[1]} "
                    f"!= backbone L0 cap {caps[0]}"
                )
                bb = spb.from_voxels_planned(
                    sb[0], sb[1], sb[2], (D, H, W), bw=ws[0],
                    row=plan["brick_row"], brick_lin=plan["brick_lin"])
            elif raw:
                bb = spb.from_voxels(sb[0], sb[1], sb[2], (D, H, W), bw=ws[0],
                                     mb_cap=caps[0], spatial=banded)
            else:
                bb = spb.from_sparse(sb, bw=ws[0], mb_cap=caps[0],
                                     spatial=banded)
            bands = [int(b) for b in self.band_widths]
            dbands = [int(b) for b in self.down_bands]
            fbc = self.band_fb_cap
            # save the "sparse_plan"-named rulebook/plan tensors across the
            # remat boundary (int32/bool, small) so the backward pass reuses
            # them instead of re-running grid builds + compactions (host-
            # shipped plan arrays are jit inputs — always available anyway)
            plan_policy = jax.checkpoint_policies.save_only_these_names(
                "sparse_plan")
            # Default NO remat for brick/banded: the tables are compact
            # (~25 MB/conv at B=2, ~0.5 GB of activations total vs the dense
            # engine's 37 GB), so storing them costs nothing on a 16 GB chip
            # while the remat recompute cost a full forward in backward —
            # measured on chip at B=2 production scale: 339 ms/step with
            # remat vs 269 ms without (bwd 254 -> 183 ms). DAL3D_REMAT=1
            # restores remat for memory-constrained shapes (bigger B/caps).
            if os.environ.get("DAL3D_REMAT", "0") == "0":
                L0, Stage = _BrickL0, _BrickStage
            else:
                L0 = nn.remat(_BrickL0, static_argnums=(2,), policy=plan_policy)
                Stage = nn.remat(_BrickStage, static_argnums=(2,),
                                 policy=plan_policy)
            x = L0(ws[1], caps[1], dtype=self.dtype, name="l0", banded=banded,
                   band=bands[0], down_band=dbands[0], fb_cap=fbc)(bb, train, plan)
            middle = [x]
            x = Stage(32, 64, 2, (3, 3, 3), (2, 2, 2), (1, 1, 1), ws[2], caps[2],
                      dtype=self.dtype, name="stage1", banded=banded,
                      band=bands[1], down_band=dbands[1], fb_cap=fbc,
                      level=1)(x, train, plan)
            middle.append(x)
            x = Stage(64, 128, 2, (3, 3, 3), (2, 2, 2), (0, 1, 1), ws[3], caps[3],
                      dtype=self.dtype, name="stage2", banded=banded,
                      band=bands[2], down_band=dbands[2], fb_cap=fbc,
                      level=2)(x, train, plan)
            middle.append(x)
            x = Stage(128, 128, 2, (3, 1, 1), (2, 1, 1), (0, 0, 0), ws[4], caps[4],
                      dtype=self.dtype, name="stage3", banded=banded,
                      band=bands[3], down_band=dbands[3], fb_cap=fbc,
                      level=3)(x, train, plan)
            middle.append(x)
            dense = bev_constraint(spb.to_dense(x).astype(jnp.float32))
            return dense, middle
        if self.impl == "hybrid":
            from ...ops.dense_sparse import to_dense_grid

            # L0 on the gather engine (rematerialized as one unit)
            L0 = nn.remat(_L0GatherSection, static_argnums=(2,))
            x = L0(self.voxel_caps[0], dtype=self.dtype, name="l0")(sb, train)
            middle = [x]
            # L1+ dense
            dense, occ = to_dense_grid(x)
            x = (dense, occ)
            Stage = _remat_stage()
            x = Stage(32, 64, 2, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.voxel_caps[1], dtype=self.dtype, name="stage1")(x, train)
            middle.append(x)
            x = Stage(64, 128, 2, (3, 3, 3), (2, 2, 2), (0, 1, 1), self.voxel_caps[2], dtype=self.dtype, name="stage2")(x, train)
            middle.append(x)
            x = Stage(128, 128, 2, (3, 1, 1), (2, 1, 1), (0, 0, 0), self.voxel_caps[3], dtype=self.dtype, name="stage3")(x, train)
            middle.append(x)
            d, occ_f = x
            B, D, H, W, C = d.shape
            dense_out = bev_constraint(d.transpose(0, 2, 3, 4, 1).reshape(B, H, W, C * D).astype(jnp.float32))
            return dense_out, middle

        if self.impl == "dense":
            from ...ops.dense_sparse import to_dense_grid

            dense, occ = to_dense_grid(sb)
            x = (dense, occ)
            mask0 = occ > 0
            x, _ = SubMConv(16, use_bias=False, dtype=self.dtype)(x)
            f = nn.relu(MaskedBatchNorm()(x, mask0, train))
            x = (f * occ[..., None].astype(f.dtype), occ)
            x = SparseBasicBlock(16, dtype=self.dtype)(x, None, train)
            x = SparseBasicBlock(16, dtype=self.dtype)(x, None, train)
            x = SparseConvDown(32, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.voxel_caps[0], use_bias=False, dtype=self.dtype)(x)
            d1, o1 = x
            f = nn.relu(MaskedBatchNorm()(d1, o1 > 0, train))
            x = (f * o1[..., None].astype(f.dtype), o1)
            middle = [x]
            Stage = _remat_stage()
            x = Stage(32, 64, 2, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.voxel_caps[1], dtype=self.dtype, name="stage1")(x, train)
            middle.append(x)
            x = Stage(64, 128, 2, (3, 3, 3), (2, 2, 2), (0, 1, 1), self.voxel_caps[2], dtype=self.dtype, name="stage2")(x, train)
            middle.append(x)
            x = Stage(128, 128, 2, (3, 1, 1), (2, 1, 1), (0, 0, 0), self.voxel_caps[3], dtype=self.dtype, name="stage3")(x, train)
            middle.append(x)
            d, occ_f = x
            B, D, H, W, C = d.shape
            # [B,D,H,W,C] -> [B,H,W,C*D], channel = c*D + d (matches to_dense)
            dense_out = bev_constraint(d.transpose(0, 2, 3, 4, 1).reshape(B, H, W, C * D).astype(jnp.float32))
            return dense_out, middle

        # gather engine
        rb0 = sp.subm_rulebook(sb, 3)
        x = SubMConv(16, use_bias=False, dtype=self.dtype)(sb, rb0)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        x = x.replace(features=nn.relu(f))
        x = SparseBasicBlock(16, dtype=self.dtype)(x, rb0, train)
        x = SparseBasicBlock(16, dtype=self.dtype)(x, rb0, train)
        x = SparseConvDown(32, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.voxel_caps[0], use_bias=False, dtype=self.dtype)(x)
        f = MaskedBatchNorm()(x.features, x.valid, train)
        x = x.replace(features=nn.relu(f))
        middle = [x]

        x = _Stage(32, 64, 2, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.voxel_caps[1], dtype=self.dtype, name="stage1")(x, train)
        middle.append(x)
        x = _Stage(64, 128, 2, (3, 3, 3), (2, 2, 2), (0, 1, 1), self.voxel_caps[2], dtype=self.dtype, name="stage2")(x, train)
        middle.append(x)
        x = _Stage(128, 128, 2, (3, 1, 1), (2, 1, 1), (0, 0, 0), self.voxel_caps[3], dtype=self.dtype, name="stage3")(x, train)
        middle.append(x)

        dense = bev_constraint(sp.to_dense(x).astype(jnp.float32))  # [B, H/8, W/8, 128*D]
        return dense, middle


@BACKBONES.register_module
class SpMiddleResNetFHD(nn.Module):
    """Non-FPN variant: dense map only (reference scn.py:396-457)."""

    num_input_features: int = 5
    voxel_caps: Sequence[int] = (60000, 60000, 30000, 30000)
    ds_factor: int = 8

    @nn.compact
    def __call__(self, sb: sp.SparseBatch, train: bool = False):
        dense, _ = FPNSpMiddleResNetFHD(
            num_input_features=self.num_input_features,
            voxel_caps=self.voxel_caps,
            ds_factor=self.ds_factor,
        )(sb, train)
        return dense


BACKBONES.register_module(FPNSpMiddleResNetFHD)
