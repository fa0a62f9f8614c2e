"""Host-side sparse-plan pyramid for the brick/banded SECOND backbones.

Every integer plan the backbone builds on device — the L0 brick pack, the
per-level submanifold rulebooks, and the strided-downsample plans — is a
pure function of the L0 voxel coordinate set. This module computes the whole
pyramid in the data-loader threads by running the *same* jnp plan code
(ops/sparse_brick.py) on the CPU backend, so the shipped arrays are
bit-identical to what the device would have built, by construction. The
device then keeps only the differentiable feature math: pack scatter-add,
gathers, MXU contractions (models/backbones/scn.py consumes the plan dict).

This is the brick-engine analog of the reference's CPU-data-worker split
(det3d/datasets/pipelines/preprocess.py runs voxelization + target
assignment in workers while the GPU trains); spconv builds its rulebooks on
GPU (bevfusion/mmdet3d/ops/spconv/ops.py:45 get_indice_pairs) because
scalar hashing is cheap there — on TPU it is issue-bound, so it moves here.

Plan keys: ops/sparse_brick.HOST_PLAN_KEYS. Ships ~a few MB of int32 per
frame; H2D overlaps device compute in the loader prefetch.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

# the four strided downsamples of SpMiddleResNetFHD (reference
# det3d/models/backbones/scn.py:316-457): (kernel, stride, padding)
DOWNSAMPLE_SPECS = (
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
)


def _cpu_device():
    """The host CPU jax device, or None when the process's jax was pinned to
    a sole non-CPU platform (JAX_PLATFORMS=axon) — callers then skip the
    pyramid and fall back to device-side planning."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _pyramid_plan(vc, vv, *, shape, widths, caps, spatial, banded=False,
                  bands=(), dbands=(), fb_cap=256, bm=128):
    """Pure-jnp plan pyramid (runs on CPU under jit): dict of int32 arrays.

    banded=True additionally builds the per-level BandPlans (subm conv/pad +
    strided conv/pad) with the engine's own builders, symmetric=True (exact
    for predict, required for the reversed-tap train backward)."""
    import jax.numpy as jnp

    from ..ops import sparse_brick as spb
    from ..ops.banded import band_plan_arrays

    B = vc.shape[0]
    plans: Dict[str, jnp.ndarray] = {}
    lin0, row0 = spb.pack_plan_arrays(vc, vv, shape, widths[0], caps[0], spatial)
    plans["brick_row"], plans["brick_lin"] = row0, lin0

    def dummy_bb(lin, shp, bw):
        mb = lin.shape[1]
        return spb.BrickBatch(
            features=jnp.zeros((B, mb, bw), jnp.float32), brick_lin=lin,
            vmask=jnp.zeros((B, mb, bw), bool), shape=shp, bw=bw,
        )

    bb = dummy_bb(lin0, tuple(int(s) for s in shape), widths[0])
    for i, (kk, ss, pp) in enumerate(DOWNSAMPLE_SPECS):
        grid = spb.build_brick_grid(bb)
        rb_t = spb.subm_rulebook(bb, 3, grid)
        plans[f"rb{i}"] = spb.pack_host_rulebook(rb_t)
        dplan = spb.downsample_plan(
            bb, kk, ss, pp, widths[i + 1], caps[i + 1], grid, spatial=spatial)
        out_lin, idx_c, hit, out_shape = dplan[0], dplan[1], dplan[2], dplan[3]
        plans[f"ds{i + 1}_lin"] = out_lin
        plans[f"ds{i + 1}_idx"] = jnp.where(hit, idx_c, -1).astype(jnp.int32)
        if banded:
            rb_b = spb.subm_rulebook_banded(
                bb, 3, None, band=int(bands[i]), fb_cap=int(fb_cap),
                symmetric=True, bm=int(bm), rb=rb_t)
            plans.update(band_plan_arrays(rb_b.conv_plan, f"bp_rb{i}_conv_"))
            plans.update(band_plan_arrays(rb_b.pad_plan, f"bp_rb{i}_pad_"))
            # same knobs the engine passes: fb_cap*2 for the strided conv
            pad_p, conv_p = spb.downsample_band_plans(
                dplan, bb.brick_lin.shape[1], int(dbands[i]), int(bm),
                int(fb_cap) * 2, symmetric_pad=True)
            plans.update(band_plan_arrays(pad_p, f"bp_ds{i + 1}_pad_"))
            plans.update(band_plan_arrays(conv_p, f"bp_ds{i + 1}_conv_"))
        bb = dummy_bb(out_lin, out_shape, widths[i + 1])
    return plans


@functools.lru_cache(maxsize=8)
def _plan_fn(shape, widths, caps, spatial, banded, bands, dbands, fb_cap, bm):
    import jax

    return jax.jit(functools.partial(
        _pyramid_plan, shape=shape, widths=widths, caps=caps, spatial=spatial,
        banded=banded, bands=bands, dbands=dbands, fb_cap=fb_cap, bm=bm))


def compute_sparse_plans(
    coords_zyx: np.ndarray, valid: np.ndarray, sparse_shape,
    widths, caps, spatial: bool, banded_knobs: Optional[dict] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """Full plan pyramid for a batch of voxel coords, computed on host CPU.

    coords_zyx [B, M, 3] int32, valid [B, M]. banded_knobs (for the banded
    engine): {"band_widths", "down_bands", "fb_cap"[, "bm"]} — ships the
    BandPlans too. Returns {plan key: numpy} or None when no CPU jax backend
    exists in this process (pyramid then falls back to device planning).
    """
    import jax

    cpu = _cpu_device()
    if cpu is None:
        return None
    bk = banded_knobs or {}
    fn = _plan_fn(tuple(int(s) for s in sparse_shape),
                  tuple(int(w) for w in widths),
                  tuple(int(c) for c in caps), bool(spatial),
                  bool(bk), tuple(int(b) for b in bk.get("band_widths", ())),
                  tuple(int(b) for b in bk.get("down_bands", ())),
                  int(bk.get("fb_cap", 256)), int(bk.get("bm", 128)))
    vc = jax.device_put(np.ascontiguousarray(coords_zyx, np.int32), cpu)
    vv = jax.device_put(np.ascontiguousarray(valid, bool), cpu)
    with jax.default_device(cpu):
        out = fn(vc, vv)
    return {k: np.asarray(v) for k, v in out.items()}
