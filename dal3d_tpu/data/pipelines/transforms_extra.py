"""Remaining mmdet3d pipeline stages (host side, numpy re-implementations).

These widen the BEVFusion dataset-machinery surface beyond the stages the
canonical configs exercise (reference
bevfusion/mmdet3d/datasets/pipelines/transforms_3d.py):

- FrameDropout            — transforms_3d.py:428 (drop whole prior sweeps by
  their time offset; the current sweep, offset 0, is always kept)
- PointSample             — transforms_3d.py:550 (random subsample to a fixed
  count, optional near/far split via ``sample_range``)
- BackgroundPointsFilter  — transforms_3d.py:652 (drop background points in
  the enlarged-but-not-original shell around each GT box)
- VoxelBasedPointSampler  — transforms_3d.py:710 (voxelize current/previous
  sweeps separately and keep <= max_num_points per voxel)
- ImagePad                — transforms_3d.py:847 (bottom/right zero pad to a
  fixed size or a size divisor)
- ImageDistort            — transforms_3d.py:921 (photometric distortion:
  brightness / contrast / saturation / hue / channel swap)

All stages use this package's ``(res, info) -> (res, info)`` contract with
points at ``res["lidar"]["points"]`` and images at
``res["camera"]["np_images"]`` (camera.py conventions).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ...core import box_np_ops
from ...core.voxel_generator import VoxelGenerator


class FrameDropout:
    """Randomly drop prior sweeps (distinct nonzero time offsets) whole."""

    def __init__(self, prob: float = 0.5, time_dim: int = -1,
                 rng: Optional[np.random.RandomState] = None):
        self.prob = prob
        self.time_dim = time_dim
        self.rng = rng or np.random.RandomState()

    def __call__(self, res: dict, info: dict):
        pts = res["lidar"]["points"]
        ts = pts[:, self.time_dim]
        keep_offsets = [o for o in np.unique(ts)
                        if o == 0 or self.rng.rand() > self.prob]
        res["lidar"]["points"] = pts[np.isin(ts, np.asarray(keep_offsets))]
        return res, info


class PointSample:
    """Subsample the cloud to ``num_points`` (with replacement only when the
    cloud is smaller). ``sample_range`` keeps all far points (depth > range,
    up to the budget) and samples the remainder from the near set."""

    def __init__(self, num_points: int, sample_range: Optional[float] = None,
                 replace: bool = False,
                 rng: Optional[np.random.RandomState] = None):
        self.num_points = num_points
        self.sample_range = sample_range
        self.replace = replace
        self.rng = rng or np.random.RandomState()

    def __call__(self, res: dict, info: dict):
        pts = res["lidar"]["points"]
        n = pts.shape[0]
        if n == 0:  # upstream filters can empty the cloud; nothing to sample
            return res, info
        replace = self.replace or n < self.num_points
        if self.sample_range is not None and not replace:
            depth = np.linalg.norm(pts[:, :3], axis=1)
            far = np.where(depth > self.sample_range)[0]
            near = np.where(depth <= self.sample_range)[0]
            if len(far) > self.num_points:
                far = self.rng.choice(far, self.num_points, replace=False)
            take = self.num_points - len(far)
            choice = np.concatenate(
                [far, self.rng.choice(near, take, replace=False)])
            self.rng.shuffle(choice)
        else:
            choice = self.rng.choice(n, self.num_points, replace=replace)
        res["lidar"]["points"] = pts[choice]
        return res, info


class BackgroundPointsFilter:
    """Drop points that fall inside GT boxes enlarged by
    ``bbox_enlarge_range`` but outside the original boxes (the ambiguous
    near-box shell)."""

    def __init__(self, bbox_enlarge_range):
        if isinstance(bbox_enlarge_range, (int, float)):
            bbox_enlarge_range = (float(bbox_enlarge_range),) * 3
        assert len(bbox_enlarge_range) == 3, bbox_enlarge_range
        # extra margin PER SIDE (mmdet3d transforms_3d.py BackgroundPointsFilter)
        self.enlarge = np.asarray(bbox_enlarge_range, np.float32)

    def __call__(self, res: dict, info: dict):
        pts = res["lidar"]["points"]
        boxes = np.asarray(res["lidar"]["annotations"]["gt_boxes"])
        if boxes.shape[0] == 0:
            return res, info
        big = boxes.copy()
        big[:, 3:6] = big[:, 3:6] + 2.0 * self.enlarge[None]
        # our box z is the BOTTOM face (points_in_rbbox origin (0.5,0.5,0)):
        # shift it down so the enlarged box extends below the object too
        big[:, 2] = big[:, 2] - self.enlarge[2]
        fg = box_np_ops.points_in_rbbox(pts, boxes).any(-1)
        fg_big = box_np_ops.points_in_rbbox(pts, big).any(-1)
        res["lidar"]["points"] = pts[~(fg_big & ~fg)]
        return res, info


class VoxelBasedPointSampler:
    """Voxel-sample current and previous sweeps separately: each sweep set is
    shuffled, voxelized with its own (voxel_size, range, max_num_points,
    max_voxels), and the surviving per-voxel points replace the cloud."""

    def __init__(self, cur_sweep_cfg: dict, prev_sweep_cfg: Optional[dict] = None,
                 time_dim: int = 4,  # [x,y,z,intensity,time] (loading.py)
                 rng: Optional[np.random.RandomState] = None):
        self.cur = VoxelGenerator(**cur_sweep_cfg)
        self.prev = VoxelGenerator(**prev_sweep_cfg) if prev_sweep_cfg else None
        if self.prev is not None:
            assert (prev_sweep_cfg["max_num_points"]
                    == cur_sweep_cfg["max_num_points"])
        self.time_dim = time_dim
        self.rng = rng or np.random.RandomState()

    def _sample(self, pts: np.ndarray, gen: VoxelGenerator) -> np.ndarray:
        voxels, _, npts = gen.generate(pts)
        keep = (np.arange(voxels.shape[1])[None, :] < npts[:, None])
        return voxels[keep]

    def __call__(self, res: dict, info: dict):
        pts = res["lidar"]["points"]
        cur_mask = pts[:, self.time_dim] == 0
        cur, prev = pts[cur_mask], pts[~cur_mask]
        self.rng.shuffle(cur)
        out = [self._sample(cur, self.cur)]
        if prev.shape[0] and self.prev is not None:
            self.rng.shuffle(prev)
            out.append(self._sample(prev, self.prev))
        elif prev.shape[0]:
            out.append(prev)
        res["lidar"]["points"] = np.concatenate(out, axis=0)
        return res, info


class ImagePad:
    """Pad images bottom/right to a fixed (h, w) or to a size divisor."""

    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None, pad_val: float = 0.0):
        assert (size is None) != (size_divisor is None), \
            "exactly one of size / size_divisor"
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def _pad(self, a: np.ndarray) -> np.ndarray:
        h, w = a.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = -(-h // d) * d, -(-w // d) * d
        assert th >= h and tw >= w, ((h, w), (th, tw))
        return np.pad(a, ((0, th - h), (0, tw - w)) + ((0, 0),) * (a.ndim - 2),
                      constant_values=self.pad_val)

    def __call__(self, res: dict, info: dict):
        cam = res["camera"]
        arrs = cam.get("np_images") or [np.asarray(i, np.float32)
                                        for i in cam["pil_images"]]
        cam["np_images"] = [self._pad(a) for a in arrs]
        return res, info


def _rgb_to_hsv(img: np.ndarray):
    """Vectorized RGB->HSV on float32 [0,255] images (H in degrees)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = img.max(-1)
    mn = img.min(-1)
    d = mx - mn
    safe = np.where(d == 0, 1.0, d)
    h = np.where(mx == r, (g - b) / safe % 6.0,
                 np.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = np.where(d == 0, 0.0, h) * 60.0
    s = np.where(mx == 0, 0.0, d / np.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    h = (h % 360.0) / 60.0
    c = v * s
    x = c * (1.0 - np.abs(h % 2.0 - 1.0))
    m = v - c
    z = np.zeros_like(c)
    idx = h.astype(np.int64) % 6
    rgb = np.stack([
        np.choose(idx, [c, x, z, z, x, c]),
        np.choose(idx, [x, c, c, x, z, z]),
        np.choose(idx, [z, z, x, c, c, x]),
    ], axis=-1)
    return rgb + m[..., None]


class ImageDistort:
    """Photometric distortion, each sub-op applied with probability 0.5:
    brightness shift, contrast scale (before or after the HSV ops), HSV
    saturation scale + hue shift, random channel swap. Operates on float32
    RGB images in [0, 255] (pre-normalize)."""

    def __init__(self, brightness_delta: float = 32.0,
                 contrast_range: Tuple[float, float] = (0.5, 1.5),
                 saturation_range: Tuple[float, float] = (0.5, 1.5),
                 hue_delta: float = 18.0,
                 rng: Optional[np.random.RandomState] = None):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta
        self.rng = rng or np.random.RandomState()

    def _one(self, img: np.ndarray) -> np.ndarray:
        rng = self.rng
        if rng.randint(2):
            img = img + rng.uniform(-self.brightness_delta,
                                    self.brightness_delta)
        contrast_first = bool(rng.randint(2))
        if contrast_first and rng.randint(2):
            img = img * rng.uniform(*self.contrast_range)
        do_sat, do_hue = bool(rng.randint(2)), bool(rng.randint(2))
        if do_sat or do_hue:
            h, s, v = _rgb_to_hsv(np.clip(img, 0, 255))
            if do_sat:
                s = np.clip(s * rng.uniform(*self.saturation_range), 0, 1)
            if do_hue:
                h = h + rng.uniform(-self.hue_delta, self.hue_delta)
            img = _hsv_to_rgb(h, s, v)
        if not contrast_first and rng.randint(2):
            img = img * rng.uniform(*self.contrast_range)
        if rng.randint(2):
            img = img[..., rng.permutation(3)]
        return np.clip(img, 0, 255).astype(np.float32)

    def __call__(self, res: dict, info: dict):
        if res.get("mode") != "train":
            return res, info
        cam = res["camera"]
        arrs = cam.get("np_images") or [np.asarray(i, np.float32)
                                        for i in cam["pil_images"]]
        cam["np_images"] = [self._one(a) for a in arrs]
        return res, info
