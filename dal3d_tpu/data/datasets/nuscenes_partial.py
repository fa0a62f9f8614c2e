"""Partial-label nuScenes variant for the estimator / partial-label AL
experiments (reference det3d/datasets/nuscenes/nuscenes_partial.py:30-140,
registered as ``NUSC_PART`` in det3d/datasets/dataset_factory.py:8).

The reference class subsets the info pool by an *active-learning buffer*
before the usual CBGS resample:

- ``active_flag == "start"`` (nuscenes_partial.py:80-95): draw the 10%
  random seed set (seeded by ``partial_seed``; an existing buffer is reused
  rather than overwritten, so resumes keep the recorded set), write it to
  ``active_buffer`` as ``{"partial_01": ids}``, and train on it.  The reference quirk — ``random.sample(range(num_sample),
  num_sample)`` permutes the *first* ``0.1 * len`` indices rather than
  sampling from the full pool — is replicated behind
  ``faithful_start=True`` (default False: sample from the whole pool, which
  is what the surrounding comment says it does).
- any other non-empty flag (:96-107): load ``active_buffer`` (JSON) and keep
  ``buffer[active_flag]``.
- empty / non-JSON buffer (:78-79): train on everything.

After subsetting, train mode applies the parent's CBGS class-balanced
resample and keeps ``frac = 0.25 * len(subset)`` for ``reset()``
(:109-133), so per-epoch resampling stays inside the labeled subset.

Extension kept from earlier rounds (no reference counterpart): a
``label_fraction`` knob that drops a per-frame fraction of GT *boxes*,
simulating box-level (rather than frame-level) annotation budgets.
"""
from __future__ import annotations

import random
from typing import Optional

import numpy as np

from ...utils.fileio import dump, load
from .nuscenes import NuScenesDataset


class NuScenesPartialDataset(NuScenesDataset):
    def __init__(
        self,
        *args,
        active_buffer: str = "",
        active_flag: str = "",
        sample_ratio: float = 0.1,
        faithful_start: bool = False,
        label_fraction: float = 1.0,
        partial_seed: int = 0,
        **kwargs,
    ):
        # consumed by load_infos, which the parent __init__ invokes
        self._active_buffer = active_buffer
        self._active_flag = active_flag
        self._sample_ratio = sample_ratio
        self._faithful_start = faithful_start
        self.label_fraction = label_fraction
        self.partial_seed = partial_seed
        super().__init__(*args, **kwargs)

    # ------------------------------------------------------------------
    def load_infos(self, info_path: str):
        import pickle

        with open(info_path, "rb") as f:
            all_infos = pickle.load(f)
        if isinstance(all_infos, dict):  # dict-of-splits: flatten first
            all_infos = [i for v in all_infos.values() for i in v]

        if not self._active_buffer.endswith(".json") or not self._active_flag:
            pass  # no buffer / no flag: train on the full pool (reference :78-79)
        elif self._active_flag == "start":
            import os

            if os.path.exists(self._active_buffer):
                # re-entry (resume / second construction): reuse the recorded
                # seed set instead of silently redrawing and overwriting it
                sample_ids = load(self._active_buffer)["partial_01"]
            else:
                rng = random.Random(self.partial_seed)
                num_sample = int(len(all_infos) * self._sample_ratio)
                if self._faithful_start:
                    # reference :87 — permutation of the first num_sample ids
                    sample_ids = rng.sample(range(num_sample), num_sample)
                else:
                    sample_ids = rng.sample(range(len(all_infos)), num_sample)
                dump({"partial_01": sample_ids}, self._active_buffer, indent=4)
            all_infos = [all_infos[i] for i in sample_ids]
        else:
            buffer = load(self._active_buffer)
            sample_ids = buffer[self._active_flag]
            all_infos = [all_infos[i] for i in sample_ids]

        self._set_infos(all_infos)

    # ------------------------------------------------------------------
    def get_sensor_data(self, idx: int, info: Optional[dict] = None):
        if info is None:
            info = self._nusc_infos[idx]
        if "gt_boxes" in info and self.label_fraction < 1.0:
            info = dict(info)
            n = len(info["gt_names"])
            rng = np.random.RandomState(self.partial_seed * 100003 + idx)
            keep = rng.rand(n) < self.label_fraction
            if n > 0 and not keep.any():
                keep[rng.randint(n)] = True
            info["gt_boxes"] = np.asarray(info["gt_boxes"])[keep]
            info["gt_names"] = np.asarray(info["gt_names"])[keep]
            if "gt_boxes_velocity" in info:
                info["gt_boxes_velocity"] = np.asarray(info["gt_boxes_velocity"])[keep]
            if "gt_boxes_token" in info:
                info["gt_boxes_token"] = np.asarray(info["gt_boxes_token"])[keep]
        return super().get_sensor_data(idx, info=info)
