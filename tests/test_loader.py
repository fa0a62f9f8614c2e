"""DataLoader multi-worker prefetch: ordering, completeness, errors.

The reference overlaps host prep with device compute via 4 loader worker
subprocesses per GPU (torchie/apis/train.py:259-264, workers_per_gpu=4);
here worker THREADS build batches (numpy + CPU-jax release the GIL) and a
sequence-numbered reorder buffer keeps iteration order identical at any
worker count — required so seeded runs reproduce exactly.
"""
import numpy as np
import pytest

from dal3d_tpu.data.loader import DataLoader


class _Toy:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "metadata": {"token": str(i)}}


def _ids(loader):
    return [b["x"][:, 0].astype(int).tolist() for b in loader]


@pytest.mark.parametrize("num_workers", [1, 3])
def test_sequential_order_and_tail_padding(num_workers):
    out = _ids(DataLoader(_Toy(10), 4, shuffle=False, drop_last=False,
                          num_workers=num_workers))
    assert out == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 9, 9]]


def test_worker_count_does_not_change_shuffled_order():
    a = _ids(DataLoader(_Toy(23), 4, shuffle=True, seed=7, num_workers=1))
    b = _ids(DataLoader(_Toy(23), 4, shuffle=True, seed=7, num_workers=4))
    assert a == b


def test_worker_exception_propagates():
    class Bad(_Toy):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return super().__getitem__(i)

    with pytest.raises(ValueError, match="boom"):
        list(DataLoader(Bad(16), 4, shuffle=False, num_workers=3))


def test_more_workers_than_batches():
    out = _ids(DataLoader(_Toy(4), 4, shuffle=False, drop_last=False,
                          num_workers=8))
    assert out == [[0, 1, 2, 3]]


# ---------------------------------------------------------------------------
# val-mode sweep-read cap (LoadPointCloudFromFile.max_points)
# ---------------------------------------------------------------------------
def _synthetic_val_dataset(tmp_path, max_points, shuffle_points=False,
                           points_per_frame=4000):
    from dal3d_tpu.data import NuScenesDataset
    from dal3d_tpu.data.datasets.synthetic import make_synthetic_nuscenes

    info_path = make_synthetic_nuscenes(
        str(tmp_path), n_frames=3, points_per_frame=points_per_frame)
    pipeline = [
        dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
        dict(type="LoadPointCloudAnnotations", with_bbox=True),
        dict(type="Preprocess", cfg=dict(mode="val", shuffle_points=shuffle_points)),
        dict(type="ReformatFixedShape"),
    ]
    return NuScenesDataset(
        info_path=info_path, nsweeps=10, class_names=["car"],
        pipeline=pipeline, tasks=[dict(num_class=1, class_names=["car"])],
        max_points=max_points, test_mode=True)


def test_sweep_read_cap_bit_identical(tmp_path):
    """Early-stopping the sweep reads at max_points must reproduce the
    uncapped read + fixed-shape truncation exactly (same RNG stream)."""
    cap = 9000  # keyframe (4000) + ~1.25 sweeps
    ds = _synthetic_val_dataset(tmp_path / "a", cap)
    load = ds.pipeline[0]
    assert load.max_points == cap  # wired: every stage is order-preserving

    np.random.seed(123)
    capped = ds[1]
    load.max_points = None  # disable: full read, truncation at Reformat
    np.random.seed(123)
    full = ds[1]
    np.testing.assert_array_equal(capped["points"], full["points"])
    np.testing.assert_array_equal(capped["points_valid"], full["points_valid"])
    assert capped["points_valid"].sum() == cap  # the cap actually bound


def test_sweep_read_cap_disabled_by_shuffling_stage(tmp_path):
    """A point-shuffling stage after the load makes early truncation unsound
    (the shuffle samples from ALL read points): the cap must stay unwired."""
    ds = _synthetic_val_dataset(tmp_path / "b", 9000, shuffle_points=True)
    assert ds.pipeline[0].max_points is None
