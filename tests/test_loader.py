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
