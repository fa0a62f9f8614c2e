"""Multihost utilities: single-process degradation + the padded pickle
all-gather logic exercised with a faked 3-process allgather (the world>1
branch was otherwise dead code in single-host CI — reference
det3d/utils/dist/dist_common.py:48-88 padding semantics)."""
import pickle
from unittest import mock

import numpy as np

from dal3d_tpu.parallel import dist as d


def test_single_process_passthrough():
    assert d.get_dist_info() == (0, 1)
    assert d.all_gather_objects({"a": 1}) == [{"a": 1}]
    d.synchronize()  # no-op

    calls = []

    @d.master_only
    def write():
        calls.append(1)
        return "wrote"

    assert write() == "wrote" and calls == [1]


def test_all_gather_objects_pads_to_max_size():
    """Fake 3 processes with differently-sized payloads: the pad-to-max +
    per-rank-size truncation must round-trip every object exactly."""
    objs = [
        {"rank": 0, "payload": list(range(50))},
        {"rank": 1},
        {"rank": 2, "blob": "x" * 257},
    ]
    payloads = [np.frombuffer(pickle.dumps(o), np.uint8) for o in objs]
    sizes = np.array([[p.size] for p in payloads], np.int64)
    maxl = int(sizes.max())

    class FakeMHU:
        @staticmethod
        def process_allgather(x):
            if x.dtype == np.int64:  # the size exchange
                return sizes
            # each fake process contributes ITS padded payload; rank 1 (the
            # caller) passes x through to check the caller-side padding too
            out = np.zeros((3, maxl), np.uint8)
            for i, p in enumerate(payloads):
                out[i, : p.size] = p
            np.testing.assert_array_equal(out[1], x)
            return out

    import jax.experimental.multihost_utils  # ensure the real module loaded
    import jax.experimental as jexp

    with mock.patch.object(d, "get_dist_info", return_value=(1, 3)), \
         mock.patch.object(jexp, "multihost_utils", FakeMHU), \
         mock.patch.dict("sys.modules",
                         {"jax.experimental.multihost_utils": FakeMHU}):
        gathered = d.all_gather_objects(objs[1])
    assert gathered == objs
