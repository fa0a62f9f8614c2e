"""AL experiment: random selector (reference counterpart: examples/active/cbgs_random.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="RandomSelector",
    budget=4800,
    buffer_file="data/buffers/random.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_random"
