"""AL experiment: temporal selector (reference counterpart: examples/active/cbgs_temporal.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="TemporalSelector",
    budget=4800,
    buffer_file="data/buffers/temporal.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_temporal"
