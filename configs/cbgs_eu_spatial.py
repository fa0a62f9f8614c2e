"""AL experiment: eu_spatial selector (reference counterpart: examples/active/cbgs_eu_spatial.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="EuSpatialSelector",
    logs_file="data/nuScenes/v1.0-trainval/log.json",
    budget=4800,
    buffer_file="data/buffers/eu_spatial.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_eu_spatial"
