"""AL experiment: spatial selector (reference counterpart: examples/active/cbgs_spatial.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="SpatialSelector",
    k=8,
    logs_file="data/nuScenes/v1.0-trainval/log.json",
    distance_store_file="data/buffers/dijkstra_distance_map.npy",
    budget=4800,
    buffer_file="data/buffers/spatial.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_spatial"
