"""AL experiment: spatial_temporal_feature selector (reference counterpart: examples/active/cbgs_spatial_temporal_feature.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="SpatialTemporalFeatureSelector",
    k=8,
    logs_file="data/nuScenes/v1.0-trainval/log.json",
    distance_store_file="data/buffers/dijkstra_distance_map.npy",
    pred_store_file="data/buffers/stf_pred.npz",
    lambda_t=1,
    lambda_f=1,
    budget=4800,
    buffer_file="data/buffers/spatial_temporal_feature.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_spatial_temporal_feature"
