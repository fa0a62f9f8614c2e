"""AL experiment: feature selector (reference counterpart: examples/active/cbgs_feature.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="FeatureSelector",
    distance_type="l2",
    pred_store_file="data/buffers/feature_pred.npz",
    budget=4800,
    buffer_file="data/buffers/feature.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_feature"
