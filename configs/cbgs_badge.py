"""AL experiment: badge selector (reference counterpart: examples/active/cbgs_badge.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="BadgeSelector",
    pred_store_file="data/buffers/badge_pred.npz",
    budget=4800,
    buffer_file="data/buffers/badge.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_badge"
