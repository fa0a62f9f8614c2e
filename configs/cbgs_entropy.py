"""AL experiment: entropy selector (reference counterpart: examples/active/cbgs_entropy.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="EntropySelector",
    pred_store_file="data/buffers/entropy_pred.npz",
    budget=4800,
    buffer_file="data/buffers/entropy.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_entropy"
