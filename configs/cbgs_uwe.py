"""AL experiment: uwe selector (reference counterpart: examples/active/cbgs_uwe.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="UWESelector",
    pred_store_file="data/buffers/uwe_pred.npz",
    budget=4800,
    buffer_file="data/buffers/uwe.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_uwe"
