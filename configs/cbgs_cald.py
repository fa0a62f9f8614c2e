"""AL experiment: cald selector (reference counterpart: examples/active/cbgs_cald.py)."""
from _cbgs_base import *  # noqa: F401,F403

selector = dict(
    type="CaldSelector",
    sorted_idx_file="data/buffers/cald_ent_sorted_idx.json",
    jsdiv_file="data/buffers/idx_to_jsdiv.pkl",
    budget=4800,
    buffer_file="data/buffers/cald.json",
    infos_origin="data/nuScenes/infos_train_10sweeps_withvelo.pkl",
)
work_dir = "./work_dirs/cbgs_cald"
