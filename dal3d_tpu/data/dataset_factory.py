"""Dataset factory (reference det3d/datasets/dataset_factory.py:1-12):
maps config ``dataset_type`` strings — both the short factory keys
("NUSC", "NUSC_PART", ...) and the class names the registry uses — to
dataset classes, so tools can honor ``dataset_type`` instead of
hardcoding NuScenesDataset."""
from __future__ import annotations


def get_dataset_cls(name: str):
    from .datasets.kitti import KittiDataset
    from .datasets.lyft import LyftDataset
    from .datasets.nuscenes import NuScenesDataset
    from .datasets.nuscenes_partial import NuScenesPartialDataset

    table = {
        "NUSC": NuScenesDataset,
        "NuScenesDataset": NuScenesDataset,
        "NUSC_PART": NuScenesPartialDataset,
        "NuScenesPartialDataset": NuScenesPartialDataset,
        "KITTI": KittiDataset,
        "KittiDataset": KittiDataset,
        "LYFT": LyftDataset,
        "LyftDataset": LyftDataset,
    }
    try:
        return table[name]
    except KeyError:
        raise KeyError(f"unknown dataset_type {name!r}; known: {sorted(table)}")


def build_dataset(cfg, dataset_type: str | None = None, **common):
    """Build a dataset from a config dict section; ``common`` supplies the
    framework-side kwargs (tasks, max_points, voxelize_host, ...)."""
    cfg = dict(cfg)
    name = dataset_type or cfg.pop("type", "NuScenesDataset")
    cfg.pop("type", None)
    cls = get_dataset_cls(name)
    cfg.pop("ann_file", None)  # reference configs alias info_path
    # caller-processed kwargs (pipeline copies, voxelize_host, ...) win over
    # the raw config values they were derived from
    return cls(**{**cfg, **common})
