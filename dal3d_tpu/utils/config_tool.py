"""Config introspection helpers (reference det3d/utils/config_tool.py:39-49)."""
from __future__ import annotations

import numpy as np


def get_downsample_factor(model_config: dict) -> int:
    neck = dict(model_config.get("neck", {}) or {})
    backbone = dict(model_config.get("backbone", {}) or {})
    ds = int(backbone.get("ds_factor", 1))
    strides = list(neck.get("ds_layer_strides", []))
    us = list(neck.get("us_layer_strides", []))
    factor = ds * int(np.prod(strides)) if strides else ds
    if us:
        factor //= int(us[-1])
    assert factor > 0
    return int(factor)
