"""Selector builder (reference: det3d/selectors/builder.py:8)."""
from ..utils.registry import build_from_cfg
from .registry import SELECTORS


def build_selector(cfg, default_args=None):
    return build_from_cfg(cfg, SELECTORS, default_args)
