"""Selector registry (reference: det3d/selectors/registry.py:3)."""
from ..utils.registry import Registry

SELECTORS = Registry("selector")
