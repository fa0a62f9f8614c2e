"""Executable-python / json / yaml experiment config loader.

Re-design of the reference's config system (det3d/torchie/utils/config.py:55,141):
a config file is a python module whose top-level, non-dunder names become an
attribute-accessible dict. JSON/YAML files load directly. ``merge_from_dict``
supports dotted CLI overrides.
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import tempfile
from typing import Any, Dict


class ConfigDict(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __init__(self, d: Dict[str, Any] | None = None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        import copy

        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


class Config:
    """Holds a ConfigDict plus the source filename."""

    def __init__(self, cfg_dict: Dict[str, Any] | None = None, filename: str | None = None):
        self._cfg_dict = ConfigDict(cfg_dict or {})
        self._filename = filename

    @staticmethod
    def fromfile(filename: str) -> "Config":
        filename = os.path.abspath(os.path.expanduser(filename))
        if not os.path.isfile(filename):
            raise FileNotFoundError(filename)
        ext = os.path.splitext(filename)[1]
        if ext == ".py":
            module_name = "_dal3d_cfg_" + os.path.splitext(os.path.basename(filename))[0]
            spec = importlib.util.spec_from_file_location(module_name, filename)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[module_name] = mod
            cfg_dir = os.path.dirname(filename)
            sys.path.insert(0, cfg_dir)  # allow `from _base import *` between configs
            try:
                spec.loader.exec_module(mod)
                cfg_dict = {
                    k: v
                    for k, v in mod.__dict__.items()
                    if not k.startswith("__") and not callable(v) and not isinstance(v, type(sys))
                }
            finally:
                sys.modules.pop(module_name, None)
                try:
                    sys.path.remove(cfg_dir)
                except ValueError:
                    pass
        elif ext == ".json":
            with open(filename) as f:
                cfg_dict = json.load(f)
        elif ext in (".yml", ".yaml"):
            import yaml

            with open(filename) as f:
                cfg_dict = yaml.safe_load(f)
        else:
            raise ValueError(f"unsupported config extension: {ext}")
        return Config(cfg_dict, filename=filename)

    @property
    def filename(self):
        return self._filename

    @property
    def text(self):
        if self._filename and os.path.isfile(self._filename):
            with open(self._filename) as f:
                return f.read()
        return json.dumps(dict(self._cfg_dict), default=str, indent=2)

    def merge_from_dict(self, options: Dict[str, Any]):
        """Merge dotted-key CLI overrides, e.g. {"data.samples_per_gpu": 4}."""
        for full_key, v in options.items():
            d = self._cfg_dict
            keys = full_key.split(".")
            for k in keys[:-1]:
                if k not in d:
                    d[k] = ConfigDict()
                d = d[k]
            d[keys[-1]] = v

    def __getattr__(self, name):
        return getattr(self._cfg_dict, name)

    def __getitem__(self, name):
        return self._cfg_dict[name]

    def __setattr__(self, name, value):
        if name.startswith("_"):
            super().__setattr__(name, value)
        else:
            setattr(self._cfg_dict, name, value)

    def __contains__(self, name):
        return name in self._cfg_dict

    def get(self, name, default=None):
        return self._cfg_dict.get(name, default)

    def keys(self):
        return self._cfg_dict.keys()

    def __repr__(self):
        return f"Config(file={self._filename})"
