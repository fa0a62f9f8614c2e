from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict
from .fileio import load, dump
from .timer import Timer
from .log import get_root_logger

__all__ = [
    "Registry",
    "build_from_cfg",
    "Config",
    "ConfigDict",
    "load",
    "dump",
    "Timer",
    "get_root_logger",
]
