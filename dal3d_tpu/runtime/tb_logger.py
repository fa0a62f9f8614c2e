"""TensorBoard logging hook (reference torchie TensorboardLoggerHook,
det3d/torchie/trainer/hooks/logger/tensorboard.py) — uses torch's bundled
SummaryWriter when available, no-op otherwise."""
from __future__ import annotations

from typing import Dict, Optional


class TensorboardLogger:
    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except Exception:
            self._w = None

    @property
    def active(self) -> bool:
        return self._w is not None

    def log(self, scalars: Dict[str, float], step: int):
        if self._w is None:
            return
        for k, v in scalars.items():
            try:
                self._w.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        if self._w is not None:
            self._w.close()
