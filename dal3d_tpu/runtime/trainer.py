"""Epoch-based trainer with hook-lite callbacks.

The reference's 5k-LoC torchie Trainer + hook system (det3d/torchie/trainer/
trainer.py:124-624, hooks/) collapses to this: the jitted train step does the
work; the trainer owns the epoch/iter loop, LogBuffer-style averaged text
logging (TextLoggerHook, interval 5), per-epoch checkpointing
(CheckpointHook), iter timing (IterTimerHook), and resume.
"""
from __future__ import annotations

import logging
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..parallel.dist import get_dist_info
from ..parallel.mesh import shard_batch
from ..solver.optim import one_cycle_lr
from . import checkpoint as ckpt
from .steps import TrainState, create_train_state, make_predict_step, make_train_step


class LogBuffer:
    def __init__(self):
        self.history = defaultdict(list)

    def update(self, d: Dict[str, float]):
        for k, v in d.items():
            self.history[k].append(float(v))

    def average(self, n: int = 0) -> Dict[str, float]:
        return {k: float(np.mean(v[-n:] if n else v)) for k, v in self.history.items()}

    def clear(self):
        self.history.clear()


class Trainer:
    def __init__(
        self,
        bundle,
        optimizer,
        work_dir: str,
        mesh=None,
        one_cycle_cfg=None,
        logger: Optional[logging.Logger] = None,
        log_interval: int = 5,
        checkpoint_interval: int = 1,
    ):
        self.bundle = bundle
        self.optimizer = optimizer
        self.work_dir = work_dir
        self.mesh = mesh
        self.logger = logger or logging.getLogger("dal3d.trainer")
        self.log_interval = log_interval
        self.checkpoint_interval = checkpoint_interval
        self.train_step = make_train_step(bundle, optimizer)
        self.predict_step = make_predict_step(bundle)
        self.lr_fn = one_cycle_lr(one_cycle_cfg) if one_cycle_cfg is not None else None
        self.state: Optional[TrainState] = None
        self.epoch = 0
        self._capacity_checked = False
        from .tb_logger import TensorboardLogger

        self.tb = TensorboardLogger(work_dir) if get_dist_info()[0] == 0 else None

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_batch):
        self.state = create_train_state(self.bundle, self.optimizer, rng, sample_batch)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.state.params))
        self.logger.info(f"initialized model: {n_params/1e6:.2f}M params")
        return self.state

    def resume(self, epoch: Optional[int] = None, work_dir: Optional[str] = None):
        """Resume from ``work_dir`` (defaults to the trainer's own)."""
        self.state, meta = ckpt.load_checkpoint(work_dir or self.work_dir, self.state, epoch)
        self.epoch = int(meta.get("epoch", 0))
        self.logger.info(f"resumed from epoch {self.epoch} (step {int(self.state.step)})")

    def load_from(self, path_or_workdir: str, epoch: Optional[int] = None):
        self.state, _ = ckpt.load_checkpoint(path_or_workdir, self.state, epoch)
        self.state = self.state.replace(step=jax.numpy.zeros((), jax.numpy.int32))

    # ------------------------------------------------------------------
    def train_epoch(self, loader: Iterable[Dict[str, Any]]):
        buf = LogBuffer()
        t_data = time.perf_counter()
        rank, _ = get_dist_info()
        for i, batch in enumerate(loader):
            data_time = time.perf_counter() - t_data
            batch = {k: v for k, v in batch.items() if k != "metadata"}
            if not self._capacity_checked and rank == 0:
                # one-shot brick-capacity observability (runtime/capacity.py):
                # saturated levels silently truncate — surface it in the log
                self._capacity_checked = True
                from .capacity import log_capacity_report

                log_capacity_report(self, batch)
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
                # ambient mesh: in-model bev_constraint picks up the 'model'
                # axis (spatial partitioning of the dense BEV pipeline)
                with jax.set_mesh(self.mesh):
                    self.state, logs = self.train_step(self.state, batch)
            else:
                self.state, logs = self.train_step(self.state, batch)
            logs = {k: v for k, v in jax.tree_util.tree_map(float, logs).items()}
            iter_time = time.perf_counter() - t_data
            buf.update({**logs, "data_time": data_time, "time": iter_time})
            if rank == 0 and (i + 1) % self.log_interval == 0:
                avg = buf.average(self.log_interval)
                if self.tb is not None:
                    self.tb.log(avg, int(self.state.step))
                lr = float(self.lr_fn(int(self.state.step))) if self.lr_fn else float("nan")
                self.logger.info(
                    f"Epoch [{self.epoch + 1}][{i + 1}] lr: {lr:.5f}, "
                    f"time: {avg['time']:.3f} ({avg['data_time']:.3f} data), "
                    f"loss: {avg['loss']:.4f} (loc {avg['loc_loss']:.4f} / cls {avg['cls_loss']:.4f}), "
                    f"grad_norm: {avg['grad_norm']:.2f}, num_pos: {avg['num_pos']:.0f}"
                )
            t_data = time.perf_counter()
        self.epoch += 1
        return buf.average()

    def run(
        self,
        train_loader_fn: Callable[[int], Iterable],
        total_epochs: int,
        val_fn: Optional[Callable[["Trainer"], Dict[str, float]]] = None,
        val_interval: Optional[int] = None,
    ):
        """Workflow [('train', val_interval), ('val', 1)] cycled to
        total_epochs (reference trainer.py:526 run + configs' workflow);
        val_interval None -> val only after the final epoch."""
        assert self.state is not None, "call init_state or resume first"
        result = None
        while self.epoch < total_epochs:
            stats = self.train_epoch(train_loader_fn(self.epoch))
            self.logger.info(f"Epoch {self.epoch} done: loss {stats.get('loss', float('nan')):.4f}")
            if self.epoch % self.checkpoint_interval == 0 or self.epoch == total_epochs:
                ckpt.save_checkpoint(self.work_dir, self.state, self.epoch)
                self.logger.info(f"saved checkpoint epoch {self.epoch}")
            at_val = val_interval is not None and self.epoch % val_interval == 0
            if val_fn is not None and (at_val or self.epoch == total_epochs):
                result = val_fn(self)
        return result
