"""Optimizer + OneCycle schedules (optax).

Re-design of the reference's fastai-style solver
(det3d/solver/fastai_optim.py:118 OptimWrapper + learning_schedules_fastai.py:
77 OneCycle, built by det3d/builder.py:98): Adam with decoupled ("true")
weight decay == optax.adamw; the OneCycle lr/momentum cosine phases are optax
schedules; the momentum schedule drives adam's b1 via inject_hyperparams.
Gradient clipping (global-norm 35, reference OptimizerHook) is part of the
chain.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OneCycleSchedule:
    lr_max: float = 0.002
    moms: Tuple[float, float] = (0.95, 0.85)
    div_factor: float = 10.0
    pct_start: float = 0.4
    total_steps: int = 1000


def _annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def one_cycle_lr(cfg: OneCycleSchedule):
    low_lr = cfg.lr_max / cfg.div_factor
    split = cfg.pct_start * cfg.total_steps

    def schedule(step):
        step = jnp.minimum(step, cfg.total_steps)
        pct1 = step / jnp.maximum(split, 1)
        pct2 = (step - split) / jnp.maximum(cfg.total_steps - split, 1)
        return jnp.where(
            step < split,
            _annealing_cos(low_lr, cfg.lr_max, pct1),
            _annealing_cos(cfg.lr_max, low_lr / 1e4, jnp.clip(pct2, 0.0, 1.0)),
        )

    return schedule


def one_cycle_momentum(cfg: OneCycleSchedule):
    split = cfg.pct_start * cfg.total_steps

    def schedule(step):
        step = jnp.minimum(step, cfg.total_steps)
        pct1 = step / jnp.maximum(split, 1)
        pct2 = (step - split) / jnp.maximum(cfg.total_steps - split, 1)
        return jnp.where(
            step < split,
            _annealing_cos(cfg.moms[0], cfg.moms[1], pct1),
            _annealing_cos(cfg.moms[1], cfg.moms[0], jnp.clip(pct2, 0.0, 1.0)),
        )

    return schedule


def build_optimizer(
    one_cycle: OneCycleSchedule,
    weight_decay: float = 0.01,
    grad_clip_norm: float = 35.0,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    """AdamW + OneCycle lr/momentum + global-norm clipping."""
    lr_sched = one_cycle_lr(one_cycle)
    mom_sched = one_cycle_momentum(one_cycle)

    opt = optax.inject_hyperparams(
        lambda learning_rate, b1: optax.adamw(
            learning_rate=learning_rate, b1=b1, b2=0.99, eps=1e-8,
            weight_decay=weight_decay,
        )
    )(learning_rate=lr_sched, b1=mom_sched)

    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
