"""Per-iteration LR schedules as pure `step -> lr` functions for optax.

The reference hand-rolls stateful schedulers that poke the torch optimizer
every batch (/root/reference/wesep/utils/schedulers.py:99-277). On TPU the
idiomatic form is a pure schedule passed to `optax.inject_hyperparams` /
`optax.scale_by_schedule`, so the LR lives inside the compiled train step
and checkpoints with the opt state. Semantics are matched exactly:

  ExponentialDecrease  (schedulers.py:193-222): warmup coeff *
      initial_lr * exp(t/T * log(final/initial))
  TriAngular2          (schedulers.py:225-277): cyclic triangular with the
      peak halving every cycle (arXiv:1506.01186)
  MarginScheduler      (schedulers.py:20-96): margin ramp for speaker
      losses (returned as a plain fn; not an optax schedule)
"""

import math
from typing import Callable

import jax.numpy as jnp

__all__ = ["exponential_decrease", "triangular2", "margin_scheduler",
           "get_scheduler"]


def _warm_coeff(step, warm_up_iter, scale_ratio, warm_from_zero):
    """Multiprocess warm-up coefficient (reference BaseClass
    get_multi_process_coeff, schedulers.py:128-138)."""
    coeff = jnp.asarray(1.0 * scale_ratio, jnp.float32)
    if warm_up_iter <= 0:
        return coeff
    in_warm = step < warm_up_iter
    if warm_from_zero:
        warm = scale_ratio * step.astype(jnp.float32) / warm_up_iter
        return jnp.where(in_warm, warm, coeff)
    if scale_ratio > 1:
        warm = (scale_ratio - 1) * step.astype(jnp.float32) / warm_up_iter + 1.0
        return jnp.where(in_warm, warm, coeff)
    return coeff


def exponential_decrease(
    num_epochs: int,
    epoch_iter: int,
    initial_lr: float,
    final_lr: float,
    warm_up_epoch: int = 6,
    scale_ratio: float = 1.0,
    warm_from_zero: bool = False,
) -> Callable:
    max_iter = num_epochs * epoch_iter
    warm_up_iter = warm_up_epoch * epoch_iter
    log_ratio = math.log(final_lr / initial_lr)

    def schedule(step):
        step = jnp.asarray(step)
        coeff = _warm_coeff(step, warm_up_iter, scale_ratio, warm_from_zero)
        return coeff * initial_lr * jnp.exp(
            step.astype(jnp.float32) / max_iter * log_ratio
        )

    return schedule


def triangular2(
    num_epochs: int,
    epoch_iter: int,
    initial_lr: float,
    final_lr: float,
    warm_up_epoch: int = 6,
    scale_ratio: float = 1.0,
    cycle_step: int = 2,
    reduce_lr_diff_ratio: float = 0.5,
) -> Callable:
    del num_epochs
    warm_up_iter = warm_up_epoch * epoch_iter
    cycle_iter = cycle_step * epoch_iter
    step_size = cycle_iter // 2
    min_lr = final_lr
    gap = initial_lr - final_lr

    def schedule(step):
        step = jnp.asarray(step)
        coeff = _warm_coeff(step, warm_up_iter, scale_ratio, False)
        point = (step % cycle_iter).astype(jnp.float32)
        cycle_index = (step // cycle_iter).astype(jnp.float32)
        max_lr = min_lr + gap * reduce_lr_diff_ratio**cycle_index
        up = min_lr + (max_lr - min_lr) * point / step_size
        down = max_lr - (max_lr - min_lr) * (point - step_size) / step_size
        return coeff * jnp.where(point <= step_size, up, down)

    return schedule


def margin_scheduler(
    initial_margin: float = 0.0,
    final_margin: float = 0.2,
    increase_start_epoch: int = 1,
    fix_start_epoch: int = 1,
    epoch_iter: int = 1,
    increase_type: str = "exp",
) -> Callable:
    """Margin ramp for margin-based speaker losses (schedulers.py:20-96)."""
    increase_start_iter = (increase_start_epoch - 1) * epoch_iter
    fix_start_iter = (fix_start_epoch - 1) * epoch_iter

    increase_iter = max(fix_start_iter - increase_start_iter, 1)

    def schedule(step):
        step = jnp.asarray(step).astype(jnp.float32)
        cur = step - increase_start_iter
        if increase_type == "exp":
            # 1 - exp(t/T * log(1e-3)) ramp (reference get_increase_margin)
            ratio = 1.0 - jnp.exp(
                cur / increase_iter * math.log(1e-3 / (1.0 + 1e-6))
            )
        else:
            ratio = cur / increase_iter
        margin = initial_margin + (final_margin - initial_margin) * ratio
        margin = jnp.where(step < increase_start_iter, initial_margin, margin)
        return jnp.where(step >= fix_start_iter, final_margin, margin)

    return schedule


_SCHEDULERS = {
    "ExponentialDecrease": exponential_decrease,
    "TriAngular2": triangular2,
}


def get_scheduler(name: str, **kwargs) -> Callable:
    if name not in _SCHEDULERS:
        raise ValueError(
            f"Unknown scheduler {name!r}; have {sorted(_SCHEDULERS)}"
        )
    return _SCHEDULERS[name](**kwargs)
