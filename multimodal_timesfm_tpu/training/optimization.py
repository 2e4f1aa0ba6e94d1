"""LR schedules and optimizer construction.

The schedule shapes match the reference's HF-style LambdaLR lambdas
(``/root/reference/src/tsfmx/optimization.py:11-48``): linear warmup followed
by linear decay to 0, or linear warmup followed by a half-cosine decay
(num_cycles=0.5). Both multiply the base learning rate; step counts are
optimizer steps (not micro-batches), mirroring the reference's per-optimizer-
step ``scheduler.step()`` (``trainer.py:218``).

The optimizer is optax AdamW with torch-AdamW-default betas/eps and decoupled
weight decay, chained behind global-norm clipping (reference
``trainer.py:131-135,213-215``).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax


def linear_schedule_with_warmup(
    base_lr: float, num_warmup_steps: int, num_training_steps: int
) -> Callable:
    """lr(t) = base * t/warmup for t<warmup, else base * (T-t)/(T-warmup), floored at 0."""

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        warm = t / max(1, num_warmup_steps)
        decay = jnp.maximum(
            0.0,
            (num_training_steps - t) / max(1, num_training_steps - num_warmup_steps),
        )
        return base_lr * jnp.where(t < num_warmup_steps, warm, decay)

    return schedule


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
) -> Callable:
    """Linear warmup then cosine decay: base * 0.5*(1+cos(pi * cycles * 2 * progress))."""

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        warm = t / max(1, num_warmup_steps)
        progress = (t - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        decay = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress)))
        return base_lr * jnp.where(t < num_warmup_steps, warm, decay)

    return schedule


def make_schedule(
    lr_scheduler_type: str,
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
) -> Callable:
    """Factory keyed the same way as reference ``trainer.py:150-156``."""
    if lr_scheduler_type == "linear":
        return linear_schedule_with_warmup(base_lr, num_warmup_steps, num_training_steps)
    if lr_scheduler_type == "cosine":
        return cosine_schedule_with_warmup(base_lr, num_warmup_steps, num_training_steps)
    raise NotImplementedError(f"Unsupported lr_scheduler_type: {lr_scheduler_type!r}")


def make_optimizer(
    schedule: Callable,
    weight_decay: float,
    max_grad_norm: float,
) -> optax.GradientTransformation:
    """Global-norm clip (if enabled) -> AdamW with torch-default betas/eps."""
    transforms = []
    if max_grad_norm > 0:
        transforms.append(optax.clip_by_global_norm(max_grad_norm))
    transforms.append(
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        )
    )
    return optax.chain(*transforms)
