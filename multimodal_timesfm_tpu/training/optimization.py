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

import dataclasses
import math
from typing import Any, Callable

import jax
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


def scale_by_adam_lowmem(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Any = jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam moment estimation with reduced-precision moment *storage*.

    Numerically identical math to ``optax.scale_by_adam`` except that the
    first AND second moments are stored in ``moment_dtype`` between steps
    (optax's ``mu_dtype`` covers only ``mu``). Each update decays/accumulates
    in fp32 and rounds once on store, so the per-step relative rounding error
    is ~2^-9 for bf16 — pinned against the fp32 trajectory in
    ``tests/test_trainer.py::test_bf16_moment_trajectory``.

    Why: in baseline mode (full 200M-backbone fine-tune, the reference's
    primary mode — ``/root/reference/src/tsfmx/trainer.py:76-79``) the AdamW
    update is HBM-bound: fp32 m+v cost 16 bytes/param of read+write traffic
    per step. bf16 moments halve that while keeping fp32 master weights.
    """

    def init_fn(params):
        def zeros(p):
            dt = moment_dtype if jnp.issubdtype(p.dtype, jnp.floating) else p.dtype
            return jnp.zeros_like(p, dtype=dt)

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32) + (1.0 - b1) * g.astype(jnp.float32),
            state.mu,
            updates,
        )
        nu32 = jax.tree.map(
            lambda n, g: b2 * n.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu,
            updates,
        )
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, n: (m / c1) / (jnp.sqrt(n / c2) + eps), mu32, nu32
        )
        cast = lambda t32, old: jax.tree.map(  # noqa: E731
            lambda x, o: x.astype(o.dtype), t32, old
        )
        return new_updates, optax.ScaleByAdamState(
            count=count, mu=cast(mu32, state.mu), nu=cast(nu32, state.nu)
        )

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm_fp32(max_norm: float) -> optax.GradientTransformation:
    """Global-norm clipping with the norm accumulated in fp32.

    ``optax.clip_by_global_norm`` computes the norm in the gradients' own
    dtype. Under mixed precision (``trainable_cast_dtype=bf16`` with
    ``gradient_accumulation_steps=1``) the gradients reach the optimizer as
    bf16, making the measured norm depend on how the backend lowers the
    reduce: XLA's tree reductions keep bf16 sums accurate (~1e-3 relative
    at 1e6 terms, measured), but that is a lowering detail, not a
    contract — a sequential bf16 accumulator saturates once the partial sum
    exceeds ~256x an addend. Accumulating leaf sums of squares in fp32
    removes the dependence at zero cost (XLA fuses the cast into the
    reduce). For fp32 gradients this matches ``optax.clip_by_global_norm``
    bit-for-bit (same trigger/select form).
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = jnp.sqrt(
            sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree.leaves(updates)
            )
        )
        trigger = g_norm < max_norm
        updates = jax.tree.map(
            lambda t: jax.lax.select(
                trigger,
                t,
                ((t.astype(jnp.float32) / g_norm) * max_norm).astype(t.dtype),
            ),
            updates,
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


@dataclasses.dataclass(frozen=True)
class FusedOptimizer:
    """AdamW as one fused step: clip + moments + decay + lr + param update.

    Same math as ``make_optimizer``'s
    ``optax.chain(clip_by_global_norm_fp32, adamw(schedule))`` — pinned
    step-for-step in ``tests/test_optimization.py`` — but the whole update is
    computed per-leaf in a single expression ending in the new params, so XLA
    emits ONE read-modify-write pass over the parameter tree instead of the
    chain's materialized intermediate update trees (clip select -> moment
    passes -> decayed-weights add -> lr scale -> apply add). On the 200M
    baseline fine-tune the optimizer is HBM-bound, and the r3 trace attributed
    ~16% of step time to the chain's separate ``multiply_add`` passes plus
    part of the 17% convert/reduce share (docs/PERF.md) — the fused form
    brings per-step optimizer traffic to its floor: one fp32 norm reduce over
    the grads, then read g/m/v/p + write m/v/p once each.

    Two deliberate numeric deviations from the chain, both only when clipping
    TRIGGERS (g_norm >= max_norm): the clip is a branchless multiply by
    ``max_norm / max(g_norm, max_norm)`` (the chain divides then multiplies —
    one rounding difference), and the clipped gradient is never rounded back
    to the gradient dtype before the moment update (the chain's select stores
    it). When clipping does not trigger both forms are bit-identical.
    """

    init: Callable
    step: Callable


def make_fused_adamw(
    schedule: Callable,
    weight_decay: float,
    max_grad_norm: float,
    moment_dtype: Any = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> FusedOptimizer:
    """Build the fused AdamW stepper: ``step(grads, state, params) -> (params, state)``.

    ``state`` is an ``optax.ScaleByAdamState`` (count, mu, nu) with moments
    stored in ``moment_dtype`` (None = each param's own dtype); accumulation
    is always fp32 (see ``scale_by_adam_lowmem``). The learning rate is
    ``schedule(count_before_increment)``, matching optax's
    ``scale_by_schedule`` / the reference's per-optimizer-step LambdaLR.
    """

    def init_fn(params):
        def zeros(p):
            dt = p.dtype
            if moment_dtype is not None and jnp.issubdtype(p.dtype, jnp.floating):
                dt = moment_dtype
            return jnp.zeros_like(p, dtype=dt)

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def step_fn(grads, state, params):
        lr = schedule(state.count)
        count = optax.safe_int32_increment(state.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        if max_grad_norm > 0:
            g_norm = jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree.leaves(grads)
                )
            )
            # Branchless clip: == 1.0 exactly when g_norm < max_norm (the
            # optax trigger/select form), one scalar multiply when it fires.
            clip = max_grad_norm / jnp.maximum(g_norm, max_grad_norm)
        else:
            clip = None

        def leaf(p, g, m, v):
            g32 = g.astype(jnp.float32)
            if clip is not None:
                g32 = g32 * clip
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            update = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
            p32 = p.astype(jnp.float32)
            new_p = p32 - lr * (update + weight_decay * p32)
            return new_p.astype(p.dtype), m32.astype(m.dtype), v32.astype(v.dtype)

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        out = [leaf(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
        new_params = jax.tree.unflatten(treedef, [o[0] for o in out])
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.unflatten(treedef, [o[1] for o in out]),
            nu=jax.tree.unflatten(treedef, [o[2] for o in out]),
        )
        return new_params, new_state

    return FusedOptimizer(init=init_fn, step=step_fn)


def make_optimizer(
    schedule: Callable,
    weight_decay: float,
    max_grad_norm: float,
    moment_dtype: Any = None,
) -> optax.GradientTransformation:
    """Global-norm clip (if enabled) -> AdamW with torch-default betas/eps.

    ``moment_dtype`` (e.g. ``jnp.bfloat16``) switches the Adam core to
    ``scale_by_adam_lowmem``, storing both moments in that dtype — the
    decayed-weights and lr-scaling stages are the same transforms
    ``optax.adamw`` chains, so ``moment_dtype=jnp.float32`` reproduces the
    default path exactly.
    """
    transforms = []
    if max_grad_norm > 0:
        # fp32-accumulated norm: identical to optax.clip_by_global_norm for
        # fp32 grads, correct (not saturating) for bf16 grads under
        # trainable_cast_dtype.
        transforms.append(clip_by_global_norm_fp32(max_grad_norm))
    if moment_dtype is None:
        transforms.append(
            optax.adamw(
                learning_rate=schedule,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=weight_decay,
            )
        )
    else:
        transforms += [
            scale_by_adam_lowmem(b1=0.9, b2=0.999, eps=1e-8, moment_dtype=moment_dtype),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(schedule),
        ]
    return optax.chain(*transforms)
