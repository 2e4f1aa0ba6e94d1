"""Trainer: whole-epoch jit-compiled training with mode-based parameter partitioning.

Capability parity with the reference ``MultimodalTrainer``
(``/root/reference/src/tsfmx/trainer.py:35-399``) — same training semantics:

  * multimodal mode trains the fusion subtree with a frozen adapter; baseline
    mode fine-tunes the adapter (``trainer.py:76-79,119-123``) — expressed
    here as gradient/optimizer partitioning over params subtrees rather than
    ``requires_grad`` flags,
  * MSE loss on the point forecast, loss/accum scaling under gradient
    accumulation, global-norm clipping before the step, linear/cosine warmup
    schedules advanced per optimizer step (``trainer.py:105,208-219``),
  * all-False input padding masks at train time (``trainer.py:204``),
  * per-epoch validation, epoch/best checkpointing with rotation, optional
    best-model restore at the end (``trainer.py:285-397``).

One benign divergence: epoch shuffling uses a seeded numpy Generator rather
than torch's global RNG, so the exact batch order differs from the reference
for a given seed (both are deterministic; trajectory equivalence under a
shared order is proven in ``tests/test_trajectory_parity.py``).

TPU-native execution model (NOT the reference's per-batch host loop):

  * the entire dataset is staged to the device ONCE at construction; each
    epoch transfers only a tiny permutation-index tensor and runs ONE jitted
    ``lax.scan`` over optimizer steps (micro-batches are device-side gathers,
    scanned inside) — no per-epoch host reshuffling or bulk transfers,
  * batches are padded to static shapes with zero-weight rows; the weighted
    loss reproduces the reference's partial-batch semantics exactly,
  * gathered batches are shard-constrained over the mesh's ``data`` axis
    (the dataset itself stays replicated — it is small); the gradient psum
    is inserted by XLA from the shardings — no explicit collectives.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_timesfm_tpu.data.collate import StackedDataset, stack_samples
from multimodal_timesfm_tpu.models.base import Params
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder
from multimodal_timesfm_tpu.models.layers import (
    fold_frozen_tree_affines,
    fold_frozen_tree_seq1,
)
from multimodal_timesfm_tpu.parallel.mesh import put_global, replicated
from multimodal_timesfm_tpu.training.checkpoint import (
    load_checkpoint,
    rotate_checkpoints,
    save_checkpoint,
)
from multimodal_timesfm_tpu.training.optimization import (
    make_fused_adamw,
    make_optimizer,
    make_schedule,
)
from multimodal_timesfm_tpu.training_args import TrainingArguments
from multimodal_timesfm_tpu.types import TrainingMode
from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()


@dataclasses.dataclass
class TrainState:
    """Pytree carried through the epoch scan."""

    trainable: Params
    opt_state: Any

    def tree_flatten(self) -> tuple:  # pragma: no cover - registered below
        return (self.trainable, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux: Any, children: tuple) -> "TrainState":  # pragma: no cover
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def quantile_objective(full: jax.Array, horizon: jax.Array, weights: jax.Array, denom: jax.Array, spec: tuple) -> jax.Array:
    """Quantile training objective shared by the trainer and vectorized sweeps.

    Mean pinball loss over the adapter's quantile channels, plus MSE on its
    mean channel when one exists. ``full``: (B, H, C) fp32 forecasts;
    ``spec``: the adapter's ``quantile_loss_spec`` = (levels, mean_channel).
    """
    levels, mean_channel = spec
    loss = 0.0
    if mean_channel is not None:
        err = (full[..., mean_channel] - horizon) ** 2
        loss = jnp.sum(err * weights[:, None]) / denom
    q_channels = [c for c in range(full.shape[-1]) if c != mean_channel]
    errs = horizon[..., None] - full[..., q_channels]  # (B, H, Q)
    levels_arr = jnp.asarray(levels, jnp.float32)
    pinball = jnp.maximum((levels_arr - 1.0) * errs, levels_arr * errs)
    return loss + jnp.sum(pinball * weights[:, None, None]) / (denom * len(levels))


def build_epoch_indices(
    n: int, batch: int, shuffle: bool, accum: int, dp: int, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray, int]:
    """Epoch permutation/weight tensors in scan layout (steps, accum, B).

    Rows are padded to static shapes with index 0 / weight 0; a weighted loss
    makes padded rows inert, reproducing the reference's partial-batch
    semantics. ``dp`` pads the batch dim to a multiple of the data-parallel
    axis. Shared by the trainer and the vectorized sweep runner.
    """
    from multimodal_timesfm_tpu.parallel.mesh import pad_to_multiple

    idx = rng.permutation(n) if shuffle else np.arange(n)
    num_batches = math.ceil(n / batch)
    num_steps = math.ceil(num_batches / accum)
    b_padded = pad_to_multiple(batch, dp)
    total = num_steps * accum * b_padded

    take = np.zeros(total, np.int64)
    weights = np.zeros(total, np.float32)
    for bi in range(num_batches):
        real = min(batch, n - bi * batch)
        take[bi * b_padded : bi * b_padded + real] = idx[bi * batch : bi * batch + real]
        weights[bi * b_padded : bi * b_padded + real] = 1.0

    shape = (num_steps, accum, b_padded)
    return take.reshape(shape).astype(np.int32), weights.reshape(shape), num_batches


class MultimodalTrainer:
    """Trainer for multimodal and baseline time-series forecasting."""

    def __init__(
        self,
        model: MultimodalDecoder,
        params: Params,
        args: TrainingArguments,
        train_dataset: Any,
        val_dataset: Any,
        mode: TrainingMode,
        mesh: Any = None,
        wandb_run: Any = None,
        shard_params_fn: Any = None,
        max_device_dataset_bytes: int = 4 << 30,
        frozen_cast_dtype: Any = None,
        trainable_cast_dtype: Any = None,
        ckpt_backend: str = "pickle",
        fuse_epochs: bool | None = None,
        fold_frozen_seq1: bool = True,
        fold_frozen_affine: bool = True,
        fused_optimizer: bool = False,
    ) -> None:
        """``shard_params_fn(params_subtree, mesh)`` overrides the default
        replicated placement — pass ``parallel.sharding.shard_params`` for
        tensor parallelism over the mesh's ``model`` axis.

        Datasets larger than ``max_device_dataset_bytes`` are not staged to
        device; epochs then materialize batches on the host (one transfer per
        epoch) instead of device-side gathers.

        ``frozen_cast_dtype`` (e.g. ``jnp.bfloat16``) stores the FROZEN
        params subtree in that dtype — the trained subtree keeps fp32 master
        weights. In multimodal mode this halves the 200M backbone's weight
        HBM traffic with no optimizer-state impact.

        ``trainable_cast_dtype`` (e.g. ``jnp.bfloat16``) is mixed-precision
        training for the TRAINED subtree: the forward/backward differentiates
        a cast copy of the fp32 master weights, so GEMMs read bf16 weights
        and the backward writes bf16 gradients (half the weight-read and
        grad-write HBM traffic per step — material in baseline mode where
        the trained tree is the 200M backbone). The optimizer still
        accumulates in fp32 against fp32 masters; pair with
        ``adam_moment_dtype="bfloat16"`` for the full low-memory update.

        ``fuse_epochs``: None (default) lets ``train()`` pick the fused
        one-dispatch multi-epoch path whenever it is applicable
        (``fused_epochs_supported``); False forces the per-epoch loop.

        ``fold_frozen_seq1`` (default True): in multimodal mode with a
        single patch token (context_len == patch_len, the reference-default
        32/32 geometry), pre-multiply each FROZEN layer's attention v/out
        projections into one matrix (``models/layers.fold_seq1_attention``)
        — exact at seq==1, ~25% fewer backbone GEMM FLOPs per step. The fold
        lives in the trainer's frozen tree only; checkpoints (trainable
        subtree) are unaffected, but ``trainer.params`` then assembles a
        seq==1-only adapter (``causal_attention`` raises loudly on longer
        contexts). Skipped automatically under tensor parallelism
        (``shard_params_fn``), whose sharding rules key on the qkv/out
        factor names."""
        self.model = model
        self.args = args
        self.mode = mode
        self.mesh = mesh
        self._wandb_run = wandb_run
        self.ckpt_backend = ckpt_backend
        self.fuse_epochs = fuse_epochs
        self._trainable_cast_dtype = trainable_cast_dtype

        multimodal = mode == "multimodal"
        self.train_data = (
            train_dataset
            if isinstance(train_dataset, StackedDataset)
            else stack_samples(train_dataset, multimodal)
        )
        self.val_data = (
            val_dataset
            if isinstance(val_dataset, StackedDataset)
            else stack_samples(val_dataset, multimodal)
        )
        if len(self.train_data) == 0:
            raise RuntimeError("Training dataset is empty.")
        if len(self.val_data) == 0:
            raise RuntimeError("Validation dataset is empty.")

        self.horizon_len = int(self.train_data.horizon.shape[1])
        self.trainable_key = "fusion" if multimodal else "adapter"

        # --- params partition: trainable subtree vs frozen remainder ---
        self.frozen = {k: v for k, v in params.items() if k != self.trainable_key}
        self._folded_seq1 = False
        if (
            fold_frozen_seq1
            and multimodal
            and shard_params_fn is None  # TP sharding rules key on qkv/out names
            and self.train_data.context.shape[1] == model.adapter.patch_len
            and self.val_data.context.shape[1] == model.adapter.patch_len
        ):
            # One patch token end-to-end: fold each frozen layer's attention
            # v+out projections into a single (D, D) matrix (fp32, once per
            # run) — softmax over one key is the identity, so the fold is
            # exact. Saves ~25% of the backbone's GEMM FLOPs and weight reads
            # per step on the reference-default 32/32 geometry (the two md x md
            # attention GEMMs of the eight per layer become one); the fused
            # fold product replaces qkv/out in the frozen tree only — saved
            # checkpoints carry the trainable subtree and are unaffected.
            folded = fold_frozen_tree_seq1(self.frozen)
            if folded is not None:  # None: non-TimesFM (e.g. Chronos) tree
                self.frozen = folded
                self._folded_seq1 = True
        self._folded_affine = False
        if fold_frozen_affine and multimodal and shard_params_fn is None:
            # Fold the frozen stack's elementwise affines (rms gain, per-dim
            # query scale, layer_norm scale/bias) into the adjacent GEMM
            # weights — exact at any sequence length, fp32, once per run
            # (models/layers.fold_frozen_affines). Composes with the seq==1
            # fold above (the gain lands on the fused vo kernel). Skipped
            # under tensor parallelism like the seq==1 fold: the sharding
            # rules expect the unfolded per-leaf names.
            folded = fold_frozen_tree_affines(self.frozen)
            if folded is not None:  # None: non-TimesFM (e.g. Chronos) tree
                self.frozen = folded
                self._folded_affine = True
        # Public: consumers sizing the program's true FLOPs (bench MFU
        # denominators) must read the ACTUAL fold state, not re-derive the
        # gates above (mode, sharding, geometry, knob) — see folded_seq1.
        if frozen_cast_dtype is not None:
            self.frozen = jax.tree.map(
                lambda x: x.astype(frozen_cast_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                self.frozen,
            )
        trainable = params[self.trainable_key]

        # --- optimizer + schedule (per optimizer step, as in the reference) ---
        batch = args.per_device_train_batch_size
        self.num_train_batches = math.ceil(len(self.train_data) / batch)
        num_training_steps = args.num_train_epochs * math.ceil(
            self.num_train_batches / args.gradient_accumulation_steps
        )
        self.num_training_steps = num_training_steps
        self.schedule = make_schedule(
            args.lr_scheduler_type,
            args.learning_rate,
            args.get_warmup_steps(num_training_steps),
            num_training_steps,
        )
        moment_dtype = jnp.bfloat16 if args.adam_moment_dtype == "bfloat16" else None
        # Fused stepper (OPT-IN): one per-leaf read-modify-write pass over
        # the trained tree instead of the optax chain's intermediate update
        # trees — same math (pinned in tests/test_optimization.py). Measured
        # NEUTRAL on the 200M baseline fine-tune (100.8k vs 102.5k series/s
        # back-to-back on v5e, inside the tunnel's noise band — XLA already
        # fuses the chain's passes; docs/PERF.md r4), so the default stays
        # the reference-anchored optax chain, whose opt_state structure also
        # matches existing checkpoints. The two store DIFFERENT opt_state
        # structures, so checkpoints resume only under the same setting.
        self._fused_opt = (
            make_fused_adamw(
                self.schedule, args.weight_decay, args.max_grad_norm, moment_dtype
            )
            if fused_optimizer
            else None
        )
        self.optimizer = make_optimizer(
            self.schedule,
            args.weight_decay,
            args.max_grad_norm,
            moment_dtype=moment_dtype,
        )
        init = self._fused_opt.init if self._fused_opt is not None else self.optimizer.init
        self.state = TrainState(trainable=trainable, opt_state=init(trainable))

        # --- device placement ---
        self._dp = self.mesh.shape["data"] if self.mesh is not None else 1
        # Kept for checkpoint restore: restored trainables/opt state must
        # re-apply the SAME placement, not fall back to replicated (which
        # would silently multiply per-device HBM by model_parallel).
        self._shard_params_fn = shard_params_fn
        if self.mesh is not None:
            if shard_params_fn is not None:
                self.state = TrainState(
                    shard_params_fn(self.state.trainable, self.mesh),
                    shard_params_fn(self.state.opt_state, self.mesh),
                )
                self.frozen = shard_params_fn(self.frozen, self.mesh)
            else:
                rep = replicated(self.mesh)
                # put_global, not device_put: on a multi-host mesh the
                # replicated sharding spans non-addressable devices, which
                # device_put rejects (tests/test_distributed.py exercises the
                # 2-process branch over localhost CPU).
                self.state = jax.tree.map(lambda x: put_global(x, rep), self.state)
                self.frozen = jax.tree.map(lambda x: put_global(x, rep), self.frozen)

        self._rng = np.random.default_rng(args.seed if args.seed is not None else 0)

        # Stage both datasets to device once when they fit; otherwise fall
        # back to host-materialized epoch batches.
        def nbytes(d: StackedDataset) -> int:
            total = d.context.nbytes + d.horizon.nbytes
            if d.text_embeddings is not None:
                total += d.text_embeddings.nbytes
            return total

        self._device_resident = (
            nbytes(self.train_data) + nbytes(self.val_data) <= max_device_dataset_bytes
        )
        if self._device_resident:
            self._train_device = self._to_device(self.train_data)
            self._val_device = self._to_device(self.val_data)
        else:
            _logger.info("Dataset exceeds device budget; using host-materialized epochs")

        # Training state (parity: reference trainer.py:116-118)
        self.current_epoch = 0
        self.start_epoch = 0
        self.global_step = 0
        self.best_val_loss = float("inf")
        self.last_throughput: float | None = None

        self._build_step_fns()

    # ------------------------------------------------------------------
    # jitted step functions
    # ------------------------------------------------------------------

    def _assemble(self, trainable: Params) -> Params:
        params = dict(self.frozen)
        params[self.trainable_key] = trainable
        return params

    def _loss_fn(self, trainable: Params, frozen: Params, context: jax.Array, horizon: jax.Array, text: jax.Array | None, weights: jax.Array) -> jax.Array:
        """Weighted training loss; weights zero out padded rows.

        ``loss_type="mse"`` is the reference objective (point-channel MSE,
        reference ``trainer.py:105,208``). ``loss_type="quantile"`` is the
        extension that trains the quantile channels: mean pinball loss over
        the adapter's ``quantile_loss_spec`` levels, plus MSE on its mean
        channel when one exists.
        """
        params = dict(frozen)
        params[self.trainable_key] = trainable
        masks = jnp.zeros_like(context, dtype=bool)
        denom = jnp.maximum(jnp.sum(weights) * self.horizon_len, 1.0)

        if self.args.loss_type == "mse":
            point = self.model(params, self.horizon_len, context, masks, text)
            err = (point.astype(jnp.float32) - horizon) ** 2
            return jnp.sum(err * weights[:, None]) / denom

        full = self.model.forward_full(params, self.horizon_len, context, masks, text)
        return quantile_objective(
            full.astype(jnp.float32),
            horizon,
            weights,
            denom,
            self.model.adapter.quantile_loss_spec,
        )

    def _batch_constraint(self, tree: Any) -> Any:
        """Constrain a gathered micro-batch to data-axis sharding (no-op without a mesh)."""
        if self.mesh is None:
            return tree
        spec = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec("data"))
        return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, spec), tree)

    def _gather(self, data: dict, idx: jax.Array, weights: jax.Array) -> dict:
        """Device-side micro-batch gather: rows ``idx`` of each dataset array."""
        mb = {k: v[idx] for k, v in data.items()}
        mb["weights"] = weights
        return self._batch_constraint(mb)

    def _build_step_fns(self) -> None:
        accum = self.args.gradient_accumulation_steps
        grad_fn = jax.value_and_grad(self._loss_fn)
        cast_dtype = self._trainable_cast_dtype

        def micro_loss_and_grads(trainable, frozen, mb):
            return grad_fn(
                trainable,
                frozen,
                mb["context"],
                mb["horizon"],
                mb.get("text"),
                mb["weights"],
            )

        def optimizer_step(state: TrainState, frozen, micro_xs, get_mb):
            """One optimizer step: accumulate over ``accum`` micro-batches, then update."""
            trainable = state.trainable
            if cast_dtype is not None:
                # Mixed precision: differentiate the CAST copy — the backward
                # then produces cast-dtype gradients and every GEMM reads
                # cast-dtype weights; the fp32 masters are only touched by
                # the optimizer update (fp32 accumulate there). Cast ONCE per
                # optimizer step, outside the accumulation scan — inside it,
                # the whole-tree fp32 read + cast-dtype write would repeat
                # every micro-batch.
                trainable = jax.tree.map(
                    lambda x: x.astype(cast_dtype) if x.dtype == jnp.float32 else x,
                    trainable,
                )
            if accum == 1:
                # No accumulation: skip the zeros-init + add pass over the
                # gradient tree AND the scan boundary, letting XLA fuse the
                # backward straight into the optimizer update — worth whole
                # HBM round-trips over the 200M-param tree in baseline mode.
                mb = jax.tree.map(lambda x: x[0], micro_xs)
                loss, grads = micro_loss_and_grads(trainable, frozen, get_mb(mb))
                losses = loss[None]
            else:

                def micro(grads_acc, xs):
                    loss, grads = micro_loss_and_grads(trainable, frozen, get_mb(xs))
                    grads_acc = jax.tree.map(lambda a, g: a + g / accum, grads_acc, grads)
                    return grads_acc, loss

                # Accumulator dtype follows the MASTERS (fp32), not the cast
                # copy: under mixed precision the per-micro-batch grads are
                # bf16 but the running sum must stay fp32 (a + g promotes).
                zeros = jax.tree.map(jnp.zeros_like, state.trainable)
                grads, losses = jax.lax.scan(micro, zeros, micro_xs)
            if self._fused_opt is not None:
                trainable, opt_state = self._fused_opt.step(
                    grads, state.opt_state, state.trainable
                )
            else:
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.trainable
                )
                trainable = optax.apply_updates(state.trainable, updates)
            return TrainState(trainable, opt_state), losses

        def eval_metrics(params, mb):
            masks = jnp.zeros_like(mb["context"], dtype=bool)
            point = self.model(params, self.horizon_len, mb["context"], masks, mb.get("text"))
            err = point.astype(jnp.float32) - mb["horizon"]
            denom = jnp.maximum(jnp.sum(mb["weights"]) * self.horizon_len, 1.0)
            mse = jnp.sum(err * err * mb["weights"][:, None]) / denom
            mae = jnp.sum(jnp.abs(err) * mb["weights"][:, None]) / denom
            return mse, mae, jnp.sum(mb["weights"])

        # --- device-resident variants: micro-batches are in-scan gathers ---

        def train_epoch_fn(state: TrainState, frozen, data, perm, weights):
            """perm/weights: (num_steps, accum, B) index/weight tensors."""

            def step(carry, xs):
                idx_group, w_group = xs
                return optimizer_step(
                    carry, frozen, (idx_group, w_group), lambda x: self._gather(data, *x)
                )

            state, losses = jax.lax.scan(step, state, (perm, weights))
            return state, losses  # losses: (num_steps, accum)

        def eval_fn(trainable, frozen, data, perm, weights):
            params = dict(frozen)
            params[self.trainable_key] = trainable

            def one(_, xs):
                idx, w = xs
                return None, eval_metrics(params, self._gather(data, idx, w))

            _, out = jax.lax.scan(one, None, (perm, weights))
            return out

        # --- host-materialized variants: micro-batches arrive as arrays ---

        def train_epoch_mat_fn(state: TrainState, frozen, batches):
            """batches: dict of (num_steps, accum, B, ...) arrays incl. weights."""

            def step(carry, group):
                return optimizer_step(carry, frozen, group, self._batch_constraint)

            state, losses = jax.lax.scan(step, state, batches)
            return state, losses

        def eval_mat_fn(trainable, frozen, batches):
            params = dict(frozen)
            params[self.trainable_key] = trainable

            def one(_, mb):
                return None, eval_metrics(params, self._batch_constraint(mb))

            _, out = jax.lax.scan(one, None, batches)
            return out

        # --- fused multi-epoch variant: the whole fine-tune in ONE dispatch ---

        # The best trainable subtree is only consumed by save_strategy="best"
        # (the only other fused-eligible strategy is "no"). Tracking it costs
        # a whole-tree select + copy per epoch — on the 200M-param baseline
        # tree that is real HBM traffic — so skip it when nothing reads it.
        track_best = self.args.save_strategy == "best"

        def fused_epochs_fn(carry0, frozen, data, val_data, perm, weights, val_perm, val_weights, val_nb):
            """Scan over epochs of (train-step scan -> val scan), tracking the best
            trainable subtree device-side (only under save_strategy="best").

            perm/weights: (E, steps, accum, B); val_perm/val_weights: (val_steps, B).
            ``val_nb`` (static) = real val batch count for the epoch-mean val loss.
            carry0: {"state": TrainState, "best_val": f32[, "best": trainable-like]}.
            """

            def epoch(carry, xs):
                p, w = xs

                def step(c, sxs):
                    idx_group, w_group = sxs
                    return optimizer_step(
                        c, frozen, (idx_group, w_group), lambda x: self._gather(data, *x)
                    )

                state, losses = jax.lax.scan(step, carry["state"], (p, w))

                params = dict(frozen)
                params[self.trainable_key] = state.trainable

                def one(_, exs):
                    idx, vw = exs
                    return None, eval_metrics(params, self._gather(val_data, idx, vw))

                _, (mse, _, _) = jax.lax.scan(one, None, (val_perm, val_weights))
                val_loss = jnp.mean(mse[:val_nb])

                is_best = val_loss < carry["best_val"]
                new_carry = {
                    "state": state,
                    "best_val": jnp.where(is_best, val_loss, carry["best_val"]),
                }
                if track_best:
                    new_carry["best"] = jax.tree.map(
                        lambda b, c: jnp.where(is_best, c, b), carry["best"], state.trainable
                    )
                return new_carry, (losses, val_loss)

            carry, (train_losses, val_losses) = jax.lax.scan(epoch, carry0, (perm, weights))
            return carry, train_losses, val_losses

        self._train_epoch_fn = jax.jit(train_epoch_fn, donate_argnums=(0,))
        self._eval_fn = jax.jit(eval_fn)
        self._train_epoch_mat_fn = jax.jit(train_epoch_mat_fn, donate_argnums=(0, 2))
        self._eval_mat_fn = jax.jit(eval_mat_fn, donate_argnums=(2,))
        self._fused_epochs_fn = jax.jit(
            fused_epochs_fn, donate_argnums=(0,), static_argnums=(8,)
        )

    # ------------------------------------------------------------------
    # host-side epoch index staging (tiny transfers; data already on device)
    # ------------------------------------------------------------------

    def _to_device(self, data: StackedDataset) -> dict:
        tree = {"context": data.context, "horizon": data.horizon}
        if data.text_embeddings is not None:
            tree["text"] = data.text_embeddings
        if self.mesh is not None:
            rep = replicated(self.mesh)
            # put_global: plain device_put single-process; assembles from
            # process-local copies on a multi-host mesh (where device_put
            # would reject the non-addressable sharding).
            return jax.tree.map(lambda x: put_global(x, rep), tree)
        return jax.tree.map(jnp.asarray, tree)

    def _epoch_indices(self, n: int, batch: int, shuffle: bool, accum: int) -> tuple:
        """Device-placed (perm, weights, num_batches); see ``build_epoch_indices``."""
        perm, weights, num_batches = build_epoch_indices(
            n, batch, shuffle, accum, self._dp, self._rng
        )
        if self.mesh is not None:
            rep = replicated(self.mesh)
            return put_global(perm, rep), put_global(weights, rep), num_batches
        return jnp.asarray(perm), jnp.asarray(weights), num_batches

    def _materialize(self, data: StackedDataset, perm: Any, weights: Any) -> dict:
        """Host-gather epoch batches into the (steps, accum, B, ...) scan layout."""
        take = np.asarray(perm).reshape(-1)
        lead = perm.shape  # (num_steps, accum, B)

        tree = {
            "context": data.context[take].reshape(lead + data.context.shape[1:]),
            "horizon": data.horizon[take].reshape(lead + data.horizon.shape[1:]),
            "weights": np.asarray(weights),
        }
        if data.text_embeddings is not None:
            tree["text"] = data.text_embeddings[take].reshape(
                lead + data.text_embeddings.shape[1:]
            )
        if self.mesh is not None:
            spec = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(None, None, "data")
            )
            return jax.tree.map(lambda x: put_global(x, spec), tree)
        return jax.tree.map(jnp.asarray, tree)

    # ------------------------------------------------------------------
    # public API (parity with reference trainer.py:185-399)
    # ------------------------------------------------------------------

    def train_epoch(self) -> float:
        """Train one epoch; returns the average per-micro-batch training loss."""
        perm, weights, num_batches = self._epoch_indices(
            len(self.train_data),
            self.args.per_device_train_batch_size,
            shuffle=True,
            accum=self.args.gradient_accumulation_steps,
        )
        t0 = time.perf_counter()
        if self._device_resident:
            self.state, losses = self._train_epoch_fn(
                self.state, self.frozen, self._train_device, perm, weights
            )
        else:
            batches = self._materialize(self.train_data, perm, weights)
            self.state, losses = self._train_epoch_mat_fn(self.state, self.frozen, batches)
        loss_matrix = np.asarray(losses)  # (num_steps, accum)
        losses = loss_matrix.reshape(-1)[:num_batches]
        elapsed = time.perf_counter() - t0
        self.last_throughput = len(self.train_data) / max(elapsed, 1e-9)

        if not np.all(np.isfinite(losses)):
            bad = int(np.flatnonzero(~np.isfinite(losses))[0])
            raise FloatingPointError(
                f"Non-finite training loss at epoch {self.current_epoch}, micro-batch {bad} "
                f"(loss={losses[bad]}). Check learning rate / data scaling."
            )

        num_steps, accum = loss_matrix.shape
        step_start = self.global_step
        self.global_step += num_steps

        # Per-step W&B logging, reconstructed post-hoc from the scanned losses
        # (parity: reference trainer.py:221-232 logs the loss of the micro-batch
        # at each accumulation boundary, plus the lr used for that step).
        if self.args.logging_strategy == "steps" and self._wandb_run is not None:
            every = max(self.args.logging_steps, 1)
            for s in range(num_steps):
                gs = step_start + s + 1
                if gs % every == 0:
                    last_real = min(accum, num_batches - s * accum) - 1
                    self._wandb_run.log(
                        {
                            "train/loss": float(loss_matrix[s, max(last_real, 0)]),
                            "train/lr": float(self.schedule(gs - 1)),
                        },
                        step=gs,
                    )

        return float(np.mean(losses))

    def validate_epoch(self) -> float:
        """One validation epoch; average per-micro-batch loss (reference :247-283)."""
        # The eval indices are deterministic (no shuffle, no rng draw): build
        # and transfer them once instead of every epoch.
        if not hasattr(self, "_val_indices"):
            self._val_indices = self._epoch_indices(
                len(self.val_data), self.args.per_device_eval_batch_size, shuffle=False, accum=1
            )
        perm, weights, num_batches = self._val_indices
        if self._device_resident:
            mse, _, _ = self._eval_fn(
                self.state.trainable, self.frozen, self._val_device, perm[:, 0], weights[:, 0]
            )
        else:
            batches = self._materialize(self.val_data, perm[:, :1], weights[:, :1])
            batches = jax.tree.map(lambda x: x[:, 0], batches)
            mse, _, _ = self._eval_mat_fn(self.state.trainable, self.frozen, batches)
        return float(np.mean(np.asarray(mse)[:num_batches]))

    @property
    def folded_seq1(self) -> bool:
        """Whether the frozen tree's attention was folded (`fold_seq1_attention`).

        True only when every gate held: multimodal mode, no TP sharding rules,
        one-patch-token geometry on BOTH splits, the ``fold_frozen_seq1`` knob,
        and a TimesFM-shaped tree. FLOPs accounting (bench MFU denominators)
        keys on this instead of re-deriving the gates.
        """
        return self._folded_seq1

    def fused_epochs_supported(self) -> bool:
        """Whether ``train()`` can run as one fused device dispatch.

        Requires the device-resident data path, per-epoch eval, and no
        per-epoch host work (epoch-checkpoint saving/rotation needs the host
        between epochs; ``no``/``best`` strategies don't).
        """
        return (
            self.fuse_epochs is not False
            and self._device_resident
            and self.args.eval_strategy == "epoch"
            and self.args.save_strategy in ("no", "best")
        )

    def train_epochs_fused(self, num_epochs: int) -> tuple[np.ndarray, np.ndarray]:
        """Run ``num_epochs`` x (train epoch + validation) in ONE jitted dispatch.

        TPU-native fast path over the per-epoch loop: a ``lax.scan`` over
        epochs removes every per-epoch dispatch/sync round-trip (measured
        ~10% of headline wall-clock on v5e; far more for the sweep-sized
        datasets where an epoch is a few optimizer steps). Semantics match
        ``num_epochs`` iterations of the reference loop — per-epoch shuffled
        permutations are pre-generated host-side in the same RNG order, the
        validation loss is the same per-batch mean, and the best trainable
        subtree is tracked *device-side* (same best-epoch selection).

        One documented divergence: a ``save_strategy="best"`` checkpoint
        written after a fused run carries the END-of-run optimizer state
        (the loop path saves the moments as of the best epoch). Weights,
        best epoch/val-loss — what sweep reloads consume — are identical.

        Returns:
            (train_losses, val_losses): shapes (E, num_micro_batches-padded)
            flattened per epoch, and (E,).
        """
        if not self._device_resident:
            raise RuntimeError("train_epochs_fused requires the device-resident data path")
        accum = self.args.gradient_accumulation_steps
        # Epoch index tensors are built on HOST and transferred once: going
        # through _epoch_indices would device-put each epoch's arrays, stack
        # them device-side, and re-put the stack — num_epochs+1 transfers for
        # one (E, steps, accum, B) tensor.
        perms, weightss = [], []
        num_batches = None
        for _ in range(num_epochs):
            p, w, num_batches = build_epoch_indices(
                len(self.train_data),
                self.args.per_device_train_batch_size,
                True,
                accum,
                self._dp,
                self._rng,
            )
            perms.append(p)
            weightss.append(w)
        perm_host, weights_host = np.stack(perms), np.stack(weightss)
        val_perm, val_weights, val_nb = self._epoch_indices(
            len(self.val_data), self.args.per_device_eval_batch_size, shuffle=False, accum=1
        )
        if self.mesh is not None:
            rep = replicated(self.mesh)
            perm, weights = put_global(perm_host, rep), put_global(weights_host, rep)
        else:
            perm, weights = jnp.asarray(perm_host), jnp.asarray(weights_host)

        carry0 = {
            "state": self.state,
            "best_val": jnp.asarray(
                self.best_val_loss if np.isfinite(self.best_val_loss) else np.finfo(np.float32).max,
                jnp.float32,
            ),
        }
        if self.args.save_strategy == "best":
            # Distinct buffers: carry0 is donated, so the best-subtree slot
            # must not alias the live trainable.
            carry0["best"] = jax.tree.map(lambda x: x.copy(), self.state.trainable)
        t0 = time.perf_counter()
        carry, train_losses, val_losses = self._fused_epochs_fn(
            carry0,
            self.frozen,
            self._train_device,
            self._val_device,
            perm,
            weights,
            val_perm[:, 0],
            val_weights[:, 0],
            val_nb,
        )
        self.state = carry["state"]
        loss_cube = np.asarray(train_losses)  # (E, steps, accum)
        val_arr = np.asarray(val_losses)  # (E,)
        elapsed = time.perf_counter() - t0
        self.last_throughput = num_epochs * len(self.train_data) / max(elapsed, 1e-9)

        flat = loss_cube.reshape(num_epochs, -1)[:, :num_batches]
        if not np.all(np.isfinite(flat)):
            e, b = map(int, np.argwhere(~np.isfinite(flat))[0])
            raise FloatingPointError(
                f"Non-finite training loss at epoch {self.start_epoch + e}, micro-batch {b} "
                f"(loss={flat[e, b]}). Check learning rate / data scaling."
            )

        self.global_step += num_epochs * loss_cube.shape[1]
        self._fused_best = {
            "val": float(np.asarray(carry["best_val"])),
            "trainable": carry.get("best"),  # None unless save_strategy="best"
            "epoch": self.start_epoch + int(np.argmin(val_arr)),
        }
        return flat, val_arr

    @property
    def params(self) -> Params:
        """Full assembled parameter pytree (frozen + current trainable)."""
        return self._assemble(self.state.trainable)

    # --- checkpointing (parity: reference trainer.py:285-354) ---

    def _build_checkpoint(self) -> dict:
        payload = {
            "epoch": self.current_epoch,
            "global_step": self.global_step,
            "optimizer_state": jax.device_get(self.state.opt_state),
            # Fused vs chain store structurally different opt_state trees
            # (a single ScaleByAdamState vs the optax chain tuple); the stamp
            # lets resume_from_checkpoint fail with the actual knob to flip
            # instead of an opaque pytree-restructure error. Bool, not a
            # kind-string: the orbax backend rejects str leaves.
            "optimizer_is_fused": self._fused_opt is not None,
            "best_val_loss": self.best_val_loss,
        }
        key = "fusion_params" if self.mode == "multimodal" else "adapter_params"
        payload[key] = jax.device_get(self.state.trainable)
        return payload

    def _load_checkpoint_state(self, checkpoint: dict) -> None:
        key = "fusion_params" if self.mode == "multimodal" else "adapter_params"
        like = jax.device_get(self.state.trainable)
        restored = jax.tree.map(lambda ref, v: jnp.asarray(v, ref.dtype), like, checkpoint[key])
        if self.mesh is not None:
            # Re-apply the ORIGINAL placement: a TP-sharded trainer restoring
            # replicated would silently multiply per-device HBM by
            # model_parallel and recompile without TP.
            if self._shard_params_fn is not None:
                restored = self._shard_params_fn(restored, self.mesh)
            else:
                restored = jax.device_put(restored, replicated(self.mesh))
        self.state = TrainState(restored, self.state.opt_state)

    def resume_from_checkpoint(self, path: Any) -> None:
        """Mid-run resume: restore params, optimizer state, and counters.

        An improvement over the reference, which saves optimizer/scheduler
        state but has no entry point to continue training from it
        (SURVEY.md §5). Call before ``train()``; training continues at the
        epoch after the checkpointed one.

        Caveat: a ``best_model.ckpt`` written by the FUSED path carries the
        best epoch's weights but the END-of-run optimizer state (stamped
        ``optimizer_state_is_final``); resuming from it warns, because the
        moments/schedule position don't match the recorded step.
        """
        checkpoint = load_checkpoint(path)
        saved_fused = checkpoint.get("optimizer_is_fused")
        if saved_fused is not None and bool(saved_fused) != (self._fused_opt is not None):
            saved_kind = "fused" if saved_fused else "chain"
            live_kind = "chain" if saved_fused else "fused"
            raise ValueError(
                f"Checkpoint {path} was written with the {saved_kind} optimizer "
                f"but this trainer was built with the {live_kind} one — their "
                "opt_state structures are incompatible. Rebuild the trainer with "
                f"fused_optimizer={bool(saved_fused)} to resume it."
            )
        if checkpoint.get("optimizer_state_is_final"):
            import warnings

            warnings.warn(
                f"Resuming from {path}: this checkpoint was written by the fused "
                "training path — its weights are the best epoch's, but the optimizer "
                "state is end-of-run. Moments/schedule position will not match the "
                "recorded epoch/global_step.",
                UserWarning,
                stacklevel=2,
            )
        self._load_checkpoint_state(checkpoint)
        loaded_opt = checkpoint["optimizer_state"]
        # Orbax restores plain containers (optax namedtuples come back as
        # dicts); rebuild against the live opt state's structure so resume
        # works from either backend.
        template = jax.device_get(self.state.opt_state)
        if jax.tree.structure(loaded_opt) != jax.tree.structure(template):
            from multimodal_timesfm_tpu.training.checkpoint import restructure_like

            loaded_opt = restructure_like(template, loaded_opt)
        opt_state = jax.tree.map(jnp.asarray, loaded_opt)
        if self.mesh is not None:
            if self._shard_params_fn is not None:  # preserve TP placement
                opt_state = self._shard_params_fn(opt_state, self.mesh)
            else:
                opt_state = jax.device_put(opt_state, replicated(self.mesh))
        self.state = TrainState(self.state.trainable, opt_state)
        self.start_epoch = checkpoint["epoch"] + 1
        self.current_epoch = self.start_epoch
        self.global_step = checkpoint["global_step"]
        self.best_val_loss = checkpoint["best_val_loss"]
        _logger.info(
            "Resumed from %s at epoch %d (global step %d)",
            path,
            self.start_epoch,
            self.global_step,
        )

    def save_ckpt(self, val_loss: float) -> None:
        """Epoch/best checkpoint policy with rotation (reference :325-354)."""
        is_best = val_loss < self.best_val_loss
        if is_best:
            self.best_val_loss = val_loss
        if self.args.save_strategy == "best" and not is_best:
            return

        checkpoint = self._build_checkpoint()

        if self.args.save_strategy == "epoch":
            path = self.args.checkpoint_dir / f"checkpoint_epoch_{self.current_epoch}.ckpt"
            save_checkpoint(path, checkpoint, backend=self.ckpt_backend)
            _logger.info("Saved checkpoint at epoch %d", self.current_epoch)
            if self.args.save_total_limit is not None:
                rotate_checkpoints(self.args.checkpoint_dir, self.args.save_total_limit)

        if is_best:
            save_checkpoint(
                self.args.checkpoint_dir / "best_model.ckpt", checkpoint, backend=self.ckpt_backend
            )
            _logger.info("Saved best model checkpoint at epoch %d", self.current_epoch)

    def train(self) -> None:
        """Main training loop (parity: reference trainer.py:356-399)."""
        if self.args.eval_strategy != "epoch":
            raise NotImplementedError(
                f"eval_strategy={self.args.eval_strategy!r} is not supported; only 'epoch' is implemented."
            )
        if self.args.save_strategy == "steps":
            # Reference parity: its trainer also only saves for epoch/best
            # (trainer.py:389), so the DEFAULT "steps" silently writes
            # nothing — warn loudly instead of losing a run's checkpoints.
            _logger.warning(
                "save_strategy='steps' is accepted for config parity but not "
                "implemented (the reference never saves under it either): NO "
                "checkpoints will be written. Use 'epoch' or 'best'."
            )

        _logger.info("Starting %s training for %d epochs", self.mode, self.args.num_train_epochs)
        _logger.info("Train dataset size: %d", len(self.train_data))
        _logger.info("Validation dataset size: %d", len(self.val_data))

        if self.fused_epochs_supported():
            self._train_fused()
        else:
            self._train_loop()

        if self.args.load_best_model_at_end:
            best_path = self.args.checkpoint_dir / "best_model.ckpt"
            if best_path.exists():
                self._load_checkpoint_state(load_checkpoint(best_path))
                _logger.info("Loaded best model at end of training")

        _logger.info("Training completed")

    def _train_fused(self) -> None:
        """One-dispatch training run (see ``train_epochs_fused``); host-side
        logging/checkpointing reconstructed post-hoc from the returned losses."""
        num_epochs = self.args.num_train_epochs - self.start_epoch
        if num_epochs <= 0:
            return
        step0 = self.global_step
        train_losses, val_losses = self.train_epochs_fused(num_epochs)
        steps_per_epoch = (self.global_step - step0) // num_epochs

        # Loop-path parity: best tracking only happens when save_ckpt runs,
        # i.e. never under save_strategy="no".
        improved = (
            self.args.save_strategy == "best"
            and float(np.min(val_losses)) < self.best_val_loss
        )
        for e in range(num_epochs):
            epoch = self.start_epoch + e
            self.current_epoch = epoch
            train_loss = float(np.mean(train_losses[e]))
            val_loss = float(val_losses[e])
            _logger.info(
                "Epoch %d: Train Loss = %.6f, Val Loss = %.6f (%.1f series/s)",
                epoch,
                train_loss,
                val_loss,
                self.last_throughput or 0.0,
            )
            if self._wandb_run is not None:
                gs = step0 + (e + 1) * steps_per_epoch
                if self.args.logging_strategy == "steps":
                    # Reconstruct the loop path's per-step logs from the loss
                    # matrix (train_epoch does the same post-hoc).
                    accum = self.args.gradient_accumulation_steps
                    num_batches = train_losses.shape[1]
                    every = max(self.args.logging_steps, 1)
                    for s in range(steps_per_epoch):
                        step_gs = step0 + e * steps_per_epoch + s + 1
                        if step_gs % every == 0:
                            last_real = min(accum, num_batches - s * accum) - 1
                            self._wandb_run.log(
                                {
                                    "train/loss": float(
                                        train_losses[e, s * accum + max(last_real, 0)]
                                    ),
                                    "train/lr": float(self.schedule(step_gs - 1)),
                                },
                                step=step_gs,
                            )
                    self._wandb_run.log({"val/loss": val_loss}, step=gs)
                elif self.args.logging_strategy == "epoch":
                    lr = float(self.schedule(gs - steps_per_epoch))
                    self._wandb_run.log(
                        {"train/loss": train_loss, "train/lr": lr, "val/loss": val_loss},
                        step=gs,
                    )
                else:
                    # Reference parity: val/loss is logged even under
                    # logging_strategy="no" (reference trainer.py:386-387).
                    self._wandb_run.log({"val/loss": val_loss}, step=gs)

        if improved:
            self.best_val_loss = self._fused_best["val"]
        if self.args.save_strategy == "best" and improved:
            # Save once, with the device-tracked best trainable subtree.
            # epoch AND global_step record the best epoch's position (loop
            # parity); the optimizer state is end-of-run — the one documented
            # fused divergence (train_epochs_fused docstring).
            live_state, live_step = self.state, self.global_step
            self.state = TrainState(self._fused_best["trainable"], self.state.opt_state)
            self.current_epoch = self._fused_best["epoch"]
            self.global_step = step0 + (
                self._fused_best["epoch"] - self.start_epoch + 1
            ) * steps_per_epoch
            checkpoint = self._build_checkpoint()
            # The one fused divergence (train_epochs_fused docstring): the
            # moments/schedule position are end-of-run, not best-epoch.
            # Stamp it so resume_from_checkpoint can warn.
            checkpoint["optimizer_state_is_final"] = True
            self.state, self.global_step = live_state, live_step
            self.current_epoch = self.args.num_train_epochs - 1
            save_checkpoint(
                self.args.checkpoint_dir / "best_model.ckpt", checkpoint, backend=self.ckpt_backend
            )
            _logger.info("Saved best model checkpoint at epoch %d", self._fused_best["epoch"])

    def _train_loop(self) -> None:
        """Reference-shaped per-epoch host loop (exact checkpoint semantics)."""
        for epoch in range(self.start_epoch, self.args.num_train_epochs):
            self.current_epoch = epoch
            epoch_lr = float(self.schedule(self.global_step))

            train_loss = self.train_epoch()
            val_loss = self.validate_epoch()
            _logger.info(
                "Epoch %d: Train Loss = %.6f, Val Loss = %.6f (%.1f series/s)",
                epoch,
                train_loss,
                val_loss,
                self.last_throughput or 0.0,
            )

            if self._wandb_run is not None:
                if self.args.logging_strategy == "epoch":
                    self._wandb_run.log(
                        {"train/loss": train_loss, "train/lr": epoch_lr, "val/loss": val_loss},
                        step=self.global_step,
                    )
                else:
                    # Reference parity: val/loss is logged even under
                    # logging_strategy="no" (reference trainer.py:386-387).
                    self._wandb_run.log({"val/loss": val_loss}, step=self.global_step)

            if self.args.save_strategy in ("epoch", "best"):
                self.save_ckpt(val_loss)
