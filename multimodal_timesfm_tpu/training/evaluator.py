"""Evaluator: aggregated MSE/MAE (and optionally quantile metrics) over a dataset.

Parity: reference ``MultimodalEvaluator``
(``/root/reference/src/tsfmx/evaluator.py:12-71``): per-batch means are
weighted by batch size and divided by the total sample count — equivalent to
the mean per-sample MSE/MAE over the dataset, which is what is computed here
directly (one jitted scan over padded static batches).

Extension: ``quantile_metrics=True`` additionally evaluates the adapter's
quantile channels (mean pinball + WQL) — the reference never scores the
quantile heads its Chronos backbone produces.
"""

from __future__ import annotations

from typing import Any

import math

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_timesfm_tpu.data.collate import StackedDataset, stack_samples
from multimodal_timesfm_tpu.models.base import Params
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder
from multimodal_timesfm_tpu.types import EvaluationMetrics


# Jitted eval executables keyed by (model, horizon): returning the SAME
# callable across evaluate() calls lets jit reuse the traced/compiled program
# instead of retracing a fresh closure per call. Bounded LRU: each entry's
# closure pins its decoder + compiled executable, so eviction keeps sweeps
# that build a fresh decoder per trial from growing memory monotonically.
# Decoders are treated as immutable after construction (true everywhere in
# this codebase) — mutating one and re-evaluating would serve a stale trace.
from collections import OrderedDict

from multimodal_timesfm_tpu.utils.cache import lru_get

_EVAL_CACHE: OrderedDict[tuple, object] = OrderedDict()
_EVAL_CACHE_MAX = 8


def _eval_fn(model: MultimodalDecoder, horizon_len: int, quantile_metrics: bool = False) -> Any:
    key = (id(model), horizon_len, quantile_metrics)
    return lru_get(
        _EVAL_CACHE,
        key,
        lambda: _build_eval_fn(model, horizon_len, quantile_metrics),
        _EVAL_CACHE_MAX,
    )


def _build_eval_fn(model: MultimodalDecoder, horizon_len: int, quantile_metrics: bool) -> Any:
    if quantile_metrics:
        levels, mean_channel = model.adapter.quantile_loss_spec
        levels_arr = jnp.asarray(levels, jnp.float32)

    @jax.jit
    def run(params, batches):
        def one(_, mb):
            masks = jnp.zeros_like(mb["context"], dtype=bool)
            w = mb["weights"][:, None]
            if quantile_metrics:
                full = model.forward_full(
                    params, horizon_len, mb["context"], masks, mb.get("text")
                ).astype(jnp.float32)
                point = full[..., model.adapter.point_forecast_index]
                q_channels = [
                    c for c in range(full.shape[-1]) if c != mean_channel
                ]
                errs = mb["horizon"][..., None] - full[..., q_channels]  # (B,H,Q)
                pinball = jnp.maximum((levels_arr - 1.0) * errs, levels_arr * errs)
                pb = jnp.sum(pinball * w[..., None]) / (horizon_len * len(levels))
                abs_y = jnp.sum(jnp.abs(mb["horizon"]) * w) / horizon_len
            else:
                point = model(
                    params, horizon_len, mb["context"], masks, mb.get("text")
                )
                pb = jnp.float32(0.0)
                abs_y = jnp.float32(0.0)
            err = point.astype(jnp.float32) - mb["horizon"]
            se = jnp.sum(err * err * w) / horizon_len
            ae = jnp.sum(jnp.abs(err) * w) / horizon_len
            return None, (se, ae, pb, abs_y)

        _, (se, ae, pb, abs_y) = jax.lax.scan(one, None, batches)
        return jnp.sum(se), jnp.sum(ae), jnp.sum(pb), jnp.sum(abs_y)

    return run


class MultimodalEvaluator:
    """Computes evaluation metrics for a multimodal decoder."""

    def __init__(self, model: MultimodalDecoder, mesh: Any = None) -> None:
        self.model = model
        self.mesh = mesh

    def evaluate(
        self,
        params: Params,
        dataset: Any,
        batch_size: int = 8,
        multimodal: bool | None = None,
        quantile_metrics: bool = False,
    ) -> EvaluationMetrics:
        """Evaluate over the dataset; raises RuntimeError if it is empty.

        Args:
            dataset: list of PreprocessedSample, a SizedDataset, or a
                StackedDataset.
            multimodal: whether to feed text embeddings; default = presence
                of text embeddings in the data (reference: presence of the
                batch key toggles fusion, ``evaluator.py:53``).
            quantile_metrics: also evaluate the quantile channels (extension
                — the reference is MSE/MAE-only, ``evaluator.py:59-71``):
                ``mean_pinball`` = mean pinball loss over the adapter's
                ``quantile_loss_spec`` levels, and ``wql`` = the standard
                weighted quantile loss, ``2·Σ pinball / Σ|y|`` averaged over
                levels (scale-free; the headline Chronos-style metric).
        """
        if not isinstance(dataset, StackedDataset):
            if len(dataset) == 0:
                raise RuntimeError("Evaluation dataset is empty.")
            probe = dataset[0]
            if multimodal is None:
                multimodal = "text_embeddings" in probe
            data = stack_samples(dataset, multimodal)
        else:
            data = dataset
            if multimodal is None:
                multimodal = data.text_embeddings is not None
        n = len(data)
        if n == 0:
            raise RuntimeError("Evaluation dataset is empty.")

        horizon_len = int(data.horizon.shape[1])
        dp = self.mesh.shape["data"] if self.mesh is not None else 1
        b = math.ceil(batch_size / dp) * dp
        num_batches = math.ceil(n / b)
        total = num_batches * b

        take = np.resize(np.arange(n), total)
        weights = np.zeros(total, np.float32)
        weights[:n] = 1.0
        # contiguous order: rows n..total-1 are pad

        tree = {
            "context": data.context[take].reshape(num_batches, b, -1),
            "horizon": data.horizon[take].reshape(num_batches, b, -1),
            "weights": weights.reshape(num_batches, b),
        }
        if multimodal and data.text_embeddings is not None:
            tree["text"] = data.text_embeddings[take].reshape(
                (num_batches, b) + data.text_embeddings.shape[1:]
            )

        if self.mesh is not None:
            spec = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(None, "data")
            )
            tree = jax.tree.map(lambda x: jax.device_put(x, spec), tree)

        total_mse, total_mae, total_pb, total_abs = _eval_fn(
            self.model, horizon_len, quantile_metrics
        )(params, tree)
        metrics = EvaluationMetrics(mse=float(total_mse) / n, mae=float(total_mae) / n)
        if quantile_metrics:
            metrics["mean_pinball"] = float(total_pb) / n
            metrics["wql"] = 2.0 * float(total_pb) / max(float(total_abs), 1e-12)
        return metrics
