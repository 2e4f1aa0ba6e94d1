"""Evaluator: aggregated MSE/MAE over a dataset.

Parity: reference ``MultimodalEvaluator``
(``/root/reference/src/tsfmx/evaluator.py:12-71``): per-batch means are
weighted by batch size and divided by the total sample count — equivalent to
the mean per-sample MSE/MAE over the dataset, which is what is computed here
directly (one jitted scan over padded static batches).
"""

from __future__ import annotations

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

_EVAL_CACHE: OrderedDict[tuple, object] = OrderedDict()
_EVAL_CACHE_MAX = 8


def _eval_fn(model: MultimodalDecoder, horizon_len: int):
    key = (id(model), horizon_len)
    if key in _EVAL_CACHE:
        _EVAL_CACHE.move_to_end(key)
    else:

        @jax.jit
        def run(params, batches):
            def one(_, mb):
                masks = jnp.zeros_like(mb["context"], dtype=bool)
                point = model(params, horizon_len, mb["context"], masks, mb.get("text"))
                err = point.astype(jnp.float32) - mb["horizon"]
                w = mb["weights"][:, None]
                se = jnp.sum(err * err * w) / horizon_len
                ae = jnp.sum(jnp.abs(err) * w) / horizon_len
                return None, (se, ae)

            _, (se, ae) = jax.lax.scan(one, None, batches)
            return jnp.sum(se), jnp.sum(ae)

        _EVAL_CACHE[key] = run
        while len(_EVAL_CACHE) > _EVAL_CACHE_MAX:
            _EVAL_CACHE.popitem(last=False)
    return _EVAL_CACHE[key]


class MultimodalEvaluator:
    """Computes evaluation metrics for a multimodal decoder."""

    def __init__(self, model: MultimodalDecoder, mesh=None) -> None:
        self.model = model
        self.mesh = mesh

    def evaluate(
        self,
        params: Params,
        dataset,
        batch_size: int = 8,
        multimodal: bool | None = None,
    ) -> EvaluationMetrics:
        """Evaluate over the dataset; raises RuntimeError if it is empty.

        Args:
            dataset: list of PreprocessedSample, a SizedDataset, or a
                StackedDataset.
            multimodal: whether to feed text embeddings; default = presence
                of text embeddings in the data (reference: presence of the
                batch key toggles fusion, ``evaluator.py:53``).
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

        total_mse, total_mae = _eval_fn(self.model, horizon_len)(params, tree)
        return EvaluationMetrics(mse=float(total_mse) / n, mae=float(total_mae) / n)
