"""Batch inference API: jit-cached forecasting over preprocessed datasets.

The reference exposes inference only implicitly (the decoder's forward inside
train/eval loops). This module adds a first-class serving surface: a
``Forecaster`` that jit-compiles the point/full forecast per (horizon, batch
bucket), pads ragged final batches to static shapes, and can denormalize
predictions back to the original scale using the per-sample z-score stats the
Time-MMD loader records in metadata (``mean``/``std`` —
``/root/reference/examples/time_mmd/data/time_mmd_dataset.py:342-349``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_timesfm_tpu.data.collate import StackedDataset, stack_samples
from multimodal_timesfm_tpu.models.base import Params
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder


class Forecaster:
    """Frozen decoder + params, specialized for batched forecasting."""

    def __init__(self, model: MultimodalDecoder, params: Params, batch_size: int = 64) -> None:
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self._point_fn = {}
        self._full_fn = {}

    def _get_fn(self, horizon: int, full: bool, with_text: bool):
        cache = self._full_fn if full else self._point_fn
        key = (horizon, with_text)
        if key not in cache:
            method = self.model.forward_full if full else self.model

            if with_text:
                fn = jax.jit(lambda p, x, m, t: method(p, horizon, x, m, t))
            else:
                fn = jax.jit(lambda p, x, m: method(p, horizon, x, m, None))
            cache[key] = fn
        return cache[key]

    def forecast(
        self,
        horizon: int,
        context: np.ndarray,
        masks: np.ndarray | None = None,
        text_embeddings: np.ndarray | None = None,
        full: bool = False,
    ) -> np.ndarray:
        """Forecast (N, horizon) point values (or (N, horizon, Q) with ``full``).

        Inputs are host arrays; batches are padded to the configured batch
        size so at most two programs are compiled per horizon.
        """
        n = context.shape[0]
        if masks is None:
            masks = np.zeros_like(context, dtype=bool)
        fn = self._get_fn(horizon, full, text_embeddings is not None)

        outs = []
        b = self.batch_size
        for i in range(0, n, b):
            ctx = context[i : i + b]
            msk = masks[i : i + b]
            txt = text_embeddings[i : i + b] if text_embeddings is not None else None
            real = ctx.shape[0]
            if real < b:  # pad the final batch to the static shape
                pad = b - real
                ctx = np.concatenate([ctx, np.repeat(ctx[-1:], pad, 0)])
                msk = np.concatenate([msk, np.repeat(msk[-1:], pad, 0)])
                if txt is not None:
                    txt = np.concatenate([txt, np.repeat(txt[-1:], pad, 0)])
            args = (self.params, jnp.asarray(ctx), jnp.asarray(msk))
            if txt is not None:
                args = args + (jnp.asarray(txt),)
            outs.append(np.asarray(fn(*args))[:real])
        return np.concatenate(outs, axis=0)

    def forecast_autoregressive(
        self,
        horizon: int,
        context: np.ndarray,
        masks: np.ndarray | None = None,
        text_embeddings: np.ndarray | None = None,
        text_mode: str = "first_window",
    ) -> np.ndarray:
        """Point forecasts beyond one output patch via autoregressive decode.

        Capability extension: the reference's TimesFM adapter hard-caps the
        horizon at one output patch and rejects AR decode
        (``/root/reference/src/tsfmx/tsfm/timesfm.py:116-119``). Here the
        context window slides: each round forecasts one chunk, appends it to
        the (fixed-length) context, and repeats.

        Text fusion applies to the FIRST window only (where the per-patch
        text embeddings describe the real context); continuation windows have
        no text for the forecasted spans and run without fusion. Because this
        silently diverges from the single-shot path a caller might expect,
        the semantics are caller-visible through ``text_mode``:

          * ``"first_window"`` (default): fuse the first window, warn ONCE
            per Forecaster when the decode actually spans multiple windows,
          * ``"error"``: raise when text is passed and the decode would need
            more than one window — for eval paths that must not silently
            change fusion behavior.

        Args:
            horizon: total steps; may exceed the backbone's single-shot cap.
            context: (N, C) with C a multiple of the patch length.
            text_embeddings: optional (N, num_patches, T) for the first window.
            text_mode: "first_window" | "error" (see above).

        Returns:
            (N, horizon) point forecasts.
        """
        if text_mode not in ("first_window", "error"):
            raise ValueError(
                f"Unsupported text_mode: {text_mode!r} (expected 'first_window' or 'error')"
            )
        adapter = self.model.adapter
        patch = adapter.patch_len
        # largest single-shot chunk that keeps the context patch-aligned
        single = getattr(adapter.config, "output_patch_len", None)
        if single is None:  # chronos: native long horizons
            return self.forecast(horizon, context, masks, text_embeddings)
        chunk = max((single // patch) * patch, patch)

        if text_embeddings is not None and horizon > chunk:
            if text_mode == "error":
                raise ValueError(
                    f"forecast_autoregressive with text_mode='error': horizon {horizon} "
                    f"needs {-(-horizon // chunk)} windows, but text fusion only applies "
                    "to the first window — drop the text, shorten the horizon, or use "
                    "text_mode='first_window' to accept first-window-only fusion."
                )
            if not getattr(self, "_warned_ar_text", False):
                import warnings

                warnings.warn(
                    "forecast_autoregressive: text fusion applies to the FIRST window "
                    f"only; the remaining {-(-horizon // chunk) - 1} window(s) decode "
                    "without text. Pass text_mode='error' to forbid this.",
                    UserWarning,
                    stacklevel=2,
                )
                self._warned_ar_text = True

        if masks is None:
            masks = np.zeros_like(context, dtype=bool)
        ctx = np.asarray(context, np.float32)
        msk = np.asarray(masks, bool)

        outs = []
        remaining = horizon
        first = True
        while remaining > 0:
            emit = min(chunk, remaining)
            text = text_embeddings if first else None
            preds = self.forecast(chunk, ctx, msk, text)  # (N, chunk)
            outs.append(preds[:, :emit])
            ctx = np.concatenate([ctx[:, chunk:], preds], axis=1)
            msk = np.concatenate([msk[:, chunk:], np.zeros_like(preds, bool)], axis=1)
            remaining -= emit
            first = False
        return np.concatenate(outs, axis=1)

    def forecast_dataset(
        self,
        horizon: int,
        dataset,
        multimodal: bool | None = None,
        denormalize: bool = False,
        full: bool = False,
    ) -> np.ndarray:
        """Forecast every sample of a (preprocessed) dataset.

        With ``denormalize``, predictions are mapped back to the original
        scale via each sample's recorded z-score ``mean``/``std`` metadata.
        """
        if not isinstance(dataset, StackedDataset):
            if multimodal is None:
                multimodal = len(dataset) > 0 and "text_embeddings" in dataset[0]
            data = stack_samples(dataset, multimodal)
        else:
            data = dataset
            if multimodal is None:
                multimodal = data.text_embeddings is not None

        preds = self.forecast(
            horizon,
            data.context,
            text_embeddings=data.text_embeddings if multimodal else None,
            full=full,
        )
        if denormalize:
            mean = np.array([m.get("mean", 0.0) for m in data.metadata], np.float32)
            std = np.array([m.get("std", 1.0) for m in data.metadata], np.float32)
            shape = (-1,) + (1,) * (preds.ndim - 1)
            preds = preds * std.reshape(shape) + mean.reshape(shape)
        return preds
