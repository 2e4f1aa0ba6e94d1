"""Batch inference API: jit-cached forecasting over preprocessed datasets.

The reference exposes inference only implicitly (the decoder's forward inside
train/eval loops). This module adds a first-class serving surface: a
``Forecaster`` that jit-compiles the point/full forecast per (horizon, batch
bucket), pads ragged final batches to static shapes, serves over a device
mesh (batch sharding + optional tensor-parallel params), decodes long
horizons as ONE ``lax.scan`` dispatch (``forecast_autoregressive``), and can
denormalize predictions back to the original scale using the per-sample
z-score stats the Time-MMD loader records in metadata (``mean``/``std`` —
``/root/reference/examples/time_mmd/data/time_mmd_dataset.py:342-349``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_timesfm_tpu.data.collate import StackedDataset, stack_samples
from multimodal_timesfm_tpu.models.base import Params
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder
from multimodal_timesfm_tpu.utils.cache import lru_get


class Forecaster:
    """Frozen decoder + params, specialized for batched forecasting.

    ``mesh`` enables multi-chip serving: request batches are sharded over
    the mesh's ``data`` axis (throughput scales with chips; XLA inserts the
    collectives), and ``shard_params_fn`` (e.g.
    ``parallel.sharding.shard_params``) additionally tensor-shards the
    backbone weights over the ``model`` axis for models too large for one
    chip. ``batch_size`` must divide evenly by the data-axis size.
    """

    def __init__(
        self,
        model: MultimodalDecoder,
        params: Params,
        batch_size: int = 64,
        mesh: Any = None,
        shard_params_fn: Any = None,
    ) -> None:
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["data"]
            if batch_size % dp != 0:
                raise ValueError(
                    f"batch_size ({batch_size}) must be divisible by the mesh data "
                    f"axis ({dp}) for sharded serving"
                )
            from multimodal_timesfm_tpu.parallel.mesh import replicated

            params = (
                shard_params_fn(params, mesh)
                if shard_params_fn is not None
                else jax.device_put(params, replicated(mesh))
            )
            self._batch_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data")
            )
        else:
            # Commit params to device ONCE: checkpoint-loaded weights arrive
            # as host numpy, and leaving them uncommitted re-uploads the full
            # backbone on every jitted dispatch (~0.8GB/batch at 200M).
            params = jax.tree.map(jnp.asarray, params)
        from collections import OrderedDict

        self.params = params
        # Bounded LRUs: caller-controlled horizons mean unbounded distinct
        # keys; each entry pins a compiled executable.
        self._point_fn: OrderedDict = OrderedDict()
        self._full_fn: OrderedDict = OrderedDict()
        self._ar_fn_cache: OrderedDict = OrderedDict()
        self._fn_cache_max = 8

    def _stage(self, arr: Any) -> jax.Array:
        """Host array -> device; batch-sharded over the mesh when present."""
        if self.mesh is None:
            return jnp.asarray(arr)
        return jax.device_put(np.asarray(arr), self._batch_sharding)

    def _get_fn(self, horizon: int, full: bool, with_text: bool) -> Any:
        cache = self._full_fn if full else self._point_fn

        def build():
            method = self.model.forward_full if full else self.model
            if with_text:
                return jax.jit(lambda p, x, m, t: method(p, horizon, x, m, t))
            return jax.jit(lambda p, x, m: method(p, horizon, x, m, None))

        return lru_get(cache, (horizon, with_text), build, self._fn_cache_max)

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
            args = (self.params, self._stage(ctx), self._stage(msk))
            if txt is not None:
                args = args + (self._stage(txt),)
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

        # TPU-native decode: ALL rounds run as one jitted program per batch —
        # a lax.scan slides the context window device-side, so an H-step
        # decode costs one dispatch instead of ceil(H/chunk) host round-trips
        # (each with a device->host readback of the running context).
        rounds = -(-horizon // chunk)
        fn = self._get_ar_fn(chunk, rounds, text_embeddings is not None)

        n = ctx.shape[0]
        b = self.batch_size
        outs = []
        for i in range(0, n, b):
            bc, bm = ctx[i : i + b], msk[i : i + b]
            bt = text_embeddings[i : i + b] if text_embeddings is not None else None
            real = bc.shape[0]
            if real < b:  # pad the final batch to the static shape
                pad = b - real
                bc = np.concatenate([bc, np.repeat(bc[-1:], pad, 0)])
                bm = np.concatenate([bm, np.repeat(bm[-1:], pad, 0)])
                if bt is not None:
                    bt = np.concatenate([bt, np.repeat(bt[-1:], pad, 0)])
            args = (self.params, self._stage(bc), self._stage(bm))
            if bt is not None:
                args = args + (self._stage(np.asarray(bt)),)
            outs.append(np.asarray(fn(*args))[:real])
        return np.concatenate(outs, axis=0)[:, :horizon]

    def _get_ar_fn(self, chunk: int, rounds: int, with_text: bool) -> Any:
        """Jitted whole-decode program: round 0 (with optional text fusion)
        then a ``lax.scan`` over the remaining context-sliding rounds."""
        return lru_get(
            self._ar_fn_cache,
            (chunk, rounds, with_text),
            lambda: self._build_ar_fn(chunk, rounds),
            self._fn_cache_max,
        )

    def _build_ar_fn(self, chunk: int, rounds: int) -> Any:
        def slide(ctx, msk, preds):
            preds = preds.astype(ctx.dtype)
            ctx = jnp.concatenate([ctx[:, chunk:], preds], axis=1)
            msk = jnp.concatenate([msk[:, chunk:], jnp.zeros_like(preds, bool)], axis=1)
            return ctx, msk

        def decode(params, ctx, msk, text=None):
            preds0 = self.model(params, chunk, ctx, msk, text)
            if rounds == 1:
                return preds0
            ctx, msk = slide(ctx, msk, preds0)

            def round_body(carry, _):
                c, m = carry
                preds = self.model(params, chunk, c, m, None)
                return slide(c, m, preds), preds

            _, rest = jax.lax.scan(round_body, (ctx, msk), None, length=rounds - 1)
            rest = jnp.moveaxis(rest, 0, 1).reshape(ctx.shape[0], -1)  # (B, (R-1)*chunk)
            return jnp.concatenate([preds0.astype(rest.dtype), rest], axis=1)

        return jax.jit(decode)

    def forecast_dataset(
        self,
        horizon: int,
        dataset: Any,
        multimodal: bool | None = None,
        denormalize: bool = False,
        full: bool = False,
        autoregressive: bool = False,
        text_mode: str = "first_window",
    ) -> np.ndarray:
        """Forecast every sample of a (preprocessed) dataset.

        With ``denormalize``, predictions are mapped back to the original
        scale via each sample's recorded z-score ``mean``/``std`` metadata.
        ``autoregressive`` routes through :meth:`forecast_autoregressive`
        (point forecasts only; horizons beyond the backbone's single-shot
        cap), with ``text_mode`` forwarded for the multi-window fusion
        contract documented there.
        """
        if autoregressive and full:
            raise ValueError(
                "autoregressive decode produces point forecasts only; drop full=True"
            )
        if not isinstance(dataset, StackedDataset):
            if multimodal is None:
                multimodal = len(dataset) > 0 and "text_embeddings" in dataset[0]
            data = stack_samples(dataset, multimodal)
        else:
            data = dataset
            if multimodal is None:
                multimodal = data.text_embeddings is not None

        text = data.text_embeddings if multimodal else None
        if autoregressive:
            preds = self.forecast_autoregressive(
                horizon, data.context, text_embeddings=text, text_mode=text_mode
            )
        else:
            preds = self.forecast(horizon, data.context, text_embeddings=text, full=full)
        if denormalize:
            mean = np.array([m.get("mean", 0.0) for m in data.metadata], np.float32)
            std = np.array([m.get("std", 1.0) for m in data.metadata], np.float32)
            shape = (-1,) + (1,) * (preds.ndim - 1)
            preds = preds * std.reshape(shape) + mean.reshape(shape)
        return preds
