"""Platform selection knob for CLI entry points.

``MTT_PLATFORM=cpu|tpu`` overrides the JAX platform for the framework's
scripts. Needed because some deployments (including this one) register the
TPU PJRT plugin in ``sitecustomize`` and set ``JAX_PLATFORMS`` before user
code runs — by then only ``jax.config`` can switch platforms. Scripts call
:func:`apply_platform_env` before any computation.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Pin ``jax_platforms`` from ``MTT_PLATFORM`` or ``JAX_PLATFORMS``.

    ``MTT_PLATFORM`` wins. Mirroring ``JAX_PLATFORMS`` into ``jax.config``
    looks redundant but is not: deployments that register an out-of-tree
    PJRT plugin in ``sitecustomize`` can still *initialize* that plugin
    during backend discovery even when the env var names only ``cpu`` —
    observed here as every env-pinned CPU process hanging whenever the TPU
    tunnel is unreachable. The explicit config update is the only pin that
    fully bypasses the plugin.
    """
    platform = os.environ.get("MTT_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def enable_compile_cache(cache_dir: str | os.PathLike | None = None) -> None:
    """Persistent XLA compilation cache.

    Defaults to ``$MTT_COMPILE_CACHE`` or ``~/.cache/multimodal_timesfm_tpu/jax``.
    Safe to call before any computation in CLI entry points; on-disk entries
    are keyed by program + compiler version, so stale hits are not a concern.

    Whether repeat *processes* actually hit the cache depends on the
    backend's compile key: plain CPU/TPU backends dedupe across processes,
    but remote-compile deployments may embed per-process/session material in
    the key (this deployment's tunneled TPU does — see CLAUDE.md), in which
    case the cache only helps within one process. Don't build warm-start
    assumptions on it.
    """
    from pathlib import Path

    import jax

    path = Path(cache_dir or os.environ.get("MTT_COMPILE_CACHE", "")
                or Path.home() / ".cache" / "multimodal_timesfm_tpu" / "jax")
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
