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
    platform = os.environ.get("MTT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
