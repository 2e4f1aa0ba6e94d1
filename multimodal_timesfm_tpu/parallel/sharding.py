"""Parameter sharding rules: tensor parallelism for the backbone matmuls.

Megatron-style TP expressed the XLA way: annotate weight shardings over the
``model`` mesh axis and let GSPMD insert the collectives. For each residual
block / FFN pair the hidden dimension is column-sharded on the up projection
and row-sharded on the down projection, so one psum per block rides the ICI.
Attention shards the head dimension.

The reference has no parallelism at all (SURVEY.md §2.4); this is new,
TPU-idiomatic design surface.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_timesfm_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path: tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for one parameter, keyed by its pytree path.

    Conventions (dims counted from the right so stacked-layer leading dims
    are transparent):
      * ``*_up``-style kernels (hidden-expanding): shard last dim
      * ``*_down``-style kernels (hidden-contracting): shard second-to-last
      * everything else replicated
    """
    names = [p for p in path if isinstance(p, str)]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""

    def last_dim_sharded() -> P:
        return P(*([None] * (ndim - 1) + [MODEL_AXIS]))

    def second_last_sharded() -> P:
        return P(*([None] * (ndim - 2) + [MODEL_AXIS, None]))

    # Column-parallel: expand into the sharded hidden/head dimension.
    # The FUSED qkv kernel (D, 3*H*D) is deliberately NOT column-sharded:
    # layers.py slices the fused output at the q/k/v thirds ([0:HD],
    # [HD:2HD], [2HD:3HD]) and the seq==1 fast path slices the kernel
    # itself — those boundaries only align with shard boundaries when
    # model_parallel is a multiple of 3, so for any other mp GSPMD must
    # all-gather the qkv activation every layer, silently defeating TP.
    # Replicating qkv keeps attention compute data-parallel; the out
    # projection stays row-parallel (local input slice + one psum), and the
    # separate q/k/v kernels of the Chronos/T5 path shard cleanly by head.
    if parent in ("ffn_up", "hidden", "q", "k", "v") and leaf in ("kernel", "bias"):
        return last_dim_sharded()
    # Row-parallel: contract the sharded dimension (bias replicated).
    if parent in ("ffn_down", "out", "output") and leaf == "kernel":
        return second_last_sharded()
    return P()


def _iter_specs(tree: Any) -> Any:
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    specs = []
    for path, leaf in flat:
        names = tuple(
            p.key if isinstance(p, jax.tree_util.DictKey) else str(p) for p in path
        )
        specs.append(_spec_for(names, leaf.ndim))
    return jax.tree_util.tree_unflatten(treedef, specs)


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a decoder/backbone params pytree."""
    return _iter_specs(params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place params on the mesh with TP shardings (no-op specs when model axis is 1)."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
