"""Bounded-LRU helper for jitted-executable caches.

Several modules cache compiled programs keyed by (model identity, geometry)
tuples — the evaluator, the vectorized sweep trainer/evaluator, and the
``Forecaster``'s point/full/AR programs. Each entry pins a compiled
executable (and usually the decoder its closure captures), so the caches
must be bounded: sweeps that build a fresh decoder per trial would otherwise
grow memory monotonically. This helper centralizes the eviction idiom those
call sites previously hand-rolled.

Keying by ``id(model)`` is safe here because every cached closure keeps the
model alive — a dead-object id can never be reused while its entry exists.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, TypeVar

V = TypeVar("V")


def lru_get(
    cache: OrderedDict,
    key: Any,
    factory: Callable[[], V],
    max_size: int,
) -> V:
    """Return ``cache[key]``, building it with ``factory()`` on a miss.

    Hits are moved to the MRU end; on insert the least-recently-used entries
    are evicted until ``len(cache) <= max_size``.
    """
    if key in cache:
        cache.move_to_end(key)
        return cache[key]
    value = factory()
    cache[key] = value
    while len(cache) > max_size:
        cache.popitem(last=False)
    return value
