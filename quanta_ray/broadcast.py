"""Per-worker-process memoization for broadcast (``ray.put``) lookup state.

The repo's broadcast-join idiom is: ``ray.put`` the small side once, read it
inside every ``map_batches`` task. The actor-pool form (fetch in
``__init__``) amortizes the fetch but pays actor-pool spin-up (~0.5-1.5 s
per stage) — a fixed tax that dominates short queries and adds up across a
42-query board. Plain-FUNCTION tasks reuse Ray's warm worker processes, so
a process-level memo gives the same once-per-process amortization with zero
spin-up: ``ray.get`` of a numpy/arrow payload is zero-copy from the local
plasma store, and the dict hit afterwards is free.

``cached_state`` additionally memoizes DERIVED state (sorted key arrays,
dict indexes, compiled artifacts) so the build cost is also once per
process, exactly like an actor ``__init__``. The cache is a small FIFO —
broadcast sides are small by contract (guarded by ``_broadcast_limit()``
at the call sites), so at most ``_MAX`` of them are pinned per worker.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[str, Any] = {}
_ORDER: list[str] = []
_MAX = 8


def cached_state(key: str, build: Callable[[], Any]) -> Any:
    """Memoize ``build()`` under ``key`` in this worker process."""
    hit = _CACHE.get(key)
    if hit is not None or key in _CACHE:
        return hit
    val = build()
    _CACHE[key] = val
    _ORDER.append(key)
    while len(_ORDER) > _MAX:
        _CACHE.pop(_ORDER.pop(0), None)
    return val


def cached_get(ref) -> Any:
    """``ray.get(ref)``, memoized per worker process (zero-copy + free hits)."""

    def _fetch():
        import ray

        return ray.get(ref)

    return cached_state(ref.hex(), _fetch)
