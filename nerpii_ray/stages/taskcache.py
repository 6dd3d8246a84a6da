"""Per-worker-process construction cache for task-pool stages.

The actor-pool form of ``map_batches(Cls, concurrency=...)`` gives
setup-once-per-actor semantics but pays actor spin-up (hundreds of ms
per actor, serialized) and pins pool width.  For stages whose state is
DETERMINISTIC from constructor arguments (compiled registries, stopword
tables, normalized query matrices), a plain task pool plus this memo is
strictly better: Ray reuses prestarted worker processes, the first task
on each worker constructs the state, later tasks hit the cache, and the
pool is elastic at cluster width.  State is a pure memo, so tasks stay
idempotent and retry-safe.

Same pattern as ``dedup._MH_CACHE`` / ``similarity._SCORER_CACHE``; this
module is the shared form for new call sites.
"""

from __future__ import annotations

from collections import OrderedDict

_CACHE: "OrderedDict" = OrderedDict()

#: bound on distinct cached constructions per worker — a long-lived
#: worker serving many differently-parameterized stages evicts the
#: least-recently-USED entry (move-to-end on hit), so a hot flagship
#: recognizer can't be pushed out by a burst of one-off constructions
_MAX_ENTRIES = 32


def worker_cached(cls, /, **kwargs):
    """Return ``cls(**kwargs)``, constructed at most once per worker
    process per distinct (cls, kwargs).  kwargs must be hashable and
    must fully determine the construction (no ambient state)."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))
    obj = _CACHE.get(key)
    if obj is None:
        if len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.popitem(last=False)
        obj = _CACHE.setdefault(key, cls(**kwargs))
    else:
        _CACHE.move_to_end(key)
    return obj
