"""Hash-partitioned actor exchange — the beyond-root-bound aggregate.

``stages/agg.py``'s merge tree is exact and fast while the root block can
hold one row per distinct key (~10^7-10^8 keys).  Past that, this module
provides the scale path: B aggregator ACTORS, each owning the key range
``hash(key) % B == b`` and merging partials incrementally as feeder tasks
push batches.  Memory per actor = distinct keys / B — scaled by B, not by
data size.  This is the one place the engine drops below the Dataset API
(a shared mutable index per bucket cannot be expressed as a batch
transform).

Correctness under retries: Ray Data may re-run a feeder task after a
failure, which would double-count its partials.  Every ``add`` therefore
carries a fingerprint derived from the feeder TASK's identity plus the
batch's ordinal within that task (NOT from the partial's content — two
different batches can legitimately produce byte-identical partials, e.g.
constant-key data); each actor keeps the set of fingerprints it has
merged and drops duplicates — making the exchange idempotent and safe
under lineage-based task retry (SURVEY §4 "retries").
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import pandas as pd
import pyarrow as pa
import ray

# Per-worker ordinal state for feeder fingerprints: task_id -> [attempt, n].
# A fingerprint must be (a) identical when Ray re-executes the SAME task
# (lineage retry replays the same block, hence the same batch sequence, so
# task_id + ordinal reproduces), and (b) distinct for DIFFERENT batches even
# when their partial CONTENT is identical (constant-key data makes every
# batch emit the same (key, sum) row — a content-only fingerprint would
# silently drop all but the first).  Ordinals reset when the attempt number
# changes so a re-execution on a surviving worker replays 0,1,2,… again.
_FEED_ORDINALS: Dict[str, List[int]] = {}

#: composite routing-key separator — ASCII unit separator.  ``"|"`` made
#: distinct multi-column keys collide (``("a|b","c")`` and ``("a","b|c")``
#: both render ``"a|b|c"``); ``"\x00"`` is unusable because pandas' string
#: hashtable treats values as NUL-terminated C strings.  Routing collisions
#: only ever co-located extra keys (finish kernels group again inside the
#: bucket), but a finish_fn that trusts the bucket key must see injective
#: keys.
KEY_SEP = "\x1f"


def composite_key(part: pd.DataFrame, keys: Sequence[str]) -> pd.Series:
    """Injective string rendering of a multi-column key (assuming no
    key value itself contains ``\\x1f``, which no engine key does —
    they are ids, hashes, labels)."""
    return part[list(keys)].astype(str).agg(KEY_SEP.join, axis=1)


def _task_attempt_number() -> int:
    """Current task's retry attempt (0 on first execution).

    Ray 2.49's public ``RuntimeContext`` exposes no attempt-number method,
    but the core worker does (``get_current_task_attempt_number``, verified
    to increment across lineage re-execution on this Ray version).  Without
    it, a re-executed feeder task landing on a SURVIVING, reused worker
    process would continue its ordinal sequence instead of replaying
    0,1,2,…, giving retried batches fresh fingerprints — double-merged
    aggregates.  Fail loudly rather than silently lose idempotence."""
    import ray._private.worker as _w

    core = getattr(_w.global_worker, "core_worker", None)
    get_att = getattr(core, "get_current_task_attempt_number", None)
    if get_att is None:  # pragma: no cover - depends on Ray version
        raise RuntimeError(
            "nerpii_ray exchange: this Ray build exposes no task-attempt "
            "API; feeder retry idempotence cannot be guaranteed. "
            "Pin Ray to a version with "
            "CoreWorker.get_current_task_attempt_number."
        )
    return int(get_att())


def _next_fingerprint(tid: str, attempt: int) -> str:
    """Pure ordinal step: same (tid, attempt) sequence → 0,1,2,…; a NEW
    attempt of the same task resets to 0 so its fingerprints collide with
    (and are dropped against) the original attempt's."""
    slot = _FEED_ORDINALS.get(tid)
    if slot is None or slot[0] != attempt:
        slot = [attempt, 0]
        _FEED_ORDINALS[tid] = slot
    n = slot[1]
    slot[1] = n + 1
    # attempt is deliberately NOT part of the fingerprint: a retried
    # attempt must COLLIDE with the original so the aggregator drops it.
    return f"{tid}:{n}"


def _batch_fingerprint() -> str:
    ctx = ray.get_runtime_context()
    try:
        tid = ctx.get_task_id() or "driver"
    except Exception:
        tid = "driver"
    if tid == "driver":
        attempt = 0  # driver code never re-executes under lineage retry
    else:
        attempt = _task_attempt_number()
    return _next_fingerprint(tid, attempt)


@ray.remote(num_cpus=0)
class _BucketAggregator:
    """Owns one hash bucket; merges partial frames incrementally.

    num_cpus=0: aggregators must never compete with the feeder tasks for
    scheduling slots (B aggregators on an N-CPU node would otherwise
    deadlock the feed when B ≥ N); their merge work is incremental and
    amortized."""

    def __init__(
        self,
        merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
        finish_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    ):
        self.merge_fn = merge_fn
        self.finish_fn = finish_fn
        self.state: Optional[pd.DataFrame] = None
        self.seen: set = set()
        self.pending: List[pd.DataFrame] = []

    def add(self, fingerprint: str, table: pa.Table) -> bool:
        if fingerprint in self.seen:
            return False  # retried feeder task — drop the duplicate
        self.seen.add(fingerprint)
        self.pending.append(table.to_pandas())
        # fold periodically so memory stays ~one merged frame per bucket
        if len(self.pending) >= 8:
            self._fold()
        return True

    def _fold(self) -> None:
        frames = self.pending
        if self.state is not None:
            frames = [self.state] + frames
        self.pending = []
        if frames:
            self.state = self.merge_fn(pd.concat(frames, ignore_index=True))

    def has_data(self) -> bool:
        return self.state is not None or bool(self.pending)

    def finish(self) -> pa.Table:
        self._fold()
        if self.state is None:
            # nothing ever routed here: do NOT call finish_fn on a
            # column-less frame (kernels index their columns and would
            # KeyError; a names=[] block also pollutes downstream
            # schemas) — the caller filters this bucket out
            return pa.Table.from_pandas(pd.DataFrame(), preserve_index=False)
        out = self.state
        if self.finish_fn is not None:
            out = self.finish_fn(out)
        return pa.Table.from_pandas(out, preserve_index=False)


def hash_exchange_aggregate(
    ds,
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    keys: Sequence[str],
    num_buckets: int = 8,
    batch_size: int = 65536,
    finish_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    as_dataset: bool = False,
    empty_result_fn: Optional[Callable[[], pa.Table]] = None,
):
    """Exact grouped aggregation via B aggregator actors.

    partial_fn/merge_fn have the same contract as ``tree_aggregate``;
    rows route to actors by ``hash(keys) % B``.  ``finish_fn`` (optional)
    runs ONCE per bucket on its fully merged frame — for per-key-range
    finishing work that needs every row of a key co-located (e.g. pairing
    within LSH buckets).  Returns a pandas DataFrame by default (concat
    of per-bucket results; buckets partition the key space, so no further
    merge is needed); with ``as_dataset=True`` the per-bucket result
    blocks become a ``ray.data.Dataset`` directly from the object store —
    the driver never materializes the aggregate, so the result may be
    arbitrarily larger than driver memory.
    """
    keys = list(keys)
    actors = [
        _BucketAggregator.remote(merge_fn, finish_fn) for _ in range(num_buckets)
    ]

    def feeder(batch: pd.DataFrame) -> pd.DataFrame:
        part = partial_fn(batch)
        if len(part):
            key_str = composite_key(part, keys)
            buckets = pd.util.hash_pandas_object(key_str, index=False) % num_buckets
            # fingerprint from task identity + batch ordinal → a retried
            # task resends under the SAME fingerprint (dropped), while
            # distinct batches with identical partial content stay distinct
            fp_base = _batch_fingerprint()
            refs = []
            for b in range(num_buckets):
                sub = part[buckets == b]
                if len(sub):
                    refs.append(
                        actors[b].add.remote(
                            f"{fp_base}:{b}",
                            pa.Table.from_pandas(sub, preserve_index=False),
                        )
                    )
            ray.get(refs)  # backpressure: feeder waits for acks
        return pd.DataFrame({"rows": [len(batch)]})

    # drive the feed; count() forces full consumption
    ds.map_batches(feeder, batch_format="pandas", batch_size=batch_size).count()
    # skip buckets that never received a row — their finish would be a
    # column-less block (crashes column-indexing kernels downstream)
    fed = ray.get([a.has_data.remote() for a in actors])
    live = [a for a, f in zip(actors, fed) if f]
    if not live and empty_result_fn is not None:
        # all-empty input: emit the caller's TYPED empty result instead
        # of a column-less block (which KeyErrors any downstream kernel
        # that indexes its columns).  Invoked lazily — only this branch
        # pays for deriving the schema.
        tbl = empty_result_fn()
        for a in actors:
            ray.kill(a)
        if as_dataset:
            import ray.data as rd

            return rd.from_arrow(tbl)
        return tbl.to_pandas()
    if not live:
        live = actors[:1]  # all-empty input: one empty block, stable path
    refs = [a.finish.remote() for a in live]
    if as_dataset:
        # wait for completion WITHOUT fetching to the driver; the block
        # objects are owned by the driver and outlive the actors, which
        # terminate when their handles go out of scope
        ray.wait(refs, num_returns=len(refs))
        import ray.data as rd

        return rd.from_arrow_refs(refs)
    tables = ray.get(refs)
    frames = [t.to_pandas() for t in tables if t.num_rows]
    for a in actors:
        ray.kill(a)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True).reset_index(drop=True)
