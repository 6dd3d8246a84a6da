"""Key co-location primitive for per-key ordered operators (window
functions, as-of joins, rolling windows, range joins).

The reference has no per-group ordered computation at all (it is a
single pandas frame; ``named_entity_recognizer.py:317`` iterates columns
of one in-memory table), but an engine at 10^12 rows needs the pattern
constantly: "bring every row of one key to one place, sorted, then run a
vectorized kernel over it".

``keyed_partition_apply`` is the one primitive, with the same
cardinality-aware physical plan as the aggregation tree (stages/agg.py):

* SMALL input (≤ the root threshold): ONE task runs the kernel over the
  whole frame — at this size any shuffle's fixed cost dwarfs the kernel
  (measured: Ray's sort-based ``groupby().map_groups`` spends 4–8 s of
  fixed latency to co-locate kilobytes of rows that a single task
  handles in milliseconds);
* LARGE input: the keyed hash-actor exchange (stages/exchange.py) —
  B aggregator actors each own ``hash(keys) % B`` and run the kernel
  once over their key range at finish, so no node ever holds the full
  table and the result stays key-partitioned in the object store.

Partitioning assumptions (stated per SURVEY §4):
* every bucket fits one worker's heap — the default actor count scales
  with cluster width and row count (≈ one per 1M rows, capped at CPUs);
  at the 100-TB design point pass ``num_buckets`` in the thousands;
* per-key ordering is established INSIDE the bucket kernel (sort the
  bucket frame), never globally — a global ``Dataset.sort`` would be an
  all-to-all over the full table for ordering only ever consumed
  per-key;
* skew: one key always lands in one bucket, so a single pathological
  key (>heap rows) needs upstream salting + a mergeable kernel — same
  contract as ``salt_hot_keys`` (stages/agg.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import pandas as pd


def keyed_partition_apply(
    ds,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: Optional[int] = None,
    path: str = "auto",
    hot_key_budget: Optional[int] = None,
    census_capacity: int = 4096,
):
    """Apply ``fn`` (pandas → pandas, vectorized) to key-partitioned
    frames, each containing only complete key-groups.

    ``fn`` sees a frame with the original columns holding every row of
    each key routed to that partition, in arbitrary order — sort inside
    if the kernel needs order.  It must tolerate an empty frame and
    multiple keys per call.

    ``path`` picks the physical plan:
    * ``"auto"`` (default) — decide small-vs-exchange from the row
      count.  For inputs whose count is knowable from METADATA (a pure
      parquet read: Ray's ``_meta_count``), the decision is free — no
      materialization, no pin, and the chosen finish is the input's
      first and only scan, at any scale.  Otherwise materialize the
      input once (the count needs a scan; the chosen finish then
      consumes the pinned copy, so rows are still scanned once);
    * ``"exchange"`` — go straight to the keyed actor exchange with NO
      materialization: the right call at a scale known a priori (a
      100-TB pipeline should stream into the exchange, not pin the
      whole input in the object store to learn what it already knows);
    * ``"small"`` — force the one-task finish (tests, bounded inputs).

    ``hot_key_budget`` (opt-in, VERDICT r4 #5): before the exchange, a
    Misra–Gries census pre-pass estimates the heaviest keys; any key
    whose DEFINITE row count (the MG estimate never overcounts) exceeds
    the budget raises loudly instead of OOMing a bucket actor at finish.
    Detection slack: a key in the band (budget, budget + N/census_capacity]
    can escape the census — size ``census_capacity`` so N/capacity is an
    acceptable overshoot.  Recovery is the stated per-kernel contract:
    ``salt_hot_keys`` + a cross-shard merge where the kernel is
    mergeable; ordered kernels must pre-filter or re-key.
    """
    import ray

    from nerpii_ray.stages.agg import ROOT_THRESHOLD_DEFAULT
    from nerpii_ray.stages.exchange import hash_exchange_aggregate

    keys = list(keys)
    n = None
    if path == "auto":
        try:
            n = ds._meta_count()  # metadata-only count (pure reads)
        except Exception:  # pragma: no cover - Ray-internal API drift
            n = None
        if n is None:
            ds = ds.materialize()
            n = ds.count()
        path = "small" if n <= ROOT_THRESHOLD_DEFAULT else "exchange"
    if path == "small":
        # ONE task, whole-frame kernel: repartition(1) is a plain
        # coalesce (no sort sampling) of an already-bounded table
        return ds.repartition(1).map_batches(
            fn, batch_format="pandas", batch_size=None
        )
    if path != "exchange":
        raise ValueError(f"keyed_partition_apply: unknown path {path!r}")
    if hot_key_budget is not None:
        from nerpii_ray.stages.agg import misra_gries_topk
        from nerpii_ray.stages.exchange import composite_key

        def keycol(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"__ck": composite_key(b, keys)})

        census = misra_gries_topk(
            ds.map_batches(keycol, batch_format="pandas"),
            "__ck",
            capacity=census_capacity,
            out_k=8,
        ).to_pandas()
        over = census.loc[census["est_count"] > hot_key_budget]
        if len(over):
            worst = over.iloc[0]
            raise RuntimeError(
                f"keyed_partition_apply: hot key {worst['value']!r} has at "
                f"least {int(worst['est_count'])} rows — over the "
                f"hot_key_budget of {hot_key_budget} for one bucket.  Salt "
                f"the key upstream (salt_hot_keys) if the kernel is "
                f"mergeable across shards, or re-key / pre-filter."
            )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nb = num_buckets or int(
        min(max(8, ncpu), max(2, (n or 0) // 1_000_000 + 1))
        if n is not None
        else max(8, ncpu)
    )
    def _typed_empty_result():
        # all-empty stream: run the kernel once on a TYPED empty frame
        # (from the input schema) so the result Dataset carries the
        # kernel's output schema instead of a column-less block.  Lazy —
        # only the empty branch executes this, and re-running the plan
        # for schema() on an empty input is cheap.
        import pyarrow as pa

        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            empty_in = base.empty_table().to_pandas()
        else:  # PandasBlockSchema carries (names, numpy dtypes)
            empty_in = pd.DataFrame(
                {n: pd.Series(dtype=t) for n, t in zip(base.names, base.types)}
            )
        return pa.Table.from_pandas(fn(empty_in), preserve_index=False)

    return hash_exchange_aggregate(
        ds,
        partial_fn=lambda b: b,
        merge_fn=lambda df: df,
        keys=keys,
        num_buckets=nb,
        finish_fn=fn,
        as_dataset=True,
        empty_result_fn=_typed_empty_result,
    )
