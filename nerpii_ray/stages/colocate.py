"""Key co-location primitive for per-key ordered operators (window
functions, as-of joins, rolling windows).

The reference has no per-group ordered computation at all (it is a
single pandas frame; ``named_entity_recognizer.py:317`` iterates columns
of one in-memory table), but an engine at 10^12 rows needs the pattern
constantly: "bring every row of one key to one place, sorted, then run a
vectorized kernel over it".

``keyed_partition_apply`` is the one primitive: rows are tagged with
``hash(keys) % num_buckets`` and each bucket — which contains ONLY whole
key-groups — is handed to a vectorized pandas function.  This is the
same physical plan as ``partitioned_hash_join`` (stages/joins.py): one
hash shuffle, B reducers, no sort of the full table (the kernel sorts
within its bucket, sized to a worker heap).

Partitioning assumptions (stated per SURVEY §4):
* every bucket fits one worker's heap — size ``num_buckets`` to the
  data (rows/bucket ≈ N/B); at the 100-TB design point B is tens of
  thousands, bounded below by heap, above by per-task fixed costs;
* per-key ordering is established INSIDE the bucket kernel (sort the
  bucket frame), never globally — a global ``Dataset.sort`` would be an
  all-to-all over the full table for ordering only ever consumed
  per-key;
* skew: one key always lands in one bucket, so a single pathological
  key (>heap rows) needs upstream salting + a mergeable kernel — same
  contract as ``salt_hot_keys`` (stages/agg.py).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

_BUCKET = "__kpa_bucket"


def keyed_partition_apply(
    ds,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
):
    """Apply ``fn`` (pandas → pandas, vectorized) to hash-bucketed
    partitions, each containing only complete key-groups.

    ``fn`` sees a frame with the original columns (the bucket tag is
    stripped) holding every row of each key routed to that bucket, in
    arbitrary order — sort inside if the kernel needs order.
    """
    keys = list(keys)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        kf = b[keys[0]].astype(str) if len(keys) == 1 else b[keys].astype(str).agg(
            "|".join, axis=1
        )
        b[_BUCKET] = (
            pd.util.hash_pandas_object(kf, index=False) % num_buckets
        ).astype("int64")
        return b

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=[_BUCKET]))

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(run, batch_format="pandas")
    )
