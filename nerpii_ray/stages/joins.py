"""Join operators (SURVEY §2.6: the reference has none; the engine needs
both patterns at scale).

* broadcast_join — the small-side pattern: the dimension table is
  ``ray.put`` ONCE and every map task reads the ref through a per-worker
  cache, so the table ships to each node a single time and deserializes
  once per worker process — no shuffle, no re-shipping per batch, no
  actor-pool spin-up.  (Refs in task ``fn_kwargs`` are safe; the
  issue-53727 deadlock only bites refs inside restartable actor pools'
  ctor args.)
* partitioned_hash_join — both sides large: tag + union + bucketed
  groupby, merging each bucket with pandas.  B buckets bound the skew;
  salt hot keys upstream if a single key exceeds a bucket.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd


#: per-worker-process cache of broadcast tables, keyed by object ref hex:
#: each worker deserializes the small side once, later tasks on the same
#: worker hit the memo.  Bounded: a long-lived worker serving many joins
#: drops the oldest entries rather than accumulating dimension tables.
_BCAST_CACHE: dict = {}


def _bcast_merge(batch: pd.DataFrame, *, small, on, how, suffix) -> pd.DataFrame:
    import ray

    if isinstance(small, ray.ObjectRef):
        key = small.hex()
        df = _BCAST_CACHE.get(key)
        if df is None:
            if len(_BCAST_CACHE) >= 8:
                _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
            df = _BCAST_CACHE.setdefault(key, ray.get(small))
    else:  # direct call in tests / driver-side reuse
        df = small
    return batch.merge(df, on=list(on), how=how, suffixes=("", suffix))


def broadcast_join(
    ds,
    small_df: pd.DataFrame,
    on: Sequence[str],
    how: str = "inner",
    suffix: str = "_r",
    batch_size: int = 8192,
):
    """Join a Dataset against a small pandas table without a shuffle."""
    import ray

    return ds.map_batches(
        _bcast_merge,
        fn_kwargs=dict(small=ray.put(small_df), on=list(on), how=how, suffix=suffix),
        batch_format="pandas",
        batch_size=batch_size,
    )


def partitioned_hash_join(
    left,
    right,
    on: Sequence[str],
    num_buckets: int = 64,
    how: str = "inner",
):
    """Explicit bucketed hash join for two large Datasets.

    Adds ``bucket = hash(key) % B`` to both sides, unions with a side
    tag, and merges matching buckets inside ``map_groups``.  Each bucket
    must fit in one worker's heap — size B to the data.
    """
    on = list(on)
    left_cols = [str(c) for c in left.schema().names]
    right_cols = [str(c) for c in right.schema().names]
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            key = b[on].astype(str).agg("|".join, axis=1)
            b = b.reindex(columns=all_cols)  # align schemas for union
            b["__bucket"] = (
                pd.util.hash_pandas_object(key, index=False) % num_buckets
            ).astype("int64")
            b["__side"] = side
            return b

        return fn

    both = left.map_batches(tag("L"), batch_format="pandas").union(
        right.map_batches(tag("R"), batch_format="pandas")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == "L", left_cols]
        rg = g.loc[g["__side"] == "R", right_cols]
        return lg.merge(rg, on=on, how=how, suffixes=("", "_r"))

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")
