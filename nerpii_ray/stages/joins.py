"""Join operators (SURVEY §2.6: the reference has none; the engine needs
both patterns at scale).

* broadcast_join — the small-side pattern: the dimension table ships as
  an actor-pool constructor argument (stored in the object store once;
  each actor materializes it once in ``__init__``) and every batch is a
  local pandas merge.  No shuffle, no re-shipping per batch.  (Args by
  value, not a ``ray.put`` ref in ``fn_constructor_kwargs`` — that
  pattern deadlocks restartable actor pools, Ray issue 53727.)
* partitioned_hash_join — both sides large: tag + union + bucketed
  groupby, merging each bucket with pandas.  B buckets bound the skew;
  salt hot keys upstream if a single key exceeds a bucket.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd


class _BroadcastMerger:
    def __init__(self, small_ref, on: Sequence[str], how: str, suffix: str):
        self.small = small_ref
        self.on, self.how, self.suffix = list(on), how, suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(
            self.small, on=self.on, how=self.how, suffixes=("", self.suffix)
        )


def broadcast_join(
    ds,
    small_df: pd.DataFrame,
    on: Sequence[str],
    how: str = "inner",
    suffix: str = "_r",
    batch_size: int = 8192,
    concurrency=(1, 4),
):
    """Join a Dataset against a small pandas table without a shuffle."""
    return ds.map_batches(
        _BroadcastMerger,
        fn_constructor_kwargs=dict(small_ref=small_df, on=on, how=how, suffix=suffix),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
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
