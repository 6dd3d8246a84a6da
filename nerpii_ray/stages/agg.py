"""Tree aggregation — the engine's grouped-aggregate primitive.

Why not ``Dataset.groupby().aggregate()``: measured on this Ray build
(2.49.2, single node), the sort-based shuffle aggregate needs 42-124 s to
merge a 95k-row combiner output that pandas merges in 0.6 s — per-
partition fixed costs dominate any aggregation whose combiner output is
small.  Since every aggregate in this engine is written combiner-first
(partials computed inside ``map_batches``, integer counts that merge
associatively), the exchange only ever moves combiner output — so the
right physical plan is a merge TREE, not a global sort:

  map: partial_fn per batch (the combiner — bounded by distinct keys/batch)
  level k: repartition(k) → merge_fn per whole block
  level 1: repartition(1) → merge_fn → exact result in one block

Scale bound (stated, not silent): the final single-block merge holds one
row per distinct key — fine into the 10^7-10^8-key range with Arrow
blocks.  Beyond that, pass ``levels=(256, 16)`` to stop above the root:
output blocks may then share keys across blocks, and the caller finishes
with a keyed shuffle (``groupby``) over data already reduced by orders of
magnitude — or routes by key upstream (bucket column + map_groups), as
the windowing/join operators do when per-key co-location is semantic.

``final_fn`` (optional) runs once on the root block — for top-k cuts,
rank assignment, renames.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import pandas as pd


def tree_aggregate(
    ds,
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
    final_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Generic combiner → merge-tree aggregate.  All callables are
    pandas-in/pandas-out; merge_fn must be idempotent on merged input
    (sum of sums, min of mins, distinct of distinct...)."""
    out = ds.map_batches(partial_fn, batch_format="pandas", batch_size=batch_size)
    for n in levels:
        out = out.repartition(n).map_batches(
            merge_fn, batch_format="pandas", batch_size=None
        )
    if final_fn is not None:
        out = out.map_batches(final_fn, batch_format="pandas", batch_size=None)
    return out


def grouped_sum(
    ds,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
):
    """SUM-by-key via the tree.  ``partial_fn`` defaults to the grouped
    sum itself (input rows already carry the key + value columns)."""
    keys, sum_cols = list(keys), list(sum_cols)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # run the groupby even on empty input: short-circuiting an empty
        # block would pass through degraded dtypes (e.g. float64 for an
        # empty int column) and poison later concatenations
        return df.groupby(keys, sort=False)[sum_cols].sum().reset_index()

    return tree_aggregate(
        ds, partial_fn or merge, merge, levels=levels, batch_size=batch_size
    )


def tree_dedup(
    ds,
    keys: Sequence[str],
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    keep_min: Optional[str] = None,
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
):
    """DISTINCT-by-key via the tree (optionally keeping the row with the
    smallest ``keep_min`` value per key — exact dedup's min-id policy)."""
    keys = list(keys)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        if keep_min is not None:
            df = df.sort_values(keep_min, kind="stable")
        return df.drop_duplicates(keys)

    return tree_aggregate(
        ds, partial_fn or merge, merge, levels=levels, batch_size=batch_size
    )


def salt_hot_keys(
    ds,
    key: str,
    hot_keys,
    salt: int = 16,
    salted_col: str = "__salted_key",
):
    """Skew salting for keyed shuffles (SURVEY §4): rows whose ``key`` is
    in ``hot_keys`` (from a ``top_surfaces``-style census) get a salted
    key ``key#<hash(row)%salt>``, everything else ``key#0`` — so a
    surface in 10 % of all rows spreads over ``salt`` buckets instead of
    hammering one reducer.

    Use when per-key co-location is semantic (``groupby(salted_col)
    .map_groups``) AND the per-key op decomposes into per-salt-bucket
    partials + a tiny cross-bucket merge; pure additive aggregates don't
    need this (the merge tree pre-combines instead).
    """
    import pandas as pd

    hot = frozenset(hot_keys)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        is_hot = b[key].isin(hot)
        buckets = (
            pd.util.hash_pandas_object(b.index.to_series(), index=False) % salt
        ).astype(str)
        b[salted_col] = b[key].astype(str) + "#" + buckets.where(is_hot.values, "0").values
        return b

    return ds.map_batches(tag, batch_format="pandas")
