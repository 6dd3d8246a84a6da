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

Unbounded key spaces (CARDINALITY-AWARE root): pass ``keys=[...]`` and
the tree becomes self-defending — it runs the pre-root levels, checks
the combiner output's row count, and finishes either at the usual
single-block root (small key space: exact, one block) or, past
``root_threshold`` rows, with the hash-partitioned actor exchange
(``stages/exchange.py``): B aggregator actors each own the key range
``hash(keys) % B``, so per-actor memory is distinct-keys/B and the
result is a Dataset of key-disjoint blocks that never coalesces into one
node.  ``exact_dedup`` and ``build_nodes`` use this — their key count is
one per distinct document/entity, which at the 100-TB design point far
exceeds any single block.

``final_fn`` (optional) runs once on the root block — for top-k cuts,
rank assignment, renames.  It requires the single-root finish and is
rejected together with ``keys`` (a beyond-root result has no single
block to finalize on).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

#: combiner-output row count beyond which the tree finishes with the
#: keyed actor exchange instead of a single root block.  Conservative:
#: the root would hold AT MOST this many rows (pre-root merge output
#: only shrinks at the root).
ROOT_THRESHOLD_DEFAULT = 2_000_000


def tree_aggregate(
    ds,
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
    final_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    keys: Optional[Sequence[str]] = None,
    root_threshold: Optional[int] = None,
):
    """Generic combiner → merge-tree aggregate.  All callables are
    pandas-in/pandas-out; merge_fn must be idempotent on merged input
    (sum of sums, min of mins, distinct of distinct...).

    With ``keys`` set, the root is cardinality-aware (see module
    docstring): small key spaces finish at one exact root block; large
    ones spill to the keyed actor exchange and return key-partitioned
    blocks.  Both paths produce the same rows.
    """
    if keys is not None and final_fn is not None:
        raise ValueError("final_fn requires a single-root finish; drop keys")
    if root_threshold is None:
        # resolved at call time so tests can force the spill path by
        # patching the module constant
        root_threshold = ROOT_THRESHOLD_DEFAULT
    out = ds.map_batches(partial_fn, batch_format="pandas", batch_size=batch_size)
    if keys is None:
        for n in levels:
            out = out.repartition(n).map_batches(
                merge_fn, batch_format="pandas", batch_size=None
            )
        if final_fn is not None:
            out = out.map_batches(final_fn, batch_format="pandas", batch_size=None)
        return out

    # cardinality-aware: pre-root levels, then measure, then decide
    for n in levels[:-1]:
        out = out.repartition(n).map_batches(
            merge_fn, batch_format="pandas", batch_size=None
        )
    out = out.materialize()  # combiner output — already reduced; also
    # prevents re-execution of the upstream by whichever finish runs
    if out.count() <= root_threshold:
        return out.repartition(1).map_batches(
            merge_fn, batch_format="pandas", batch_size=None
        )
    import ray

    from nerpii_ray.stages.exchange import hash_exchange_aggregate

    num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return hash_exchange_aggregate(
        out,
        partial_fn=merge_fn,
        merge_fn=merge_fn,
        keys=list(keys),
        num_buckets=num_buckets,
        batch_size=batch_size,
        as_dataset=True,
    )


def grouped_sum(
    ds,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
    root_threshold: Optional[int] = None,
    adaptive: bool = True,
):
    """SUM-by-key via the cardinality-aware tree.  ``partial_fn``
    defaults to the grouped sum itself (input rows already carry the
    key + value columns).

    ``adaptive=False`` skips the cardinality check (one extra pipeline
    barrier: the pre-root output is materialized to count it) — pass it
    ONLY when the key space is bounded by construction (a label
    histogram, a 5-value dimension), never when keys scale with data.
    """
    keys, sum_cols = list(keys), list(sum_cols)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # run the groupby even on empty input: short-circuiting an empty
        # block would pass through degraded dtypes (e.g. float64 for an
        # empty int column) and poison later concatenations.
        # observed=True: with a dictionary-encoded (categorical) key the
        # pandas default materializes the CARTESIAN PRODUCT of category
        # sets — measured 6,987 rows → 65.8M phantom rows (85 s) on a
        # mentions-derived frame
        return (
            df.groupby(keys, sort=False, observed=True)[sum_cols]
            .sum()
            .reset_index()
        )

    return tree_aggregate(
        ds, partial_fn or merge, merge, levels=levels, batch_size=batch_size,
        keys=keys if adaptive else None, root_threshold=root_threshold,
    )


def tree_dedup(
    ds,
    keys: Sequence[str],
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    keep_min: Optional[str] = None,
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
    root_threshold: Optional[int] = None,
    adaptive: bool = True,
):
    """DISTINCT-by-key via the cardinality-aware tree (optionally keeping
    the row with the smallest ``keep_min`` value per key — exact dedup's
    min-id policy).  ``adaptive=False``: see ``grouped_sum``."""
    keys = list(keys)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        if keep_min is not None:
            df = df.sort_values(keep_min, kind="stable")
        return df.drop_duplicates(keys)

    return tree_aggregate(
        ds, partial_fn or merge, merge, levels=levels, batch_size=batch_size,
        keys=keys if adaptive else None, root_threshold=root_threshold,
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


def grouped_quantile_disc(
    ds,
    keys: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    q_names: Sequence[str],
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Exact discrete quantiles per group WITHOUT sorting the data:
    DuckDB-``quantile_disc`` semantics (0-based element index
    ``ceil(q*n) - 1`` of the per-group sorted values).

    Physical plan — the scale-safe exact-quantile form for discrete
    domains (integer cents, token counts, day numbers):

      1. per-batch combiner: ``(keys…, value) → cnt`` value counts —
         the shuffle moves one row per distinct (group, value) per
         batch, never per input row;
      2. cardinality-aware grouped sum over ``keys + [value_col]``
         (merge tree; keyed actor exchange past the root threshold);
      3. one histogram-sized root: per-group cumulative counts pick
         each quantile — the histogram is bounded by
         |groups| × |distinct values|, a property of the DOMAIN
         (price grid, length grid), not of the row count, which is
         what makes the single root hold at 100 TB.  For continuous
         float domains use a fixed-point grid upstream or an
         approximate sketch instead.

    ``partial_fn`` overrides step 1 (e.g. to derive the integer value
    column from raw floats inside the same pass).  Returns one row per
    group: ``keys…, n (BIGINT), <q_names…> (value dtype)``.
    """
    keys, qs, q_names = list(keys), list(qs), list(q_names)
    gcols = keys + [value_col]

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(gcols, sort=False, observed=True).size().rename("cnt")
        return out.reset_index()

    hist = grouped_sum(
        ds, gcols, ["cnt"], partial_fn=partial_fn or count_partial,
        adaptive=True,
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {k: pd.Series(dtype="object") for k in keys}
            cols["n"] = pd.Series(dtype="int64")
            for name in q_names:
                cols[name] = pd.Series(dtype="int64")
            return pd.DataFrame(cols)
        df = df.sort_values(gcols, kind="stable")
        gb = df.groupby(keys, sort=False, observed=True)
        cum = gb["cnt"].cumsum()
        n = gb["cnt"].transform("sum")
        out = gb["cnt"].sum().rename("n").reset_index()
        for q, name in zip(qs, q_names):
            # smallest value whose cumulative count reaches ceil(q*n)
            target = np.ceil(q * n - 1e-9)  # float-robust ceil(q*n)
            hit = df.loc[(cum >= target).to_numpy(), gcols]
            first = hit.groupby(keys, sort=False, observed=True)[
                value_col
            ].first().rename(name)
            out = out.merge(first.reset_index(), on=keys, how="left")
        return out.reset_index(drop=True)

    # the histogram is domain-bounded (see above): repartition(1) holds
    # |groups|×|values| rows, not data-sized — same contract as the
    # bounded-key adaptive=False grouped sums
    return hist.repartition(1).map_batches(
        pick, batch_format="pandas", batch_size=None
    )


def grouped_quantile_sketch(
    ds,
    keys: Sequence[str],
    value_col: str,
    id_col: str,
    qs: Sequence[float],
    q_names: Sequence[str],
    k: int = 1024,
    prep_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Approximate grouped quantiles for CONTINUOUS domains — the scale
    path ``grouped_quantile_disc``'s docstring points to when the value
    grid is unbounded.  A mergeable bottom-k (KMV) sample: per group,
    keep the k rows whose ``md5(id)`` hex is smallest (ties broken by
    id), then take discrete quantiles OF THE SAMPLE.

    Properties that make this the right sketch here:
    * mergeable — bottom-k of a concat of bottom-k's is the global
      bottom-k, so it rides the cardinality-aware tree/exchange like any
      other combiner (state per group is k rows, independent of n);
    * deterministic AND SQL-replayable — md5 priorities are stable
      across processes and reproducible in DuckDB (``ROW_NUMBER() OVER
      (PARTITION BY keys ORDER BY md5(id), id) <= k`` + quantile_disc
      replays the whole sketch exactly at ANY scale — the oracle checks
      the algorithm, not a scale-dependent coincidence);
    * md5-of-unique-id is a uniform k-subset per group ⇒ rank error
      O(1/sqrt(k)); exact whenever a group has ≤ k rows.

    ``prep_fn`` (optional) derives ``keys + [value_col, id_col]`` from
    raw batches (e.g. float → integer cents) inside the same pass.
    Output: one row per group — ``keys…, <q_names…>``.
    """
    keys, qs, q_names = list(keys), list(qs), list(q_names)
    cols = keys + [value_col, id_col]
    PRI = "__kmv_pri"

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([PRI, id_col], kind="stable")
            .groupby(keys, sort=False, observed=True)
            .head(k)
            .reset_index(drop=True)
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from nerpii_ray.functions.textfns import md5_of_strings

        if prep_fn is not None:
            b = prep_fn(b)
        b = b[cols].copy(deep=False)
        b[PRI] = md5_of_strings(b[id_col].astype(str))
        return bottom_k(b)

    merged = tree_aggregate(ds, partial, bottom_k, keys=keys)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols_out = {c: pd.Series(dtype="object") for c in keys}
            for name in q_names:
                cols_out[name] = pd.Series(dtype="int64")
            return pd.DataFrame(cols_out)
        df = df.sort_values(keys + [value_col], kind="stable")
        gb = df.groupby(keys, sort=False, observed=True)
        pos = gb.cumcount().to_numpy()
        m = gb[value_col].transform("size").to_numpy()
        out = gb.size().rename("__m").reset_index()[keys]
        for q, name in zip(qs, q_names):
            # sample element ceil(q*m) - 1 (0-based), quantile_disc rule
            target = np.ceil(q * m - 1e-9).astype("int64") - 1
            sel = df.loc[pos == np.maximum(target, 0), keys + [value_col]]
            out = out.merge(
                sel.rename(columns={value_col: name}), on=keys, how="left"
            )
        return out.reset_index(drop=True)

    # blocks out of the tree are key-disjoint on BOTH finishes (single
    # root = one block; exchange = per-actor key ranges), so a whole-
    # block map finalizes each group exactly once
    return merged.map_batches(finish, batch_format="pandas", batch_size=None)


def distinct_count_sketch(
    ds,
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    k: int = 1024,
):
    """Approximate COUNT DISTINCT via the KMV (k minimum values) sketch
    — the classic bottom-k estimator (Bar-Yossef et al. 2002): keep the
    k smallest DISTINCT md5 hashes of the items; if fewer than k exist
    the count is exact, else estimate (k−1) / r_k where r_k is the kth
    smallest hash as a fraction of the hash space.  Relative error
    ~1/sqrt(k−2) (~3 % at k=1024).

    Like ``grouped_quantile_sketch``, md5 makes the sketch deterministic
    and SQL-replayable at any scale: the DuckDB twin is
    ``ORDER BY md5(item) LIMIT k`` + the same closed-form estimate, so
    the oracle checks the algorithm exactly even though the estimate is
    approximate.  State is k hashes regardless of input size; merge =
    distinct-union → k smallest (idempotent, associative) — rides the
    plain merge tree with a single tiny root.

    ``partial_fn``: batch → frame with one column ``hx`` holding the
    md5 hex of each item occurrence (dedup happens in the tree).
    Output: one row — ``est_distinct`` (BIGINT).
    """

    def bottom(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("hx").sort_values("hx", kind="stable")
        return df.head(k).reset_index(drop=True)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return bottom(partial_fn(b))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        m = len(df)
        if m < k:
            est = m  # sketch holds every distinct item: exact
        else:
            kth = df["hx"].max()
            # first 8 md5 bytes as a fraction of the 64-bit hash space —
            # the same truncation the SQL twin uses
            frac = int(kth[:16], 16) / 2.0**64
            est = int(np.floor((k - 1) / frac))
        return pd.DataFrame({"est_distinct": pd.Series([est], dtype="int64")})

    return tree_aggregate(ds, partial, bottom, final_fn=finish)


def grouped_sorted_concat(
    ds,
    keys: Sequence[str],
    value_col: str,
    out_col: str,
    sep: str = ",",
):
    """Ordered string aggregation per group — SQL's
    ``string_agg(value, sep ORDER BY value)``.  The merge state per
    group is its (still-unsorted-across-partials) value list carried as
    rows; merging is a plain distinct-free concat, so the combiner only
    dedups nothing and the ROOT does one sort + join per group.  Use for
    label lists, provenance trails, per-entity surface inventories —
    group value lists must individually fit a worker (same contract as
    any per-group state).
    """
    keys = list(keys)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[keys + [value_col]]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {k: pd.Series(dtype="object") for k in keys}
            cols[out_col] = pd.Series(dtype="object")
            return pd.DataFrame(cols)
        df = df.sort_values(keys + [value_col], kind="stable")
        out = (
            df.groupby(keys, sort=False, observed=True)[value_col]
            .agg(lambda s: sep.join(s.astype(str)))
            .rename(out_col)
            .reset_index()
        )
        return out

    return tree_aggregate(ds, keep, keep, final_fn=finish)


def _exact_sums_partial(keys: list, value_col: str):
    """Per-batch (n, Σx, Σx²) partial with GENUINE object dtype (not
    int64): pandas then sums with Python big-ints inside
    groupby().sum().  A ``.map(int)`` column is inferred int64 and a
    group's Σx² silently wraps past 2^63 (~1e5 rows of 1e7-cent values
    — reached by lineitem at sf1) while the HUGEINT SQL twin stays
    exact."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col]
        df = pd.DataFrame({**{k: b[k] for k in keys}})
        df["n"] = pd.Series([1] * len(df), index=df.index, dtype="object")
        df["s1"] = pd.Series(
            [int(x) for x in v], index=df.index, dtype="object"
        )
        df["s2"] = pd.Series(
            [int(x) * int(x) for x in v], index=df.index, dtype="object"
        )
        return (
            df.groupby(keys, sort=False, observed=True)[["n", "s1", "s2"]]
            .sum()
            .reset_index()
        )

    return partial


def _exact_sums_merge(keys: list):
    """Merge level for the (n, Σx, Σx²) tree — re-coerces to object
    Python ints: partials ride Ray blocks between tree levels and a
    format conversion could hand back int64 columns whose further sums
    would wrap."""

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in ("n", "s1", "s2"):
            df[c] = pd.Series(
                [int(x) for x in df[c]], index=df.index, dtype="object"
            )
        return (
            df.groupby(keys, sort=False, observed=True)[["n", "s1", "s2"]]
            .sum()
            .reset_index()
        )

    return merge


def grouped_moments(
    ds,
    keys: Sequence[str],
    value_col: str,
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Mergeable first/second moments per group — COUNT, MEAN, VAR_POP —
    with EXACT integer accumulation: the combiner state per group is
    (n, Σx, Σx²) carried as arbitrary-precision Python ints (an int64
    Σx² overflows at ~10⁵ rows of 10⁷-cent values), so merge order
    cannot perturb anything.  The floating-point result is produced by
    ONE double division at the very end from exact integer numerators —
    var = (n·Σx² − (Σx)²) / n², mean = Σx / n — which is the same single
    IEEE rounding DuckDB's ``CAST(exact AS DOUBLE) / CAST(exact AS
    DOUBLE)`` performs, so the oracle match is bit-stable (a naive
    float-partials Welford would differ per merge order).

    ``value_col`` must be integer-valued (cents, counts, day numbers);
    derive it in ``partial_fn``.  Output: keys…, n (BIGINT),
    mean (DOUBLE), var_pop (DOUBLE).
    """
    keys = list(keys)
    default_partial = _exact_sums_partial(keys, value_col)
    merge = _exact_sums_merge(keys)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {k: pd.Series(dtype="object") for k in keys}
            cols.update(n=pd.Series(dtype="int64"),
                        mean=pd.Series(dtype="float64"),
                        var_pop=pd.Series(dtype="float64"))
            return pd.DataFrame(cols)
        n = df["n"].map(int)
        s1 = df["s1"].map(int)
        s2 = df["s2"].map(int)
        out = df[keys].copy()
        out["n"] = n.astype("int64")
        out["mean"] = [float(a) / float(b) for a, b in zip(s1, n)]
        out["var_pop"] = [
            float(c * b - a * a) / float(c * c)
            for a, b, c in zip(s1, s2, n)
        ]
        return out.reset_index(drop=True)

    return tree_aggregate(
        ds, partial_fn or default_partial, merge, final_fn=finish
    )


def grouped_corr(
    ds,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Mergeable bivariate moments per group — COVAR_POP and CORR — with
    the same exact-integer discipline as ``grouped_moments``: the
    combiner state is (n, Σx, Σy, Σxy, Σx², Σy²) carried as genuine
    object-dtype Python ints (int64 Σxy/Σx² wrap at realistic scale
    factors), and every floating-point result is produced from exact
    integer numerators with the SAME expression shape DuckDB evaluates —
    covar = (n·Σxy − Σx·Σy)/n², corr = (n·Σxy − Σx·Σy) /
    (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) — so hash matches are bit-stable.

    ``x_col``/``y_col`` must be integer-valued (cents, counts); derive
    them in ``partial_fn``.  Output: keys…, n, covar_pop, corr.
    """
    import math

    keys = list(keys)
    state = ["n", "sx", "sy", "sxy", "sxx", "syy"]

    def default_partial(b: pd.DataFrame) -> pd.DataFrame:
        x = [int(v) for v in b[x_col]]
        y = [int(v) for v in b[y_col]]
        df = pd.DataFrame({**{k: b[k] for k in keys}})
        idx = df.index
        df["n"] = pd.Series([1] * len(df), index=idx, dtype="object")
        df["sx"] = pd.Series(x, index=idx, dtype="object")
        df["sy"] = pd.Series(y, index=idx, dtype="object")
        df["sxy"] = pd.Series(
            [a * c for a, c in zip(x, y)], index=idx, dtype="object"
        )
        df["sxx"] = pd.Series([a * a for a in x], index=idx, dtype="object")
        df["syy"] = pd.Series([c * c for c in y], index=idx, dtype="object")
        return (
            df.groupby(keys, sort=False, observed=True)[state]
            .sum()
            .reset_index()
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in state:
            df[c] = pd.Series(
                [int(v) for v in df[c]], index=df.index, dtype="object"
            )
        return (
            df.groupby(keys, sort=False, observed=True)[state]
            .sum()
            .reset_index()
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {k: pd.Series(dtype="object") for k in keys}
            cols.update(n=pd.Series(dtype="int64"),
                        covar_pop=pd.Series(dtype="float64"),
                        corr=pd.Series(dtype="float64"))
            return pd.DataFrame(cols)
        out = df[keys].copy()
        n = [int(v) for v in df["n"]]
        sx = [int(v) for v in df["sx"]]
        sy = [int(v) for v in df["sy"]]
        sxy = [int(v) for v in df["sxy"]]
        sxx = [int(v) for v in df["sxx"]]
        syy = [int(v) for v in df["syy"]]
        out["n"] = pd.Series(n, index=df.index).astype("int64")
        out["covar_pop"] = [
            float(c * xy - a * b) / float(c * c)
            for a, b, xy, c in zip(sx, sy, sxy, n)
        ]
        # zero variance in either column (incl. every single-row group:
        # n*sxx - sx² == 0) → NULL, matching the SQL twin's corr()
        # semantics instead of raising ZeroDivisionError (ADVICE r4)
        out["corr"] = [
            float(c * xy - a * b)
            / (math.sqrt(float(c * xx - a * a)) * math.sqrt(float(c * yy - b * b)))
            if (c * xx - a * a) > 0 and (c * yy - b * b) > 0
            else float("nan")
            for a, b, xy, xx, yy, c in zip(sx, sy, sxy, sxx, syy, n)
        ]
        return out.reset_index(drop=True)

    return tree_aggregate(
        ds, partial_fn or default_partial, merge, final_fn=finish
    )


def misra_gries_topk(
    ds,
    value_col: str,
    capacity: int = 64,
    out_k: int = 10,
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Heavy hitters via a mergeable Misra–Gries summary: each combiner
    keeps at most ``capacity`` (value, count) counters; summaries merge
    by summing counters and decrementing all by the (capacity+1)-largest
    count when over capacity (Agarwal et al., "Mergeable Summaries",
    PODS'12) — the estimate undercounts each value by at most N/capacity
    regardless of merge order.  One tree pass, state bounded by
    capacity per block at every level, never by distinct values.

    EXACT regime: with ``capacity`` ≥ the number of distinct values no
    counter is ever decremented and the output is the exact top-k —
    that is the SQL-oracle registration; the error bound of the lossy
    regime is pytest-pinned against exact counts.

    Output: (value, est_count) — the ``out_k`` largest counters, count
    descending then value ascending (deterministic cut).
    """

    def default_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[value_col].value_counts()
        return pd.DataFrame(
            {"value": vc.index.astype(str), "est_count": vc.to_numpy()}
        )

    def mg_merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"value": pd.Series(dtype="object"),
                 "est_count": pd.Series(dtype="int64")}
            )
        s = (
            df.groupby("value", sort=False, observed=True)["est_count"]
            .sum()
            .sort_values(ascending=False, kind="stable")
        )
        if len(s) > capacity:
            dec = int(s.iloc[capacity])  # (capacity+1)-largest count
            s = (s - dec).iloc[:capacity]
            s = s[s > 0]
        return pd.DataFrame(
            {"value": s.index.to_numpy(), "est_count": s.to_numpy()}
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = mg_merge(df)
        df = df.sort_values(
            ["est_count", "value"], ascending=[False, True], kind="stable"
        ).head(out_k)
        df["est_count"] = df["est_count"].astype("int64")
        return df.reset_index(drop=True)

    return tree_aggregate(
        ds, partial_fn or default_partial, mg_merge, final_fn=finish
    )


def equi_width_histogram(
    ds,
    value_col: str = "value",
    num_buckets: int = 32,
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
):
    """Exact equi-width histogram over an integer-cents measure.

    Classic two-pass shape for a 100-TB scan (the reference has no
    histogram at all — ``named_entity_recognizer.py`` profiles one
    in-memory frame):

    1. global (lo, hi) cents via the combiner tree — the driver reads
       TWO scalars, never data;
    2. the scalars ship in the task closure (bytes, not a shuffle) and
       every batch buckets locally: ``(cents - lo) * B // (hi - lo + 1)``
       — pure int64, so the result hash-matches the SQL replay exactly;
       counts finish on the bounded-key grouped sum (``num_buckets``
       keys ⇒ ``adaptive=False``: the cardinality check would pay a
       barrier to learn a bound known by construction).

    Output: (bucket, bucket_lo_cents, n) — only non-empty buckets, like
    the SQL GROUP BY.
    """

    def cents_of(b: pd.DataFrame) -> np.ndarray:
        # np.round(value*100) ↔ SQL ROUND(value*100): the established
        # cents discipline of every money query (events_hourly et al.)
        return np.round(b[value_col].to_numpy() * 100).astype(np.int64)

    def bounds_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"lo": pd.Series(dtype="int64"), "hi": pd.Series(dtype="int64")}
            )
        c = cents_of(b)
        return pd.DataFrame({"lo": [int(c.min())], "hi": [int(c.max())]})

    def bounds_merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"lo": pd.Series(dtype="int64"), "hi": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"lo": [int(df["lo"].min())], "hi": [int(df["hi"].max())]}
        )

    bounds = tree_aggregate(
        ds, bounds_partial, bounds_merge, levels=levels, batch_size=batch_size
    ).take_all()
    if not bounds:
        raise ValueError("equi_width_histogram: empty input")
    lo, hi = int(bounds[0]["lo"]), int(bounds[0]["hi"])
    span = hi - lo + 1

    def bucket_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
            )
        bucket = (cents_of(b) - lo) * num_buckets // span
        return (
            pd.DataFrame({"bucket": bucket, "n": np.int64(1)})
            .groupby("bucket", sort=False)["n"]
            .sum()
            .reset_index()
        )

    counts = grouped_sum(
        ds, ["bucket"], ["n"], partial_fn=bucket_partial,
        levels=levels, batch_size=batch_size, adaptive=False,
    )

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_lo_cents"] = (
            lo + df["bucket"].to_numpy(dtype=np.int64) * span // num_buckets
        )
        return df[["bucket", "bucket_lo_cents", "n"]]

    return counts.map_batches(annotate, batch_format="pandas", batch_size=None)


def grouped_mode(
    ds,
    keys: Sequence[str],
    value_col: str,
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
):
    """Exact per-key mode (most frequent value), deterministic ties:
    highest count wins, then the SMALLEST value — the same cut rule the
    SQL twin's ``ORDER BY COUNT(*) DESC, value`` expresses.

    Plan: counts via the cardinality-aware grouped sum on
    ``keys + [value_col]`` (the only data-sized pass), then the argmax
    finish rides ``keyed_partition_apply`` on ``keys`` alone — the
    counts table is (key × distinct-values)-sized, never raw-data-sized,
    and no node holds more of it than its key range.

    Output: (*keys, mode_<value_col>, n).
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            out = b.loc[:, keys + [value_col]].copy()
            out["n"] = pd.Series(dtype="int64")
            return out
        out = b.loc[:, keys + [value_col]].copy()
        out["n"] = np.int64(1)
        return (
            out.groupby(keys + [value_col], sort=False, observed=True)["n"]
            .sum()
            .reset_index()
        )

    counts = grouped_sum(
        ds, keys + [value_col], ["n"], partial_fn=count_partial,
        levels=levels, batch_size=batch_size,
    )

    out_col = f"mode_{value_col}"

    def argmax(frame: pd.DataFrame) -> pd.DataFrame:
        frame = frame.rename(columns={value_col: out_col})
        if not len(frame):
            return frame.loc[:, keys + [out_col, "n"]]
        s = frame.sort_values(
            [*keys, "n", out_col],
            ascending=[True] * len(keys) + [False, True],
            kind="mergesort",
        )
        return (
            s.groupby(keys, sort=False, observed=True)
            .head(1)
            .loc[:, keys + [out_col, "n"]]
            .reset_index(drop=True)
        )

    return keyed_partition_apply(counts, keys, argmax)


def grouped_higher_moments(
    ds,
    keys: Sequence[str],
    value_col: str,
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Third/fourth CENTRAL moments per group with the exact-integer
    discipline of ``grouped_moments``: the mergeable state is the raw
    power sums (n, Σx, Σx², Σx³, Σx⁴) as arbitrary-precision Python
    ints, and the central sums come out of the binomial expansion over
    the SCALED residuals x·n − Σx (integers, so no float drift at any
    merge order):

        Σ(x·n − S)³ = n³·Σx³ − 3n²·S·Σx² + 2n·S³
        Σ(x·n − S)⁴ = n⁴·Σx⁴ − 4n³·S·Σx³ + 6n²·S²·Σx² − 3n·S⁴

    and m3 = Σ(x·n−S)³ / n⁴,  m4 = Σ(x·n−S)⁴ / n⁵ — each ONE double
    division of two exact integers, the same single IEEE rounding as
    DuckDB's ``CAST(exact AS DOUBLE) / CAST(exact AS DOUBLE)``, so the
    oracle match is bit-stable.  (Standardized skewness/kurtosis need a
    √, which no finite SQL replay matches bit-for-bit — callers divide
    by var^1.5 themselves if they want the unitless form.)

    ``value_col`` must be integer-valued.  Output: keys…, n (BIGINT),
    m3 (DOUBLE), m4 (DOUBLE).
    """
    keys = list(keys)
    cols = ["n", "s1", "s2", "s3", "s4"]

    def default_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col]
        df = pd.DataFrame({**{k: b[k] for k in keys}})
        ints = [int(x) for x in v]
        df["n"] = pd.Series([1] * len(df), index=df.index, dtype="object")
        df["s1"] = pd.Series(ints, index=df.index, dtype="object")
        df["s2"] = pd.Series([x * x for x in ints], index=df.index,
                             dtype="object")
        df["s3"] = pd.Series([x * x * x for x in ints], index=df.index,
                             dtype="object")
        df["s4"] = pd.Series([x * x * x * x for x in ints], index=df.index,
                             dtype="object")
        return (
            df.groupby(keys, sort=False, observed=True)[cols]
            .sum()
            .reset_index()
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in cols:
            df[c] = pd.Series(
                [int(x) for x in df[c]], index=df.index, dtype="object"
            )
        return (
            df.groupby(keys, sort=False, observed=True)[cols]
            .sum()
            .reset_index()
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = {k: pd.Series(dtype="object") for k in keys}
            out.update(n=pd.Series(dtype="int64"),
                       m3=pd.Series(dtype="float64"),
                       m4=pd.Series(dtype="float64"))
            return pd.DataFrame(out)
        n = df["n"].map(int)
        s1, s2 = df["s1"].map(int), df["s2"].map(int)
        s3, s4 = df["s3"].map(int), df["s4"].map(int)
        out = df[keys].copy()
        out["n"] = n.astype("int64")
        out["m3"] = [
            float(b**3 * c3 - 3 * b**2 * a * c2 + 2 * b * a**3)
            / float(b**4)
            for a, b, c2, c3 in zip(s1, n, s2, s3)
        ]
        out["m4"] = [
            float(
                b**4 * c4 - 4 * b**3 * a * c3
                + 6 * b**2 * a * a * c2 - 3 * b * a**4
            )
            / float(b**5)
            for a, b, c2, c3, c4 in zip(s1, n, s2, s3, s4)
        ]
        return out.reset_index(drop=True)

    return tree_aggregate(
        ds, partial_fn or default_partial, merge, final_fn=finish
    )


def grouped_argmax(
    ds,
    keys: Sequence[str],
    value_col: str,
    tie_col: str,
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
    root_threshold: Optional[int] = None,
):
    """Per-key ARGMAX: for every key, the row with the largest
    ``value_col`` (ties broken by the SMALLEST ``tie_col``) plus the
    group's row count — the "pick the canonical representative" shape
    (longest document per near-dup cluster, latest record per entity).

    Fully mergeable: a partial carries (key, max value, tie-min at that
    max, partial count); merging partials re-applies the identical
    (value DESC, tie ASC) cut and sums counts, so the combiner tree
    never ships more than one row per key per block and the root is
    cardinality-aware (exchange past ``root_threshold``).

    Output: (*keys, value_col, tie_col, n).
    """
    keys = list(keys)
    cols = keys + [value_col, tie_col]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # empty-safe: run the full path so dtypes survive
        df = df.loc[:, cols + ["n"]]
        n = (
            df.groupby(keys, sort=False, observed=True)["n"]
            .sum()
            .reset_index()
        )
        s = df.sort_values(
            [*keys, value_col, tie_col],
            ascending=[True] * len(keys) + [False, True],
            kind="mergesort",
        )
        best = (
            s.groupby(keys, sort=False, observed=True)
            .head(1)
            .loc[:, cols]
        )
        return best.merge(n, on=keys)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[:, cols].copy()
        b["n"] = np.int64(1) if len(b) else pd.Series(dtype="int64")
        return merge(b)

    return tree_aggregate(
        ds, partial, merge, levels=levels, batch_size=batch_size,
        keys=keys, root_threshold=root_threshold,
    )


def pivot_counts(
    ds,
    keys: Sequence[str],
    pivot_col: str,
    domain: Optional[Sequence[str]] = None,
    domain_ds=None,
    prefix: str = "n_",
):
    """Long→wide PIVOT as conditional grouped counts: one int64 output
    column per distinct ``pivot_col`` value.  The reference engines
    express this as ``SUM(CASE WHEN pivot = v THEN 1 END)`` per value;
    here each batch computes its partial pivot locally and the counts
    ride the cardinality-aware grouped-sum tree — one keyed aggregate,
    no post-hoc reshape of a long table.

    The pivot domain must be BOUNDED (a dimension, not a data-scaled
    key) — it becomes the output schema.  Pass it explicitly via
    ``domain``, or let the operator derive it with a column-pruned
    distinct tree over ``domain_ds`` (falls back to ``ds``; a separate
    pruned read avoids re-executing a wide upstream pipeline twice).
    The derived domain lands on the driver — that is domain-sized, the
    same contract as ``equi_width_histogram``'s two scalars.
    """
    keys = list(keys)
    if domain is None:
        src = domain_ds if domain_ds is not None else ds
        dom = tree_dedup(
            src.select_columns([pivot_col]), [pivot_col], adaptive=False
        ).to_pandas()
        domain = sorted(str(v) for v in dom[pivot_col])
    else:
        domain = sorted(str(v) for v in domain)
    cols = [f"{prefix}{v}" for v in domain]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = b.loc[:, keys].copy()
        pv = b[pivot_col].astype(str).to_numpy()
        for v, c in zip(domain, cols):
            df[c] = (pv == v).astype(np.int64)
        return (
            df.groupby(keys, sort=False, observed=True)[cols]
            .sum()
            .reset_index()
        )

    return grouped_sum(ds, keys, cols, partial_fn=partial)


def grouped_linreg(
    ds,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    partial_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Per-group least-squares fit y ≈ slope·x + intercept (SQL's
    REGR_SLOPE / REGR_INTERCEPT) with the exact-integer discipline of
    ``grouped_corr``: combiner state (n, Σx, Σy, Σxy, Σx²) as genuine
    object-dtype Python ints, and each double result is ONE division of
    exact integer numerator by exact integer denominator —
    slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), intercept =
    (Σy·Σx² − Σx·Σxy)/(n·Σx² − (Σx)²) — the same expression shape the
    SQL twin evaluates over HUGEINT sums, so hash matches are
    bit-stable where a float-partial REGR_* drifts with merge order.

    ``x_col``/``y_col`` must be integer-valued (cents, counts); derive
    them in ``partial_fn``.  Zero x-variance groups (incl. single-row
    groups) yield NaN for both, matching SQL NULL semantics.
    Output: keys…, n, slope, intercept.
    """
    keys = list(keys)
    state = ["n", "sx", "sy", "sxy", "sxx"]

    def default_partial(b: pd.DataFrame) -> pd.DataFrame:
        x = [int(v) for v in b[x_col]]
        y = [int(v) for v in b[y_col]]
        df = pd.DataFrame({**{k: b[k] for k in keys}})
        idx = df.index
        df["n"] = pd.Series([1] * len(df), index=idx, dtype="object")
        df["sx"] = pd.Series(x, index=idx, dtype="object")
        df["sy"] = pd.Series(y, index=idx, dtype="object")
        df["sxy"] = pd.Series(
            [a * c for a, c in zip(x, y)], index=idx, dtype="object"
        )
        df["sxx"] = pd.Series([a * a for a in x], index=idx, dtype="object")
        return (
            df.groupby(keys, sort=False, observed=True)[state]
            .sum()
            .reset_index()
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in state:
            df[c] = pd.Series(
                [int(v) for v in df[c]], index=df.index, dtype="object"
            )
        return (
            df.groupby(keys, sort=False, observed=True)[state]
            .sum()
            .reset_index()
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {k: pd.Series(dtype="object") for k in keys}
            cols.update(n=pd.Series(dtype="int64"),
                        slope=pd.Series(dtype="float64"),
                        intercept=pd.Series(dtype="float64"))
            return pd.DataFrame(cols)
        out = df[keys].copy()
        n = [int(v) for v in df["n"]]
        sx = [int(v) for v in df["sx"]]
        sy = [int(v) for v in df["sy"]]
        sxy = [int(v) for v in df["sxy"]]
        sxx = [int(v) for v in df["sxx"]]
        out["n"] = pd.Series(n, index=df.index).astype("int64")
        out["slope"] = [
            float(c * xy - a * b) / float(c * xx - a * a)
            if (c * xx - a * a) != 0 else float("nan")
            for a, b, xy, xx, c in zip(sx, sy, sxy, sxx, n)
        ]
        out["intercept"] = [
            float(b * xx - a * xy) / float(c * xx - a * a)
            if (c * xx - a * a) != 0 else float("nan")
            for a, b, xy, xx, c in zip(sx, sy, sxy, sxx, n)
        ]
        return out.reset_index(drop=True)

    return tree_aggregate(
        ds, partial_fn or default_partial, merge, final_fn=finish
    )


def grouped_gini(
    ds,
    keys: Sequence[str],
    value_col: str,
    levels: Tuple[int, ...] = (16, 1),
    batch_size: int = 65536,
):
    """Per-key categorical Gini impurity in integer basis points:

        gini_bp = ⌊10⁴ · (n² − Σ_v c_v²) / n²⌋

    (0 = one category, → 10⁴·(1−1/|V|) = uniform mix) — the diversity /
    concentration statistic kept RATIONAL (entropy's log would
    hash-drift; Gini is exact integers end to end).

    Plan mirrors ``grouped_mode``: (key, value) counts via the
    cardinality-aware grouped-sum tree (the only data-sized pass), then
    the Σc² finish rides ``keyed_partition_apply`` over the counts
    table.  The finish sums squares as PYTHON ints — per-key totals
    square past int64 at realistic scales.

    Output: (*keys, n, gini_bp).
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            out = b.loc[:, keys + [value_col]].copy()
            out["n"] = pd.Series(dtype="int64")
            return out
        out = b.loc[:, keys + [value_col]].copy()
        out["n"] = np.int64(1)
        return (
            out.groupby(keys + [value_col], sort=False, observed=True)["n"]
            .sum()
            .reset_index()
        )

    counts = grouped_sum(
        ds, keys + [value_col], ["n"], partial_fn=count_partial,
        levels=levels, batch_size=batch_size,
    )

    def gini(frame: pd.DataFrame) -> pd.DataFrame:
        if not len(frame):
            out = frame.loc[:, keys].copy()
            out["n"] = pd.Series(dtype="int64")
            out["gini_bp"] = pd.Series(dtype="int64")
            return out
        rows = []
        for kv, s in frame.groupby(keys, sort=False, observed=True)["n"]:
            tot = sum(int(v) for v in s)
            ss = sum(int(v) * int(v) for v in s)
            kt = tuple(kv) if isinstance(kv, tuple) else (kv,)
            rows.append(
                kt + (tot, (10**4 * (tot * tot - ss)) // (tot * tot))
            )
        return pd.DataFrame(rows, columns=keys + ["n", "gini_bp"]).astype(
            {"n": "int64", "gini_bp": "int64"}
        )

    return keyed_partition_apply(counts, keys, gini)


def hll_registers(ds, key_col: str, prep_fn=None, group_cols=None):
    """HyperLogLog register table over a key column — the
    constant-memory COUNT DISTINCT sketch complementing the KMV
    bottom-k in ``distinct_count_sketch`` (KMV keeps k hashes; HLL
    keeps 256 max-rank bytes and merges by elementwise MAX, the
    textbook cross-cluster cardinality shape).

    h = first 8 md5 digest bytes of str(key); register = top byte
    (m = 256); rank = leading-zero count of the remaining 56 bits + 1
    (57 when they are all zero).  Per-batch (register, max rank)
    partials merge through the bounded-key tree (≤256 rows per level).
    The output IS the sketch — (register BIGINT, max_rank BIGINT),
    registers no key hashed into omitted — which a SQL twin replays
    exactly (md5 substrings + length(bin(rem))), the
    ``grouped_quantile_sketch`` oracle trick: the check is exact even
    though the estimate is approximate.  ``hll_estimate`` derives the
    bias-corrected cardinality from the sketch.
    """
    from nerpii_ray.functions.textfns import stable_hash64_np

    gcols = list(group_cols) if group_cols else []
    gb_keys = gcols + ["register"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash64_np(b[key_col].astype(str))
        reg = (h >> np.uint64(56)).astype(np.int64)
        rem = (h & np.uint64((1 << 56) - 1)).astype(np.uint64)
        # exact vectorized bit length (float log2 misrounds near 2^k)
        bl = np.zeros(len(rem), dtype=np.int64)
        v = rem.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= np.uint64(1 << s)
            bl[big] += s
            v[big] >>= np.uint64(s)
        bl += (v > 0).astype(np.int64)
        out = pd.DataFrame({"register": reg, "max_rank": 57 - bl})
        for c in gcols:  # one sketch per group: ≤ groups x 256 rows
            out[c] = b[c].to_numpy()
        return (
            out.groupby(gb_keys, sort=False, observed=True)["max_rank"]
            .max()
            .reset_index()
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (
            df.groupby(gb_keys, sort=False, observed=True)["max_rank"]
            .max()
            .reset_index()
        )

    src = ds.map_batches(prep_fn, batch_format="pandas") if prep_fn else ds
    return tree_aggregate(src, partial, merge)


def hll_estimate(registers: pd.DataFrame, m: int = 256) -> float:
    """Bias-corrected HLL estimate from a ``hll_registers`` table.
    The harmonic sum is computed in EXACT integers (Σ 2^(57−M_j) —
    every term a power of two) with one float division at the end."""
    alpha = 0.7213 / (1 + 1.079 / m)
    ranks = dict(
        zip(registers["register"].astype(int), registers["max_rank"].astype(int))
    )
    z = sum(1 << (57 - ranks.get(j, 0)) for j in range(m))
    raw = alpha * m * m * float(1 << 57) / float(z)
    zeros = sum(1 for j in range(m) if j not in ranks)
    if raw <= 2.5 * m and zeros:
        import math

        return m * math.log(m / zeros)  # linear counting regime
    return raw


def equi_depth_histogram(
    ds,
    value_col: str = "cents",
    num_buckets: int = 4,
    prep_fn=None,
):
    """Equi-DEPTH histogram (≈equal row counts per bucket) over an
    integer value column — the quantile-bucketing complement of
    ``equi_width_histogram``.  One pass builds the (value, count) table
    through the merge tree; the root assigns each DISTINCT VALUE the
    bucket ``min(B−1, B·cum_lt // total)`` where ``cum_lt`` counts rows
    strictly below it — ties share a value and therefore a bucket, so
    the split is deterministic and exactly SQL-replayable (no
    interpolation, no float).  Same bounded-VALUE-DOMAIN root
    assumption as ``grouped_quantile_disc``: the root block holds one
    row per distinct value, not per input row.

    Output: bucket, n_rows, lo_<value_col>, hi_<value_col>.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({value_col: b[value_col]})
        out["n"] = np.int64(1)
        return out.groupby(value_col, sort=False)["n"].sum().reset_index()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(value_col, sort=False)["n"].sum().reset_index()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        lo_c, hi_c = f"lo_{value_col}", f"hi_{value_col}"
        if df.empty:
            return pd.DataFrame(
                {
                    "bucket": pd.Series(dtype="int64"),
                    "n_rows": pd.Series(dtype="int64"),
                    lo_c: pd.Series(dtype="int64"),
                    hi_c: pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(value_col, kind="mergesort").reset_index(drop=True)
        n = df["n"].to_numpy(dtype=np.int64)
        cum_lt = np.cumsum(n) - n
        total = int(n.sum())
        df["bucket"] = np.minimum(
            num_buckets - 1, num_buckets * cum_lt // total
        ).astype(np.int64)
        g = df.groupby("bucket", sort=True).agg(
            n_rows=("n", "sum"),
            **{lo_c: (value_col, "min"), hi_c: (value_col, "max")},
        ).reset_index()
        return g.astype(
            {"bucket": "int64", "n_rows": "int64", lo_c: "int64", hi_c: "int64"}
        )

    src = ds.map_batches(prep_fn, batch_format="pandas") if prep_fn else ds
    return tree_aggregate(src, partial, merge, final_fn=finish)


def skyline_2d(ds, x_col: str, y_col: str):
    """2-D skyline (Pareto front): rows not STRICTLY dominated — no
    other row is greater in BOTH ``x_col`` and ``y_col``.  Strict
    domination is transitive, so the distributed plan is the classic
    local-front merge tree: each batch keeps its own front, fronts
    merge pairwise, and the root front equals the global front (a row
    eliminated locally is dominated by a surviving row, which either
    reaches the root or is dominated transitively by one that does).
    Only candidate fronts ever move — output-sized, not data-sized.

    In-kernel test is vectorized: sort by x descending, take the
    running max of y over all STRICTLY-greater-x groups (groupwise
    cummax shifted by one group); a row is dominated iff that prefix
    max exceeds its own y.  All columns pass through.
    """

    def front(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        df = df.sort_values(
            [x_col, y_col], ascending=False, kind="mergesort"
        ).reset_index(drop=True)
        x = df[x_col].to_numpy()
        grp = np.concatenate([[0], np.cumsum(x[1:] != x[:-1])])
        gmax = pd.Series(df[y_col].to_numpy()).groupby(grp).max()
        prefix = gmax.cummax().shift(1)  # max y over greater-x groups
        pref_row = prefix.iloc[grp].to_numpy()
        y = df[y_col].to_numpy()
        dominated = pd.notna(pref_row) & (pref_row > y)
        return df[~dominated].reset_index(drop=True)

    return tree_aggregate(ds, front, front)


def grouped_spearman(
    ds,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Spearman rank correlation per group — Pearson correlation of the
    within-group AVERAGE ranks.  Average ranks of integers are exact
    half-integers, so the rank stage emits 2×rank as int64 and the
    downstream Pearson tree is the exact-big-int ``grouped_corr``
    machinery unchanged (scale invariance: corr(2r_x, 2r_y) =
    corr(r_x, r_y)).  SQL twin replays 2×avgrank as
    ``2*RANK() OVER (PARTITION BY g ORDER BY v) +
    COUNT(*) OVER (PARTITION BY g, v) - 1`` and the same
    one-division-at-the-end corr expression, so matches are bit-stable.

    Physical plan: ranking needs each group whole, so groups co-locate
    once through ``keyed_partition_apply`` (one-task small path / keyed
    actor exchange); the ranked (keys, rx, ry) rows — two int64s per
    input row — then flow through the combiner tree, so nothing
    group-sized survives past the rank stage.  Contract: a single
    group must fit a worker heap; for few-huge-groups layouts rank via
    a range-partitioned ``window.global_row_number`` per group instead.

    ``x_col``/``y_col`` must be integer-valued.  Output: keys…, n,
    spearman (NaN for zero-variance groups, matching SQL NULL).
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)

    def rank_kernel(g: pd.DataFrame) -> pd.DataFrame:
        out = g[keys].copy()
        gb = g.groupby(keys, sort=False, observed=True)
        out["rx"] = np.round(
            gb[x_col].rank(method="average").to_numpy() * 2
        ).astype("int64")
        out["ry"] = np.round(
            gb[y_col].rank(method="average").to_numpy() * 2
        ).astype("int64")
        return out.reset_index(drop=True)

    ranked = keyed_partition_apply(ds, keys, rank_kernel, num_buckets, path)
    corr = grouped_corr(ranked, keys, "rx", "ry")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        out = b[keys + ["n"]].copy()
        out["spearman"] = b["corr"].astype("float64")
        return out

    return corr.map_batches(finish, batch_format="pandas")


def grouped_zscore(ds, keys: Sequence[str], x_col: str):
    """Per-row population z-score within its group — the feature-scaling
    map — in TWO passes with nothing group-sized ever centralized:

      1. the exact (n, Σx, Σx²) combiner tree (object Python ints, the
         ``grouped_moments`` discipline) reduces to ≤|groups| rows —
         the bounded-key contract — which the driver folds into a
         constants table shipped inside the map closure;
      2. one map pass computes ``z = (n·x − Σx) / √(n·Σx² − (Σx)²)``:
         the numerator is an EXACT integer per row and the division is
         the single float step, so the HUGEINT SQL twin
         (``CAST(n*x - s1 AS DOUBLE) / SQRT(CAST(… AS DOUBLE))``)
         matches bit-for-bit.  (The algebra: (x−μ)/σ_pop with μ=Σx/n,
         σ=√(n·Σx²−Σx²)/n — the n's cancel.)  Zero-variance groups
         (incl. singletons) emit NaN, matching SQL NULL.

    Rows of groups absent from pass 1 cannot exist (same input); the
    numerator stays in numpy int64 while ``n·max|x|+|Σx| < 2^62`` and
    falls back to exact object ints past it.  Output: all input
    columns plus ``z:float64``.
    """
    import math

    keys = list(keys)
    raw = tree_aggregate(
        ds, _exact_sums_partial(keys, x_col), _exact_sums_merge(keys)
    ).take_all()
    consts = {}
    for r in raw:
        k = tuple(r[c] for c in keys)
        n, s1, s2 = int(r["n"]), int(r["s1"]), int(r["s2"])
        consts[k] = (n, s1, n * s2 - s1 * s1)

    def zmap(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        z = np.full(len(b), np.nan, dtype=np.float64)
        x = b[x_col].to_numpy()
        for k, idx in b.groupby(keys, sort=False, observed=True).indices.items():
            kk = k if isinstance(k, tuple) else (k,)
            n, s1, d = consts[kk]
            if d <= 0:
                continue
            xs = x[idx]
            root = math.sqrt(float(d))
            if n * int(np.abs(xs).max()) + abs(s1) < 2**62:
                num = (n * xs.astype(np.int64) - s1).astype(np.float64)
            else:
                num = np.array(
                    [float(n * int(v) - s1) for v in xs], dtype=np.float64
                )
            z[idx] = num / root
        b["z"] = z
        return b

    return ds.map_batches(zmap, batch_format="pandas")


def grouped_mad(ds, keys: Sequence[str], x_col: str):
    """Median absolute deviation per group — the robust-scale statistic
    beside variance — as TWO exact discrete-quantile passes:

      1. per-group discrete median through the value-histogram tree
         (``grouped_quantile_disc``: one row per distinct (group,
         value) moves, DuckDB ``quantile_disc(0.5)`` semantics) — the
         ≤|groups| medians ship in the second pass's map closure;
      2. per-row ``|x − med|`` (exact int64), then the SAME histogram
         tree picks the deviation median.

    All-integer end to end, so the twin
    (``quantile_disc(ABS(x − med), 0.5)``) matches exactly; both the
    histogram roots are domain-bounded, never row-bounded.  Output:
    keys…, n:int64, mad:int64.
    """
    keys = list(keys)
    med_rows = grouped_quantile_disc(
        ds, keys, x_col, [0.5], ["med"]
    ).take_all()
    meds = {tuple(r[c] for c in keys): int(r["med"]) for r in med_rows}

    def dev(b: pd.DataFrame) -> pd.DataFrame:
        out = b[keys].copy()
        d = np.empty(len(b), dtype=np.int64)
        x = b[x_col].to_numpy(np.int64)
        for k, idx in b.groupby(keys, sort=False, observed=True).indices.items():
            kk = k if isinstance(k, tuple) else (k,)
            d[idx] = np.abs(x[idx] - meds[kk])
        out["_dev"] = d
        return out

    out = grouped_quantile_disc(
        ds.map_batches(dev, batch_format="pandas"), keys, "_dev",
        [0.5], ["mad"],
    )
    return out.map_batches(
        lambda b: b.astype({"n": "int64", "mad": "int64"})
        if len(b) else b,
        batch_format="pandas",
    )


def grouped_weighted_mean(
    ds, keys: Sequence[str], val_col: str, weight_col: str
):
    """Weighted mean per group — Σ(w·v)/Σw — with the exact-big-int
    discipline: (Σw, Σwv) ride the combiner tree as object Python ints
    (w·v products wrap int64 at realistic scales) and the ONE double
    division happens at the root, so the HUGEINT SQL twin matches
    bit-for-bit.  Zero total weight → NaN (SQL NULL).  Output:
    keys…, n:int64, wmean:float64.
    """
    keys = list(keys)
    state = ["n", "sw", "swv"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        w = [int(x) for x in b[weight_col]]
        v = [int(x) for x in b[val_col]]
        df = pd.DataFrame({**{k: b[k] for k in keys}})
        idx = df.index
        df["n"] = pd.Series([1] * len(df), index=idx, dtype="object")
        df["sw"] = pd.Series(w, index=idx, dtype="object")
        df["swv"] = pd.Series(
            [a * c for a, c in zip(w, v)], index=idx, dtype="object"
        )
        return (
            df.groupby(keys, sort=False, observed=True)[state]
            .sum()
            .reset_index()
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in state:
            df[c] = pd.Series(
                [int(x) for x in df[c]], index=df.index, dtype="object"
            )
        return (
            df.groupby(keys, sort=False, observed=True)[state]
            .sum()
            .reset_index()
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {k: pd.Series(dtype="object") for k in keys}
            cols.update(n=pd.Series(dtype="int64"),
                        wmean=pd.Series(dtype="float64"))
            return pd.DataFrame(cols)
        out = df[keys].copy()
        out["n"] = df["n"].map(int).astype("int64")
        out["wmean"] = [
            float(int(a)) / float(int(b)) if int(b) != 0 else float("nan")
            for a, b in zip(df["swv"], df["sw"])
        ]
        return out.reset_index(drop=True)

    return tree_aggregate(ds, partial, merge, final_fn=finish)


def grouped_bitops(
    ds,
    keys: Sequence[str],
    mask_col: str,
    prep_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
):
    """Grouped bitwise OR / AND / XOR over an int64 mask column — the
    flag-set reductions of a feature/bitmap pipeline (union of flags
    seen, flags common to EVERY row, per-bit occurrence parity).  All
    three ops are associative + commutative, so raw rows collapse to
    (keys…, 3×int64) partials inside the scan and only combiner output
    rides the cardinality-aware tree — the ``grouped_sum`` physical
    plan exactly.

    The per-block reduce is vectorized: stable-sort by key, group
    starts from adjacent-inequality, then ONE ``np.bitwise_*.reduceat``
    per op — no Python loop over groups.  ``prep_fn`` (optional) maps a
    raw batch to (keys…, mask_col) rows first.

    Output: keys…, bits_or, bits_and, bits_xor (all int64).
    """
    keys = list(keys)
    cols = ["bits_or", "bits_and", "bits_xor"]
    ops = {
        "bits_or": np.bitwise_or,
        "bits_and": np.bitwise_and,
        "bits_xor": np.bitwise_xor,
    }

    def _typed_empty(df: pd.DataFrame) -> pd.DataFrame:
        out = {
            k: (df[k].iloc[:0] if k in df.columns
                else pd.Series(dtype="int64"))
            for k in keys
        }
        out.update({c: pd.Series(dtype="int64") for c in cols})
        return pd.DataFrame(out)

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _typed_empty(df)
        sdf = df.sort_values(keys, kind="mergesort")
        # appearance order == sorted order on a sorted frame, so the
        # group codes are nondecreasing and reduceat segments are runs
        codes = (
            sdf.groupby(keys, sort=False, observed=True)
            .ngroup()
            .to_numpy(dtype=np.int64)
        )
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        out = sdf.iloc[starts][keys].reset_index(drop=True)
        for c in cols:
            out[c] = ops[c].reduceat(
                sdf[c].to_numpy(dtype=np.int64), starts
            )
        return out

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if prep_fn is not None:
            b = prep_fn(b)
        if b.empty:
            return _typed_empty(b)
        m = b[mask_col].to_numpy(dtype=np.int64)
        df = pd.DataFrame({k: b[k].to_numpy() for k in keys})
        for c in cols:
            df[c] = m
        return _reduce(df)

    return tree_aggregate(ds, partial, _reduce, keys=keys)


def cms_registers(ds, key_col: str, d: int = 4, w: int = 64, prep_fn=None):
    """Count-Min sketch registers over ``key_col`` occurrences: ``d``
    hash lanes × ``w`` counters; register (lane, bucket) sums the rows
    whose key hashes there under lane's salt.  Point-frequency estimate
    = min over lanes of the key's register — never an undercount (every
    occurrence lands in all d registers; collisions only ADD).

    Registers are plain bounded-key SUMS (d·w keys total), so the
    sketch is mergeable across blocks/clusters through the ordinary
    grouped-sum tree and the registered output IS the sketch — the SQL
    twin replays the md5 bucketing exactly and the check is hash-exact
    even though the estimate is approximate (``cms_estimate`` accuracy
    is pytest-pinned).  Bucket = first 8 md5 digest bytes of
    "lane:key", big-endian, mod w — the repo-wide draw idiom.

    Output: lane:int64, bucket:int64, cnt:int64.
    """
    from nerpii_ray.functions.textfns import stable_hash64_np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if prep_fn is not None:
            b = prep_fn(b)
        vals = b[key_col].astype(str)
        frames = []
        for lane in range(d):
            bucket = (
                stable_hash64_np(str(lane) + ":" + vals) % np.uint64(w)
            ).astype("int64")
            frames.append(
                pd.DataFrame(
                    {
                        "lane": np.int64(lane),
                        "bucket": bucket,
                        "cnt": np.int64(1),
                    }
                )
            )
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(["lane", "bucket"], sort=False).sum().reset_index()

    return grouped_sum(ds, ["lane", "bucket"], ["cnt"], partial_fn=partial)


def cms_estimate(
    registers: pd.DataFrame, key, d: int = 4, w: int = 64
) -> int:
    """Point-frequency estimate from ``cms_registers`` output: min over
    lanes of the key's register (missing register → 0)."""
    from nerpii_ray.functions.textfns import stable_hash64_np

    lut = {
        (int(l), int(bkt)): int(c)
        for l, bkt, c in zip(
            registers["lane"], registers["bucket"], registers["cnt"]
        )
    }
    est = None
    for lane in range(d):
        b = int(
            stable_hash64_np(pd.Series([f"{lane}:{key}"]))[0] % np.uint64(w)
        )
        v = lut.get((lane, b), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)


def quota_topk_filter(ds, key_col: str, rank_cols: Sequence[str], k: int):
    """Keep at most ``k`` rows per key, the lexicographically smallest
    ``rank_cols`` tuples first — the per-source/per-domain quota cap a
    web-scale training mix needs (no single origin may dominate).

    Scale shape: a mergeable per-key top-k tree (top-k of a union IS the
    top-k of per-part top-ks) reduces to ONE threshold row per key —
    state bounded by k x n_keys at every merge level, never by data
    size; the key-cardinality threshold table then broadcasts into a
    second pass over ``ds`` and rows at-or-under their key's k-th rank
    tuple pass.  Data rows are never shuffled and the driver holds only
    the threshold table.  ``ds`` is consumed twice (census + filter) —
    keep it a narrow projection; ``rank_cols`` tuples must be unique per
    row (use a content hash + a unique id as tiebreak)."""
    from nerpii_ray.stages.joins import broadcast_join

    rank_cols = list(rank_cols)

    def keep_k(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values([key_col] + rank_cols)
            .groupby(key_col, sort=False)
            .head(k)
        )

    def thresholds(b: pd.DataFrame) -> pd.DataFrame:
        # the k-th (or last, when fewer) row per key IS the cutoff
        tail = keep_k(b).groupby(key_col, sort=False).tail(1)
        out = {key_col: tail[key_col].to_numpy()}
        for c in rank_cols:
            out[f"{c}_thr"] = tail[c].to_numpy()
        return pd.DataFrame(out)

    thr = tree_aggregate(ds, keep_k, keep_k, final_fn=thresholds).to_pandas()

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        under = np.zeros(len(b), dtype=bool)
        eq = np.ones(len(b), dtype=bool)
        for i, c in enumerate(rank_cols):
            t = b[f"{c}_thr"]
            if i < len(rank_cols) - 1:
                under |= eq & (b[c] < t).to_numpy()
                eq &= (b[c] == t).to_numpy()
            else:
                under |= eq & (b[c] <= t).to_numpy()
        return b.loc[under, [key_col] + rank_cols]

    return broadcast_join(ds, thr, on=[key_col]).map_batches(
        finish, batch_format="pandas"
    )
