"""Windowed aggregates over the events stream table (SURVEY §2.9: the
reference is pure batch; these are the engine's stream-shaped operators,
implemented per the ordered-partitioned-log model).

Ordering assumption (stated per the guide): events of one key are
processed sorted by ``ts`` inside their group; groups are formed by a
hash shuffle on the key.  Tumbling windows pre-aggregate inside
``map_batches`` (combiner) so the shuffle moves one row per
(key, window, batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _ts_us(ts: pd.Series) -> pd.Series:
    """Timestamps as int64 MICROSECONDS, independent of the ambient
    resolution.  A bare ``.astype('int64')`` yields whatever unit the
    column happens to carry (ns-backed datetimes would make every window
    1000× too wide); normalizing through datetime64[us] pins the unit."""
    return ts.astype("datetime64[us]").astype("int64")


def hourly_agg(events_ds, value_col: str = "value", user_col: str = "user_id"):
    """Tumbling 1-hour window per user: event count + value cents sum.

    Returns (user_id, hour_epoch BIGINT, n_events BIGINT, value_cents
    BIGINT).  Money in integer cents so the result hash-matches SQL.
    """

    from nerpii_ray.stages.agg import grouped_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hour = (_ts_us(b["ts"]) // 3_600_000_000) * 3600
        cents = np.round(b[value_col].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame(
            {user_col: b[user_col], "hour_epoch": hour, "n_events": 1, "value_cents": cents}
        )
        return (
            df.groupby([user_col, "hour_epoch"], sort=False)
            .agg(n_events=("n_events", "sum"), value_cents=("value_cents", "sum"))
            .reset_index()
        )

    return grouped_sum(
        events_ds, [user_col, "hour_epoch"], ["n_events", "value_cents"],
        partial_fn=partial,
    )


def sessionize(events_ds, gap_sec: int = 1800, user_col: str = "user_id"):
    """Session windows: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_sec``.  Returns one row per user:
    (user_id, n_sessions BIGINT, n_events BIGINT).

    Implemented as a MERGEABLE interval summary on the tree aggregate
    (stages/agg.py) instead of a keyed shuffle: each batch locally
    sessionizes its own events into (user, start, end, count) intervals;
    merging two partials = interval merging with the same gap rule, which
    is associative — so the exchange carries one row per local session,
    not per event.  The interval table is keyed by user, so the tree's
    cardinality-aware root applies: a users×sessions table past the
    threshold finishes key-partitioned on the actor exchange instead of
    coalescing into one block (at the 100-TB design point that root
    would hold one row per session).  The per-user session/event counts
    then reduce through a combiner-first grouped sum.  Timestamps
    compare in integer MICROSECONDS (flooring to seconds would disagree
    with the SQL oracle's ``epoch_us`` at exact-gap boundaries).
    """
    from nerpii_ray.stages.agg import grouped_sum

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(user_col, sort=False)
            .agg(n_sessions=("s_start", "size"), n_events=("n_events", "sum"))
            .reset_index()
        )
        return out.astype({"n_sessions": "int64", "n_events": "int64"})

    # the interval merge is user-local and associative, so it is a valid
    # per-key-range merge for the exchange finish; the interval rows a
    # bucket actor accumulates are exactly its users' sessions
    intervals = _session_intervals(events_ds, gap_sec, user_col)
    return grouped_sum(
        intervals, [user_col], ["n_sessions", "n_events"],
        partial_fn=count_partial,
    )


def _session_intervals(events_ds, gap_sec: int, user_col: str):
    """The shared mergeable-interval tree under ``sessionize`` and
    ``session_table``: each batch locally sessionizes into
    (user, s_start, s_end, n_events) rows; merging partials re-applies
    the gap rule, which is associative — the shuffle carries one row
    per LOCAL session, never per event."""
    from nerpii_ray.stages.agg import tree_aggregate

    gap_us = gap_sec * 1_000_000

    def merge_intervals(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, "s_start"], kind="stable").reset_index(
            drop=True
        )
        end_cummax = df.groupby(user_col, sort=False)["s_end"].cummax()
        prev_end = end_cummax.shift()
        first_of_user = df[user_col] != df[user_col].shift()
        new_session = first_of_user | (df["s_start"] - prev_end > gap_us)
        gid = new_session.cumsum()
        out = (
            df.groupby([user_col, gid], sort=False)
            .agg(
                s_start=("s_start", "min"),
                s_end=("s_end", "max"),
                n_events=("n_events", "sum"),
            )
            .reset_index(level=0)
            .reset_index(drop=True)
        )
        return out[[user_col, "s_start", "s_end", "n_events"]]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ts = _ts_us(b["ts"])
        df = pd.DataFrame(
            {user_col: b[user_col], "s_start": ts, "s_end": ts, "n_events": 1}
        )
        return merge_intervals(df)

    return tree_aggregate(events_ds, partial, merge_intervals, keys=[user_col])


def session_table(events_ds, gap_sec: int = 1800, user_col: str = "user_id"):
    """One row PER SESSION: (user_id, s_start µs, s_end µs, n_events) —
    the interval table ``sessionize`` reduces to per-user counts,
    exposed directly.  The SQL twin is the LAG-gap / running-break-count
    window form."""
    return _session_intervals(events_ds, gap_sec, user_col).map_batches(
        lambda b: b.astype(
            {user_col: "int64", "s_start": "int64", "s_end": "int64",
             "n_events": "int64"}
        ),
        batch_format="pandas",
    )


def rolling_time_count(
    events_ds,
    window_sec: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "n_window",
    num_buckets: int | None = None,
    path: str = "auto",
    _bias_cap: int = 1 << 62,
    sum_col: str | None = None,
):
    """Sliding time window: for every event, the count of same-key events
    with ``ts`` in ``[ts - window, ts]`` — SQL's ``COUNT(*) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW)``, including CURRENT ROW's ts-peers per the RANGE frame
    rule.  With ``sum_col`` set (an int64 column, cents discipline) the
    output is the window SUM of that column instead of the count — the
    rank difference becomes a prefix-sum difference at the same two
    ``searchsorted`` indices.

    Per-key co-location via ``keyed_partition_apply`` (one hash shuffle,
    B heap-bounded buckets); inside a bucket the kernel is two
    ``searchsorted`` calls on the per-user sorted µs timestamps — no
    Python loop, no global sort.  Window bounds compare in integer
    MICROSECONDS (RANGE is inclusive at both ends).
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    win_us = window_sec * 1_000_000

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {id_col: g[id_col] if id_col in g else pd.Series(dtype="int64"),
                 out_col: pd.Series(dtype="int64")}
            )
        g = g.sort_values([user_col, ts_col], kind="stable")
        ts = _ts_us(g[ts_col]).to_numpy()
        # per-user segments: users are contiguous after the sort
        user = g[user_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, user[1:] != user[:-1]])
        bounds = np.r_[starts, len(user)]
        seg_len = np.diff(bounds)
        seg_first = ts[starts]
        # offset-bias each user's (rebased) timestamps by the running sum
        # of (span + window + 1): segments become disjoint on one global
        # axis, so TWO searchsorted calls replace the per-user Python
        # loop (a bucket of millions of short histories paid loop
        # overhead per user).  The left query ts-window can never cross
        # into the previous segment because inter-segment gaps exceed
        # the window by construction.
        span = ts[bounds[1:] - 1] - seg_first
        gap = span + win_us + 1
        base = np.zeros(len(starts), dtype=np.int64)
        if len(starts) > 1:
            base[1:] = np.cumsum(gap[:-1])
        vals = (
            g[sum_col].to_numpy().astype(np.int64)
            if sum_col is not None
            else None
        )
        n = np.empty(len(user), dtype=np.int64)
        # int64 headroom guard for the cumulative bias (parameter so
        # tests can force the multi-slice path — real ns-bounded
        # timestamps cannot reach it with one slice's worth of users)
        CAP = np.int64(_bias_cap)
        s0 = 0
        while s0 < len(starts):  # almost always ONE slice; the loop is
            # only entered again when the cumulative bias nears 2^62
            rebased = base - base[s0]
            s1 = int(np.searchsorted(rebased + gap, CAP, side="left"))
            s1 = max(s1, s0 + 1)
            lo, hi = bounds[s0], bounds[s1]
            biased = (
                ts[lo:hi]
                - np.repeat(seg_first[s0:s1], seg_len[s0:s1])
                + np.repeat(rebased[s0:s1], seg_len[s0:s1])
            )
            right = np.searchsorted(biased, biased, side="right")
            left = np.searchsorted(biased, biased - win_us, side="left")
            if vals is None:
                n[lo:hi] = right - left
            else:  # prefix-sum difference at the same frame indices
                csum = np.zeros(hi - lo + 1, dtype=np.int64)
                np.cumsum(vals[lo:hi], out=csum[1:])
                n[lo:hi] = csum[right] - csum[left]
            s0 = s1
        return pd.DataFrame({id_col: g[id_col].to_numpy(), out_col: n})

    return keyed_partition_apply(events_ds, [user_col], kernel, num_buckets, path)


def running_order_stats(
    orders_ds,
    key_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    id_col: str = "o_orderkey",
    price_col: str = "o_totalprice",
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Per-key ordered window functions over the orders stream: sequence
    number (ROW_NUMBER), running money total (SUM OVER), and whole-day
    gap to the previous order (LAG diff; -1 for the first order).  The
    SQL twin is a WINDOW w AS (PARTITION BY key ORDER BY date, id)
    clause — see ``customer_order_running`` in pipelines/queries.py.

    Same physical plan as ``rolling_time_count``: one hash shuffle to
    co-locate keys, then one in-bucket sort + pandas groupby cumsum /
    cumcount / diff — all C kernels.  Money in integer cents.
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, date_col, id_col], kind="stable")
        cents = np.round(g[price_col].to_numpy() * 100).astype(np.int64)
        gb = g.groupby(key_col, sort=False, observed=True)
        seq = gb.cumcount().to_numpy() + 1
        run = pd.Series(cents).groupby(g[key_col].to_numpy()).cumsum().to_numpy()
        day = _ts_us(g[date_col]) // 86_400_000_000
        gap = day.groupby(g[key_col].to_numpy()).diff()
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                "order_seq": seq.astype(np.int64),
                "run_cents": run.astype(np.int64),
                "gap_days": gap.fillna(-1).astype(np.int64).to_numpy(),
            }
        )

    return keyed_partition_apply(orders_ds, [key_col], kernel, num_buckets, path)


def first_last_value(
    events_ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "event_type",
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Per-key FIRST_VALUE / LAST_VALUE over the (ts, id)-ordered stream —
    SQL's ``FIRST_VALUE(v) OVER (PARTITION BY key ORDER BY ts, id ROWS
    BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)`` pair, reduced
    to one row per key (the per-row window value is constant within the
    key).  Same physical plan as every ordered operator here: one hash
    co-location via ``keyed_partition_apply`` (metadata-count auto path:
    a pure parquet read never materializes), then an in-bucket sort +
    groupby first/last — C kernels, no global sort.

    Output: (key, first_value, last_value, n_events).
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {user_col: pd.Series(dtype="int64"),
                 "first_value": pd.Series(dtype="object"),
                 "last_value": pd.Series(dtype="object"),
                 "n_events": pd.Series(dtype="int64")}
            )
        g = g.sort_values([user_col, ts_col, id_col], kind="stable")
        gb = g.groupby(user_col, sort=False, observed=True)[value_col]
        out = pd.DataFrame(
            {
                "first_value": gb.first(),
                "last_value": gb.last(),
                "n_events": gb.size().astype("int64"),
            }
        ).reset_index()
        out[user_col] = out[user_col].astype("int64")
        return out

    return keyed_partition_apply(
        events_ds, [user_col], kernel, num_buckets, path
    )


def sequential_funnel(
    events_ds,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_buckets=None,
    path: str = "auto",
    emit_times: bool = False,
):
    """General k-step ordered conversion funnel (VERDICT r4 #8 — the
    3-step ``events_funnel`` kernel parameterized by a step list): for
    every user, the deepest prefix of ``steps`` reached with STRICTLY
    increasing timestamps between consecutive steps.  Output:
    (user_col, funnel_stage BIGINT in [0, len(steps)]).

    Physical plan: ONE co-location by user (metadata-count auto path /
    keyed exchange at scale); the in-bucket kernel is k chained
    conditional groupby-mins — stage i's candidate events filter on
    ``ts > min-ts-of-stage-(i-1)`` via a vectorized user map, no
    per-user Python loop, no global sort.  SQL twin: k chained
    ``MIN(ts) ... WHERE ts > prev`` CTEs (the registered 3- and 4-step
    queries replay it exactly).
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    steps = list(steps)
    if not steps:
        raise ValueError("sequential_funnel: steps must be non-empty")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            key_dtype = (
                g[user_col].dtype if user_col in g.columns else "int64"
            )
            base = {user_col: pd.Series(dtype=key_dtype),
                    "funnel_stage": pd.Series(dtype="int64")}
            if emit_times:
                for i in range(1, len(steps) + 1):
                    base[f"t{i}"] = pd.Series(dtype="int64")
            return pd.DataFrame(base)
        users = pd.unique(g[user_col])
        stage = np.zeros(len(users), dtype=np.int64)
        users_s = pd.Series(users)
        prev = None  # min-ts of the previous stage, indexed by user
        stage_mins = []  # per-stage min-ts Series (emit_times)
        for si, st in enumerate(steps):
            sub = g.loc[g[type_col] == st]
            if prev is not None:
                t_prev = sub[user_col].map(prev)
                sub = sub.loc[(sub[ts_col] > t_prev).to_numpy()]
            cur = sub.groupby(user_col, sort=False, observed=True)[ts_col].min()
            if cur.empty:
                break
            stage[users_s.isin(cur.index).to_numpy()] = si + 1
            prev = cur
            stage_mins.append(cur)
        out = pd.DataFrame(
            {
                # preserve string keys (conversation ids); pin numeric
                # keys to int64 so empty/typed blocks concatenate clean
                user_col: (
                    users_s
                    if users_s.dtype == object
                    else users_s.astype("int64")
                ),
                "funnel_stage": stage,
            }
        )
        if emit_times:
            # stage-i min timestamp per user as int64 microseconds,
            # -1 where the user never reached the stage
            for i in range(1, len(steps) + 1):
                if i <= len(stage_mins):
                    tv = users_s.map(stage_mins[i - 1])
                    iv = tv.astype("datetime64[us]").astype("int64")
                    iv[tv.isna()] = -1
                    out[f"t{i}"] = iv.to_numpy()
                else:
                    out[f"t{i}"] = np.int64(-1)
        return out

    return keyed_partition_apply(
        events_ds, [user_col], kernel, num_buckets, path
    )


def rows_window_sum(
    ds,
    key_col: str,
    order_cols: list,
    value_col: str,
    preceding: int,
    out_col: str = "moving_sum",
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Per-key ROWS-frame moving sum — SQL's ``SUM(v) OVER (PARTITION BY
    key ORDER BY ... ROWS BETWEEN <preceding> PRECEDING AND CURRENT
    ROW)``.  The count-based frame complements ``rolling_time_count``'s
    RANGE frame.

    Same physical plan as every ordered kernel here: one keyed
    co-location, then an in-bucket sort + two C-level passes — a grouped
    cumsum and the same cumsum shifted ``preceding+1`` rows within the
    key (window sum = difference), no per-row Python.  ``value_col``
    must already be an integer column (cents discipline).
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    m = preceding + 1

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="stable")
        v = pd.Series(g[value_col].to_numpy(dtype=np.int64))
        keys = g[key_col].to_numpy()
        run = v.groupby(keys).cumsum()
        lagged = run.groupby(keys).shift(m)
        out = g.loc[:, [key_col, *order_cols]].reset_index(drop=True)
        out[out_col] = (run - lagged.fillna(0)).astype(np.int64).to_numpy()
        return out

    return keyed_partition_apply(ds, [key_col], kernel, num_buckets, path)


def lead_gap(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    out_col: str = "next_gap_us",
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Per-key LEAD: µs gap from each row to the NEXT row of the same
    key in (ts, id) order, -1 on the key's last row — the
    forward-looking complement of the LAG-gap in
    ``running_order_stats``.  One keyed co-location + an in-bucket
    grouped ``shift(-1)``."""
    from nerpii_ray.stages.colocate import keyed_partition_apply

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="stable")
        us = _ts_us(g[ts_col]).reset_index(drop=True)
        nxt = us.groupby(g[key_col].to_numpy()).shift(-1)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                out_col: (nxt - us).fillna(-1).astype(np.int64).to_numpy(),
            }
        )

    return keyed_partition_apply(ds, [key_col], kernel, num_buckets, path)


def global_row_number(
    ds,
    value_col: str,
    id_col: str,
    num_buckets: int = 64,
    out_col: str = "rn",
    num_partitions: int | None = None,
    path: str = "auto",
):
    """Global total-order ROW_NUMBER (ORDER BY value DESC, id ASC)
    without a single-node sort — the range-partitioned ranking a 100-TB
    corpus needs:

    1. global (lo, hi) of the integer ``value_col`` via the combiner
       tree (driver reads two scalars);
    2. bounded-key equi-width bucket counts (one grouped sum over
       ``num_buckets`` keys) → the driver cumsums ``num_buckets`` rows
       into per-bucket rank offsets — never data;
    3. rows co-locate by bucket (complete buckets per partition), each
       partition sorts its buckets locally and adds offset + position.

    Equi-width ranges assume the value distribution is not
    pathologically skewed; for skewed data derive boundaries from
    ``agg.grouped_quantile_disc`` instead and bucket by searchsorted —
    the offset/kernel mechanics below are unchanged.  ``value_col``
    must already be int64 (cents discipline).
    """
    from nerpii_ray.stages.agg import grouped_sum, tree_aggregate
    from nerpii_ray.stages.colocate import keyed_partition_apply

    def bounds_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"lo": pd.Series(dtype="int64"), "hi": pd.Series(dtype="int64")}
            )
        v = b[value_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"lo": [int(v.min())], "hi": [int(v.max())]})

    def bounds_merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return pd.DataFrame(
            {"lo": [int(df["lo"].min())], "hi": [int(df["hi"].max())]}
        )

    bounds = tree_aggregate(ds, bounds_partial, bounds_merge).take_all()
    if not bounds:
        raise ValueError("global_row_number: empty input")
    lo, hi = int(bounds[0]["lo"]), int(bounds[0]["hi"])
    span = hi - lo + 1

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = (
            (b[value_col].to_numpy(dtype=np.int64) - lo) * num_buckets // span
        )
        return b

    # pin the bucketized projection ONCE: the counts tree and the
    # ranking co-location both consume it, and the auto path would
    # have materialized it anyway for the cardinality decision — this
    # way the source is scanned twice total (bounds + bucketize), not
    # re-executed per consumer
    withb = ds.map_batches(bucketize, batch_format="pandas").materialize()

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"_bkt": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
            )
        return (
            pd.DataFrame({"_bkt": b["_bkt"], "n": np.int64(1)})
            .groupby("_bkt", sort=False)["n"].sum().reset_index()
        )

    counts = grouped_sum(
        withb, ["_bkt"], ["n"], partial_fn=count_partial, adaptive=False
    ).to_pandas()
    # descending rank: higher buckets rank first
    counts = counts.sort_values("_bkt", ascending=False)
    offsets = dict(
        zip(
            counts["_bkt"].astype(int),
            np.concatenate(([0], counts["n"].to_numpy(dtype=np.int64).cumsum()[:-1])),
        )
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["_bkt", value_col, id_col], ascending=[False, False, True],
            kind="mergesort",
        )
        pos = g.groupby("_bkt", sort=False).cumcount().to_numpy(dtype=np.int64)
        base = g["_bkt"].map(offsets).to_numpy(dtype=np.int64)
        out = g.loc[:, [id_col, value_col]].reset_index(drop=True)
        out[out_col] = base + pos + 1
        return out

    return keyed_partition_apply(withb, ["_bkt"], kernel, num_partitions, path)


def max_concurrent_intervals(
    intervals_ds,
    start_col: str = "s_start",
    end_col: str = "s_end",
    num_buckets: int = 64,
):
    """Maximum number of simultaneously-active intervals (INCLUSIVE
    bounds: at any instant t, intervals with start ≤ t ≤ end count) —
    the sweep-line primitive behind peak-concurrency metrics, done
    range-partitioned so no node ever sees the whole boundary stream
    (the ``global_row_number`` plan applied to prefix sums):

    1. boundary rows (ts, +1) / (ts, −1) from each interval;
    2. global (lo, hi) of ts via the combiner tree → two driver
       scalars; equi-width time buckets;
    3. per-bucket Σdelta via a bounded-key sum tree → the driver
       cumsums ``num_buckets`` integers into per-bucket ENTRY
       concurrency offsets — never data;
    4. boundaries co-locate by bucket; each bucket sorts by
       (ts, delta DESC) — starts before ends at the same instant, the
       inclusive-overlap convention — and takes max(offset + cumsum);
    5. one tiny tree maxes the ≤``num_buckets`` bucket maxima.

    Returns a single-row Dataset ``(max_concurrent:int64)``; 0 on
    empty input.  ``start_col``/``end_col`` must be int64 (µs
    discipline).
    """
    from nerpii_ray.stages.agg import grouped_sum, tree_aggregate
    from nerpii_ray.stages.colocate import keyed_partition_apply

    def bounds(b: pd.DataFrame) -> pd.DataFrame:
        ts = np.concatenate(
            [b[start_col].to_numpy(np.int64), b[end_col].to_numpy(np.int64)]
        )
        delta = np.concatenate(
            [np.ones(len(b), dtype=np.int64), -np.ones(len(b), dtype=np.int64)]
        )
        return pd.DataFrame({"ts": ts, "delta": delta})

    bnd = intervals_ds.map_batches(bounds, batch_format="pandas").materialize()

    def mm_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"lo": pd.Series(dtype="int64"), "hi": pd.Series(dtype="int64")}
            )
        t = b["ts"].to_numpy(np.int64)
        return pd.DataFrame({"lo": [int(t.min())], "hi": [int(t.max())]})

    def mm_merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return pd.DataFrame(
            {"lo": [int(df["lo"].min())], "hi": [int(df["hi"].max())]}
        )

    mm = tree_aggregate(bnd, mm_partial, mm_merge).take_all()
    import ray.data as rd

    if not mm:
        return rd.from_pandas(
            pd.DataFrame({"max_concurrent": pd.array([0], dtype="int64")})
        )
    lo, hi = int(mm[0]["lo"]), int(mm[0]["hi"])
    span = hi - lo + 1

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = (
            (b["ts"].to_numpy(np.int64) - lo) * num_buckets // span
        ).astype(np.int64)
        return b

    withb = bnd.map_batches(bucketize, batch_format="pandas").materialize()

    sums = grouped_sum(
        withb.map_batches(
            lambda b: pd.DataFrame({"_bkt": b["_bkt"], "d": b["delta"]}),
            batch_format="pandas",
        ),
        ["_bkt"], ["d"], adaptive=False,
    ).to_pandas()
    per_bucket = np.zeros(num_buckets, dtype=np.int64)
    per_bucket[sums["_bkt"].to_numpy(np.int64)] = sums["d"].to_numpy(np.int64)
    entry = np.concatenate([[0], np.cumsum(per_bucket)[:-1]])

    def bucket_max(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"m": pd.Series(dtype="int64")})
        out = []
        for bkt, grp in g.groupby("_bkt", sort=False):
            grp = grp.sort_values(
                ["ts", "delta"], ascending=[True, False], kind="mergesort"
            )
            run = int(entry[int(bkt)]) + grp["delta"].cumsum()
            out.append(int(run.max()))
        return pd.DataFrame({"m": pd.array(out, dtype="int64")})

    maxima = keyed_partition_apply(withb, ["_bkt"], bucket_max)

    def root_max(df: pd.DataFrame) -> pd.DataFrame:
        # partial sees the kernel's "m" column, merge its own output
        col = "m" if "m" in df.columns else "max_concurrent"
        m = int(df[col].max()) if len(df) else 0
        return pd.DataFrame({"max_concurrent": pd.array([m], dtype="int64")})

    return tree_aggregate(maxima, root_max, root_max)


def consecutive_streaks(
    ds,
    keys: list[str],
    day_col: str,
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Gaps-and-islands: per key, the LONGEST run of consecutive
    ``day_col`` values plus the distinct active-day count — the
    engagement-streak primitive.  ``day_col`` is an int64 ordinal (epoch
    days); duplicates within a day collapse first, so event volume per
    day never matters.

    One keyed co-location; the in-bucket kernel is fully vectorized:
    sort unique (key, day), break where the key changes or the day gap
    ≠ 1, label islands with a cumulative sum, and size them with one
    groupby — the SQL twin is the classic ``day − ROW_NUMBER()`` island
    idiom.  Output: keys…, longest_streak:int64, active_days:int64.
    Per-key state past the co-location is O(distinct days); salt is
    never needed (runs are key-local by construction).
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = (
            g[keys + [day_col]]
            .drop_duplicates()
            .sort_values(keys + [day_col], kind="mergesort")
            .reset_index(drop=True)
        )
        if not len(u):
            out = u[keys].copy()
            out["longest_streak"] = pd.Series(dtype="int64")
            out["active_days"] = pd.Series(dtype="int64")
            return out
        key_change = u[keys].ne(u[keys].shift()).any(axis=1).to_numpy()
        day = u[day_col].to_numpy(np.int64)
        gap = np.concatenate([[True], np.diff(day) != 1])
        rid = np.cumsum(key_change | gap)
        runs = (
            u.assign(_rid=rid)
            .groupby(keys + ["_rid"], sort=False, observed=True)
            .size()
            .reset_index(name="_streak")
        )
        res = (
            runs.groupby(keys, sort=False, observed=True)["_streak"]
            .agg(longest_streak="max", active_days="sum")
            .reset_index()
        )
        res["longest_streak"] = res["longest_streak"].astype("int64")
        res["active_days"] = res["active_days"].astype("int64")
        return res

    return keyed_partition_apply(ds, keys, kernel, num_buckets, path)


def time_weighted_avg(
    ds,
    key: str,
    ts_col: str,
    val_col: str,
    order_col: str,
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Time-weighted average per key (the TWAP shape): each observation
    holds its integer value until the key's next observation, so the
    average weights values by their µs holding time — Σ(value·Δt)/Σ(Δt)
    over the n−1 intervals.  Keys with a single observation emit
    nothing (no interval); an all-tied key (ΣΔt = 0) emits NaN,
    matching the SQL twin's NULL.

    One keyed co-location; in-bucket the kernel sorts by (key, ts,
    order_col) — order_col breaks ts ties deterministically, though a
    tied pair only ever contributes a zero weight — diffs once, and
    carries Σ(value·Δt) as OBJECT Python ints (cents × µs products
    overflow int64 at realistic spans; same discipline as
    ``agg.grouped_corr``).  The single float is produced by ONE double
    division at the end, so the HUGEINT SQL twin (LEAD(t) − t per row,
    exact sums, one division) matches bit-for-bit.  Output: key,
    n_intervals:int64, total_dt_us:int64, twap:float64.
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, order_col], kind="mergesort")
        u = g[key].to_numpy()
        t = g[ts_col].to_numpy(np.int64)
        c = g[val_col].to_numpy(np.int64)
        if len(g) < 2:
            return pd.DataFrame(
                {
                    key: pd.Series(dtype=g[key].dtype),
                    "n_intervals": pd.Series(dtype="int64"),
                    "total_dt_us": pd.Series(dtype="int64"),
                    "twap": pd.Series(dtype="float64"),
                }
            )
        same = u[1:] == u[:-1]
        iu = u[:-1][same]
        dt = (t[1:] - t[:-1])[same]
        cv = c[:-1][same]
        prod = pd.Series(
            [int(a) * int(b) for a, b in zip(cv, dt)], dtype="object"
        )
        df = pd.DataFrame({key: iu, "_dt": dt, "_p": prod})
        s = (
            df.groupby(key, sort=False, observed=True)
            .agg(
                n_intervals=("_dt", "size"),
                total_dt_us=("_dt", "sum"),
                _swv=("_p", "sum"),
            )
            .reset_index()
        )
        s["n_intervals"] = s["n_intervals"].astype("int64")
        s["total_dt_us"] = s["total_dt_us"].astype("int64")
        s["twap"] = [
            float(int(a)) / float(int(b)) if int(b) > 0 else float("nan")
            for a, b in zip(s["_swv"], s["total_dt_us"])
        ]
        return s.drop(columns=["_swv"])

    return keyed_partition_apply(ds, [key], kernel, num_buckets, path)


def interval_union_length(
    intervals_ds,
    keys: list[str],
    start_col: str = "s_start",
    end_col: str = "s_end",
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Per-key UNION length of (possibly overlapping) intervals — total
    covered time, double-count-free: the coverage/uptime primitive that
    complements ``max_concurrent_intervals`` (global peak) and
    ``session_table`` (the interval source).  Closed-open convention:
    an interval covers [start, end), so zero-length intervals add
    nothing and touching intervals merge seamlessly.

    One keyed co-location; in-bucket the classic merge is fully
    vectorized: sort by (key, start), running cummax of ends per key,
    an island breaks where start > cummax(prev ends) — the same
    ``day − ROW_NUMBER()`` family as ``consecutive_streaks``, in
    continuous time.  SQL twin: cummax window + island groupby.
    Output: keys…, covered:int64 (Σ per-island max(end)−min(start)),
    n_islands:int64.
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [start_col, end_col], kind="mergesort")
        if not len(g):
            out = g[keys].copy()
            out["covered"] = pd.Series(dtype="int64")
            out["n_islands"] = pd.Series(dtype="int64")
            return out
        s = g[start_col].to_numpy(np.int64)
        e = g[end_col].to_numpy(np.int64)
        kc = g[keys].ne(g[keys].shift()).any(axis=1).to_numpy()
        # running cummax of e within key runs
        run = np.cumsum(kc) - 1
        emax = pd.Series(e).groupby(run).cummax().to_numpy()
        prev = np.concatenate([[np.iinfo(np.int64).min], emax[:-1]])
        brk = kc | (s > prev)
        iid = np.cumsum(brk)
        isl = (
            pd.DataFrame({**{k: g[k].to_numpy() for k in keys},
                          "_iid": iid, "_s": s, "_e": emax})
            .groupby(keys + ["_iid"], sort=False, observed=True)
            .agg(_lo=("_s", "min"), _hi=("_e", "max"))
            .reset_index()
        )
        isl["_len"] = isl["_hi"] - isl["_lo"]
        out = (
            isl.groupby(keys, sort=False, observed=True)
            .agg(covered=("_len", "sum"), n_islands=("_len", "size"))
            .reset_index()
        )
        out["covered"] = out["covered"].astype("int64")
        out["n_islands"] = out["n_islands"].astype("int64")
        return out

    return keyed_partition_apply(intervals_ds, keys, kernel, num_buckets, path)


def debounce(
    ds,
    keys: list[str],
    ts_col: str,
    min_gap_us: int,
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Per-key DEBOUNCE: keep a row only if the key's previous KEPT row
    is at least ``min_gap_us`` older — the telemetry / duplicate-event
    suppression shape.  Note the contract is against the previously
    KEPT row (a burst of rapid events collapses to its first), which is
    the streaming debounce semantics; the LAG-against-previous-RAW-row
    variant would re-admit every other row of a burst.

    One keyed co-location; the in-bucket kernel walks each key's sorted
    timestamps once in numpy (greedy anchor scan — a cumsum cannot
    express the data-dependent anchor, but the loop is per-ROW numpy
    scalar work only inside a burst window, and per-key rows live in
    one bucket by construction).  Ties on ts break by stable input
    order after a (keys, ts) mergesort.  All input columns pass
    through.
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g
        g = g.sort_values(keys + [ts_col], kind="mergesort").reset_index(
            drop=True
        )
        kc = g[keys].ne(g[keys].shift()).any(axis=1).to_numpy()
        t = g[ts_col].to_numpy(np.int64)
        keep = np.zeros(len(g), dtype=bool)
        anchor = 0
        for i in range(len(g)):
            if kc[i] or t[i] - anchor >= min_gap_us:
                keep[i] = True
                anchor = t[i]
        return g[keep].reset_index(drop=True)

    return keyed_partition_apply(ds, keys, kernel, num_buckets, path)


def _str_order_proxy(values, prefix_len: int) -> np.ndarray:
    """Monotone uint64 proxy for utf-8 strings: the first 8 bytes after
    a stripped common prefix, big-endian.  UTF-8 byte order equals
    codepoint order, so the proxy is order-preserving (non-strict —
    ties collapse, which equi-width bucketing tolerates)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, s in enumerate(values):
        b = s.encode("utf-8")[prefix_len : prefix_len + 8]
        out[i] = int.from_bytes(b.ljust(8, b"\x00"), "big")
    return out


def pack_token_blocks(
    ds,
    id_col: str,
    count_col: str,
    capacity: int,
    num_buckets: int = 64,
    path: str = "auto",
    id_kind: str = "int",
):
    """Sequence packing — the LLM-pretraining step that concatenates a
    deterministically-ordered corpus into fixed-``capacity`` token
    blocks (context windows) and records which blocks each document
    lands in.  Documents are laid out end-to-end in ``id_col`` order;
    a document may straddle a block boundary (the standard packed-
    pretraining layout — downstream attention masking handles the
    seam).

    Physical plan = the ``global_row_number`` range-partition shape,
    with the per-bucket COUNT replaced by a per-bucket token SUM:

    1. global (lo, hi) of ``id_col`` via the combiner tree (two driver
       scalars);
    2. equi-width id buckets; per-bucket token sums (one bounded-key
       grouped sum) → the driver cumsums ``num_buckets`` rows into
       per-bucket starting-token offsets — never data;
    3. rows co-locate by bucket; each partition sorts by id, exclusive-
       cumsums its token counts and adds the bucket offset — every
       document's global start token without a single-node sort.

    Ids need not be dense — only monotone layout order; equi-width
    bucketing assumes ids are not pathologically skewed (the
    ``global_row_number`` contract).  ``id_kind="str"`` packs by
    LEXICOGRAPHIC id order: the range partitioner projects each id to
    a monotone uint64 (first 8 utf-8 bytes past the global common
    prefix of min and max id), the in-bucket sort stays on the real
    string.  Zero-token documents are dropped (they occupy no block).
    Output: id_col (int64, or string for ``id_kind="str"``), n_toks,
    start_tok, block_first, block_last (int64).
    """
    from nerpii_ray.stages.agg import grouped_sum, tree_aggregate
    from nerpii_ray.stages.colocate import keyed_partition_apply

    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if id_kind not in ("int", "str"):
        raise ValueError("id_kind must be 'int' or 'str'")
    is_str = id_kind == "str"

    def bounds_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[count_col] > 0]
        if not len(b):
            dt = "object" if is_str else "int64"
            return pd.DataFrame(
                {"lo": pd.Series(dtype=dt), "hi": pd.Series(dtype=dt)}
            )
        if is_str:
            v = b[id_col].astype(str)
            return pd.DataFrame({"lo": [v.min()], "hi": [v.max()]})
        v = b[id_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"lo": [int(v.min())], "hi": [int(v.max())]})

    def bounds_merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return pd.DataFrame(
            {"lo": [df["lo"].min()], "hi": [df["hi"].max()]}
        )

    bounds = tree_aggregate(ds, bounds_partial, bounds_merge).take_all()
    if not bounds:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    id_col: pd.Series(dtype="object" if is_str else "int64"),
                    "n_toks": pd.Series(dtype="int64"),
                    "start_tok": pd.Series(dtype="int64"),
                    "block_first": pd.Series(dtype="int64"),
                    "block_last": pd.Series(dtype="int64"),
                }
            )
        )
    if is_str:
        lo_s, hi_s = str(bounds[0]["lo"]), str(bounds[0]["hi"])
        lo_b, hi_b = lo_s.encode("utf-8"), hi_s.encode("utf-8")
        prefix_len = 0
        for x, y in zip(lo_b, hi_b):
            if x != y:
                break
            prefix_len += 1
        lo_v = int(_str_order_proxy([lo_s], prefix_len)[0])
        hi_v = int(_str_order_proxy([hi_s], prefix_len)[0])
        step = (hi_v - lo_v) // num_buckets + 1
    else:
        lo, hi = int(bounds[0]["lo"]), int(bounds[0]["hi"])
        span = hi - lo + 1

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[count_col] > 0].copy()
        if is_str:
            prox = _str_order_proxy(
                b[id_col].astype(str).to_numpy(), prefix_len
            )
            b["_bkt"] = ((prox - np.uint64(lo_v)) // np.uint64(step)).astype(
                np.int64
            )
        else:
            b["_bkt"] = (
                (b[id_col].to_numpy(dtype=np.int64) - lo)
                * num_buckets // span
            )
        return b

    # one pinned bucketized projection feeds both the offsets tree and
    # the ranking co-location (the global_row_number discipline)
    withb = ds.map_batches(bucketize, batch_format="pandas").materialize()

    def sum_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"_bkt": pd.Series(dtype="int64"),
                 "t": pd.Series(dtype="int64")}
            )
        return (
            pd.DataFrame(
                {"_bkt": b["_bkt"],
                 "t": b[count_col].to_numpy(dtype=np.int64)}
            )
            .groupby("_bkt", sort=False)["t"].sum().reset_index()
        )

    sums = grouped_sum(
        withb, ["_bkt"], ["t"], partial_fn=sum_partial, adaptive=False
    ).to_pandas()
    sums = sums.sort_values("_bkt", ascending=True)
    offsets = dict(
        zip(
            sums["_bkt"].astype(int),
            np.concatenate(
                ([0], sums["t"].to_numpy(dtype=np.int64).cumsum()[:-1])
            ),
        )
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_bkt", id_col], kind="mergesort")
        n = g[count_col].to_numpy(dtype=np.int64)
        csum = n.cumsum() - n  # exclusive prefix sum within the block
        # rebase each bucket's run to zero, then add its global offset
        first = (
            pd.Series(csum).groupby(
                g["_bkt"].to_numpy(), sort=False
            ).transform("min").to_numpy(dtype=np.int64)
        )
        base = g["_bkt"].map(offsets).to_numpy(dtype=np.int64)
        start = base + (csum - first)
        ids = (
            g[id_col].to_numpy()
            if is_str
            else g[id_col].to_numpy(dtype=np.int64)
        )
        out = pd.DataFrame(
            {
                id_col: ids,
                "n_toks": n,
                "start_tok": start,
                "block_first": start // capacity,
                "block_last": (start + n - 1) // capacity,
            }
        )
        return out

    return keyed_partition_apply(withb, ["_bkt"], kernel, None, path)


def lagged_pairs(
    ds,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    lag: int = 1,
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Per-key lagged value pairs — the primitive under serial
    autocorrelation and lag-k feature engineering: for every row i of a
    key's ``order_cols``-ordered series, emit (a = x_i, b = x_{i+lag})
    when row i+lag still belongs to the same key.  ``value_col`` must be
    integer-valued (cents, counts); derive it upstream.

    One keyed co-location; the in-bucket kernel is fully vectorized —
    sort by keys + order, shift the KEY columns by −lag and compare
    (the tail rows of each key compare against the next key or NaN and
    drop out), then take the value array and its roll.  Output:
    keys…, a:int64, b:int64 — feed ``agg.grouped_corr`` on a constant
    key for pooled autocorrelation, or keep the keys for per-key lag
    features.  Pairs are key-local by construction, so hot keys carry
    the usual co-location contract.
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)
    order_cols = list(order_cols)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = (
            g.sort_values(keys + order_cols, kind="mergesort")
            .reset_index(drop=True)
        )
        if len(u) <= lag:
            out = u[keys].iloc[:0].copy()
            out["a"] = pd.Series(dtype="int64")
            out["b"] = pd.Series(dtype="int64")
            return out
        ks = u[keys]
        same = ~ks.ne(ks.shift(-lag)).any(axis=1).to_numpy()
        v = u[value_col].to_numpy(np.int64)
        out = u.loc[same, keys].reset_index(drop=True)
        out["a"] = v[same]
        out["b"] = np.roll(v, -lag)[same]
        return out

    return keyed_partition_apply(ds, keys, kernel, num_buckets, path)


def cusum_max(
    ds,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Self-normalized CUSUM change score per key: with n = the key's
    row count and S = its value sum, the deviation at ordered position
    i is D_i = n·cum_i − i·S (an exact integer — the cross-multiplied
    form of cum_i/i − S/n), and the score is max|D_i| — large when the
    series' level shifts mid-stream, 0 for a constant series.  The
    classic change-point detection statistic, exact with no floats.

    One keyed co-location; in-bucket the kernel sorts, takes one global
    cumsum rebased per key, and cross-multiplies in int64 with an
    OBJECT-int fallback past 2^62 (n·cum grows as n²·max|x|).  Output:
    keys…, n:int64, cusum_max:int64.
    """
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)
    order_cols = list(order_cols)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            out = g[keys].copy()
            out["n"] = pd.Series(dtype="int64")
            out["cusum_max"] = pd.Series(dtype="int64")
            return out
        u = (
            g.sort_values(keys + order_cols, kind="mergesort")
            .reset_index(drop=True)
        )
        v = u[value_col].to_numpy(np.int64)
        kch = u[keys].ne(u[keys].shift()).any(axis=1).to_numpy()
        gid = np.cumsum(kch) - 1
        csum = np.cumsum(v)
        # rebase the global cumsum so each key starts at its own x_0
        first_idx = np.flatnonzero(kch)
        base = np.repeat(csum[first_idx] - v[first_idx],
                         np.diff(np.append(first_idx, len(v))))
        cum = csum - base
        i = np.arange(len(v), dtype=np.int64) - np.repeat(
            first_idx, np.diff(np.append(first_idx, len(v)))
        ) + 1
        sizes = np.diff(np.append(first_idx, len(v))).astype(np.int64)
        n_rep = np.repeat(sizes, sizes)
        s_rep = np.repeat(cum[np.append(first_idx[1:], len(v)) - 1], sizes)
        if (
            len(v)
            and int(n_rep.max()) * int(np.abs(cum).max() + 1) < 2 ** 62
            and int(i.max()) * int(np.abs(s_rep).max() + 1) < 2 ** 62
        ):
            dev = np.abs(n_rep * cum - i * s_rep)
        else:  # exact past int64: object-int lane (same expression)
            dev = np.abs(
                n_rep.astype(object) * cum.astype(object)
                - i.astype(object) * s_rep.astype(object)
            )
        res = pd.DataFrame({k: u[k] for k in keys})
        res["_gid"] = gid
        res["_dev"] = dev
        out = (
            res.groupby(keys + ["_gid"], sort=False, observed=True)["_dev"]
            .max()
            .reset_index()
            .drop(columns="_gid")
            .rename(columns={"_dev": "cusum_max"})
        )
        out["n"] = sizes.astype("int64")
        out["cusum_max"] = out["cusum_max"].astype("int64")
        return out[keys + ["n", "cusum_max"]]

    return keyed_partition_apply(ds, keys, kernel, num_buckets, path)


def sequence_ngrams(
    ds,
    keys: list[str],
    order_cols: list[str],
    token_col: str,
    n: int = 3,
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Global support counts of ordered per-key token n-grams — the
    sequence-mining primitive (which event paths actually happen, and
    how often).  An n-gram is n CONSECUTIVE ``token_col`` values within
    one key's ``order_cols``-ordered stream.

    One keyed co-location emits per-bucket LOCAL (t1…tn, support)
    counts (the combiner: n-gram instances never leave their bucket
    unaggregated), then one bounded-key ``grouped_sum`` tree merges
    buckets.  Output: t1…tn (strings), support:int64.
    """
    from nerpii_ray.stages.agg import grouped_sum
    from nerpii_ray.stages.colocate import keyed_partition_apply

    keys = list(keys)
    order_cols = list(order_cols)
    tcols = [f"t{i + 1}" for i in range(n)]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = (
            g.sort_values(keys + order_cols, kind="mergesort")
            .reset_index(drop=True)
        )
        if len(u) < n:
            return pd.DataFrame(
                {**{c: pd.Series(dtype="object") for c in tcols},
                 "support": pd.Series(dtype="int64")}
            )
        ks = u[keys]
        toks = u[token_col].astype(object).to_numpy()
        same = np.ones(len(u), dtype=bool)
        cols = {}
        for j in range(n):
            if j:
                same &= ~ks.ne(ks.shift(-j)).any(axis=1).to_numpy()
            cols[tcols[j]] = np.roll(toks, -j)
        df = pd.DataFrame(cols)[same]
        out = (
            df.groupby(tcols, sort=False, observed=True)
            .size()
            .reset_index(name="support")
        )
        out["support"] = out["support"].astype("int64")
        return out

    local = keyed_partition_apply(ds, keys, kernel, num_buckets, path)
    return grouped_sum(local, tcols, ["support"])
