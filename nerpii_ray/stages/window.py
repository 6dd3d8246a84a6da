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


def hourly_agg(events_ds, value_col: str = "value", user_col: str = "user_id"):
    """Tumbling 1-hour window per user: event count + value cents sum.

    Returns (user_id, hour_epoch BIGINT, n_events BIGINT, value_cents
    BIGINT).  Money in integer cents so the result hash-matches SQL.
    """

    from nerpii_ray.stages.agg import grouped_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hour = (b["ts"].astype("int64") // 3_600_000_000) * 3600
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

    groupby(user) shuffle; inside each group a sort + vectorized diff —
    the ordered-log pattern for stream-shaped semantics.
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        # compare in integer MICROSECONDS: flooring to seconds would
        # disagree with the SQL oracle's epoch_us at exact-gap boundaries
        ts = np.sort(g["ts"].astype("int64").to_numpy())
        if len(ts) == 0:
            return pd.DataFrame({user_col: [], "n_sessions": [], "n_events": []})
        gaps = np.diff(ts)
        n_sessions = int(1 + (gaps > gap_sec * 1_000_000).sum())
        return pd.DataFrame(
            {
                user_col: [g[user_col].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [len(ts)],
            }
        )

    return events_ds.groupby(user_col).map_groups(per_user, batch_format="pandas")
