"""Hash-actor exchange: exactness vs pandas groupby, idempotent resends,
and empty input.  (Callables are defined inside each test so cloudpickle
serializes them by value — tests/ isn't importable from Ray workers.)"""

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from nerpii_ray.stages.exchange import _BucketAggregator, hash_exchange_aggregate


def _fns():
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("k", sort=False)["v"].sum().reset_index()

    return partial, partial  # merge has the same shape


def test_matches_pandas_groupby():
    partial, merge = _fns()
    df = pd.DataFrame({"k": [f"key{i % 97}" for i in range(10_000)], "v": range(10_000)})
    ds = rd.from_pandas(df).repartition(8)
    got = hash_exchange_aggregate(ds, partial, merge, keys=["k"], num_buckets=4)
    want = df.groupby("k")["v"].sum().reset_index()
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_duplicate_sends_are_dropped():
    _, merge = _fns()
    actor = _BucketAggregator.remote(merge)
    t = pa.table({"k": ["a", "b"], "v": [1, 2]})
    assert ray.get(actor.add.remote("fp1", t)) is True
    assert ray.get(actor.add.remote("fp1", t)) is False  # retried task
    assert ray.get(actor.add.remote("fp2", t)) is True
    out = ray.get(actor.finish.remote()).to_pandas().sort_values("k")
    assert list(out["v"]) == [2, 4]  # fp1 counted once, fp2 once
    ray.kill(actor)


def test_identical_partials_from_distinct_batches_all_count():
    # Constant-key input: every feeder batch emits the identical partial
    # row ("k", <same sum>).  A content-derived fingerprint would collapse
    # them into one and undercount; task-identity fingerprints must not.
    partial, merge = _fns()
    df = pd.DataFrame({"k": ["k"] * 4096, "v": [1] * 4096})
    ds = rd.from_pandas(df).repartition(8)
    got = hash_exchange_aggregate(
        ds, partial, merge, keys=["k"], num_buckets=2, batch_size=256
    )
    assert len(got) == 1
    assert int(got["v"].iloc[0]) == 4096


def test_cardinality_aware_tree_spills_to_exchange():
    """tree_dedup / grouped_sum with a forced-low root_threshold must take
    the keyed-exchange finish and produce exactly the single-root result
    (as a Dataset of key-disjoint blocks)."""
    from nerpii_ray.stages.agg import grouped_sum, tree_dedup

    df = pd.DataFrame(
        {
            "k": [f"key{i % 257}" for i in range(20_000)],
            "id": range(20_000),
            "v": [i % 7 for i in range(20_000)],
        }
    )
    ds = rd.from_pandas(df).repartition(8)

    root = tree_dedup(ds, keys=["k"], keep_min="id").to_pandas()
    spill = tree_dedup(ds, keys=["k"], keep_min="id", root_threshold=1)
    assert isinstance(spill, rd.Dataset)
    spill_df = spill.to_pandas()
    cols = ["k", "id", "v"]
    pd.testing.assert_frame_equal(
        root.sort_values("k").reset_index(drop=True)[cols],
        spill_df.sort_values("k").reset_index(drop=True)[cols],
    )

    ds2 = rd.from_pandas(df).repartition(8)
    root_s = grouped_sum(ds2, ["k"], ["v"]).to_pandas()
    spill_s = grouped_sum(ds2, ["k"], ["v"], root_threshold=1).to_pandas()
    pd.testing.assert_frame_equal(
        root_s.sort_values("k").reset_index(drop=True),
        spill_s.sort_values("k").reset_index(drop=True)[["k", "v"]],
    )


def test_exact_dedup_spill_path_matches():
    """exact_dedup through the forced exchange finish keeps the same
    (min-id per fingerprint) rows as the root finish."""
    from nerpii_ray.stages.dedup import exact_dedup

    docs = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": [f"document body {i % 60}" for i in range(200)],
        }
    )
    want = (
        exact_dedup(rd.from_pandas(docs).repartition(4))
        .to_pandas().sort_values("fp").reset_index(drop=True)
    )
    got = (
        exact_dedup(rd.from_pandas(docs).repartition(4), root_threshold=1)
        .to_pandas().sort_values("fp").reset_index(drop=True)
    )
    assert len(want) == 60
    pd.testing.assert_frame_equal(want[["doc_id", "fp"]], got[["doc_id", "fp"]])


def test_empty_input():
    partial, merge = _fns()
    ds = rd.from_pandas(
        pd.DataFrame({"k": pd.Series(dtype=str), "v": pd.Series(dtype="int64")})
    )
    out = hash_exchange_aggregate(ds, partial, merge, keys=["k"], num_buckets=2)
    assert len(out) == 0
