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


def test_attempt_api_available_and_zero_on_first_try():
    # The fingerprint scheme's safety depends on the core-worker
    # attempt-number API (RuntimeContext has none on Ray 2.49); this
    # asserts it exists and reads 0 inside a first-attempt task.
    from nerpii_ray.stages import exchange as ex

    @ray.remote
    def probe():
        from nerpii_ray.stages.exchange import _task_attempt_number

        return _task_attempt_number()

    assert ray.get(probe.remote()) == 0


def test_reexecution_on_reused_worker_replays_fingerprints():
    """ADVICE r2 (medium): a lineage re-execution scheduled onto a
    surviving, REUSED worker process must replay fingerprints 0,1,2,…
    so the aggregator drops them — not continue the ordinal sequence.
    Simulated: same module state (same process), same task id, attempt
    number bumped by the retry."""
    from nerpii_ray.stages.exchange import _FEED_ORDINALS, _next_fingerprint

    _FEED_ORDINALS.pop("taskX", None)
    first = [_next_fingerprint("taskX", 0) for _ in range(3)]
    # re-execution: same process, same task, attempt 1
    second = [_next_fingerprint("taskX", 1) for _ in range(3)]
    assert first == second == ["taskX:0", "taskX:1", "taskX:2"]
    # a different task never collides
    assert _next_fingerprint("taskY", 0) == "taskY:0"


def test_aggregator_death_mid_feed_fails_loudly():
    """Fault drill (VERDICT r2 #8): if a _BucketAggregator actor dies
    mid-feed, the job must raise — never return a silently-partial
    aggregate.  The actor kills itself (os._exit) once it has merged
    more than a few batches; every feeder waits on acks, so the death
    surfaces as an actor error in some feeder task and fails the run."""
    import pytest

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("k", sort=False)["v"].sum().reset_index()

    def merge_then_die(df: pd.DataFrame) -> pd.DataFrame:
        import os

        if df["v"].sum() > 2000:  # enough feed has arrived — die mid-job
            os._exit(1)
        return df.groupby("k", sort=False)["v"].sum().reset_index()

    df = pd.DataFrame({"k": [f"key{i % 5}" for i in range(20_000)], "v": [1] * 20_000})
    ds = rd.from_pandas(df).repartition(16)
    with pytest.raises(Exception):
        hash_exchange_aggregate(
            ds, partial, merge_then_die, keys=["k"], num_buckets=1, batch_size=256
        )


def test_empty_input():
    partial, merge = _fns()
    ds = rd.from_pandas(
        pd.DataFrame({"k": pd.Series(dtype=str), "v": pd.Series(dtype="int64")})
    )
    out = hash_exchange_aggregate(ds, partial, merge, keys=["k"], num_buckets=2)
    assert len(out) == 0


def test_composite_key_injective_on_pipe_values():
    """VERDICT r3 #2: "|"-joined composite keys collided ("a|b","c") with
    ("a","b|c").  The \\x1f separator must keep them disjoint (and \\x00
    would be wrong too — pandas' string hashtable is NUL-terminated)."""
    from nerpii_ray.stages.exchange import KEY_SEP, composite_key

    part = pd.DataFrame({"k1": ["a|b", "a"], "k2": ["c", "b|c"]})
    ks = composite_key(part, ["k1", "k2"])
    assert ks.nunique() == 2, ks.tolist()
    assert KEY_SEP == "\x1f"
    # end-to-end: the two keys aggregate separately through the exchange
    df = pd.DataFrame(
        {"k1": ["a|b", "a"] * 50, "k2": ["c", "b|c"] * 50, "v": [1, 10] * 50}
    )
    out = hash_exchange_aggregate(
        rd.from_pandas(df).repartition(4),
        partial_fn=lambda b: b.groupby(["k1", "k2"], sort=False)["v"].sum().reset_index(),
        merge_fn=lambda d: d.groupby(["k1", "k2"], sort=False)["v"].sum().reset_index(),
        keys=["k1", "k2"],
        num_buckets=4,
    ).sort_values(["k1"]).reset_index(drop=True)
    assert out["v"].tolist() == [500, 50]


def test_keyed_partition_apply_empty_stream_typed_schema():
    """ADVICE r3 (low): an all-empty exchange stream used to emit one
    column-less block; path="exchange" callers now get the kernel's
    TYPED output schema so downstream column indexing works."""
    from nerpii_ray.stages.colocate import keyed_partition_apply

    ds = rd.from_pandas(
        pd.DataFrame({"k": pd.Series(dtype=str), "v": pd.Series(dtype="int64")})
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("k", sort=False)["v"].sum().reset_index()
        return out.rename(columns={"v": "total"})

    res = keyed_partition_apply(ds, ["k"], kernel, path="exchange")
    pdf = res.to_pandas()
    # empty result still indexable by the kernel's output columns
    assert list(res.schema().names) == ["k", "total"]
    assert len(pdf) == 0
