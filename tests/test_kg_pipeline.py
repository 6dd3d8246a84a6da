"""End-to-end KG pipeline tests: triple P/R vs the reference-semantics
oracle (BASELINE.json gate), the per-turn ordering invariant, and
checkpoint/resume (SURVEY §7 steps 5-9)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from nerpii_ray.config import EngineConfig
from nerpii_ray.oracle.reference_oracle import oracle_triples
from nerpii_ray.pipelines.kg import run_kg, run_kg_partitioned
from nerpii_ray.testgen import generate_table, write_transcripts


@pytest.fixture(scope="module")
def transcripts(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("transcripts"))
    write_transcripts(d, n_convs=60, seed=7, convs_per_file=20)
    return d


def _engine_edge_set(edges_df: pd.DataFrame) -> set:
    return {
        (r.subj_id, r.pred, r.obj_id, r.conv_id, int(r.turn_idx))
        for r in edges_df.itertuples(index=False)
    }


def test_triple_precision_recall_vs_oracle(transcripts):
    turns = rd.read_parquet(transcripts)
    res = run_kg(turns, EngineConfig(recognizer_concurrency=2), with_assignments=False)
    engine = _engine_edge_set(res["edges"].to_pandas())

    rows = pq.read_table(transcripts).to_pylist()
    truth = oracle_triples(rows)

    tp = len(engine & truth)
    precision = tp / len(engine) if engine else 0.0
    recall = tp / len(truth) if truth else 0.0
    assert len(truth) > 500, f"oracle produced too few triples: {len(truth)}"
    # the BASELINE.json gate
    assert precision >= 0.95, f"precision {precision:.4f}\nextra: {list(engine - truth)[:5]}"
    assert recall >= 0.95, f"recall {recall:.4f}\nmissed: {list(truth - engine)[:5]}"


def test_nodes_are_distinct_and_pseudonymized(transcripts):
    turns = rd.read_parquet(transcripts)
    res = run_kg(turns, EngineConfig(recognizer_concurrency=2), with_assignments=False)
    nodes = res["nodes"].to_pandas()
    assert nodes["node_id"].is_unique
    # hot surface appears exactly once despite ~10% frequency
    assert (nodes["canonical_name"] == "acme corp").sum() == 1
    # deterministic pseudonyms: PERSON nodes get a name, not their surface
    persons = nodes[nodes["entity_type"] == "PERSON"]
    assert len(persons) > 0
    assert (persons["pseudonym"] != persons["canonical_name"]).all()
    # edges reference known nodes
    edges = res["edges"].to_pandas()
    known = set(nodes["node_id"])
    assert set(edges["obj_id"]).issubset(known)


def test_run_kg_emits_stage_metrics(transcripts, tmp_path):
    """F15: run_kg returns per-stage metrics (wall + row counts) and
    write_graph completes the lineage record with the sink stages."""
    import json

    from nerpii_ray.pipelines.kg import write_graph

    turns = rd.read_parquet(transcripts)
    res = run_kg(turns, EngineConfig(recognizer_concurrency=2))
    m = res["metrics"]
    assert m["scan"]["mention_rows"] > 0 and m["scan"]["wall_sec"] > 0
    assert m["assign"]["groups_assigned"] > 0
    out = str(tmp_path / "graph")
    write_graph(res, out)
    with open(f"{out}/_metrics.json") as f:
        rec = json.load(f)
    assert set(rec) >= {"scan", "assign", "write_edges", "write_nodes"}
    assert rec["write_edges"]["wall_sec"] > 0


def test_top_surfaces_census(transcripts):
    """The skew census's distributed top-k must equal a driver-side
    nlargest over the full mention counts (the driver only ever sees k
    rows from the engine)."""
    from nerpii_ray.stages.canonicalize import top_surfaces

    turns = rd.read_parquet(transcripts)
    res = run_kg(turns, EngineConfig(recognizer_concurrency=2), with_assignments=False)
    got = top_surfaces(res["mentions"], k=10)
    men = res["mentions"].to_pandas()
    men = men[men["node_id"].notna()]
    want = (
        men.groupby(["node_id", "entity", "norm_surface"], observed=True)
        .size().reset_index(name="cnt")
        .nlargest(10, "cnt").reset_index(drop=True)
    )
    assert len(got) == len(want)
    # ties at the k-th count make membership ambiguous; the count
    # multiset must match exactly, and everything STRICTLY above the
    # boundary count must be present
    assert sorted(got["cnt"]) == sorted(want["cnt"])
    kth = sorted(want["cnt"])[0]
    must = set(want.loc[want["cnt"] > kth, "node_id"])
    assert must <= set(got["node_id"])


def test_fused_redaction_matches_standalone(transcripts):
    """run_kg(redact=...) fuses redaction into the KG scan: the redacted
    corpus must equal the standalone redact_transcripts output text-for-
    text, and the graph must be unchanged by the fusion."""
    from nerpii_ray.stages.redact import redact_transcripts

    turns = rd.read_parquet(transcripts)
    cfg = EngineConfig(recognizer_concurrency=2)
    fused = run_kg(turns, cfg, with_assignments=False, redact="pseudonym")
    fused_red = (
        fused["redacted"].to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    alone = (
        redact_transcripts(turns, cfg, mode="pseudonym").to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert len(fused_red) == len(alone)
    assert (fused_red["text"].to_numpy() == alone["text"].to_numpy()).all()

    # graph unchanged by the fusion
    plain = run_kg(turns, cfg, with_assignments=False)
    assert _engine_edge_set(fused["edges"].to_pandas()) == _engine_edge_set(
        plain["edges"].to_pandas()
    )
    nodes_f = set(fused["nodes"].to_pandas()["node_id"])
    nodes_p = set(plain["nodes"].to_pandas()["node_id"])
    assert nodes_f == nodes_p


def test_per_turn_text_equality_under_stable_order(transcripts):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering, via the Dataset path vs direct read."""
    ds = rd.read_parquet(transcripts).sort(["conv_id", "turn_idx"])
    got = ds.to_pandas()
    want = (
        pq.read_table(transcripts)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["text"], want["text"])
    pd.testing.assert_series_equal(got["turn_idx"], want["turn_idx"])


def test_generate_deterministic():
    a = generate_table(5, seed=11)
    b = generate_table(5, seed=11)
    assert a.equals(b)
    c = generate_table(5, seed=12)
    assert not a.equals(c)


def test_partitioned_run_resumes(transcripts, tmp_path):
    out = str(tmp_path / "graph")
    cfg = EngineConfig(recognizer_concurrency=2)
    rec1 = run_kg_partitioned(transcripts, out, cfg, files_per_partition=2)
    assert len(rec1) == 2  # 3 files → 2 partitions of ≤2
    assert all(not r.get("skipped") for r in rec1)
    for p in range(2):
        assert os.path.exists(os.path.join(out, f"part={p:05d}", "edges", "_SUCCESS"))
        assert os.path.exists(os.path.join(out, f"part={p:05d}", "edges", "_lineage.json"))
    # second run: everything skipped, nothing recomputed
    rec2 = run_kg_partitioned(transcripts, out, cfg, files_per_partition=2)
    assert all(r.get("skipped") for r in rec2)
    # output is a readable graph
    edges = pq.read_table(os.path.join(out, "part=00000", "edges"))
    assert edges.num_rows > 0
    assert set(edges.column_names) >= {"subj_id", "pred", "obj_id", "conv_id", "turn_idx"}


def test_stale_inprogress_dir_recovered(transcripts, tmp_path):
    """A killed run leaves <out>.inprogress; the next run must clean it
    up and still commit atomically (sources/writers.py)."""
    import ray.data as rd2

    from nerpii_ray.sources.writers import write_partition

    out = str(tmp_path / "part0")
    stale = out + ".inprogress"
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("half-written garbage")
    ds = rd2.from_items([{"a": 1}, {"a": 2}])
    rec = write_partition(ds, out, {"test": True}, min_rows_per_file=1)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(stale)
    assert rec["test"] is True
    # second call: skipped, lineage read back from disk
    rec2 = write_partition(ds, out, {"test": False})
    assert rec2["test"] is True


def test_profile_data_sample_deterministic():
    import pandas as pd2

    from nerpii_ray.pipelines.profile import profile_table

    df = pd2.DataFrame({"email": [f"user{i}@example.com" for i in range(50)]})
    a = profile_table(df, data_sample=10, seed=3)
    b = profile_table(df, data_sample=10, seed=3)
    assert a == b
    assert a["email"]["entity"] == "EMAIL_ADDRESS"


def test_triples_exact_across_batch_boundaries(transcripts):
    """Regression: mentions were emitted in scan-pass order (not row
    order), so re-batching could split one turn's mentions across batches
    and drop works_for/located_in pairs — P/R must be EXACT even with a
    tiny recognizer batch size that forces many block boundaries."""
    turns = rd.read_parquet(transcripts)
    cfg = EngineConfig(recognizer_concurrency=2, recognizer_batch_size=64)
    res = run_kg(turns, cfg, with_assignments=False)
    engine = _engine_edge_set(res["edges"].to_pandas())
    truth = oracle_triples(pq.read_table(transcripts).to_pylist())
    assert engine == truth, (
        f"missing={list(truth - engine)[:3]} extra={list(engine - truth)[:3]}"
    )
