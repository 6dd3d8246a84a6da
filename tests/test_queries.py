"""Driver-contract parity: run every SQL-oracled query at sf0.001 through
the Ray path AND the DuckDB oracle, compare row-count + sorted-column
value equality (the same comparison the driver makes at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from nerpii_ray.pipelines.queries import (
    ORACLE_SQL,
    QUERIES,
    _transcript_curation_funnel_sql,
    _transcript_pack_contexts_sql,
    _transcript_reply_latency_sql,
    _transcript_role_bigrams_sql,
    _transcript_turn_dedup_sql,
    _transcript_turn_stats_sql,
    kg_assignments_sql_for,
    kg_edges_sql_for,
    kg_nodes_core_sql_for,
    kg_nodes_sql_for,
    kg_canonical_comention_sql_for,
    kg_comention_window_sql_for,
    kg_person_comention_sql_for,
    kg_negsample_sql_for,
    kg_randomwalk_sql_for,
    kg_skipgram_sql_for,
    kg_person_fuzzy_sql_for,
    _conv_minhash_sql,
    _transcript_langid_mix_sql,
    _transcript_pii_rate_sql,
    _transcript_segment_split_sql,
    _transcript_role_runs_sql,
    _transcript_sft_pairs_sql,
    _transcript_tool_funnel_sql,
    _transcript_hashed_features_sql,
    kg_person_phonetic_sql_for,
    transcript_gender_sql_for,
    kg_entity_timeline_sql_for,
    kg_predicate_stats_sql_for,
    kg_edge_support_sql_for,
    _transcript_dialog_acts_sql,
    _transcript_tool_stats_sql,
    kg_degree_histogram_sql_for,
    kg_neighbor_jaccard_sql_for,
    kg_comention_lift_sql_for,
    kg_temporal_edges_sql_for,
    kg_conv_overlap_sql_for,
    kg_type_cooccurrence_sql_for,
    kg_incremental_nodes_sql_for,
    _transcript_role_vocab_sql,
    _transcript_len_ratio_sql,
    kg_entity_role_matrix_sql_for,
    kg_triangles_sql_for,
    _prompt_response_matrix_sql,
    kg_node_gender_census_sql_for,
    kg_email_domain_census_sql_for,
    kg_org_location_affinity_sql_for,
    kg_works_for_conflicts_sql_for,
    kg_conv_graph_stats_sql_for,
    _transcript_ts_inversions_sql,
    kg_org_size_histogram_sql_for,
    _transcript_daily_volume_sql,
    kg_cluster_modularity_sql_for,
    kg_cluster_conductance_sql_for,
)

SF = "/root/testdata/sf0.001"
# the kg oracles read side parquets the queries write, whose paths embed
# the sf; the registered SQL targets the driver's sf0.01 run, so rebuild
# it for the test sf here
SQL_OVERRIDES = {
    "kg_assignments": kg_assignments_sql_for(0.001),
    "kg_edges": kg_edges_sql_for(0.001),
    "kg_nodes_core": kg_nodes_core_sql_for(0.001),
    "kg_nodes": kg_nodes_sql_for(0.001),
    "kg_canonical_comention_edges": kg_canonical_comention_sql_for(0.001),
    "kg_comention_window_edges": kg_comention_window_sql_for(0.001),
    "kg_person_comention_edges": kg_person_comention_sql_for(0.001),
    "kg_randomwalk_corpus": kg_randomwalk_sql_for(0.001),
    "kg_walk_skipgram_pairs": kg_skipgram_sql_for(0.001),
    "kg_walk_negative_samples": kg_negsample_sql_for(0.001),
    "kg_person_fuzzy_clusters": kg_person_fuzzy_sql_for(0.001),
    "transcript_conv_minhash_pairs": _conv_minhash_sql(0.001),
    "transcript_langid_mix": _transcript_langid_mix_sql(0.001),
    "transcript_segment_split": _transcript_segment_split_sql(0.001),
    "transcript_role_runs": _transcript_role_runs_sql(0.001),
    "transcript_sft_pairs": _transcript_sft_pairs_sql(0.001),
    "transcript_tool_funnel": _transcript_tool_funnel_sql(0.001),
    "transcript_hashed_features": _transcript_hashed_features_sql(0.001),
    "transcript_pii_rate": _transcript_pii_rate_sql(0.001),
    "kg_person_phonetic_blocks": kg_person_phonetic_sql_for(0.001),
    "transcript_gender_enrich": transcript_gender_sql_for(0.001),
    "transcript_turn_stats": _transcript_turn_stats_sql(0.001),
    "transcript_role_bigrams": _transcript_role_bigrams_sql(0.001),
    "transcript_turn_dedup": _transcript_turn_dedup_sql(0.001),
    "transcript_curation_funnel": _transcript_curation_funnel_sql(0.001),
    "transcript_pack_contexts": _transcript_pack_contexts_sql(0.001),
    "transcript_reply_latency": _transcript_reply_latency_sql(0.001),
    "kg_entity_timeline": kg_entity_timeline_sql_for(0.001),
    "kg_predicate_stats": kg_predicate_stats_sql_for(0.001),
    "kg_edge_support": kg_edge_support_sql_for(0.001),
    "transcript_dialog_acts": _transcript_dialog_acts_sql(0.001),
    "transcript_tool_stats": _transcript_tool_stats_sql(0.001),
    "kg_degree_histogram": kg_degree_histogram_sql_for(0.001),
    "kg_node_neighbor_jaccard": kg_neighbor_jaccard_sql_for(0.001),
    "kg_comention_lift": kg_comention_lift_sql_for(0.001),
    "kg_temporal_edges": kg_temporal_edges_sql_for(0.001),
    "kg_conv_entity_overlap": kg_conv_overlap_sql_for(0.001),
    "kg_type_cooccurrence": kg_type_cooccurrence_sql_for(0.001),
    "kg_incremental_nodes": kg_incremental_nodes_sql_for(0.001),
    "transcript_role_vocab": _transcript_role_vocab_sql(0.001),
    "transcript_len_ratio": _transcript_len_ratio_sql(0.001),
    "kg_entity_role_matrix": kg_entity_role_matrix_sql_for(0.001),
    "kg_comention_triangles": kg_triangles_sql_for(0.001),
    "transcript_prompt_response_matrix": _prompt_response_matrix_sql(0.001),
    "kg_node_gender_census": kg_node_gender_census_sql_for(0.001),
    "kg_email_domain_census": kg_email_domain_census_sql_for(0.001),
    "kg_org_location_affinity": kg_org_location_affinity_sql_for(0.001),
    "kg_works_for_conflicts": kg_works_for_conflicts_sql_for(0.001),
    "kg_conv_graph_stats": kg_conv_graph_stats_sql_for(0.001),
    "transcript_ts_inversions": _transcript_ts_inversions_sql(0.001),
    "kg_org_size_histogram": kg_org_size_histogram_sql_for(0.001),
    "transcript_daily_volume": _transcript_daily_volume_sql(0.001),
    "kg_cluster_modularity": kg_cluster_modularity_sql_for(0.001),
    "kg_cluster_conductance": kg_cluster_conductance_sql_for(0.001),
}
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype("float64"), 6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _typed_empty(ds) -> pd.DataFrame:
    """Ray's to_pandas() on an empty Dataset drops the column schema;
    rebuild a typed empty frame from ds.schema() instead."""
    import pyarrow as pa

    sch = ds.schema()
    cols = {}
    for name, t in zip(sch.names, sch.types):
        dt = t.to_pandas_dtype() if isinstance(t, pa.DataType) else t
        try:
            cols[name] = pd.Series(dtype=dt)
        except Exception:
            cols[name] = pd.Series(dtype="object")
    return pd.DataFrame(cols)


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
        if df.shape[1] == 0 and not len(df):
            return _typed_empty(result)
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, con):
    got_raw = _to_df(QUERIES[name](SF))
    want_raw = con.execute(SQL_OVERRIDES.get(name, ORACLE_SQL[name])).df()
    # Driver hashes values WITHOUT dtype coercion: a DuckDB HUGEINT (from a
    # bare SUM(BIGINT)) lands as float64/object and hash-mismatches an int64
    # engine column even when values agree. Catch that class here.
    for c in set(got_raw.columns) & set(want_raw.columns):
        gk, wk = got_raw[c].dtype.kind, want_raw[c].dtype.kind
        assert (gk == wk) or {gk, wk} <= {"i", "u"}, (
            f"{name}.{c}: engine dtype kind {gk!r} != oracle {wk!r} "
            "(driver hash would mismatch; CAST the SQL aggregate)"
        )
    got = _canon(got_raw)
    want = _canon(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run(name):
    got = _to_df(QUERIES[name](SF))
    assert got is not None
    assert len(got.columns) > 0


def test_every_query_has_callable():
    assert len(QUERIES) >= 20
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_randomwalk_walks_are_valid_paths():
    """Structural invariant the SQL twin cannot express: every
    consecutive (node, next) pair in every walk is an actual edge of
    the co-mention graph, and every walk has exactly length+1 steps."""
    walks = _to_df(QUERIES["kg_randomwalk_corpus"](SF))
    edges = _to_df(QUERIES["kg_person_comention_edges"](SF))
    eset = set(zip(edges["node_a"], edges["node_b"]))
    eset |= {(b, a) for a, b in eset}
    w = walks.sort_values(["start", "step"])
    for _, g in w.groupby("start", sort=False):
        nodes = g["node"].tolist()
        assert len(nodes) == 4  # length=3 walks emit start + 3 hops
        for a, b in zip(nodes, nodes[1:]):
            assert (a, b) in eset, (a, b)


def test_negative_samples_track_corpus_frequency():
    """Draw shares follow walk-corpus node frequency (the distribution
    the trainer needs), within a loose tolerance at 4096 draws."""
    draws = _to_df(QUERIES["kg_walk_negative_samples"](SF))
    walks = _to_df(QUERIES["kg_randomwalk_corpus"](SF))
    want = walks["node"].value_counts(normalize=True)
    got = draws["node"].value_counts(normalize=True)
    top = want.index[0]
    assert abs(got.get(top, 0.0) - want[top]) < 0.05
