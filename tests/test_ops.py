"""Training-data operator tests over the driver testdata (sf0.001):
text stats, dedup family, similarity search, windows, joins, multimodal."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nerpii_ray.stages.dedup import (
    add_simhash,
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from nerpii_ray.stages.joins import broadcast_join, partitioned_hash_join
from nerpii_ray.stages.multimodal import DecodeStub, frame_sample, media_pipeline
from nerpii_ray.stages.similarity import brute_force_topk, ivf_topk
from nerpii_ray.stages.textstats import text_stats_pipeline
from nerpii_ray.stages.window import hourly_agg, sessionize

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_text_stats(docs, docs_df):
    out = text_stats_pipeline(docs).to_pandas().sort_values("doc_id")
    assert len(out) == len(docs_df)
    row = out.iloc[1]
    want_tokens = len(docs_df.iloc[1]["text"].split())
    assert row["n_tokens"] == want_tokens
    assert set(out["pred_lang"]) <= {"en", "es", "de", "fr", "it", "und"}
    assert out["fp"].str.len().eq(32).all()
    # empty text → 0 tokens, not quality
    empties = out[out["n_tokens"] == 0]
    assert (~empties["is_quality"]).all()


def test_exact_dedup(docs, docs_df):
    kept = exact_dedup(docs).to_pandas()
    # testdata documents are all distinct → everything kept
    assert len(kept) == docs_df["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip().nunique()
    # inject duplicates → smallest id wins
    dup = pd.concat(
        [docs_df, docs_df.head(5).assign(doc_id=lambda d: d["doc_id"] + 100000)]
    )
    kept2 = exact_dedup(rd.from_pandas(dup)).to_pandas()
    assert len(kept2) == len(kept)
    assert kept2["doc_id"].max() < 100000


def test_minhash_lsh_finds_injected_near_dups(docs_df):
    base = docs_df.head(50).copy()
    near = base.head(5).copy()
    near["doc_id"] = near["doc_id"] + 1000
    # perturb one word → high Jaccard
    near["text"] = near["text"].str.replace("the", "teh", n=1)
    ds = rd.from_pandas(pd.concat([base, near], ignore_index=True))
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    for did in near["doc_id"]:
        assert (did - 1000, did) in found, f"missed near-dup pair for {did}"


def test_banded_vectorized_matches_scalar(docs_df):
    """The vectorized batch kernel (_batch_sigs) must be bit-identical to
    the scalar reference (signature) for every doc, including the empty,
    whitespace-only, sub-shingle-length and unicode edge cases."""
    import numpy as np

    from nerpii_ray.stages.dedup import _MERSENNE, MinHasher

    texts = list(docs_df["text"]) + ["", "   ", "one", "two words", "héllo wörld"]
    vec = MinHasher(num_perm=64, shingle_k=3)
    ref = MinHasher(num_perm=64, shingle_k=3)
    kept, sigs = vec._batch_sigs(texts)
    pos = {int(d): i for i, d in enumerate(kept)}
    sentinel = np.full(64, _MERSENNE, dtype=np.uint64)
    for j, t in enumerate(texts):
        want = ref.signature(t)
        got = sigs[pos[j]] if j in pos else sentinel
        assert np.array_equal(want, got), f"signature mismatch at doc {j}"


def test_minhash_pairs_match_naive_lsh(docs_df):
    """The two-phase keyed-exchange pairing must produce exactly the
    pair set a naive single-process LSH produces from the same
    signatures (same coefficients, same banding, same threshold)."""
    from collections import defaultdict

    from nerpii_ray.stages.dedup import MinHasher

    base = docs_df.head(60).copy()
    near = base.head(8).copy()
    near["doc_id"] += 5000
    near["text"] = near["text"].str.replace("the", "thee", n=2)
    df = pd.concat([base, near], ignore_index=True)

    mh = MinHasher(num_perm=64, shingle_k=3)
    bands, rpb, threshold = 16, 4, 0.5
    sigs, buckets = {}, defaultdict(list)
    for did, text in zip(df["doc_id"], df["text"].fillna("")):
        if not mh._shingle_hashes(text).size:
            continue
        sig = mh.signature(text)
        sigs[did] = sig
        for band in range(bands):
            key = (band, sig[band * rpb : (band + 1) * rpb].tobytes())
            buckets[key].append(did)
    want = set()
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if (sigs[a] == sigs[b]).mean() >= threshold:
                    want.add((a, b))

    got_df = minhash_lsh_pairs(
        rd.from_pandas(df).repartition(6), threshold=threshold
    ).to_pandas()
    got = set(zip(got_df["id_a"], got_df["id_b"]))
    assert got == want


def test_lsh_hot_bucket_truncation_is_counted_and_logged(caplog):
    """VERDICT r2 #6: max_bucket truncation must not be silent.  A
    crafted hot bucket (7 ids, cap 4) drops C(7,2)-C(4,2)=15 pairs; the
    counter and the warning must both say so."""
    import logging

    from nerpii_ray.stages.dedup import (
        _bucket_candidate_pairs,
        _bucket_truncation_stats,
    )

    nb, dropped = _bucket_truncation_stats(np.array([7, 3, 2]), max_bucket=4)
    assert (nb, dropped) == (1, 15)

    df = pd.DataFrame(
        {"band": [0] * 7 + [1] * 2, "band_hash": ["h"] * 7 + ["g"] * 2,
         "doc_id": list(range(7)) + [10, 11]}
    )
    with caplog.at_level(logging.WARNING, logger="nerpii_ray.dedup"):
        pairs = _bucket_candidate_pairs(df, "doc_id", max_bucket=4)
    # hot bucket keeps its 4 smallest ids -> C(4,2)=6 pairs, plus 1 pair
    # from the cold bucket
    assert len(pairs) == 7
    assert "15 candidate pair(s) dropped" in caplog.text
    assert "max_bucket=4" in caplog.text


def test_minhash_pairing_root_and_exchange_agree(docs_df):
    """The cardinality-aware pairing root: the single-task root (small
    key tables) and the keyed actor exchange (forced via a tiny
    threshold) must emit identical pair sets."""
    import nerpii_ray.stages.agg as agg
    from nerpii_ray.stages.dedup import minhash_lsh_pairs as mlp

    base = docs_df.head(40).copy()
    near = base.head(6).copy()
    near["doc_id"] += 7000
    near["text"] = near["text"].str.replace("the", "thee", n=1)
    ds = rd.from_pandas(pd.concat([base, near], ignore_index=True)).repartition(4)
    want = mlp(ds).to_pandas()
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1  # read at call time → forces exchange
    try:
        got = mlp(ds).to_pandas()
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    # pair sets AND verify scores identical: the scale path re-derives
    # est_jaccard on the exchange (E3), not in the driver
    w = {(a, b): e for a, b, e in zip(want["id_a"], want["id_b"], want["est_jaccard"])}
    g = {(a, b): e for a, b, e in zip(got["id_a"], got["id_b"], got["est_jaccard"])}
    assert w == g
    assert len(want) > 0


def test_empty_docs_never_pair_as_duplicates(docs_df):
    """Empty/whitespace-only docs must not read as jaccard-1.0 duplicates
    of each other — in LSH (all-sentinel signatures) or n-gram Jaccard
    ('' shingle from an empty token list)."""
    base = docs_df.head(10).copy()
    empties = pd.DataFrame(
        {
            "doc_id": [9001, 9002, 9003],
            "text": ["", "   ", None],
            "source": [base["source"].iloc[0]] * 3,
        }
    )
    both = pd.concat([base[["doc_id", "text", "source"]], empties], ignore_index=True)
    ds = rd.from_pandas(both)
    def paired_ids(df: pd.DataFrame) -> set:
        if df.empty or "id_a" not in df.columns:
            return set()
        return set(df["id_a"]) | set(df["id_b"])

    lsh = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert paired_ids(lsh).isdisjoint({9001, 9002, 9003})
    ng = ngram_jaccard_pairs(ds, bucket_col="source", threshold=0.5).to_pandas()
    assert paired_ids(ng).isdisjoint({9001, 9002, 9003})


def test_simhash_deterministic_and_near(docs_df):
    b = docs_df.head(10)
    out1 = add_simhash(b)
    out2 = add_simhash(b)
    assert (out1["simhash"] == out2["simhash"]).all()
    # near-identical docs → small Hamming distance
    a = add_simhash(pd.DataFrame({"doc_id": [1], "text": [b.iloc[1]["text"]]}))
    c = add_simhash(
        pd.DataFrame({"doc_id": [2], "text": [b.iloc[1]["text"].replace("the", "teh", 1)]})
    )
    ham = bin(int(a["simhash"][0]) ^ int(c["simhash"][0])).count("1")
    assert ham <= 12


def test_ngram_jaccard_pairs(docs_df):
    base = docs_df.head(20).copy()
    near = base.head(3).copy()
    near["doc_id"] += 500
    ds = rd.from_pandas(pd.concat([base, near], ignore_index=True))
    pairs = ngram_jaccard_pairs(ds, bucket_col="source", threshold=0.9).to_pandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert {(d - 500, d) for d in near["doc_id"]} <= found


def test_bucket_pair_kernels_exchange_path(docs_df):
    """ngram_jaccard_pairs / embedding_dup_pairs ride
    keyed_partition_apply: pin the forced-exchange scale path equal to
    the one-task small path (values included)."""
    import nerpii_ray.stages.agg as agg

    base = docs_df.head(20).copy()
    near = base.head(3).copy()
    near["doc_id"] += 500
    ds = rd.from_pandas(pd.concat([base, near], ignore_index=True)).repartition(3)
    vdf = rd.read_parquet(f"{SF}/embeddings.parquet").to_pandas()
    dup = vdf.iloc[[0]].assign(vec_id=99999)
    vds = rd.from_pandas(pd.concat([vdf, dup], ignore_index=True))

    want_n = ngram_jaccard_pairs(ds, bucket_col="source", threshold=0.9).to_pandas()
    want_e = embedding_dup_pairs(vds, threshold=0.999).to_pandas()
    assert len(want_n) and len(want_e)

    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1  # read at call time → forces exchange
    try:
        got_n = ngram_jaccard_pairs(ds, bucket_col="source", threshold=0.9).to_pandas()
        got_e = embedding_dup_pairs(vds, threshold=0.999).to_pandas()
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old

    key = ["id_a", "id_b"]
    for want, got in ((want_n, got_n), (want_e, got_e)):
        pd.testing.assert_frame_equal(
            want.sort_values(key).reset_index(drop=True),
            got[want.columns].sort_values(key).reset_index(drop=True),
        )


def test_embedding_dup_and_ann():
    vecs = rd.read_parquet(f"{SF}/embeddings.parquet")
    vdf = vecs.to_pandas()
    qs = np.stack([np.asarray(v) for v in vdf.head(3)["embedding"]])

    top = brute_force_topk(vecs, qs, k=5).to_pandas()
    assert len(top) == 15
    # each query's best hit is itself (cos ≈ 1)
    for qi in range(3):
        best = top[(top["q_id"] == qi) & (top["rank"] == 1)].iloc[0]
        assert best["vec_id"] == vdf.iloc[qi]["vec_id"]
        assert best["cos_sim"] >= 0.999

    # IVF recall vs brute force
    approx = ivf_topk(vecs, qs, k=5, nlist=8, nprobe=4).to_pandas()
    recall = len(
        set(zip(approx["q_id"], approx["vec_id"]))
        & set(zip(top["q_id"], top["vec_id"]))
    ) / len(top)
    assert recall >= 0.6, f"IVF recall too low: {recall}"

    # random embeddings have no 0.999-cosine pairs → empty result is valid
    dups = embedding_dup_pairs(vecs, threshold=0.999).to_pandas()
    if len(dups):
        assert (dups["id_a"] < dups["id_b"]).all()
    # inject an exact duplicate vector → the pair must surface
    vdf2 = vdf.copy()
    dup_row = vdf2.iloc[[0]].assign(vec_id=99999)
    dups2 = embedding_dup_pairs(
        rd.from_pandas(pd.concat([vdf2, dup_row], ignore_index=True)),
        threshold=0.999,
    ).to_pandas()
    assert (99999 in set(dups2.get("id_b", pd.Series(dtype="int64"))))


def test_windows():
    events = rd.read_parquet(f"{SF}/events.parquet")
    edf = events.to_pandas()
    hourly = hourly_agg(events).to_pandas()
    want = (
        edf.assign(
            hour_epoch=(edf["ts"].astype("int64") // 3_600_000_000) * 3600,
            cents=np.round(edf["value"] * 100).astype("int64"),
        )
        .groupby(["user_id", "hour_epoch"])
        .agg(n_events=("cents", "size"), value_cents=("cents", "sum"))
        .reset_index()
    )
    got = hourly.sort_values(["user_id", "hour_epoch"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "hour_epoch"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "hour_epoch", "n_events", "value_cents"]].astype("int64"),
        want.astype("int64"),
    )

    sess = sessionize(events, gap_sec=1800).to_pandas()
    assert sess["n_events"].sum() == len(edf)
    assert (sess["n_sessions"] >= 1).all()


def test_sessionize_spill_path_matches():
    """sessionize's interval table is keyed by user, so a forced-low
    root threshold must route it through the actor exchange and produce
    identical per-user session counts."""
    import nerpii_ray.stages.agg as agg

    events = rd.read_parquet(f"{SF}/events.parquet")
    want = sessionize(events, gap_sec=1800).to_pandas().sort_values("user_id").reset_index(drop=True)
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1
    try:
        got = sessionize(events, gap_sec=1800).to_pandas().sort_values("user_id").reset_index(drop=True)
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    pd.testing.assert_frame_equal(want, got[want.columns.tolist()])


def test_windows_resolution_independent():
    """ns-backed timestamps must produce the same windows as us-backed —
    the window math normalizes units instead of trusting the ambient
    resolution (a bare int64 view of ns would be off by 1000x)."""
    events = rd.read_parquet(f"{SF}/events.parquet")
    edf_us = events.to_pandas()
    edf_ns = edf_us.assign(ts=edf_us["ts"].astype("datetime64[ns]"))
    key = ["user_id", "hour_epoch"]
    h_us = hourly_agg(rd.from_pandas(edf_us)).to_pandas().sort_values(key).reset_index(drop=True)
    h_ns = hourly_agg(rd.from_pandas(edf_ns)).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(h_us, h_ns)
    s_us = sessionize(rd.from_pandas(edf_us)).to_pandas().sort_values("user_id").reset_index(drop=True)
    s_ns = sessionize(rd.from_pandas(edf_ns)).to_pandas().sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(s_us, s_ns)


def test_broadcast_join():
    orders = rd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    joined = broadcast_join(
        orders, cust[["c_custkey", "c_mktsegment"]].rename(columns={"c_custkey": "o_custkey"}),
        on=["o_custkey"],
    ).to_pandas()
    odf = pd.read_parquet(f"{SF}/orders.parquet")
    want = odf.merge(
        cust[["c_custkey", "c_mktsegment"]],
        left_on="o_custkey", right_on="c_custkey",
    )
    assert len(joined) == len(want)
    assert joined.groupby("c_mktsegment").size().to_dict() == want.groupby("c_mktsegment").size().to_dict()


def test_partitioned_hash_join():
    orders = rd.read_parquet(f"{SF}/orders.parquet")
    lineitem = rd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def key(b):
        return b.rename(columns={"l_orderkey": "o_orderkey"})

    li = lineitem.map_batches(key, batch_format="pandas")
    joined = partitioned_hash_join(
        orders.select_columns(["o_orderkey", "o_totalprice"]), li,
        on=["o_orderkey"], num_buckets=8,
    ).to_pandas()
    want = pd.read_parquet(f"{SF}/lineitem.parquet").merge(
        pd.read_parquet(f"{SF}/orders.parquet"),
        left_on="l_orderkey", right_on="o_orderkey",
    )
    assert len(joined) == len(want)


def test_multimodal(docs):
    feats = media_pipeline(docs).to_pandas()
    assert len(feats) == docs.count()
    assert feats["feature"].map(len).eq(8).all()
    # deterministic features
    feats2 = media_pipeline(docs).to_pandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )
    # real decode routes to the from-scratch BMP/WAV codecs (r5);
    # unknown modes still fail loudly
    assert DecodeStub(mode="real")._real is not None
    with pytest.raises(ValueError):
        DecodeStub(mode="jpeg")
    # frame explode layout
    import pyarrow as pa

    blobs = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"x" * 200], pa.binary()),
        }
    )
    frames = frame_sample(blobs)
    assert frames.num_rows == 4  # ceil(200/64)
    assert frames.column("frame_idx").to_pylist() == [0, 1, 2, 3]


def test_salt_hot_keys_bounds_bucket_size():
    from nerpii_ray.stages.agg import salt_hot_keys

    df = pd.DataFrame({"surface": ["acme"] * 900 + ["rare%d" % i for i in range(100)]})
    ds = rd.from_pandas(df)
    salted = salt_hot_keys(ds, "surface", hot_keys={"acme"}, salt=8).to_pandas()
    sizes = salted.groupby("__salted_key").size()
    # the hot key spreads over ~8 buckets, each far below its raw count
    acme_buckets = sizes[sizes.index.str.startswith("acme#")]
    assert len(acme_buckets) > 4
    assert acme_buckets.max() < 400
    # cold keys keep a single bucket
    assert sizes["rare5#0"] == 1
    # row total preserved
    assert sizes.sum() == 1000


def test_worker_cached_constructs_once_per_key_and_bounds_entries():
    """taskcache.worker_cached: one construction per (cls, kwargs) per
    process, distinct kwargs get distinct instances, and the memo drops
    oldest entries at the bound instead of growing forever."""
    from nerpii_ray.stages import taskcache

    calls = []

    class Probe:
        def __init__(self, tag="x"):
            self.tag = tag
            calls.append(tag)

    saved = dict(taskcache._CACHE)
    taskcache._CACHE.clear()
    try:
        a1 = taskcache.worker_cached(Probe, tag="a")
        a2 = taskcache.worker_cached(Probe, tag="a")
        b = taskcache.worker_cached(Probe, tag="b")
        assert a1 is a2 and a1 is not b
        assert calls == ["a", "b"]
        for i in range(taskcache._MAX_ENTRIES + 4):
            taskcache.worker_cached(Probe, tag=f"fill{i}")
        assert len(taskcache._CACHE) <= taskcache._MAX_ENTRIES
        # evicted key reconstructs (still correct, just re-built)
        taskcache.worker_cached(Probe, tag="a")
        assert calls.count("a") == 2

        # VERDICT r3 #6: eviction is by RECENCY, not insertion order — a
        # hot entry touched between one-off constructions must survive
        taskcache._CACHE.clear()
        calls.clear()
        taskcache.worker_cached(Probe, tag="hot")
        for i in range(taskcache._MAX_ENTRIES - 1):
            taskcache.worker_cached(Probe, tag=f"cold{i}")
            taskcache.worker_cached(Probe, tag="hot")  # touch: move-to-end
        # cache is now full; one more insert evicts the LRU entry, which
        # must be cold0 — NOT the oldest-inserted-but-hot "hot"
        taskcache.worker_cached(Probe, tag="one_more")
        taskcache.worker_cached(Probe, tag="hot")
        assert calls.count("hot") == 1, calls
        taskcache.worker_cached(Probe, tag="cold0")
        assert calls.count("cold0") == 2
    finally:
        taskcache._CACHE.clear()
        taskcache._CACHE.update(saved)


def test_token_keyed_recognizer_cache_reuses_and_separates_stages():
    """recognize._recognize_batch: same token → one recognizer per
    process; different token → fresh state (no cross-stage bleed)."""
    import pyarrow as pa

    from nerpii_ray.stages import recognize as rec

    batch = pa.table(
        {
            "conv_id": pa.array([1], pa.int64()),
            "turn_idx": pa.array([0], pa.int64()),
            "role": pa.array(["user"], pa.string()),
            "tool": pa.array([None], pa.string()),
            "text": pa.array(["mail me at ada@example.com"], pa.string()),
        }
    )
    ctor = dict(registry=None, config=None)
    saved = dict(rec._REC_CACHE)
    rec._REC_CACHE.clear()
    try:
        out1 = rec._recognize_batch(batch, token="t1", ctor=ctor)
        obj1 = rec._REC_CACHE["t1"]
        rec._recognize_batch(batch, token="t1", ctor=ctor)
        assert rec._REC_CACHE["t1"] is obj1
        rec._recognize_batch(batch, token="t2", ctor=ctor)
        assert rec._REC_CACHE["t2"] is not obj1
        ents = out1.column("entity").to_pylist()
        assert "EMAIL_ADDRESS" in ents
    finally:
        rec._REC_CACHE.clear()
        rec._REC_CACHE.update(saved)


# ---------------------------------------------------------------------
# Ordered / windowed operators (asof join, window functions, quantiles)
# ---------------------------------------------------------------------


def test_asof_join_backward_strict_and_inclusive():
    from nerpii_ray.stages.joins import asof_join

    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3],
            "t": pd.to_datetime(
                ["2020-01-01 10:00", "2020-01-01 11:00", "2020-01-01 09:00",
                 "2020-01-01 10:00", "2020-01-01 10:00"]
            ),
            "lid": [10, 11, 12, 20, 30],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "t": pd.to_datetime(
                ["2020-01-01 10:00", "2020-01-01 10:30", "2020-01-01 09:00"]
            ),
            "v": [100, 130, 200],
        }
    )
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    # inclusive (<=): the 10:00 left row of k=1 matches the 10:00 right row
    out = (
        asof_join(lds, rds, key="k", ts="t", num_buckets=4, strict=False)
        .to_pandas()
        .set_index("lid")["v"]
    )
    assert out[10] == 100 and out[11] == 130 and np.isnan(out[12])
    assert out[20] == 200 and np.isnan(out[30])
    # strict (<): the exact-ts match is excluded
    out2 = (
        asof_join(lds, rds, key="k", ts="t", num_buckets=4, strict=True)
        .to_pandas()
        .set_index("lid")["v"]
    )
    assert np.isnan(out2[10]) and out2[11] == 130

    # duplicate (key, ts) on the right is a contract violation
    dup = rd.from_pandas(
        pd.DataFrame(
            {"k": [1, 1], "t": pd.to_datetime(["2020-01-01", "2020-01-01"]),
             "v": [1, 2]}
        )
    )
    with pytest.raises(Exception, match="duplicate"):
        asof_join(lds, dup, key="k", ts="t", num_buckets=4).materialize()


def test_grouped_quantile_disc_matches_duckdb_rule():
    import duckdb

    from nerpii_ray.stages.agg import grouped_quantile_disc

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 4, 5000),
            "v": rng.integers(0, 300, 5000).astype("int64"),
        }
    )
    got = (
        grouped_quantile_disc(
            rd.from_pandas(df), ["g"], "v", [0.5, 0.95, 0.01],
            ["p50", "p95", "p01"],
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            """SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                      quantile_disc(v, 0.5) AS p50,
                      quantile_disc(v, 0.95) AS p95,
                      quantile_disc(v, 0.01) AS p01
               FROM df GROUP BY g ORDER BY g"""
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["g", "n", "p50", "p95", "p01"]], want, check_dtype=False
    )


def test_rolling_time_count_range_frame_semantics():
    from nerpii_ray.stages.window import rolling_time_count

    # window = 10s; boundary at exactly ts-10s is INCLUDED (RANGE frame)
    ts = pd.to_datetime(
        [
            "2020-01-01 00:00:00", "2020-01-01 00:00:05",
            "2020-01-01 00:00:10", "2020-01-01 00:00:21",
        ]
    )
    df = pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "user_id": [7, 7, 7, 7], "ts": ts}
    )
    out = (
        rolling_time_count(rd.from_pandas(df), window_sec=10, num_buckets=2)
        .to_pandas()
        .set_index("event_id")["n_window"]
    )
    assert out[1] == 1 and out[2] == 2 and out[3] == 3 and out[4] == 1


def test_running_order_stats_kernel():
    from nerpii_ray.stages.window import running_order_stats

    df = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [5, 5, 5, 9],
            "o_orderdate": pd.to_datetime(
                ["2020-01-01", "2020-01-04", "2020-01-04", "2020-02-01"]
            ),
            "o_totalprice": [10.0, 20.0, 5.5, 1.0],
        }
    )
    out = (
        running_order_stats(rd.from_pandas(df), num_buckets=2)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert out["order_seq"].tolist() == [1, 2, 3, 1]
    assert out["run_cents"].tolist() == [1000, 3000, 3550, 100]
    assert out["gap_days"].tolist() == [-1, 3, 0, -1]


def test_interval_join_keyed_left_and_inner():
    from nerpii_ray.stages.joins import interval_join

    pts = pd.DataFrame(
        {
            "pid": [1, 2, 3, 4],
            "k": [7, 7, 7, 9],
            "t": pd.to_datetime(
                ["2020-01-01 00:10", "2020-01-01 02:00",
                 "2020-01-01 00:30", "2020-01-01 00:10"]
            ),
        }
    )
    ivs = pd.DataFrame(
        {
            "k": [7, 7, 9],
            "lo": pd.to_datetime(
                ["2020-01-01 00:00", "2020-01-01 00:20", "2020-01-02 00:00"]
            ),
            "hi": pd.to_datetime(
                ["2020-01-01 01:00", "2020-01-01 03:00", "2020-01-02 01:00"]
            ),
            "tag": ["a", "b", "c"],
        }
    )
    out = interval_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        ts="t", lo="lo", hi="hi", key="k",
        granularity_sec=1800, num_buckets=4, how="left",
    ).to_pandas()
    by_pid = out.groupby("pid")["tag"].apply(
        lambda s: sorted(x for x in s if isinstance(x, str))
    )
    assert by_pid[1] == ["a"]          # only first window contains 00:10
    assert by_pid[2] == ["b"]          # 02:00 only in the second window
    assert by_pid[3] == ["a", "b"]     # 00:30 in both (boundary granules)
    assert by_pid[4] == []             # k=9 interval is on the next day
    assert len(out) == 5               # 4 matches + 1 matchless left row

    inner = interval_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        ts="t", lo="lo", hi="hi", key="k",
        granularity_sec=1800, num_buckets=4, how="inner",
    ).to_pandas()
    assert len(inner) == 4 and set(inner["pid"]) == {1, 2, 3}


def test_interval_join_keyless_cross_containment():
    from nerpii_ray.stages.joins import interval_join

    pts = pd.DataFrame(
        {"pid": [1, 2], "t": pd.to_datetime(["2020-01-01 00:30",
                                             "2020-01-05 00:00"])}
    )
    ivs = pd.DataFrame(
        {
            "lo": pd.to_datetime(["2020-01-01 00:00"]),
            # a 3-day interval spans many granules; the 00:30 point must
            # match exactly once (points live in ONE granule)
            "hi": pd.to_datetime(["2020-01-04 00:00"]),
            "tag": ["w"],
        }
    )
    out = interval_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        ts="t", lo="lo", hi="hi", key=None,
        granularity_sec=3600, how="left",
    ).to_pandas()
    assert (out["pid"] == 1).sum() == 1
    assert out.set_index("pid")["tag"][1] == "w"
    assert pd.isna(out.set_index("pid")["tag"][2])


def test_interval_join_rejects_inverted_intervals():
    from nerpii_ray.stages.joins import interval_join

    pts = rd.from_pandas(
        pd.DataFrame({"pid": [1], "t": pd.to_datetime(["2020-01-01"])})
    )
    bad = rd.from_pandas(
        pd.DataFrame(
            {"lo": pd.to_datetime(["2020-01-02"]),
             "hi": pd.to_datetime(["2020-01-01"])}
        )
    )
    with pytest.raises(Exception, match="hi < lo"):
        interval_join(pts, bad, ts="t", lo="lo", hi="hi").materialize()


def test_grouped_quantile_sketch_exact_when_group_fits_k():
    from nerpii_ray.stages.agg import grouped_quantile_sketch

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, 900),
            "v": rng.normal(0, 1000, 900).round().astype("int64"),
            "rid": np.arange(900),
        }
    )
    got = (
        grouped_quantile_sketch(
            rd.from_pandas(df), ["g"], "v", "rid", [0.5, 0.9],
            ["p50", "p90"], k=2000,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    import duckdb

    want = (
        duckdb.sql(
            """SELECT g, quantile_disc(v, 0.5) AS p50,
                      quantile_disc(v, 0.9) AS p90
               FROM df GROUP BY g ORDER BY g"""
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_quantile_sketch_rank_error_and_determinism():
    from nerpii_ray.stages.agg import grouped_quantile_sketch

    rng = np.random.default_rng(5)
    n = 60_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 2, n),
            "v": rng.integers(0, 1_000_000, n).astype("int64"),
            "rid": np.arange(n),
        }
    )

    def run():
        return (
            grouped_quantile_sketch(
                rd.from_pandas(df), ["g"], "v", "rid", [0.5], ["p50"],
                k=1024,
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )

    a, b = run(), run()
    pd.testing.assert_frame_equal(a, b)  # md5 priorities: deterministic
    for g in (0, 1):
        vals = np.sort(df.loc[df["g"] == g, "v"].to_numpy())
        est = a.loc[a["g"] == g, "p50"].iloc[0]
        rank = np.searchsorted(vals, est) / len(vals)
        # bottom-k of md5(unique id) is a uniform sample: rank error
        # O(1/sqrt(k)); 5/sqrt(1024) ≈ 0.16 is a >5-sigma-safe bound
        assert abs(rank - 0.5) < 0.16, (g, rank)


def test_simhash_dup_pairs_matches_bruteforce_and_logs_truncation(caplog):
    from nerpii_ray.stages.dedup import add_simhash, simhash_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype="int64"),
            "text": [
                base,
                base + " tonight",          # near-dup of 0
                base.replace("fox", "cat"),  # near-dup of 0
                "completely different words about ray data engines",
                "completely different words about ray data engines",  # exact dup of 3
                "unrelated third topic entirely with other vocabulary",
            ],
        }
    )
    got = (
        simhash_dup_pairs(rd.from_pandas(docs), max_hamming=3)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # brute force over the same signatures
    sig = add_simhash(docs).set_index("doc_id")["simhash"]
    want = []
    for a in range(6):
        for b in range(a + 1, 6):
            h = bin(int(sig[a]) ^ int(sig[b])).count("1")
            if h <= 3:
                want.append((a, b, h))
    assert list(map(tuple, got[["id_a", "id_b", "hamming"]].to_numpy())) == want
    assert (4, 3, 0) not in want and (3, 4, 0) in want  # ordered pairs

    with pytest.raises(ValueError, match="0..3"):
        simhash_dup_pairs(rd.from_pandas(docs), max_hamming=7)

    # hot bucket (many exact dups) truncates — rows through the Ray path,
    # the log through a direct in-process kernel call (worker logs don't
    # reach driver caplog)
    hot = pd.DataFrame(
        {"doc_id": np.arange(8, dtype="int64"), "text": ["same text here"] * 8}
    )
    out = simhash_dup_pairs(
        rd.from_pandas(hot), max_hamming=0, max_bucket=4
    ).to_pandas()
    assert len(out) == 6  # C(4,2): smallest ids kept
    assert set(out["id_a"]) | set(out["id_b"]) == {0, 1, 2, 3}

    import logging

    from nerpii_ray.stages.dedup import _simhash_pair_bucket

    s = add_simhash(hot)
    bucket = pd.DataFrame(
        {"band": 0, "bval": 0, "id": s["doc_id"], "sig": s["simhash"]}
    )
    with caplog.at_level(logging.WARNING, logger="nerpii_ray.dedup"):
        direct = _simhash_pair_bucket(bucket, max_hamming=0, max_bucket=4)
    assert len(direct) == 6
    assert any("truncated bucket" in r.message for r in caplog.records)


def test_distinct_count_sketch_estimates_and_exact_small():
    from nerpii_ray.functions.textfns import md5_of_strings
    from nerpii_ray.stages.agg import distinct_count_sketch

    def hashes(b):
        return pd.DataFrame({"hx": md5_of_strings(b["v"].astype(str))})

    # exact path: fewer distinct values than k
    small = pd.DataFrame({"v": np.arange(200) % 37})
    got = distinct_count_sketch(
        rd.from_pandas(small), hashes, k=1024
    ).to_pandas()
    assert got["est_distinct"].iloc[0] == 37

    # estimator path: 50k distinct values, k=512 → ~4.4% stderr; also
    # deterministic (md5 priorities)
    big = pd.DataFrame({"v": np.arange(50_000)})
    ds = rd.from_pandas(big)
    a = distinct_count_sketch(ds, hashes, k=512).to_pandas()
    b = distinct_count_sketch(ds, hashes, k=512).to_pandas()
    est = a["est_distinct"].iloc[0]
    assert est == b["est_distinct"].iloc[0]
    assert abs(est - 50_000) / 50_000 < 0.2  # >4-sigma-safe bound


def test_simhash_pairs_small_and_exchange_paths_agree(docs_df):
    """Cardinality-aware pairing root: the one-task small path and the
    keyed-exchange scale path (forced via a tiny threshold) must emit
    identical pair sets including hamming distances."""
    import nerpii_ray.stages.agg as agg
    from nerpii_ray.stages.dedup import simhash_dup_pairs

    base = docs_df.head(40).copy()
    near = base.head(6).copy()
    near["doc_id"] += 9000
    near["text"] = near["text"].str.replace("the", "thx", n=1)
    ds = rd.from_pandas(pd.concat([base, near], ignore_index=True)).repartition(4)

    def pairset(df):
        return {(a, b): h for a, b, h in
                zip(df["id_a"], df["id_b"], df["hamming"])}

    want = pairset(simhash_dup_pairs(ds).to_pandas())
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1
    try:
        got = pairset(simhash_dup_pairs(ds).to_pandas())
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    assert want == got and len(want) > 0


def test_keyed_partition_apply_paths_agree_across_operators():
    """The one-task small path and the keyed-exchange path (forced via a
    tiny root threshold) must agree for every operator riding
    keyed_partition_apply: rolling window, running stats, asof join,
    interval join, hash join."""
    import nerpii_ray.stages.agg as agg
    from nerpii_ray.stages.joins import (
        asof_join,
        interval_join,
        partitioned_hash_join,
    )
    from nerpii_ray.stages.window import rolling_time_count

    rng = np.random.default_rng(3)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(400, dtype="int64"),
            "user_id": rng.integers(0, 12, 400),
            "ts": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, 400), unit="s"),
        }
    )
    right = (
        ev.groupby("user_id", as_index=False)
        .agg(t=("ts", "median"))
        .assign(v=lambda d: d["user_id"] * 10)
    )
    iv = right.rename(columns={"t": "lo"}).assign(
        hi=lambda d: d["lo"] + pd.Timedelta(hours=2)
    )[["user_id", "lo", "hi", "v"]]
    eds, rds, ids_ = rd.from_pandas(ev), rd.from_pandas(right), rd.from_pandas(iv)
    rds_ts = rd.from_pandas(right.rename(columns={"t": "ts"}))

    def runs():
        out = {}
        out["roll"] = (
            rolling_time_count(eds, window_sec=600)
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        out["asof"] = (
            asof_join(eds, rds_ts, key="user_id", ts="ts")
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        out["ivj"] = (
            interval_join(eds, ids_, ts="ts", lo="lo", hi="hi",
                          key="user_id", granularity_sec=7200, how="left")
            .to_pandas()
            .sort_values(["event_id", "v"])
            .reset_index(drop=True)
        )
        out["hj"] = (
            partitioned_hash_join(eds, rds, on=["user_id"])
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        return out

    small = runs()
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1
    try:
        ex = runs()
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    for k in small:
        pd.testing.assert_frame_equal(small[k], ex[k], check_dtype=False)


def test_connected_components_small_and_scale_paths():
    import nerpii_ray.stages.agg as agg
    from nerpii_ray.stages.dedup import connected_components

    # two components {1,2,3,7} (chain) and {10,11}; 5 is absent (no edge)
    edges = pd.DataFrame(
        {"id_a": [1, 2, 3, 10], "id_b": [2, 3, 7, 11]}
    )
    want = {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}

    def run():
        df = connected_components(rd.from_pandas(edges)).to_pandas()
        return dict(zip(df["node"].astype(int), df["component"].astype(int)))

    assert run() == want
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1  # force the label-propagation path
    try:
        assert run() == want
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old

    # empty edge list → empty typed result (schema survives even though
    # Ray's to_pandas drops columns of an all-empty Dataset)
    out = connected_components(
        rd.from_pandas(pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                     "id_b": pd.Series(dtype="int64")}))
    )
    assert out.count() == 0
    assert [str(n) for n in out.schema().names] == ["node", "component"]


def test_kmeans_converges_and_is_self_consistent():
    from nerpii_ray.stages.similarity import _assign_batch, kmeans

    rng = np.random.default_rng(21)
    # 3 well-separated blobs in 8-d
    centers = rng.normal(0, 10, (3, 8))
    X = np.concatenate(
        [centers[i] + rng.normal(0, 0.5, (60, 8)) for i in range(3)]
    ).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(180, dtype="int64"), "embedding": list(X)}
    )
    ds = rd.from_pandas(df)
    assigned, cents = kmeans(ds, k=3, n_iter=10)
    a = assigned.to_pandas().sort_values("vec_id").reset_index(drop=True)
    # blob purity: every true blob maps to exactly one cluster
    truth = np.repeat([0, 1, 2], 60)
    for t in range(3):
        assert a.loc[truth == t, "cluster"].nunique() == 1
    assert a["cluster"].nunique() == 3
    # self-consistency: final assignment IS nearest final centroid
    direct = _assign_batch(df, cents=cents, vec_col="embedding",
                           id_col="vec_id")
    assert (direct["cluster"].to_numpy() == a["cluster"].to_numpy()).all()
    # determinism across runs
    a2 = kmeans(ds, k=3, n_iter=10)[0].to_pandas().sort_values(
        "vec_id"
    ).reset_index(drop=True)
    assert a.equals(a2)


def test_quantile_sketch_paths_agree():
    """grouped_quantile_sketch small-root vs forced-exchange finish must
    emit identical rows (group-complete blocks on both paths)."""
    import nerpii_ray.stages.agg as agg
    from nerpii_ray.stages.agg import grouped_quantile_sketch

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 4000),
            "v": rng.integers(0, 10_000, 4000).astype("int64"),
            "rid": np.arange(4000),
        }
    )

    def run():
        return (
            grouped_quantile_sketch(
                rd.from_pandas(df), ["g"], "v", "rid", [0.5, 0.99],
                ["p50", "p99"], k=128,
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )

    want = run()
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1
    try:
        got = run()
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    pd.testing.assert_frame_equal(want, got, check_dtype=False)


def test_explicit_exchange_path_matches_auto():
    """path='exchange' (no materialize, stream straight into the keyed
    exchange — the a-priori-large-input form) must equal auto."""
    from nerpii_ray.stages.window import rolling_time_count

    rng = np.random.default_rng(9)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(300, dtype="int64"),
            "user_id": rng.integers(0, 9, 300),
            "ts": pd.to_datetime("2021-06-01")
            + pd.to_timedelta(rng.integers(0, 7200, 300), unit="s"),
        }
    )
    ds = rd.from_pandas(ev)
    auto = rolling_time_count(ds, window_sec=900).to_pandas().sort_values(
        "event_id"
    ).reset_index(drop=True)
    ex = rolling_time_count(ds, window_sec=900, path="exchange").to_pandas(
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(auto, ex)


def test_winnow_fingerprints_guarantee_and_edges():
    """Winnowing property: two docs sharing a substring of length
    >= w+k-1 (= 8 chars here) share at least one selected fingerprint;
    sub-k and sub-w docs carry none."""
    from nerpii_ray.stages.textstats import add_winnow_fingerprints

    shared = "abcdefghij"  # 10 chars >= w+k-1
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [f"xxx {shared} yyy", f"zz{shared}qq", "ab", "abcde"],
        }
    )
    out = add_winnow_fingerprints(df).set_index("doc_id")

    def selected(text):
        # independent per-gram Python-int polynomial (the engine does
        # k-1 shifted uint64 multiply-adds over the whole batch)
        t = " ".join(text.split()).lower()
        B, M = 0x9E3779B97F4A7C15, 1 << 64
        hs = np.array(
            [sum(ord(c) * pow(B, 4 - j, M) for j, c in enumerate(t[i:i+5])) % M
             for i in range(len(t) - 4)], dtype=np.uint64)
        return set(np.lib.stride_tricks.sliding_window_view(hs, 4).min(axis=1))

    a, b = selected(df["text"][0]), selected(df["text"][1])
    assert a & b, "shared 10-char substring must share a fingerprint"
    assert out.loc[0, "n_fps"] == len(selected(df["text"][0]))
    assert out.loc[2, "n_fps"] == 0 and out.loc[2, "fp_min"] == "0"  # < k
    assert out.loc[3, "n_fps"] == 0  # k grams exist but fewer than w


def test_grouped_moments_exact_past_int64(tmp_path):
    """ADVICE r3 (high): int64 partials silently wrapped once a group's
    Σx² passed 2^63.  Values ~3e9 square to ~9e18 > 2^63, so 40 rows
    overflow an int64 accumulator ~150×; the object-dtype Python-int
    partials must stay exact through the full tree (multi-block input
    exercises the cross-block merge, not just the within-batch sum)."""
    from nerpii_ray.stages.agg import grouped_moments

    vals_a = [3_000_000_000 + 7 * i for i in range(40)]
    vals_b = [4_100_000_000 - 3 * i for i in range(25)]
    frames = [
        pd.DataFrame({"g": ["a"] * 20, "v": vals_a[:20]}),
        pd.DataFrame(
            {"g": ["a"] * 20 + ["b"] * 13, "v": vals_a[20:] + vals_b[:13]}
        ),
        pd.DataFrame({"g": ["b"] * 12, "v": vals_b[13:]}),
    ]
    ds = rd.from_pandas(frames)
    out = (
        grouped_moments(ds, ["g"], "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )

    def exact(vs):
        n, s1 = len(vs), sum(vs)
        s2 = sum(x * x for x in vs)
        return n, float(s1) / float(n), float(n * s2 - s1 * s1) / float(n * n)

    for g, vs in (("a", vals_a), ("b", vals_b)):
        row = out[out["g"] == g].iloc[0]
        n, mean, var = exact(vs)
        assert int(row["n"]) == n
        # bit-exact: one double division from exact integer numerators
        assert float(row["mean"]) == mean, (g, float(row["mean"]), mean)
        assert float(row["var_pop"]) == var, (g, float(row["var_pop"]), var)


def test_connected_components_path_graph_log_rounds():
    """VERDICT r3 #4: the scale path must converge in O(log n) rounds on
    a pathological chain (label propagation needed O(diameter)).  A
    10k-node path graph, forced onto the star-contraction path, must
    finish in ≤ 20 alternating rounds (pandas simulation: 15) and label
    every node with the component minimum."""
    import nerpii_ray.stages.agg as agg
    from nerpii_ray.stages.dedup import connected_components

    n = 10_000
    rng = np.random.default_rng(7)
    perm = rng.permutation(n).astype("int64")  # relabeled so ids ≁ order
    edges = pd.DataFrame(
        {"id_a": perm[np.arange(1, n)], "id_b": perm[np.arange(0, n - 1)]}
    )
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1  # force the star-contraction path
    stats: dict = {}
    try:
        out = connected_components(
            rd.from_pandas(edges).repartition(8), _stats=stats
        ).to_pandas()
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    assert stats["rounds"] <= 20, stats
    assert len(out) == n
    assert out["component"].nunique() == 1
    assert int(out["component"].iloc[0]) == 0


def test_grouped_corr_exact_past_int64():
    """grouped_corr carries exact object-int bivariate partials; doubles
    come from one division of exact integers — bit-equal to the Python
    big-int reference even when Σx² would wrap int64."""
    import math

    from nerpii_ray.stages.agg import grouped_corr

    rng = np.random.default_rng(11)
    xs = (3_000_000_000 + rng.integers(0, 10**7, 60)).tolist()
    ys = rng.integers(1, 50, 60).tolist()
    frames = [
        pd.DataFrame({"g": ["a"] * 30, "x": xs[:30], "y": ys[:30]}),
        pd.DataFrame({"g": ["a"] * 30, "x": xs[30:], "y": ys[30:]}),
    ]
    out = grouped_corr(rd.from_pandas(frames), ["g"], "x", "y").to_pandas()
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    want_cov = float(n * sxy - sx * sy) / float(n * n)
    want_corr = float(n * sxy - sx * sy) / (
        math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    )
    row = out.iloc[0]
    assert int(row["n"]) == n
    assert float(row["covar_pop"]) == want_cov
    assert float(row["corr"]) == want_corr


def test_misra_gries_exact_and_lossy_bound():
    """misra_gries_topk: exact regime (capacity ≥ distinct) returns the
    exact top-k; lossy regime undercounts each value by at most
    N/capacity (mergeable-summaries guarantee), never overcounts."""
    from nerpii_ray.stages.agg import misra_gries_topk

    rng = np.random.default_rng(3)
    # zipf-ish: value i appears ~ 3000/i times
    vals = []
    for i in range(1, 200):
        vals += [f"v{i:03d}"] * (3000 // i)
    rng.shuffle(vals)
    frames = [
        pd.DataFrame({"tok": vals[i::4]}) for i in range(4)
    ]
    ds = rd.from_pandas(frames)
    true = pd.Series(vals).value_counts()

    exact = misra_gries_topk(ds, "tok", capacity=1000, out_k=10).to_pandas()
    want = (
        true.rename_axis("value").reset_index(name="est_count")
        .sort_values(["est_count", "value"], ascending=[False, True])
        .head(10).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        exact.astype({"est_count": "int64"}),
        want.astype({"est_count": "int64"}),
    )

    lossy = misra_gries_topk(ds, "tok", capacity=32, out_k=10).to_pandas()
    bound = len(vals) / 32
    for _, r in lossy.iterrows():
        t = int(true.get(r["value"], 0))
        assert r["est_count"] <= t, "MG must never overcount"
        assert t - r["est_count"] <= bound, (r["value"], t, r["est_count"])


def test_first_last_value_matches_pandas():
    from nerpii_ray.stages.window import first_last_value

    rng = np.random.default_rng(9)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(400, dtype="int64"),
            "user_id": rng.integers(0, 12, 400),
            "ts": pd.to_datetime("2021-06-01")
            + pd.to_timedelta(rng.integers(0, 7200, 400), unit="s"),
            "event_type": rng.choice(["a", "b", "c"], 400),
        }
    )
    out = (
        first_last_value(rd.from_pandas(ev))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    gb = ref.groupby("user_id")["event_type"]
    want = pd.DataFrame(
        {
            "user_id": gb.first().index.astype("int64"),
            "first_value": gb.first().to_numpy(),
            "last_value": gb.last().to_numpy(),
            "n_events": gb.size().to_numpy().astype("int64"),
        }
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)
    # exchange path agrees
    ex = (
        first_last_value(rd.from_pandas(ev), path="exchange")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ex, want)


def test_pagerank_fp_hand_graph_and_determinism():
    """pagerank_fp on a hand graph: integer fixed-point ranks equal the
    straight-line Python replay, sinks leak (stated convention), and the
    result is identical across partitionings (order-independent integer
    sums)."""
    from nerpii_ray.stages.graph import pagerank_fp

    edges = pd.DataFrame(
        {"src": ["a", "a", "b", "c"], "dst": ["b", "c", "c", "d"]}
    )

    def replay(iters=3, scale=10**12):
        nodes = sorted(set(edges["src"]) | set(edges["dst"]))
        n = len(nodes)
        base = scale // n
        outdeg = edges.groupby("src").size().to_dict()
        r = {v: base for v in nodes}
        for _ in range(iters):
            s = {v: 0 for v in nodes}
            for u, v in zip(edges["src"], edges["dst"]):
                s[v] += r[u] // outdeg[u]
            r = {v: (15 * base) // 100 + (85 * s[v]) // 100 for v in nodes}
        return r

    want = replay()
    for parts in (1, 3):
        out = (
            pagerank_fp(rd.from_pandas(edges).repartition(parts))
            .to_pandas()
            .set_index("node")["pagerank_fp"]
            .to_dict()
        )
        assert out == want, (parts, out, want)
    # the distributed iterative plan computes the identical integers
    ex = (
        pagerank_fp(rd.from_pandas(edges).repartition(2), path="exchange")
        .to_pandas()
        .set_index("node")["pagerank_fp"]
        .to_dict()
    )
    assert ex == want, (ex, want)
    # sink 'd' holds only base+incoming, sources decay toward base term
    assert want["d"] > want["a"]


def test_bloom_semi_join_exact_and_prefilter_effective():
    """bloom_semi_join: result is EXACTLY the semi-join (false positives
    verified away), and the bloom pre-filter alone already removes the
    overwhelming majority of non-members (sized for ~0.1% FP here)."""
    from nerpii_ray.stages.joins import (
        _bloom_positions,
        bloom_semi_join,
        build_bloom,
    )

    rng = np.random.default_rng(17)
    members = rng.choice(10**9, 2000, replace=False).astype("int64")
    non_members = np.setdiff1d(
        rng.choice(10**9, 20000, replace=False).astype("int64"), members
    )
    big = pd.DataFrame(
        {"k": np.concatenate([members, non_members]),
         "v": np.arange(len(members) + len(non_members), dtype="int64")}
    )
    keys = pd.DataFrame({"k": members})
    out = (
        bloom_semi_join(
            rd.from_pandas(big).repartition(4),
            rd.from_pandas(keys).repartition(2),
            on="k",
        )
        .to_pandas()
    )
    assert set(out["k"]) == set(members)
    assert len(out) == len(members)

    # pre-filter effectiveness: direct bitmap probe of the non-members
    bm = build_bloom(rd.from_pandas(keys), "k", m_bits=1 << 23, k=4)
    pos = _bloom_positions(non_members, 1 << 23, 4)
    hit = np.ones(len(non_members), dtype=bool)
    for i in range(4):
        p = pos[:, i]
        hit &= (bm[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
    assert hit.mean() < 0.01, f"FP rate {hit.mean():.4f} too high"


def test_bloom_semi_join_empty_sides():
    """Edge contracts: an empty build side keeps nothing; an empty probe
    side returns an empty frame without schema loss."""
    from nerpii_ray.stages.joins import bloom_semi_join

    big = pd.DataFrame({"k": np.arange(50, dtype="int64"),
                        "v": np.arange(50, dtype="int64")})
    empty = pd.DataFrame({"k": pd.Series(dtype="int64")})
    out = bloom_semi_join(
        rd.from_pandas(big), rd.from_pandas(empty), on="k"
    ).to_pandas()
    assert len(out) == 0
    out2 = bloom_semi_join(
        rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype="int64"),
                                     "v": pd.Series(dtype="int64")})),
        rd.from_pandas(pd.DataFrame({"k": np.arange(5, dtype="int64")})),
        on="k",
    ).to_pandas()
    assert len(out2) == 0


def test_rolling_time_count_bias_slice_guard():
    """The offset-bias kernel slices user segments when the cumulative
    bias would pass the int64 headroom cap; forcing a tiny cap makes
    every user its own slice — counts must match the unsliced run."""
    from nerpii_ray.stages.window import rolling_time_count

    rng = np.random.default_rng(23)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(600, dtype="int64"),
            "user_id": rng.integers(0, 25, 600),
            "ts": pd.to_datetime("2021-06-01")
            + pd.to_timedelta(rng.integers(0, 10**7, 600), unit="s"),
        }
    )
    ds = rd.from_pandas(ev)
    normal = rolling_time_count(ds, window_sec=3600).to_pandas()
    sliced = rolling_time_count(
        ds, window_sec=3600, _bias_cap=10**12
    ).to_pandas()
    pd.testing.assert_frame_equal(
        normal.sort_values("event_id").reset_index(drop=True),
        sliced.sort_values("event_id").reset_index(drop=True),
    )


def test_rolling_time_sum_matches_pandas_and_slices():
    """``sum_col`` turns the rank difference into a prefix-sum
    difference at the same frame indices: pin it against a pandas
    per-user O(n²) reference (RANGE frame, ties included) and against
    the forced multi-slice path."""
    from nerpii_ray.stages.window import rolling_time_count

    rng = np.random.default_rng(41)
    n = 500
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, 20, n),
            "ts": pd.to_datetime("2021-06-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "cents": rng.integers(-500, 500, n).astype("int64"),
        }
    )
    ds = rd.from_pandas(ev)
    out = (
        rolling_time_count(ds, window_sec=3600, sum_col="cents",
                           out_col="s")
        .to_pandas().set_index("event_id")["s"]
    )
    sliced = (
        rolling_time_count(ds, window_sec=3600, sum_col="cents",
                           out_col="s", _bias_cap=10**12)
        .to_pandas().set_index("event_id")["s"]
    )
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    for i in range(n):
        mask = (
            (ev["user_id"] == ev["user_id"][i])
            & (us >= us[i] - 3600 * 10**6)
            & (us <= us[i])
        )
        want = int(ev.loc[mask, "cents"].sum())
        assert out[i] == want
        assert sliced[i] == want


def test_power_iteration_tracks_svd_direction():
    """The fixed-point integer power iteration must approximate the
    true dominant right-singular vector — |cos| >= 0.95 against numpy
    SVD on a matrix with a planted strong direction."""
    from nerpii_ray.stages.similarity import power_iteration_top_component

    rng = np.random.default_rng(7)
    d = 16
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    coef = rng.normal(size=(300, 1)) * 3.0
    E = coef * direction + rng.normal(size=(300, d)) * 0.2
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(300), "embedding": list(E.astype(np.float32))}
        )
    )
    out = power_iteration_top_component(ds, iters=4)
    v = out.sort_values("dim")["comp"].to_numpy(dtype=np.float64)
    v /= np.linalg.norm(v)
    top = np.linalg.svd(E, full_matrices=False)[2][0]
    assert abs(float(v @ top)) >= 0.95


def test_node_triangle_counts_k4_plus_pendant():
    """K4 (every node in C(3,2)=3 triangles) plus a pendant edge: the
    four clique nodes count 3 each, the pendant node is absent (no
    triangle membership)."""
    from nerpii_ray.stages.graph import node_triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = pd.DataFrame(k4 + [(3, 9)], columns=["u", "v"]).astype("int64")
    out = (
        node_triangle_counts(rd.from_pandas(edges))
        .to_pandas().set_index("node")["tri"].to_dict()
    )
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_sequential_funnel_emit_times():
    """emit_times carries each stage's min timestamp (µs) out of the
    funnel kernel; unreached stages read -1."""
    from nerpii_ray.stages.window import sequential_funnel

    t0 = pd.Timestamp("2021-01-01")
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "event_type": ["signup", "view", "purchase",
                           "signup", "purchase", "view"],
            "ts": [t0, t0 + pd.Timedelta(minutes=5),
                   t0 + pd.Timedelta(minutes=9),
                   t0, t0 + pd.Timedelta(minutes=1), t0],
        }
    )
    out = (
        sequential_funnel(
            rd.from_pandas(ev), ["signup", "view", "purchase"],
            emit_times=True,
        )
        .to_pandas().set_index("user_id").sort_index()
    )
    us = int(t0.value // 1000)
    assert out.loc[1, "funnel_stage"] == 3
    assert out.loc[1, "t1"] == us
    assert out.loc[1, "t2"] == us + 5 * 60 * 10**6
    assert out.loc[1, "t3"] == us + 9 * 60 * 10**6
    # user 2 skipped 'view': purchase cannot count, t2/t3 = -1
    assert out.loc[2, "funnel_stage"] == 1
    assert out.loc[2, "t1"] == us
    assert out.loc[2, "t2"] == -1 and out.loc[2, "t3"] == -1
    # user 3 never signed up
    assert out.loc[3, "funnel_stage"] == 0
    assert out.loc[3, "t1"] == -1


def test_grouped_corr_zero_variance_yields_null():
    """Degenerate groups (single row, or zero variance in x or y) must
    yield corr = NULL/NaN like DuckDB's corr(), not ZeroDivisionError
    (ADVICE r4)."""
    from nerpii_ray.stages.agg import grouped_corr

    df = pd.DataFrame(
        {
            "g": ["solo", "constx", "constx", "ok", "ok", "ok"],
            "x": [5, 7, 7, 1, 2, 3],
            "y": [9, 1, 4, 2, 4, 7],
        }
    )
    out = (
        grouped_corr(rd.from_pandas(df), ["g"], "x", "y")
        .to_pandas()
        .set_index("g")
    )
    assert np.isnan(out.loc["solo", "corr"])
    assert np.isnan(out.loc["constx", "corr"])
    assert abs(out.loc["ok", "corr"] - np.corrcoef([1, 2, 3], [2, 4, 7])[0, 1]) < 1e-12
    # covar_pop of the degenerate groups is still well-defined
    assert out.loc["solo", "covar_pop"] == 0.0


def test_connected_components_self_loop_nodes():
    """A node whose ONLY edge is a self-loop must come out as a
    singleton component on BOTH physical paths (ADVICE r4: the exchange
    path's canon() dropped it entirely)."""
    import nerpii_ray.stages.agg as agg
    from nerpii_ray.stages.dedup import connected_components

    edges = pd.DataFrame(
        {"id_a": [1, 2, 9, 3], "id_b": [2, 3, 9, 3]}  # 9 and 3 self-loop
    )
    want = {1: 1, 2: 1, 3: 1, 9: 9}

    def run():
        df = connected_components(rd.from_pandas(edges)).to_pandas()
        return dict(zip(df["node"].astype(int), df["component"].astype(int)))

    assert run() == want
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1  # force the star-contraction path
    try:
        assert run() == want
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old


def test_write_ipc_table_retry_overwrites_not_duplicates(tmp_path, monkeypatch):
    """The IPC sink's part filename derives from task identity, so a
    re-executed task attempt OVERWRITES its file instead of publishing a
    duplicate (ADVICE r4).  Simulated by pinning the fingerprint."""
    import nerpii_ray.stages.exchange as ex
    from nerpii_ray.sources.readers import read_ipc_table, write_ipc_table

    monkeypatch.setattr(ex, "_batch_fingerprint", lambda: "taskA:0")
    out = str(tmp_path / "ipc")
    df = pd.DataFrame({"a": np.arange(10, dtype="int64")})
    write_ipc_table(rd.from_pandas(df), out)
    write_ipc_table(rd.from_pandas(df), out)  # the "retry"
    import os

    assert sorted(os.listdir(out)) == ["part-taskA-0.arrow"]
    back = read_ipc_table(out).to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_bloom_anti_join_exact_even_with_forced_false_positives():
    """bloom_anti_join == exact NOT IN on every path: the default bitmap,
    a deliberately tiny bitmap (m_bits=64 → most probes are false
    positives, exercising the verify exchange), and an empty build side."""
    from nerpii_ray.stages.joins import bloom_anti_join

    rng = np.random.default_rng(7)
    big = pd.DataFrame(
        {"k": rng.integers(0, 300, 500).astype("int64"),
         "payload": [f"p{i}" for i in range(500)]}
    )
    keys = pd.DataFrame({"k": rng.integers(0, 300, 150).astype("int64")})
    want = big.loc[~big["k"].isin(set(keys["k"]))].sort_values(
        ["k", "payload"]
    ).reset_index(drop=True)

    for mb in (1 << 23, 64):
        got = (
            bloom_anti_join(rd.from_pandas(big), rd.from_pandas(keys), "k",
                            m_bits=mb)
            .to_pandas()
            .sort_values(["k", "payload"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        assert got["k"].dtype == np.dtype("int64")  # dtypes restored

    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype="int64")}))
    got = bloom_anti_join(rd.from_pandas(big), empty, "k").to_pandas()
    assert len(got) == len(big)


def test_bmp_wav_codecs_roundtrip_and_reject():
    """From-scratch codecs (VERDICT r4 #2): BMP round-trips every stride
    class (w%4 = 0..3) and top-down files; WAV round-trips and walks
    extra RIFF chunks; malformed inputs fail loudly."""
    import struct

    from nerpii_ray.stages.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(5)
    for w in (1, 2, 3, 4, 7):
        img = rng.integers(0, 256, (5, w, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    # top-down: negative height means rows are stored top-first
    img = rng.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    data = bytearray(encode_bmp(img[::-1]))
    struct.pack_into("<i", data, 22, -4)
    # bottom-up encode of img[::-1] stores rows physically in img order;
    # the top-down flag reads them as-is
    assert (decode_bmp(bytes(data)) == img).all()

    pcm = rng.integers(-2048, 2048, 95).astype(np.int16)
    rate, back = decode_wav(encode_wav(pcm, 44100))
    assert rate == 44100 and (back == pcm).all()

    # extra LIST chunk (word-aligned) before data must be skipped
    raw = encode_wav(np.arange(10, dtype=np.int16), 8000)
    fmt_chunk, data_chunk = raw[12:36], raw[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    rebuilt = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt_chunk) + len(extra) + len(data_chunk))
        + b"WAVE" + fmt_chunk + extra + data_chunk
    )
    rate, back = decode_wav(rebuilt)
    assert rate == 8000 and (back == np.arange(10, dtype=np.int16)).all()

    with pytest.raises(ValueError):
        decode_bmp(b"NOPE")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_real_decode_stage_matches_direct_computation():
    """documents → real BMP/WAV blobs → DecodeReal actor stage == the
    closed-form fixture stats computed directly."""
    from nerpii_ray.stages.multimodal import DecodeStub, docs_to_real_blobs

    import pyarrow as pa

    docs = rd.from_arrow(pa.table({"doc_id": list(range(20))}))
    out = (
        docs.map_batches(docs_to_real_blobs, batch_format="pyarrow")
        .map_batches(
            DecodeStub,
            fn_constructor_kwargs=dict(mode="real"),
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    for d in range(20):
        if d % 2 == 0:
            w, h = 4 + d % 5, 3 + d % 4
            xs, ys = np.meshgrid(np.arange(w), np.arange(h))
            assert out.loc[d, "width"] == w and out.loc[d, "height"] == h
            assert out.loc[d, "sum_r"] == ((d * 7 + xs * 13 + ys * 31) % 256).sum()
            assert out.loc[d, "sum_b"] == ((d * 13 + xs * 19 + ys * 41) % 256).sum()
        else:
            n = 64 + d % 32
            i = np.arange(n)
            assert out.loc[d, "n_samples"] == n
            assert out.loc[d, "sum_abs"] == np.abs((d * 17 + i * 29) % 4096 - 2048).sum()


def test_sequential_funnel_step_permutations():
    """sequential_funnel: strictly-increasing-ts semantics across step
    permutations, checked against a per-user Python reference."""
    from nerpii_ray.stages.window import sequential_funnel

    rng = np.random.default_rng(13)
    n = 800
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 60, n).astype("int64"),
            "ts": pd.to_datetime("2021-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "event_type": rng.choice(
                ["signup", "view", "click", "purchase", "error"], n
            ),
        }
    )

    def reference(steps):
        out = {}
        for u, g in ev.groupby("user_id"):
            stage, prev = 0, None
            for st in steps:
                cand = g.loc[g["event_type"] == st, "ts"]
                if prev is not None:
                    cand = cand[cand > prev]
                if cand.empty:
                    break
                stage, prev = stage + 1, cand.min()
            out[int(u)] = stage
        return out

    for steps in (
        ["signup", "view", "purchase"],
        ["purchase", "view", "signup"],
        ["view", "click", "signup", "purchase"],
        ["error"],
    ):
        got = sequential_funnel(rd.from_pandas(ev), steps).to_pandas()
        gmap = dict(zip(got["user_id"].astype(int), got["funnel_stage"].astype(int)))
        assert gmap == reference(steps), steps


def test_hot_key_guard_raises_and_salted_merge_equal():
    """Opt-in hot-key guard (VERDICT r4 #5): a crafted pathological key
    over the bucket budget fails LOUDLY before the exchange; and for a
    mergeable kernel (per-key count), salting the hot key + a cross-shard
    merge is pinned equal to the unsalted result."""
    from nerpii_ray.stages.agg import salt_hot_keys
    from nerpii_ray.stages.colocate import keyed_partition_apply

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "k": np.concatenate(
                [np.zeros(5000, dtype="int64"),  # the hot key
                 rng.integers(1, 50, 500).astype("int64")]
            ),
            "v": np.arange(5500, dtype="int64"),
        }
    )
    ds = rd.from_pandas(df)

    def count_kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"k": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return (
            g.groupby("k", sort=False, observed=True)
            .size()
            .rename("n")
            .reset_index()
        )

    with pytest.raises(RuntimeError, match="hot key"):
        keyed_partition_apply(
            ds, ["k"], count_kernel, path="exchange", hot_key_budget=1000
        )

    # under budget: passes through untouched
    ok = keyed_partition_apply(
        ds, ["k"], count_kernel, path="exchange", hot_key_budget=10_000
    ).to_pandas()
    want = df.groupby("k").size().rename("n").reset_index()
    got = ok.copy()
    got["k"] = got["k"].astype("int64")
    pd.testing.assert_frame_equal(
        got.sort_values("k").reset_index(drop=True),
        want.sort_values("k").reset_index(drop=True),
        check_dtype=False,
    )

    # mergeable kernel recovery: salt the hot key, count per salted
    # shard, merge shards — equal to the direct count
    salted = salt_hot_keys(ds, "k", hot_keys={0}, salt=8)

    def shard_count(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"k": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        out = (
            g.groupby("__salted_key", sort=False, observed=True)
            .size()
            .rename("n")
            .reset_index()
        )
        out["k"] = out["__salted_key"].str.rsplit("#", n=1).str[0]
        return out[["k", "n"]]

    sh = keyed_partition_apply(
        salted, ["__salted_key"], shard_count, path="exchange",
        hot_key_budget=1000,  # each shard is now under budget
    ).to_pandas()
    merged = sh.groupby("k")["n"].sum().reset_index()
    merged["k"] = merged["k"].astype("int64")
    pd.testing.assert_frame_equal(
        merged.sort_values("k").reset_index(drop=True),
        want.sort_values("k").reset_index(drop=True),
        check_dtype=False,
    )


def test_equi_width_histogram_and_grouped_mode():
    from nerpii_ray.stages.agg import equi_width_histogram, grouped_mode

    ev = rd.read_parquet(f"{SF}/events.parquet")
    edf = ev.to_pandas()

    hist = equi_width_histogram(ev, num_buckets=8).to_pandas()
    assert hist["n"].sum() == len(edf)
    assert hist["bucket"].between(0, 7).all()
    # pandas reference with the identical integer arithmetic
    cents = np.round(edf["value"].to_numpy() * 100).astype(np.int64)
    lo, hi = cents.min(), cents.max()
    want = pd.Series((cents - lo) * 8 // (hi - lo + 1)).value_counts()
    got = hist.set_index("bucket")["n"]
    assert got.sort_index().equals(want.sort_index().astype("int64"))
    # bucket lower edges are the exact integer formula
    assert (
        hist["bucket_lo_cents"]
        == lo + hist["bucket"].to_numpy(dtype=np.int64) * (hi - lo + 1) // 8
    ).all()

    mode = grouped_mode(ev, ["user_id"], "event_type").to_pandas()
    ref = (
        edf.groupby(["user_id", "event_type"]).size().reset_index(name="n")
        .sort_values(["user_id", "n", "event_type"], ascending=[True, False, True])
        .groupby("user_id").head(1).reset_index(drop=True)
    )
    assert len(mode) == edf["user_id"].nunique()
    m = mode.sort_values("user_id").reset_index(drop=True)
    assert (m["mode_event_type"].to_numpy() == ref["event_type"].to_numpy()).all()
    assert (m["n"].to_numpy() == ref["n"].to_numpy()).all()

    # deterministic tie: equal counts → lexicographically smallest value
    tie = pd.DataFrame(
        {"user_id": [1, 1, 1, 1], "event_type": ["view", "click", "click", "view"]}
    )
    out = grouped_mode(rd.from_pandas(tie), ["user_id"], "event_type").to_pandas()
    assert out.iloc[0]["mode_event_type"] == "click" and out.iloc[0]["n"] == 2


def test_srp_dup_pairs():
    from nerpii_ray.stages.dedup import srp_dup_pairs

    vdf = rd.read_parquet(f"{SF}/embeddings.parquet").to_pandas()
    # an exact duplicate vector shares EVERY band with its original →
    # always a candidate, cosine exactly 1.0 → must surface
    dup = vdf.iloc[[0]].assign(vec_id=99999)
    vds = rd.from_pandas(pd.concat([vdf, dup], ignore_index=True))
    got = srp_dup_pairs(vds).to_pandas()
    hit = got[(got["id_a"] == vdf.iloc[0]["vec_id"]) & (got["id_b"] == 99999)]
    assert len(hit) == 1 and hit.iloc[0]["cos_sim"] == 1.0
    assert (got["id_a"] < got["id_b"]).all()
    # no duplicated pairs despite multi-band collisions
    assert not got.duplicated(["id_a", "id_b"]).any()

    # forced-exchange scale path ≡ one-task small path
    import nerpii_ray.stages.agg as agg

    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1
    try:
        got2 = srp_dup_pairs(vds).to_pandas()
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        got2[got.columns].sort_values(key).reset_index(drop=True),
    )


def test_rank_ties_competition_semantics(tmp_path):
    import duckdb

    from nerpii_ray.pipelines.queries import QUERIES, ORACLE_SQL

    # crafted ties: two orders share the 3rd-highest price, so RANK()
    # keeps 4 rows (ranks 1,2,3,3) where ROW_NUMBER would keep exactly 3;
    # a second tie pair at the top (ranks 1,1,3) pins the skip-after-tie
    df = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5, 6, 7, 8],
            "o_orderpriority": ["1-URGENT"] * 5 + ["2-HIGH"] * 3,
            "o_totalprice": [900.0, 800.0, 500.0, 500.0, 100.0,
                             7.0, 7.0, 3.0],
        }
    )
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/orders.parquet")
    got = (
        QUERIES["orders_rank_ties"](sf)
        .to_pandas()
        .sort_values(["o_orderpriority", "rnk", "o_orderkey"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    want = (
        con.execute(ORACLE_SQL["orders_rank_ties"])
        .df()
        .sort_values(["o_orderpriority", "rnk", "o_orderkey"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    urgent = got[got["o_orderpriority"] == "1-URGENT"]
    assert urgent["rnk"].tolist() == [1, 2, 3, 3]  # tie survives the cut
    high = got[got["o_orderpriority"] == "2-HIGH"]
    assert high["rnk"].tolist() == [1, 1, 3]  # rank skips after a tie


def test_ntile_and_median_edge_groups(tmp_path):
    import duckdb

    from nerpii_ray.pipelines.queries import QUERIES, ORACLE_SQL

    sf = str(tmp_path)
    # groups of size 1, 3 (< K=4), 5 (remainder 1) and 8 (even split)
    rows = []
    k = 0
    for prio, sz in [("A", 1), ("B", 3), ("C", 5), ("D", 8)]:
        for j in range(sz):
            k += 1
            rows.append((k, prio, float(100 * sz + j)))
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    ).to_parquet(f"{sf}/orders.parquet")
    # lineitem: odd group (median = one middle value) and even group
    # (two DISTINCT middle values — lo != hi) plus a duplicated-value
    # group where both middles are the same repeated price
    li = pd.DataFrame(
        {
            "l_returnflag": ["O"] * 3 + ["E"] * 4 + ["R"] * 4,
            "l_extendedprice": [5.0, 1.0, 3.0,
                                10.0, 40.0, 20.0, 30.0,
                                7.0, 7.0, 7.0, 9.0],
        }
    )
    li.to_parquet(f"{sf}/lineitem.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")

    for name in ["orders_ntile_quartiles", "lineitem_price_median"]:
        got = QUERIES[name](sf).to_pandas()
        want = con.execute(ORACLE_SQL[name]).df()
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    med = QUERIES["lineitem_price_median"](sf).to_pandas().set_index("l_returnflag")
    assert med.loc["O", "median_lo"] == med.loc["O", "median_hi"] == 3.0
    assert (med.loc["E", "median_lo"], med.loc["E", "median_hi"]) == (20.0, 30.0)
    assert med.loc["R", "median_lo"] == med.loc["R", "median_hi"] == 7.0


def test_grouped_argmax():
    """grouped_argmax: per-key row with the max value, ties to the
    smallest tie-break, plus group count — small root and the forced
    keyed-exchange root must agree exactly."""
    from nerpii_ray.stages import agg

    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "value", "event_id"])
    edf = ev.to_pandas()

    got = (
        agg.grouped_argmax(ev, ["user_id"], "value", "event_id")
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    ref = (
        edf.sort_values(["user_id", "value", "event_id"],
                        ascending=[True, False, True], kind="mergesort")
        .groupby("user_id").head(1)
        .merge(edf.groupby("user_id").size().rename("n").reset_index(),
               on="user_id")
        .sort_values("user_id").reset_index(drop=True)
    )
    assert len(got) == edf["user_id"].nunique()
    assert (got["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()
    assert (got["value"].to_numpy() == ref["value"].to_numpy()).all()
    assert (got["event_id"].to_numpy() == ref["event_id"].to_numpy()).all()
    assert (got["n"].to_numpy() == ref["n"].to_numpy()).all()

    # forced exchange root: identical rows
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1  # read at call time → forces exchange
    try:
        forced = (
            agg.grouped_argmax(ev, ["user_id"], "value", "event_id")
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    pd.testing.assert_frame_equal(
        got, forced[got.columns.tolist()], check_dtype=False
    )

    # deterministic tie: equal max values → smallest tie-break wins
    tie = pd.DataFrame({"k": [1, 1, 1], "v": [5, 5, 3], "t": [9, 2, 1]})
    out = agg.grouped_argmax(rd.from_pandas(tie), ["k"], "v", "t").to_pandas()
    assert out.iloc[0]["v"] == 5 and out.iloc[0]["t"] == 2 and out.iloc[0]["n"] == 3


def test_ngram_decontaminate():
    """An exact copy of a benchmark doc is contaminated at every gram
    position; docs with fewer than k tokens and non-overlapping docs are
    never flagged; distinct vs total hit counts diverge on repeats."""
    from nerpii_ray.stages.dedup import ngram_decontaminate

    bench = pd.DataFrame({
        "doc_id": [100],
        "text": ["a b c d e f g h i j"],          # 10 tokens → 3 8-grams
    })
    train = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c d e f g h i j",                 # exact copy → 3 hits
            "x " + "a b c d e f g h" + " y",       # one shared 8-gram
            "a b c d e f g",                       # 7 tokens → no grams
            "q w e r t y u i o p",                 # disjoint
        ],
    })
    out = (
        ngram_decontaminate(rd.from_pandas(train), rd.from_pandas(bench), k=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_hits"].tolist() == [3, 1]
    assert out["n_distinct_hits"].tolist() == [3, 1]

    # repeated contaminated gram: total counts positions, distinct dedups
    rep = pd.DataFrame({
        "doc_id": [9],
        "text": ["a b c d e f g h a b c d e f g h"],
    })
    out2 = ngram_decontaminate(
        rd.from_pandas(rep), rd.from_pandas(bench), k=8
    ).to_pandas()
    # grams at positions 1 and 9 are both 'a..h'; the bridging grams are
    # not in the benchmark
    assert out2.iloc[0]["n_hits"] == 2 and out2.iloc[0]["n_distinct_hits"] == 1


def test_rows_window_and_lead_gap():
    """ROWS-frame moving sum and LEAD gap: pandas-reference equality on
    real events/orders, including the forced-exchange path."""
    from nerpii_ray.stages import agg
    from nerpii_ray.stages.window import lead_gap, rows_window_sum

    od = rd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    odf = od.to_pandas()
    odf["cents"] = np.round(odf["o_totalprice"] * 100).astype("int64")

    prep = od.map_batches(
        lambda b: b.assign(
            cents=np.round(b["o_totalprice"].to_numpy() * 100).astype("int64")
        )[["o_orderkey", "o_custkey", "o_orderdate", "cents"]],
        batch_format="pandas",
    )
    got = (
        rows_window_sum(prep, "o_custkey", ["o_orderdate", "o_orderkey"],
                        "cents", preceding=2)
        .to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    )
    s = odf.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                        kind="mergesort")
    want = (
        s.groupby("o_custkey")["cents"]
        .rolling(3, min_periods=1).sum().reset_index(level=0, drop=True)
        .astype("int64")
    )
    ref = s.assign(w=want).sort_values("o_orderkey").reset_index(drop=True)
    assert (got["moving_sum"].to_numpy() == ref["w"].to_numpy()).all()

    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    edf = ev.to_pandas()
    got_g = (
        lead_gap(ev, "user_id", "ts", "event_id")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    se = edf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    us = se["ts"].astype("int64")
    nxt = us.groupby(se["user_id"].to_numpy()).shift(-1)
    ref_g = se.assign(gap=(nxt - us).fillna(-1).astype("int64")) \
              .sort_values("event_id").reset_index(drop=True)
    assert (got_g["next_gap_us"].to_numpy() == ref_g["gap"].to_numpy()).all()

    # forced exchange path agrees
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1
    try:
        forced = (
            lead_gap(ev, "user_id", "ts", "event_id")
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    assert (forced["next_gap_us"].to_numpy() == got_g["next_gap_us"].to_numpy()).all()


def test_ngram_novelty():
    """First doc is 100% novel, an exact later copy is 0% novel, a doc
    mixing one old and one new gram scores the integer bp split."""
    from nerpii_ray.stages.dedup import ngram_novelty

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "a b c d e f",        # grams: abcde, bcdef → both novel
            "a b c d e f",        # exact copy → 0 novel
            "b c d e f g h",      # bcdef old; cdefg, defgh novel → 2/3
        ],
    })
    out = (
        ngram_novelty(rd.from_pandas(docs), k=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_grams"].tolist() == [2, 2, 3]
    assert out["n_novel"].tolist() == [2, 0, 2]
    assert out["novelty_bp"].tolist() == [10000, 0, 2 * 10000 // 3]


def test_span_dedup():
    """Distinct 8-token spans attribute to the smallest (doc, pos): an
    exact later copy keeps nothing, a doc repeating an old span plus a
    new tail keeps only the tail, empty/None text drops out."""
    from nerpii_ray.stages.dedup import span_dedup

    s1 = "a b c d e f g h"          # doc 1 span 1
    s2 = "i j k l m n o p"          # doc 1 span 2
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"{s1} {s2}",            # both spans novel
            f"{s1} {s2}",            # exact copy → nothing kept
            f"{s1} q r s",           # span1 old, tail "q r s" novel
            "",                      # no tokens → no output row
        ],
    })
    out = (
        span_dedup(rd.from_pandas(docs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_spans"].tolist() == [2, 2, 2]
    assert out["n_kept"].tolist() == [2, 0, 1]
    assert out["clean_text"].tolist() == [f"{s1} {s2}", "", "q r s"]

    # forced-low root threshold must route the winners tree through the
    # keyed exchange and land identically (house cross-path discipline)
    forced = (
        span_dedup(rd.from_pandas(docs).repartition(3), root_threshold=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(forced[out.columns], out)


def test_global_row_number():
    """Range-partitioned global ROW_NUMBER equals the single-node sort
    reference, on both the small root and the forced-exchange path."""
    from nerpii_ray.stages import agg
    from nerpii_ray.stages.window import global_row_number

    od = rd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    prep = od.map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64"),
            "cents": np.round(b["o_totalprice"].to_numpy() * 100).astype("int64"),
        }),
        batch_format="pandas",
    )
    ref = prep.to_pandas().sort_values(
        ["cents", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    ref["rn"] = np.arange(1, len(ref) + 1, dtype=np.int64)

    for force in (False, True):
        old = agg.ROOT_THRESHOLD_DEFAULT
        if force:
            agg.ROOT_THRESHOLD_DEFAULT = 1
        try:
            got = (
                global_row_number(prep, "cents", "o_orderkey")
                .to_pandas().sort_values("rn").reset_index(drop=True)
            )
        finally:
            agg.ROOT_THRESHOLD_DEFAULT = old
        assert (got["o_orderkey"].to_numpy() == ref["o_orderkey"].to_numpy()).all()
        assert (got["rn"].to_numpy() == ref["rn"].to_numpy()).all()
        assert got["rn"].iloc[0] == 1 and got["rn"].iloc[-1] == len(ref)


def test_pivot_counts():
    """PIVOT long→wide: explicit domain, value missing from a group → 0,
    values outside the domain ignored, empty input keeps the schema."""
    from nerpii_ray.stages.agg import pivot_counts

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "v": ["a", "a", "b", "b", "zzz", "a"],
    })
    out = (
        pivot_counts(rd.from_pandas(df), ["k"], "v", domain=["a", "b"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(out.columns) == ["k", "n_a", "n_b"]
    assert out["n_a"].tolist() == [2, 0, 1]
    assert out["n_b"].tolist() == [1, 1, 0]

    # derived domain comes back sorted and includes every distinct value
    out2 = (
        pivot_counts(rd.from_pandas(df), ["k"], "v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(out2.columns) == ["k", "n_a", "n_b", "n_zzz"]
    assert out2["n_zzz"].tolist() == [0, 1, 0]


def test_grouped_linreg():
    """Exact fit recovers slope/intercept bit-exactly; degenerate
    (single-row / zero-x-variance) groups yield NaN, not a crash."""
    from nerpii_ray.stages.agg import grouped_linreg

    x = np.arange(1, 101, dtype=np.int64)
    df = pd.DataFrame({
        "g": ["fit"] * 100 + ["single", "flat", "flat"],
        "x": np.concatenate([x, [5, 7, 7]]),
        "y": np.concatenate([2 * x + 3, [1, 1, 2]]),
    })
    out = (
        grouped_linreg(rd.from_pandas(df), ["g"], "x", "y")
        .to_pandas().set_index("g")
    )
    assert out.loc["fit", "slope"] == 2.0
    assert out.loc["fit", "intercept"] == 3.0
    assert np.isnan(out.loc["single", "slope"])
    assert np.isnan(out.loc["flat", "slope"])
    assert out.loc["flat", "n"] == 2


def test_bm25_topk():
    """Integer BM25: more query-term mass ranks higher; rarer terms
    outweigh common ones; docs without any term are excluded; None/empty
    texts still count toward corpus stats without crashing."""
    from nerpii_ray.stages.textstats import bm25_topk

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "apple apple banana x y z",   # 2×apple 1×banana
            "apple x y z q w",            # 1×apple
            "banana x y z q w",           # 1×banana (rarer: df 2 vs 3)
            "apple pie recipe",           # 1×apple → df(apple)=3
            "nothing relevant here",      # no term → excluded
            None,                          # counts toward N only
        ],
    })
    out = (
        bm25_topk(rd.from_pandas(docs), ["apple", "banana"], topk=10)
        .to_pandas().reset_index(drop=True)
    )
    assert set(out["doc_id"]) == {1, 2, 3, 4}
    top = out.sort_values(["score_ppm", "doc_id"],
                          ascending=[False, True])["doc_id"].tolist()
    assert top[0] == 1                      # both terms, double tf
    # banana (df=2) must outscore apple (df=3) at equal tf and equal dl
    s = out.set_index("doc_id")["score_ppm"]
    assert s[3] > s[2]
    # exact-integer scores (no floats anywhere)
    assert out["score_ppm"].dtype == np.int64


def test_posting_lists():
    """Inverted index: exact df, first-k postings sorted ascending,
    terms with no postings absent, cap respected."""
    from nerpii_ray.stages.textstats import posting_lists

    docs = pd.DataFrame({
        "doc_id": [5, 3, 1, 2, 4],
        "text": ["cat dog", "cat", "cat mouse", "dog", None],
    })
    out = (
        posting_lists(rd.from_pandas(docs), ["cat", "dog", "absent"], k=2)
        .to_pandas().sort_values("term").reset_index(drop=True)
    )
    assert out["term"].tolist() == ["cat", "dog"]
    assert out["df"].tolist() == [3, 2]           # exact, not capped
    assert out["postings"].tolist() == ["1,3", "2,5"]  # capped at k=2


def test_term_cooccurrence():
    """Lift: independent pair ≈ 1e6, perfectly-coupled pair > 1e6,
    never-co-occurring pair = 0; counts exact."""
    from nerpii_ray.stages.textstats import term_cooccurrence

    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": ["a b", "a b", "a b", "a b", "c", "c", "d", None],
    })
    out = (
        term_cooccurrence(rd.from_pandas(docs), ["a", "b", "c"])
        .to_pandas().set_index(["term_a", "term_b"])
    )
    ab = out.loc[("a", "b")]
    assert ab["n_a"] == 4 and ab["n_b"] == 4 and ab["n_ab"] == 4
    assert ab["lift_ppm"] == (10**6 * 8 * 4) // 16  # = 2e6 > 1e6
    ac = out.loc[("a", "c")]
    assert ac["n_ab"] == 0 and ac["lift_ppm"] == 0


def test_grouped_gini():
    """Gini impurity bp: pure group 0, 50/50 → 5000, uniform-3 → 6666;
    multi-key tuples survive; Python-int squares (no int64 overflow on
    big counts is pinned by construction — exercised via exact values)."""
    from nerpii_ray.stages.agg import grouped_gini

    df = pd.DataFrame({
        "g": ["p"] * 4 + ["h"] * 4 + ["u"] * 3,
        "v": ["a", "a", "a", "a", "a", "a", "b", "b", "x", "y", "z"],
    })
    out = (
        grouped_gini(rd.from_pandas(df), ["g"], "v")
        .to_pandas().set_index("g")
    )
    assert out.loc["p", "gini_bp"] == 0
    assert out.loc["h", "gini_bp"] == 5000
    assert out.loc["u", "gini_bp"] == (10**4 * (9 - 3)) // 9  # 6666
    assert out.loc["u", "n"] == 3


def test_chunk_token_windows():
    """Context-window chunking: full coverage with overlap, short/empty
    docs, exact-multiple boundary, and typed output on empty input."""
    from nerpii_ray.stages.textstats import chunk_token_windows

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                " ".join(f"w{i}" for i in range(70)),   # 2 chunks, short tail
                "a b c",                                  # 1 short chunk
                "",                                       # no chunks
                " ".join(f"x{i}" for i in range(96)),   # starts 0,48 — exact
            ],
        }
    )
    out = (
        chunk_token_windows(rd.from_pandas(docs), chunk=64, stride=48)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 1, 2, 4, 4]
    assert out["chunk_idx"].tolist() == [0, 1, 0, 0, 1]
    assert out["chunk_tokens"].tolist() == [64, 22, 3, 64, 48]
    # chunk text is the literal token slice
    toks70 = [f"w{i}" for i in range(70)]
    assert out.loc[0, "chunk_text"] == " ".join(toks70[:64])
    assert out.loc[1, "chunk_text"] == " ".join(toks70[48:70])
    # every token is covered: union of slices reconstructs the doc
    seen = set()
    for _, r in out[out["doc_id"] == 1].iterrows():
        s = int(r["chunk_idx"]) * 48
        seen.update(range(s, s + int(r["chunk_tokens"])))
    assert seen == set(range(70))
    # whitespace-run + leading/trailing semantics match str.split()
    messy = pd.DataFrame({"doc_id": [9], "text": ["  a\t\tb \n c  "]})
    m = chunk_token_windows(rd.from_pandas(messy)).to_pandas()
    assert m.loc[0, "chunk_text"] == "a b c" and m.loc[0, "chunk_tokens"] == 3
    # invalid parameters fail loudly
    with pytest.raises(ValueError):
        chunk_token_windows(rd.from_pandas(docs), chunk=4, stride=8)


def test_grouped_higher_moments_exact():
    """m3/m4 match a Python big-int reference bit-for-bit, including a
    value range whose power sums overflow int64."""
    from nerpii_ray.stages.agg import grouped_higher_moments

    rng = np.random.RandomState(7)
    vals = rng.randint(1, 3_000_000, size=4000).astype(np.int64)
    keys = rng.choice(["a", "b"], size=4000)
    df = pd.DataFrame({"k": keys, "v": vals})
    # Σx⁴ for 3e6-scale values: ~8e25 per row → far past 2^63
    got = (
        grouped_higher_moments(
            rd.from_pandas(df).repartition(8), ["k"], "v"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        xs = [int(x) for x in df.loc[df["k"] == r["k"], "v"]]
        n, s1 = len(xs), sum(xs)
        s2 = sum(x * x for x in xs)
        s3 = sum(x**3 for x in xs)
        s4 = sum(x**4 for x in xs)
        m3 = float(n**3 * s3 - 3 * n**2 * s1 * s2 + 2 * n * s1**3) / float(n**4)
        m4 = float(
            n**4 * s4 - 4 * n**3 * s1 * s3 + 6 * n**2 * s1 * s1 * s2
            - 3 * n * s1**4
        ) / float(n**5)
        assert r["n"] == n
        assert r["m3"] == m3 and r["m4"] == m4  # bit-exact, not approx


def test_triangle_count_crafted():
    """Known triangle structures, hub skew, and equality with a brute
    -force closure on a random graph."""
    from itertools import combinations

    from nerpii_ray.stages.graph import triangle_count

    def run(edges):
        df = pd.DataFrame(edges, columns=["u", "v"]).astype("int64")
        out = triangle_count(rd.from_pandas(df)).to_pandas()
        return int(out["n_triangles"].iloc[0])

    def brute(edges):
        es = {tuple(e) for e in edges}
        nodes = sorted({x for e in edges for x in e})
        return sum(
            1
            for a, b, c in combinations(nodes, 3)
            if (a, b) in es and (b, c) in es and (a, c) in es
        )

    # K4 has 4 triangles
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    assert run(k4) == 4
    # a path has none
    assert run([(0, 1), (1, 2), (2, 3)]) == 0
    # hub star + one rim edge = exactly 1 triangle despite skew
    star = [(0, i) for i in range(1, 50)] + [(1, 2)]
    assert run(star) == 1
    # random graph vs brute force
    rng = np.random.RandomState(11)
    e = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.randint(0, 30, size=(120, 2))
        if a != b
    }
    e = sorted(e)
    assert run(e) == brute(e)


def test_hll_registers_and_estimate():
    """HLL sketch: register table matches a direct per-key replay, the
    estimate lands within 2σ (m=256 → σ≈1.04/16 ≈ 6.5%), merge = max."""
    import hashlib

    from nerpii_ray.stages.agg import hll_estimate, hll_registers

    ids = pd.DataFrame({"k": [f"user-{i}" for i in range(5000)] * 2})
    got = (
        hll_registers(rd.from_pandas(ids).repartition(8), "k")
        .to_pandas()
        .sort_values("register")
        .reset_index(drop=True)
    )
    # direct replay
    ref = {}
    for s in set(ids["k"]):
        h = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
        reg, rem = h >> 56, h & ((1 << 56) - 1)
        rank = 57 - rem.bit_length()
        ref[reg] = max(ref.get(reg, 0), rank)
    assert dict(zip(got["register"], got["max_rank"])) == ref
    est = hll_estimate(got)
    assert abs(est - 5000) / 5000 < 0.13
    # small-cardinality regime: linear counting takes over and is close
    small = pd.DataFrame({"k": [f"u{i}" for i in range(40)]})
    sgot = hll_registers(rd.from_pandas(small), "k").to_pandas()
    sest = hll_estimate(sgot)
    assert abs(sest - 40) / 40 < 0.2


def test_equi_depth_histogram():
    from nerpii_ray.stages.agg import equi_depth_histogram

    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [rng.randint(0, 100, 700), rng.randint(100, 10000, 300),
         np.full(500, 42)]  # heavy tie mass
    ).astype("int64")
    df = pd.DataFrame({"cents": vals})
    out = (
        equi_depth_histogram(rd.from_pandas(df).repartition(6), "cents")
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert out["n_rows"].sum() == len(df)
    # buckets are contiguous, ordered, non-overlapping
    assert (out["lo_cents"] <= out["hi_cents"]).all()
    assert (out["hi_cents"].to_numpy()[:-1] < out["lo_cents"].to_numpy()[1:]).all()
    # pandas reference with the identical value-level rule
    vc = df["cents"].value_counts().sort_index()
    cum_lt = vc.cumsum() - vc
    bucket = np.minimum(3, 4 * cum_lt // len(df))
    want = vc.groupby(bucket).sum()
    got = out.set_index("bucket")["n_rows"]
    assert got.sort_index().equals(want.sort_index().astype("int64"))


def test_token_ed1_pairs_crafted():
    from nerpii_ray.stages.dedup import token_ed1_pairs

    docs = pd.DataFrame(
        {
            "text": [
                "cat bat",        # substitution
                "cat cart",       # insertion (cart -> cat? lev=2: c-a-t vs c-a-r-t = 1 insertion)
                "car cart",       # insertion at end
                "ab ba",          # transposition: lev 2, must NOT pair
                "x y",            # single chars: lev 1
                "same same",      # identical: never a pair
            ]
        }
    )
    got = token_ed1_pairs(rd.from_pandas(docs)).to_pandas()
    pairs = set(zip(got["tok_a"], got["tok_b"]))
    # brute-force reference over the vocab
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    vocab = sorted({t for s in docs["text"] for t in s.split()})
    want = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1:]
        if lev(a, b) == 1
    }
    assert ("ab", "ba") not in pairs
    assert ("bat", "cat") in pairs and ("car", "cart") in pairs
    assert ("x", "y") in pairs
    assert pairs == want
    assert not got.duplicated(["tok_a", "tok_b"]).any()


def _lev_py(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


def test_levenshtein_np_matches_scalar_dp():
    from nerpii_ray.stages.dedup import levenshtein_np

    import itertools
    vocab = ["", "a", "ab", "ba", "abc", "axc", "abcd", "dcba",
             "kitten", "sitting", "flaw", "lawn", "same", "same"]
    pa_, pb_ = zip(*itertools.product(vocab, vocab))
    got = levenshtein_np(pd.Series(pa_), pd.Series(pb_))
    want = np.array([_lev_py(x, y) for x, y in zip(pa_, pb_)])
    assert (got == want).all()


def test_token_edk_pairs_matches_bruteforce():
    from nerpii_ray.stages.dedup import token_edk_pairs

    docs = pd.DataFrame(
        {
            "text": [
                "cat bat hat",     # ed1 chain
                "cart card ab ba", # ed2 via transposition (ab/ba), cart/cat
                "kitten sitten sittin sitting",  # classic ed ladder
                "x y zz",
            ]
        }
    )
    got = token_edk_pairs(rd.from_pandas(docs), k=2).to_pandas()
    vocab = sorted({t for s in docs["text"] for t in s.split()})
    want = {
        (a, b, _lev_py(a, b))
        for i, a in enumerate(vocab)
        for b in vocab[i + 1:]
        if 1 <= _lev_py(a, b) <= 2
    }
    assert set(zip(got["tok_a"], got["tok_b"], got["dist"])) == want
    assert ("ab", "ba", 2) in want  # the k=2-only case is exercised
    assert not got.duplicated(["tok_a", "tok_b"]).any()


def test_bfs_levels_crafted_and_cross_path():
    from nerpii_ray.stages.graph import bfs_levels

    # path graph 0-1-2-3-4-5: hops capped at 3
    edges = pd.DataFrame({"u": [0, 1, 2, 3, 4], "v": [1, 2, 3, 4, 5]})
    out = (
        bfs_levels(rd.from_pandas(edges))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert dict(zip(out["node"], out["dist"])) == {0: 0, 1: 1, 2: 2, 3: 3}

    # star + rim: every rim node at 1, opposite rim at 2 via hub
    star = pd.DataFrame({"u": [0] * 5, "v": [1, 2, 3, 4, 5]})
    got = bfs_levels(rd.from_pandas(star), source=3).to_pandas()
    d = dict(zip(got["node"], got["dist"]))
    assert d[3] == 0 and d[0] == 1 and all(d[i] == 2 for i in (1, 2, 4, 5))

    # disconnected component never appears
    two = pd.DataFrame({"u": [0, 10], "v": [1, 11]})
    got = bfs_levels(rd.from_pandas(two)).to_pandas()
    assert set(got["node"]) == {0, 1}

    # source absent from the graph → empty result
    assert len(bfs_levels(rd.from_pandas(two), source=99).to_pandas()) == 0

    # cross-path equality on a random graph
    rng = np.random.RandomState(5)
    e = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.randint(0, 40, size=(120, 2))
            if a != b
        }
    )
    edf = pd.DataFrame(e, columns=["u", "v"]).astype("int64")
    small = (
        bfs_levels(rd.from_pandas(edf), path="small")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    exch = (
        bfs_levels(rd.from_pandas(edf), path="exchange")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, exch, check_dtype=False)


def test_skyline_2d():
    from nerpii_ray.stages.agg import skyline_2d

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {
            "id": np.arange(3000, dtype="int64"),
            "x": rng.randint(0, 500, 3000).astype("int64"),
            "y": rng.randint(0, 500, 3000).astype("int64"),
        }
    )
    got = (
        skyline_2d(rd.from_pandas(df).repartition(8), "x", "y")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    x, y = df["x"].to_numpy(), df["y"].to_numpy()
    dominated = np.array(
        [bool(np.any((x > x[i]) & (y > y[i]))) for i in range(len(df))]
    )
    want = df[~dominated].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # tie safety: equal x never dominates; identical points both survive
    tie = pd.DataFrame(
        {"id": [1, 2, 3], "x": [5, 5, 5], "y": [9, 1, 9]}
    ).astype("int64")
    out = skyline_2d(rd.from_pandas(tie), "x", "y").to_pandas()
    assert sorted(out["id"]) == [1, 2, 3]


def test_asof_join_forward():
    from nerpii_ray.stages.joins import asof_join

    left = pd.DataFrame({"k": [1, 1, 2], "ts": [5, 10, 3]}).astype("int64")
    right = pd.DataFrame(
        {"k": [1, 1, 2], "ts": [7, 12, 1], "x": [70, 120, 10]}
    ).astype("int64")
    out = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", ts="ts", direction="forward",
        )
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert out["x"].fillna(-1).tolist() == [70.0, 120.0, -1.0]
    # exact match included unless strict
    l2 = pd.DataFrame({"k": [1], "ts": [7]}).astype("int64")
    inc = asof_join(rd.from_pandas(l2), rd.from_pandas(right),
                    key="k", ts="ts", direction="forward").to_pandas()
    assert inc["x"].iloc[0] == 70
    str_ = asof_join(rd.from_pandas(l2), rd.from_pandas(right),
                     key="k", ts="ts", direction="forward",
                     strict=True).to_pandas()
    assert str_["x"].iloc[0] == 120
    with pytest.raises(ValueError):
        asof_join(rd.from_pandas(l2), rd.from_pandas(right),
                  key="k", ts="ts", direction="sideways")


def test_max_concurrent_intervals():
    from nerpii_ray.stages.window import max_concurrent_intervals

    # three overlapping at t=10..12; inclusive bounds: end==start counts
    iv = pd.DataFrame(
        {
            "s_start": [0, 5, 10, 20, 30],
            "s_end": [12, 11, 15, 25, 30],
        }
    ).astype("int64")
    out = max_concurrent_intervals(rd.from_pandas(iv)).to_pandas()
    assert out["max_concurrent"].tolist() == [3]

    # touching endpoints: [0,10] and [10,20] overlap at t=10 inclusively
    touch = pd.DataFrame({"s_start": [0, 10], "s_end": [10, 20]}).astype(
        "int64"
    )
    out2 = max_concurrent_intervals(rd.from_pandas(touch)).to_pandas()
    assert out2["max_concurrent"].tolist() == [2]

    # empty input -> 0
    empty = pd.DataFrame(
        {"s_start": pd.Series(dtype="int64"), "s_end": pd.Series(dtype="int64")}
    )
    out3 = max_concurrent_intervals(rd.from_pandas(empty)).to_pandas()
    assert out3["max_concurrent"].tolist() == [0]

    # bucket-boundary stress: many intervals spanning bucket edges, few buckets
    rng = pd.DataFrame(
        {
            "s_start": [i * 7 % 101 for i in range(60)],
            "s_end": [i * 7 % 101 + (i * 13) % 29 for i in range(60)],
        }
    ).astype("int64")
    got = int(
        max_concurrent_intervals(rd.from_pandas(rng), num_buckets=4)
        .to_pandas()["max_concurrent"].iloc[0]
    )
    # brute-force sweep
    events = []
    for s, e in zip(rng["s_start"], rng["s_end"]):
        events.append((s, 1))
        events.append((e + 1, -1))  # inclusive end
    events.sort()
    cur = best = 0
    for _, d in events:
        cur += d
        best = max(best, cur)
    assert got == best


def test_asof_join_nearest():
    from nerpii_ray.stages.joins import asof_join

    left = pd.DataFrame({"k": [1, 1, 1, 2], "ts": [10, 16, 100, 7]}).astype(
        "int64"
    )
    right = pd.DataFrame(
        {"k": [1, 1, 1], "ts": [5, 15, 25], "x": [50, 150, 250]}
    ).astype("int64")
    out = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", ts="ts", direction="nearest",
        )
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    # ts=10: dist 5 to both 5 and 15 -> TIE -> prior (x=50)
    # ts=16: dist 1 to 15 -> x=150; ts=100: nearest 25 -> x=250
    # k=2: no right rows -> null
    assert out["x"].fillna(-1).tolist() == [50.0, 150.0, 250.0, -1.0]

    # strict excludes the exact match: left ts=15 must skip x=150
    l2 = pd.DataFrame({"k": [1], "ts": [15]}).astype("int64")
    ex = asof_join(rd.from_pandas(l2), rd.from_pandas(right),
                   key="k", ts="ts", direction="nearest").to_pandas()
    assert ex["x"].iloc[0] == 150
    st = asof_join(rd.from_pandas(l2), rd.from_pandas(right),
                   key="k", ts="ts", direction="nearest",
                   strict=True).to_pandas()
    # dist 10 to both 5 and 25 -> tie -> prior (x=50)
    assert st["x"].iloc[0] == 50


def test_grouped_spearman():
    from nerpii_ray.stages.agg import grouped_spearman

    # group a: perfect monotone (rho=1) despite non-linear values
    # group b: perfect inverse (rho=-1); group c: zero variance -> NaN
    df = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 4 + ["c"] * 3,
            "x": [1, 2, 3, 4, 5, 1, 2, 3, 4, 7, 7, 7],
            "y": [1, 10, 100, 1000, 10000, 9, 7, 5, 3, 1, 2, 3],
        }
    )
    out = (
        grouped_spearman(rd.from_pandas(df.astype({"x": "int64", "y": "int64"})), ["g"], "x", "y")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert out["n"].tolist() == [5, 4, 3]
    # num/(sqrt(dx)*sqrt(dy)) is the SQL-twin expression shape; for
    # perfect correlation it lands 1 ulp off 1.0 (sqrt(d)**2 != d)
    assert abs(out["spearman"].iloc[0] - 1.0) < 1e-12
    assert abs(out["spearman"].iloc[1] + 1.0) < 1e-12
    assert np.isnan(out["spearman"].iloc[2])

    # ties: average ranks; cross-check against pandas corr of ranks
    tdf = pd.DataFrame(
        {
            "g": ["t"] * 6,
            "x": [1, 1, 2, 3, 3, 4],
            "y": [2, 1, 5, 5, 4, 9],
        }
    ).astype({"x": "int64", "y": "int64"})
    got = grouped_spearman(rd.from_pandas(tdf), ["g"], "x", "y").to_pandas()
    rx = tdf["x"].rank(method="average")
    ry = tdf["y"].rank(method="average")
    exp = np.corrcoef(rx, ry)[0, 1]
    assert abs(got["spearman"].iloc[0] - exp) < 1e-12


def test_consecutive_streaks():
    from nerpii_ray.stages.window import consecutive_streaks

    df = pd.DataFrame(
        {
            # u1: days 1,2,3, 7,8 + a duplicate day -> longest 3, active 5
            # u2: single day -> 1/1; u3: all consecutive -> 4/4
            "u": [1, 1, 1, 1, 1, 1, 2, 3, 3, 3, 3],
            "day": [1, 2, 3, 7, 8, 2, 42, 10, 11, 12, 13],
        }
    ).astype("int64")
    out = (
        consecutive_streaks(rd.from_pandas(df), ["u"], "day")
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    assert out["longest_streak"].tolist() == [3, 1, 4]
    assert out["active_days"].tolist() == [5, 1, 4]

    # adjacent users' runs must not bridge: u4 ends day 20, u5 starts 21
    df2 = pd.DataFrame({"u": [4, 4, 5, 5], "day": [19, 20, 21, 22]}).astype(
        "int64"
    )
    out2 = (
        consecutive_streaks(rd.from_pandas(df2), ["u"], "day")
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    assert out2["longest_streak"].tolist() == [2, 2]


def test_dup_ngram_stats():
    from nerpii_ray.stages.textstats import dup_ngram_stats

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c a b c a b c",   # 7 grams, 3 distinct, top 3
                "one two three four",  # 2 grams, 2 distinct, top 1
                "short one",           # < 3 tokens -> zeros
                None,                  # null text -> zeros
            ],
        }
    )
    out = (
        dup_ngram_stats(rd.from_pandas(df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_ngrams"].tolist() == [7, 2, 0, 0]
    assert out["n_distinct"].tolist() == [3, 2, 0, 0]
    assert out["top_count"].tolist() == [3, 1, 0, 0]


def test_time_weighted_avg():
    from nerpii_ray.stages.window import time_weighted_avg

    # u1: value 10 held 4us, value 20 held 1us -> (40+20)/5 = 12
    # u2: single event -> no row; u3: tied ts -> total_dt 0 -> NaN
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3, 3],
            "t": [0, 4, 5, 9, 7, 7],
            "v": [10, 20, 99, 5, 1, 2],
            "o": [1, 2, 3, 4, 5, 6],
        }
    ).astype("int64")
    out = (
        time_weighted_avg(rd.from_pandas(df), "k", "t", "v", "o")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 3]
    assert out["n_intervals"].tolist() == [2, 1]
    assert out["total_dt_us"].tolist() == [5, 0]
    assert out["twap"].iloc[0] == 12.0
    assert np.isnan(out["twap"].iloc[1])

    # overflow guard: cents*dt far past int64 must stay exact
    big = pd.DataFrame(
        {
            "k": [9, 9, 9],
            "t": [0, 2**45, 2**46],
            "v": [2**40, 2**40, 0],
            "o": [1, 2, 3],
        }
    ).astype("int64")
    got = time_weighted_avg(rd.from_pandas(big), "k", "t", "v", "o").to_pandas()
    assert got["twap"].iloc[0] == float(2**40)


def test_prefix_filter_jaccard_pairs():
    import re as _re
    from itertools import combinations

    from nerpii_ray.stages import agg
    from nerpii_ray.stages.dedup import prefix_filter_jaccard_pairs

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different words entirely here"),
        (5, "words entirely different completely here now"),  # near-dup of 4
        (6, ""),            # empty -> never pairs
        (7, None),          # null  -> never pairs
        (8, "zz yy xx"),
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])

    # brute-force expected pairs over token sets
    tokre = _re.compile(r"\w+")
    sets = {i: set(tokre.findall(str(t).lower())) for i, t in docs if t}
    exp = set()
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if sa and sb and len(sa & sb) / len(sa | sb) >= 0.5:
            exp.add((a, b))

    out = (
        prefix_filter_jaccard_pairs(rd.from_pandas(df), threshold=0.5)
        .to_pandas()
    )
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == exp
    assert (out["jaccard"] >= 0.5).all()
    # exact dup scores exactly 1.0
    j13 = out.set_index(["id_a", "id_b"])["jaccard"]
    assert j13[(1, 3)] == 1.0

    # forced exchange path must equal the small path bit-for-bit
    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1
    try:
        out2 = (
            prefix_filter_jaccard_pairs(
                rd.from_pandas(df).repartition(3), threshold=0.5
            )
            .to_pandas()
        )
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old
    a = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = out2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_grouped_zscore():
    from nerpii_ray.stages.agg import grouped_zscore

    df = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 2 + ["c"],
            "x": [2, 4, 6, 8, 5, 5, 42],
        }
    ).astype({"x": "int64"})
    out = (
        grouped_zscore(rd.from_pandas(df).repartition(3), ["g"], "x")
        .to_pandas().sort_values(["g", "x"]).reset_index(drop=True)
    )
    # group a: mean 5, var_pop 5 -> z = (x-5)/sqrt(5)
    a = out[out["g"] == "a"]["z"].to_numpy()
    exp = (np.array([2, 4, 6, 8]) - 5) / np.sqrt(5.0)
    assert np.allclose(a, exp, atol=1e-12)
    # zero variance (b) and singleton (c) -> NaN
    assert np.isnan(out[out["g"] == "b"]["z"]).all()
    assert np.isnan(out[out["g"] == "c"]["z"]).all()

    # big-int fallback: values past the int64-product guard stay exact
    big = pd.DataFrame({"g": ["z"] * 3, "x": [2**61, -(2**61), 0]}).astype(
        {"x": "int64"}
    )
    got = grouped_zscore(rd.from_pandas(big), ["g"], "x").to_pandas()
    zs = np.sort(got["z"].to_numpy())
    n, s1 = 3, 0
    d = n * (2 * (2**61) ** 2) - 0
    import math
    e = float(n * 2**61) / math.sqrt(float(d))
    assert np.allclose(zs, [-e, 0.0, e], rtol=0, atol=0)


def test_knn_self_join():
    from nerpii_ray.stages.similarity import knn_self_join

    # 2-D vectors with known geometry: 1 and 2 identical direction,
    # 3 orthogonal-ish, 4 opposite
    df = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "embedding": [
                [1.0, 0.0], [2.0, 0.0], [0.0, 1.0], [-1.0, 0.0],
            ],
        }
    )
    out = (
        knn_self_join(rd.from_pandas(df), k=2)
        .to_pandas().sort_values(["vec_id", "rank"]).reset_index(drop=True)
    )
    assert len(out) == 8
    # vec 1's nearest is 2 (cos 1), then 3 (cos 0)
    r1 = out[out["vec_id"] == 1]
    assert r1["nbr_id"].tolist() == [2, 3]
    assert abs(r1["cos_sim"].iloc[0] - 1.0) < 1e-9
    # vec 3 ties between 1,2 (cos 0) and 4 (cos 0): smaller ids win
    r3 = out[out["vec_id"] == 3]
    assert r3["nbr_id"].tolist() == [1, 2]
    # no self matches anywhere
    assert (out["vec_id"] != out["nbr_id"]).all()


def test_interval_union_length():
    from nerpii_ray.stages.window import interval_union_length

    df = pd.DataFrame(
        {
            # k1: [0,10) ∪ [5,20) merge -> 20; [30,35) separate -> 5
            # k2: touching [0,5) [5,9) merge -> 9 (one island)
            # k3: contained [0,100) ⊃ [10,20) -> 100
            # k4: zero-length [7,7) -> 0 covered, 1 island
            "k": [1, 1, 1, 2, 2, 3, 3, 4],
            "s_start": [0, 5, 30, 0, 5, 0, 10, 7],
            "s_end": [10, 20, 35, 5, 9, 100, 20, 7],
        }
    ).astype("int64")
    out = (
        interval_union_length(rd.from_pandas(df), ["k"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["covered"].tolist() == [25, 9, 100, 0]
    assert out["n_islands"].tolist() == [2, 1, 1, 1]


def test_grouped_mad():
    from nerpii_ray.stages.agg import grouped_mad

    # g=a values [1,2,4,100]: disc median (ceil(.5*4)=2nd) = 2;
    # devs [1,0,2,98] sorted [0,1,2,98] -> disc median = 1
    # g=b single value -> med=7, dev 0 -> mad 0
    df = pd.DataFrame(
        {"g": ["a", "a", "a", "a", "b"], "x": [1, 2, 4, 100, 7]}
    ).astype({"x": "int64"})
    out = (
        grouped_mad(rd.from_pandas(df).repartition(2), ["g"], "x")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert out["n"].tolist() == [4, 1]
    assert out["mad"].tolist() == [1, 0]


def test_asof_join_tolerance():
    from nerpii_ray.stages.joins import asof_join

    left = pd.DataFrame({"k": [1, 1, 1], "ts": [10, 50, 100]}).astype("int64")
    right = pd.DataFrame(
        {"k": [1, 1], "ts": [8, 90], "x": [80, 900]}
    ).astype("int64")
    # backward, tolerance 5: ts=10 matches 8 (gap 2); ts=50's nearest
    # prior is 8 (gap 42) -> rejected; ts=100 matches 90 (gap 10) -> rejected
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="k", ts="ts", tolerance=5)
        .to_pandas().sort_values("ts").reset_index(drop=True)
    )
    assert out["x"].fillna(-1).tolist() == [80.0, -1.0, -1.0]
    # nearest with tolerance: ts=50 nearest is 90 (gap 40) vs 8 (gap 42),
    # tolerance 41 admits only the forward one
    out2 = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="k", ts="ts", direction="nearest", tolerance=41)
        .to_pandas().sort_values("ts").reset_index(drop=True)
    )
    assert out2["x"].fillna(-1).tolist() == [80.0, 900.0, 900.0]


def test_debounce():
    from nerpii_ray.stages.window import debounce

    # k=1 at t 0,5,9,20: greedy gap 10 keeps 0 and 20 (5 and 9 are
    # within 10 of the KEPT anchor 0 — the LAG-vs-raw variant would
    # wrongly keep 20 only if measured against 9)
    df = pd.DataFrame(
        {"k": [1, 1, 1, 1, 2], "t": [0, 5, 9, 20, 3]}
    ).astype("int64")
    out = (
        debounce(rd.from_pandas(df), ["k"], "t", 10)
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    assert list(zip(out["k"], out["t"])) == [(1, 0), (1, 20), (2, 3)]
    # chain: 0,10,20 with gap 10 keeps all (>= comparison)
    df2 = pd.DataFrame({"k": [9] * 3, "t": [0, 10, 20]}).astype("int64")
    out2 = debounce(rd.from_pandas(df2), ["k"], "t", 10).to_pandas()
    assert sorted(out2["t"]) == [0, 10, 20]


def test_grouped_weighted_mean():
    from nerpii_ray.stages.agg import grouped_weighted_mean

    df = pd.DataFrame(
        {
            "g": ["a", "a", "b", "z"],
            "v": [10, 20, 7, 5],
            "w": [1, 3, 2, 0],
        }
    ).astype({"v": "int64", "w": "int64"})
    out = (
        grouped_weighted_mean(rd.from_pandas(df).repartition(2), ["g"], "v", "w")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert out["n"].tolist() == [2, 1, 1]
    assert out["wmean"].iloc[0] == 70.0 / 4.0
    assert out["wmean"].iloc[1] == 7.0
    assert np.isnan(out["wmean"].iloc[2])  # zero total weight

    # exactness past int64: w*v products beyond 2^63 stay exact
    big = pd.DataFrame(
        {"g": ["x"] * 2, "v": [2**40, 2**40], "w": [2**30, 2**30]}
    ).astype({"v": "int64", "w": "int64"})
    got = grouped_weighted_mean(rd.from_pandas(big), ["g"], "v", "w").to_pandas()
    assert got["wmean"].iloc[0] == float(2**40)


def test_kcore_crafted_and_cross_path():
    from nerpii_ray.stages.graph import kcore

    # K4 clique (0-3) with a pendant chain 3-4-5: the 2-core is the
    # clique plus nothing (4,5 peel off in two cascading rounds);
    # in-core degrees are the clique degrees
    edges = pd.DataFrame(
        {
            "u": [0, 0, 0, 1, 1, 2, 3, 4],
            "v": [1, 2, 3, 2, 3, 3, 4, 5],
        }
    ).astype("int64")
    got = (
        kcore(rd.from_pandas(edges), k=2)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert list(got["node"]) == [0, 1, 2, 3]
    assert list(got["deg"]) == [3, 3, 3, 3]

    # k higher than the densest core → empty result, schema intact on
    # the Dataset (Ray's to_pandas() drops columns of all-empty data)
    empty_ds = kcore(rd.from_pandas(edges), k=5)
    assert empty_ds.schema().names == ["node", "deg"]
    assert len(empty_ds.to_pandas()) == 0

    # cross-path equality on a random graph
    rng = np.random.RandomState(7)
    e = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.randint(0, 60, size=(400, 2))
            if a != b
        }
    )
    edf = pd.DataFrame(e, columns=["u", "v"]).astype("int64")
    small = (
        kcore(rd.from_pandas(edf), k=6, path="small")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    exch = (
        kcore(rd.from_pandas(edf), k=6, path="exchange")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert len(small) > 0  # the test graph must exercise a real peel
    pd.testing.assert_frame_equal(small, exch, check_dtype=False)


def test_grouped_bitops_crafted_and_forced_exchange():
    from nerpii_ray.stages import agg
    from nerpii_ray.stages.agg import grouped_bitops

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "mask": [0b0011, 0b0101, 0b1001, 0b1111, 0b0110, 0b1000],
        }
    ).astype("int64")
    want = {
        1: (0b1111, 0b0001, 0b1111),
        2: (0b1111, 0b0110, 0b1001),
        3: (0b1000, 0b1000, 0b1000),
    }

    def check(out: pd.DataFrame):
        got = {
            int(r.k): (int(r.bits_or), int(r.bits_and), int(r.bits_xor))
            for r in out.itertuples()
        }
        assert got == want

    ds = rd.from_pandas(df).repartition(3)  # merges must cross blocks
    check(grouped_bitops(ds, ["k"], "mask").to_pandas())

    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1  # read at call time → forces exchange
    try:
        check(grouped_bitops(ds, ["k"], "mask").to_pandas())
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old


def test_pack_token_blocks_crafted_and_forced_exchange():
    from nerpii_ray.stages import agg
    from nerpii_ray.stages.window import pack_token_blocks

    # ids deliberately non-dense and out of order across blocks
    df = pd.DataFrame(
        {
            "doc_id": [10, 3, 7, 21, 15, 4],
            "n_toks": [5, 3, 0, 4, 6, 2],
        }
    ).astype("int64")
    # layout order: 3(3), 4(2), 10(5), 15(6), 21(4); 7 drops (0 tokens)
    # capacity 4 → starts 0,3,5,10,16
    want = pd.DataFrame(
        {
            "doc_id": [3, 4, 10, 15, 21],
            "n_toks": [3, 2, 5, 6, 4],
            "start_tok": [0, 3, 5, 10, 16],
            "block_first": [0, 0, 1, 2, 4],
            "block_last": [0, 1, 2, 3, 4],
        }
    ).astype("int64")

    ds = rd.from_pandas(df).repartition(3)
    got = (
        pack_token_blocks(ds, "doc_id", "n_toks", capacity=4,
                          num_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    old = agg.ROOT_THRESHOLD_DEFAULT
    agg.ROOT_THRESHOLD_DEFAULT = 1
    try:
        got = (
            pack_token_blocks(ds, "doc_id", "n_toks", capacity=4,
                              num_buckets=4, path="exchange")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        agg.ROOT_THRESHOLD_DEFAULT = old

    # all-zero-token input → typed empty
    z = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "n_toks": [0, 0]}).astype("int64")
    )
    out_ds = pack_token_blocks(z, "doc_id", "n_toks", capacity=4)
    assert out_ds.schema().names == [
        "doc_id", "n_toks", "start_tok", "block_first", "block_last"
    ]
    assert len(out_ds.to_pandas()) == 0


def test_radius_search_matches_numpy():
    from nerpii_ray.stages.similarity import radius_search

    rng = np.random.RandomState(11)
    M = rng.randn(80, 16)
    q = rng.randn(16)
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(80, dtype=np.int64),
             "embedding": list(M)}
        )
    )
    got = radius_search(ds, q, threshold=0.1).to_pandas()
    # reference: the same fixed-point arithmetic in-process
    F = np.floor(M * (1 << 20)).astype(np.int64)
    qf = np.floor(q * (1 << 20)).astype(np.int64)
    cos = (F @ qf) / (
        np.sqrt((F * F).sum(axis=1).astype(float))
        * np.sqrt(float((qf * qf).sum()))
    )
    want_ids = set(np.flatnonzero(cos >= 0.1).astype(int))
    assert set(got["vec_id"].astype(int)) == want_ids
    assert 0 < len(want_ids) < 80
    got_map = dict(zip(got["vec_id"].astype(int), got["cos_sim"]))
    for i in want_ids:
        assert got_map[i] == pytest.approx(cos[i], abs=0)


def test_ppm_codec_roundtrip_and_reject():
    from nerpii_ray.stages.multimodal import decode_ppm, encode_ppm

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)

    # plain round trip
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    # comment line in the header must be skipped
    assert np.array_equal(
        decode_ppm(encode_ppm(rgb, comment="hello # nested")), rgb
    )
    # hand-built header with interleaved comments and whitespace runs
    raw = (b"P6\n#c1\n  7\t# mid\n5\n#c2\n255\n" + rgb.tobytes())
    assert np.array_equal(decode_ppm(raw), rgb)

    # rejects: wrong magic, 16-bit maxval, truncated raster
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\0" * 6)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + b"\0" * 10)


def test_decode_real_sniffs_ppm_payloads():
    import pyarrow as pa

    from nerpii_ray.stages.multimodal import DecodeReal, docs_to_ppm_blobs

    batch = pa.table({"doc_id": pa.array([0, 5, 11], pa.int64())})
    blobs = docs_to_ppm_blobs(batch)
    out = DecodeReal()(blobs).to_pandas()
    for _, r in out.iterrows():
        d = int(r["media_id"])
        w, h = 3 + d % 6, 2 + d % 5
        assert (r["width"], r["height"]) == (w, h)
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        for c, col in enumerate(["sum_r", "sum_g", "sum_b"]):
            assert int(r[col]) == int(
                ((d * 23 + x * 5 + y * 3 + c * 77) % 256).sum()
            )


def test_fk_integrity_audit_counts_orphans(tmp_path):
    """Crafted orphans on three edges: the bloom anti-join path must
    count them exactly (bloom false positives anti-verify away)."""
    from nerpii_ray.pipelines.queries import QUERIES

    sf = str(tmp_path)
    pd.DataFrame({"r_regionkey": [0, 1]}).to_parquet(f"{sf}/region.parquet")
    pd.DataFrame(
        {"n_nationkey": [0, 1, 2], "n_regionkey": [0, 1, 9]}  # 1 orphan
    ).to_parquet(f"{sf}/nation.parquet")
    pd.DataFrame(
        {"c_custkey": [10, 11], "c_nationkey": [0, 2]}
    ).to_parquet(f"{sf}/customer.parquet")
    pd.DataFrame(
        {"s_suppkey": [5], "s_nationkey": [7]}  # 1 orphan
    ).to_parquet(f"{sf}/supplier.parquet")
    pd.DataFrame({"p_partkey": [100, 101]}).to_parquet(f"{sf}/part.parquet")
    pd.DataFrame(
        {"o_orderkey": [1, 2, 3], "o_custkey": [10, 11, 99]}  # 1 orphan
    ).to_parquet(f"{sf}/orders.parquet")
    pd.DataFrame(
        {
            "l_orderkey": [1, 2, 4, 4],  # 2 orphans (orderkey 4)
            "l_partkey": [100, 101, 100, 999],  # 1 orphan
            "l_suppkey": [5, 5, 5, 5],  # 0 orphans
        }
    ).to_parquet(f"{sf}/lineitem.parquet")

    got = QUERIES["fk_integrity_audit"](sf).set_index("fk")
    exp = {
        "lineitem.l_orderkey -> orders.o_orderkey": (4, 2),
        "lineitem.l_partkey -> part.p_partkey": (4, 1),
        "lineitem.l_suppkey -> supplier.s_suppkey": (4, 0),
        "orders.o_custkey -> customer.c_custkey": (3, 1),
        "customer.c_nationkey -> nation.n_nationkey": (2, 0),
        "supplier.s_nationkey -> nation.n_nationkey": (1, 1),
        "nation.n_regionkey -> region.r_regionkey": (3, 1),
    }
    assert len(got) == len(exp)
    for fk, (n, v) in exp.items():
        assert (got.loc[fk, "fact_rows"], got.loc[fk, "violations"]) == (n, v)


def test_last_touch_direct_and_interleaving(tmp_path):
    """A purchase that OPENS a user's stream attributes to 'direct';
    interleaved users must not leak attribution across user boundaries
    (the shift is masked at user changes)."""
    from nerpii_ray.pipelines.queries import QUERIES

    sf = str(tmp_path)
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:01",
         "2024-01-01 00:00:02", "2024-01-01 00:00:03",
         "2024-01-01 00:00:00", "2024-01-01 00:00:05"]
    )
    # user 1: view -> purchase -> purchase (chained); user 2 opens with
    # a purchase at the same ts as user 1's view
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": ts,
            "event_type": ["view", "purchase", "purchase", "click",
                           "purchase", "purchase"],
        }
    ).to_parquet(f"{sf}/events.parquet")

    got = (
        QUERIES["events_last_touch"](sf)
        .to_pandas()
        .set_index("attributed")["purchases"]
    )
    assert got.to_dict() == {"view": 1, "purchase": 2, "direct": 1}


def test_cosine_pairs_posting_crafted(tmp_path):
    """Near-identical docs pair up; a doc shorter than one 3-gram
    contributes nothing; unrelated docs never become candidates (no
    shared shingle -> no pair, the inverted-index guarantee)."""
    from nerpii_ray.pipelines.queries import QUERIES

    sf = str(tmp_path)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                base,
                base + " iota",        # near-dup of 1
                "one two",              # < 3 tokens: no shingles
                "x y z w v u t s",      # disjoint vocabulary
            ],
        }
    ).to_parquet(f"{sf}/documents.parquet")

    got = QUERIES["doc_cosine_pairs_posting"](sf).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    # doc1: 6 shingles (all tf=1, n2=6); doc2: 7; shared dot = 6
    assert (r["doc_a"], r["doc_b"], r["dot"], r["na2"], r["nb2"]) == (
        1, 2, 6, 6, 7
    )
    assert r["dot"] ** 2 * 4 >= r["na2"] * r["nb2"]


def test_containment_catches_what_cosine_misses(tmp_path):
    """A short doc fully quoted inside a long one: containment = 1.0
    (pair emitted) while cosine < 0.5 (pair suppressed) — the
    asymmetric-dup case that motivates the second posting-family op."""
    from nerpii_ray.pipelines.queries import QUERIES

    quote = "alpha beta gamma delta epsilon"          # 3 shingles
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    pd.DataFrame(
        {"doc_id": [1, 2], "text": [quote, quote + " " + filler]}
    ).to_parquet(f"{tmp_path}/documents.parquet")

    cont = QUERIES["doc_containment_pairs"](str(tmp_path)).to_pandas()
    cos = QUERIES["doc_cosine_pairs_posting"](str(tmp_path)).to_pandas()
    assert len(cont) == 1 and len(cos) == 0
    r = cont.iloc[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["dot"] == r["na2"] == 3  # full containment of the quote


def test_locf_gap_fill_and_single_day_user(tmp_path):
    """Gap days carry the previous close; the daily close is the LAST
    event of the day (ts, event_id order); a single-day user emits
    exactly one spine row."""
    from nerpii_ray.pipelines.queries import QUERIES

    ts = pd.to_datetime(
        ["2024-01-01 09:00", "2024-01-01 17:00",   # day 1: close 2.0
         "2024-01-04 12:00",                        # 2-day gap, then 5.0
         "2024-02-01 00:00"]                        # user 2, one day
    )
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 2],
            "ts": ts,
            "value": [1.0, 2.0, 5.0, 9.0],
        }
    ).to_parquet(f"{tmp_path}/events.parquet")

    got = (
        QUERIES["events_value_locf"](str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "day_epoch"])
        .reset_index(drop=True)
    )
    assert got["cents"].tolist() == [200, 200, 200, 500, 900]
    assert len(got[got["user_id"] == 1]) == 4  # Jan 1..4 spine
    assert len(got[got["user_id"] == 2]) == 1


def test_mannwhitney_identity_and_ties(tmp_path):
    """U_A + U_B = n_A * n_B (in doubled units: u2_a + u2_b =
    2*n_a*n_b), and tie-averaged ranks are exact: all-equal samples
    give U_A = n_A*n_B/2 on the nose."""
    from nerpii_ray.pipelines.queries import QUERIES

    ts = pd.to_datetime(["2024-01-01"] * 6)
    # users 0,2 -> A (n=3 values), users 1,3 -> B (n=3); all values tie
    pd.DataFrame(
        {
            "event_id": range(6),
            "user_id": [0, 2, 0, 1, 3, 1],
            "ts": ts,
            "value": [5.0] * 6,
        }
    ).to_parquet(f"{tmp_path}/events.parquet")

    r = QUERIES["events_mannwhitney_u"](str(tmp_path)).iloc[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]
    assert r["u2_a"] == r["n_a"] * r["n_b"]  # all-tied: U = n_a*n_b/2


def test_ks_disjoint_samples_hit_dmax(tmp_path):
    """Fully separated distributions give D = 1: d_num == n_a * n_b."""
    from nerpii_ray.pipelines.queries import QUERIES

    ts = pd.to_datetime(["2024-01-01"] * 6)
    # A users (even ids) all below B users (odd ids)
    pd.DataFrame(
        {
            "event_id": range(6),
            "user_id": [0, 2, 4, 1, 3, 5],
            "ts": ts,
            "value": [1.0, 2.0, 3.0, 10.0, 11.0, 12.0],
        }
    ).to_parquet(f"{tmp_path}/events.parquet")

    r = QUERIES["events_ks_statistic"](str(tmp_path)).iloc[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["d_num"] == r["n_a"] * r["n_b"]


def test_lagged_pairs():
    from nerpii_ray.stages.window import lagged_pairs

    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2, 3],
            "o": [10, 20, 30, 5, 6, 1],
            "x": [7, 9, 11, 100, 200, 5],
        }
    ).astype("int64")
    out = (
        lagged_pairs(rd.from_pandas(df), ["u"], ["o"], "x", lag=1)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    # pairs never bridge users; singletons emit nothing
    assert list(map(tuple, out[["a", "b"]].to_numpy())) == [
        (7, 9), (9, 11), (100, 200),
    ]
    # lag=2 within u1 only
    out2 = (
        lagged_pairs(rd.from_pandas(df), ["u"], ["o"], "x", lag=2)
        .to_pandas()
    )
    assert list(map(tuple, out2[["a", "b"]].to_numpy())) == [(7, 11)]


def test_cusum_max():
    from nerpii_ray.stages.window import cusum_max

    # u1 constant series -> deviation 0; u2 level shift -> big score
    df = pd.DataFrame(
        {
            "u": [1] * 4 + [2] * 6,
            "o": list(range(4)) + list(range(6)),
            "x": [5, 5, 5, 5] + [0, 0, 0, 10, 10, 10],
        }
    ).astype("int64")
    out = (
        cusum_max(rd.from_pandas(df), ["u"], ["o"], "x")
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    assert out["n"].tolist() == [4, 6]
    assert out["cusum_max"].tolist()[0] == 0
    # u2: S=30, n=6; at i=3 cum=0 -> |6*0 - 3*30| = 90 (the max)
    assert out["cusum_max"].tolist()[1] == 90

    # brute-force parity on a pseudo-random series
    rng = np.random.RandomState(7)
    xs = rng.randint(-50, 50, size=37)
    df2 = pd.DataFrame(
        {"u": np.int64(9), "o": np.arange(37), "x": xs}
    ).astype("int64")
    out2 = cusum_max(rd.from_pandas(df2), ["u"], ["o"], "x").to_pandas()
    n, s = 37, int(xs.sum())
    want = max(
        abs(n * int(xs[: i + 1].sum()) - (i + 1) * s) for i in range(n)
    )
    assert out2["cusum_max"].tolist() == [want]


def test_sequence_ngrams():
    from nerpii_ray.stages.window import sequence_ngrams

    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2, 2, 2, 3],
            "o": [1, 2, 3, 4, 1, 2, 3, 1],
            "t": ["a", "b", "a", "b", "a", "b", "a", "a"],
        }
    )
    df["u"] = df["u"].astype("int64")
    df["o"] = df["o"].astype("int64")
    out = (
        sequence_ngrams(rd.from_pandas(df), ["u"], ["o"], "t", n=3)
        .to_pandas().sort_values(["t1", "t2", "t3"]).reset_index(drop=True)
    )
    # u1: aba, bab; u2: aba; u3 too short -> aba:2, bab:1
    assert list(map(tuple, out.to_numpy())) == [
        ("a", "b", "a", 2), ("b", "a", "b", 1),
    ]

    # bigrams across the same fixture
    out2 = (
        sequence_ngrams(rd.from_pandas(df), ["u"], ["o"], "t", n=2)
        .to_pandas().sort_values(["t1", "t2"]).reset_index(drop=True)
    )
    assert list(map(tuple, out2.to_numpy())) == [
        ("a", "b", 3), ("b", "a", 2),
    ]


def test_hits_fp_paths_and_values():
    from nerpii_ray.stages.graph import hits_fp

    # tiny directed graph: 1->3, 2->3, 3->4 (3 is the authority for
    # {1,2}, and also the best hub via 4)
    e = pd.DataFrame({"src": ["1", "2", "3"], "dst": ["3", "3", "4"]})
    small = (
        hits_fp(rd.from_pandas(e), path="small")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    # a1 = indeg: 3->2, 4->1; h1(u)=sum a1 over outs: 1->2, 2->2, 3->1
    # a2(v)=sum h1 over ins: 3->4, 4->1; h2(u)=sum a2 over outs:
    # 1->4, 2->4, 3->1
    assert small["node"].tolist() == ["1", "2", "3", "4"]
    assert small["authority_fp"].tolist() == [0, 0, 4, 1]
    assert small["hub_fp"].tolist() == [4, 4, 1, 0]

    ex = (
        hits_fp(rd.from_pandas(e), path="exchange")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, ex)


def test_cms_registers_estimate():
    from nerpii_ray.stages.agg import cms_estimate, cms_registers

    rng = np.random.RandomState(11)
    keys = rng.zipf(1.7, size=2000) % 97
    df = pd.DataFrame({"k": keys.astype("int64")})
    regs = cms_registers(rd.from_pandas(df), "k").to_pandas()
    # each lane's registers partition all occurrences
    per_lane = regs.groupby("lane")["cnt"].sum()
    assert (per_lane == len(df)).all()
    # CMS never undercounts; on this small domain the top key is exact
    # or near-exact
    true = pd.Series(keys).value_counts()
    for k in true.index[:5]:
        est = cms_estimate(regs, int(k))
        assert est >= true[k]


def test_quota_topk_filter_matches_groupby_head():
    """quota_topk_filter == pandas groupby-head oracle, with the input
    split across blocks so the per-part top-k tree genuinely merges;
    covers sub-k groups (kept whole) and exact-k boundaries."""
    import numpy as np
    import ray.data as rd

    from nerpii_ray.stages.agg import quota_topk_filter

    rng = np.random.RandomState(7)
    n = 500
    df = pd.DataFrame(
        {
            "key": rng.choice(["a", "b", "c", "d", "tiny"], n,
                              p=[0.3, 0.3, 0.2, 0.19, 0.01]),
            "h": [f"{v:08x}" for v in rng.randint(0, 2**31, n)],
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    k = 7
    got = (
        quota_topk_filter(rd.from_pandas(df).repartition(8), "key",
                          ["h", "rid"], k=k)
        .to_pandas()
        .sort_values(["key", "h", "rid"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["key", "h", "rid"])
        .groupby("key", sort=False)
        .head(k)
        .sort_values(["key", "h", "rid"])
        .reset_index(drop=True)[["key", "h", "rid"]]
    )
    pd.testing.assert_frame_equal(got, want)
    # sub-k group survives intact
    assert (got["key"] == "tiny").sum() == (df["key"] == "tiny").sum()


def test_transcript_ts_inversions_detects_crafted_skew(monkeypatch):
    """The corpus' clocks are monotone by construction, so the
    registered query is empty on testdata — pin the detection path on
    a crafted conversation whose ts runs backward mid-dialogue."""
    import ray.data as rd

    from nerpii_ray.pipelines import queries as q

    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    df = pd.DataFrame(
        {
            "conv_id": ["a"] * 4 + ["b"] * 3,
            "turn_idx": [0, 1, 2, 3, 0, 1, 2],
            # conv a: one inversion (t2 < t1); conv b: monotone
            "ts": pd.to_datetime(
                np.array(
                    [base, base + 10_000_000, base + 5_000_000,
                     base + 20_000_000,
                     base, base + 1_000_000, base + 2_000_000],
                    dtype="int64",
                ),
                unit="us",
            ),
        }
    )
    monkeypatch.setattr(
        q, "_turns_ds",
        lambda sf_dir, columns=None: rd.from_pandas(df[columns or df.columns]),
    )
    out = q.QUERIES["transcript_ts_inversions"]("/ignored")
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(out) == 1
    row = out.iloc[0]
    assert row["conv_id"] == "a"
    assert row["n_turns"] == 4
    assert row["n_inversions"] == 1
