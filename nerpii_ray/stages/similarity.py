"""Similarity search over an embedding column (list<float>).

* brute_force_topk — the exact baseline: a task-pool ``map_batches``
  whose per-worker-process scorer cache (_SCORER_CACHE) normalizes the
  query matrix once per worker — setup-once semantics without actor
  spin-up, and the kilobyte query payload rides ``fn_kwargs`` (one
  object-store entry, shared by every task).  Each batch does ONE float
  matmul and emits its local top-k per query; a tiny root merge produces
  the global top-k.  Shuffle volume is O(k × batches × queries), never
  O(rows).  (The earlier actor-pool form hit Ray issue 53727 with
  by-ref ctor args; by-value + worker cache sidesteps it entirely.)
* ivf_topk — the scale path: a sampled k-means codebook (built once on
  the driver from a small sample), batches prune to rows whose nearest
  centroid is in the query's probe list, then the same local-top-k merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _typed_empty(id_col: str, id_dtype="int64") -> pd.DataFrame:
    """Column- and dtype-stable empty result frame.  A bare
    ``pd.DataFrame()`` (or list-built object columns) makes the operator
    emit blocks with a DIFFERENT schema than its non-empty ones — Ray's
    streaming executor warns ('RefBundle with a different schema') and
    schema-unstable blocks break operator fusing on some Ray versions."""
    return pd.DataFrame(
        {"q_id": pd.Series(dtype="int64"), id_col: pd.Series(dtype=id_dtype),
         "cos_sim": pd.Series(dtype="float64")}
    )


class _BruteForceScorer:
    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        self.q = _normalize(np.asarray(queries_ref, dtype=np.float64))
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _typed_empty(self.id_col)
        m = _normalize(
            np.stack([np.asarray(v, dtype=np.float64) for v in batch[self.vec_col]])
        )
        sims = m @ self.q.T  # (rows × queries)
        ids = batch[self.id_col].to_numpy()
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            top = np.argpartition(-sims[:, qi], k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[top])
            out_sim.extend(sims[top, qi])
        return pd.DataFrame(
            {"q_id": np.asarray(out_q, dtype="int64"),
             self.id_col: np.asarray(out_id, dtype=ids.dtype),
             "cos_sim": np.asarray(out_sim, dtype="float64")}
        )


def _topk_tree(local_ds, k: int, id_col: str):
    """Merge per-batch local top-k into the global top-k per query via the
    tree (stages/agg.py): each level keeps ≤k rows per query."""
    from nerpii_ray.stages.agg import tree_aggregate

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            # repartition pads with COLUMN-LESS empty blocks; passing one
            # through re-emits a names=[] schema and trips the streaming
            # executor's schema-stability warning — substitute the typed
            # empty frame (schema-stable blocks also keep operator fusing)
            return df if len(df.columns) else _typed_empty(id_col)
        return (
            df.sort_values(["cos_sim", id_col], ascending=[False, True])
            .groupby("q_id", sort=False)
            .head(k)
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["q_id", "cos_sim", id_col], ascending=[True, False, True])
        df = df.copy()
        df["rank"] = df.groupby("q_id", sort=False).cumcount() + 1
        df["cos_sim"] = np.round(df["cos_sim"], 6)
        return df.reset_index(drop=True)

    # levels=(1,): the map stage IS the first tree level here — every
    # scorer task already cut its output to ≤ k rows per query, so the
    # root merges batches × k × queries rows (k≈10: small until ~10^5
    # blocks; pass deeper levels from the caller beyond that).  A 16-way
    # pre-level would pad the tiny input with empty schema-less blocks
    # (Ray repartition) and cost an extra shuffle round for nothing.
    return tree_aggregate(local_ds, merge, merge, levels=(1,), final_fn=finalize)


#: per-worker-process scorer cache (see stages/dedup.py _MH_CACHE for the
#: pattern): scorer construction normalizes the query matrix / computes
#: probe lists once per worker, tasks reuse Ray's prestarted workers with
#: zero actor spin-up, and the query/codebook payloads are kilobytes —
#: cheap to ship in fn_kwargs (the object store dedups the ref per task
#: anyway).  State is a pure memo, so tasks stay idempotent.
from collections import OrderedDict

_SCORER_CACHE: "OrderedDict" = OrderedDict()

#: LRU bound — scorers hold normalized query/codebook matrices; evict by
#: recency so a hot scorer survives bursts of one-off constructions
_SCORER_MAX = 32


def _cached_scorer(cls, **kwargs):
    key = (cls.__name__,) + tuple(
        (k, v.tobytes() if isinstance(v, np.ndarray) else v)
        for k, v in sorted(kwargs.items())
    )
    sc = _SCORER_CACHE.get(key)
    if sc is None:
        if len(_SCORER_CACHE) >= _SCORER_MAX:
            _SCORER_CACHE.popitem(last=False)
        sc = _SCORER_CACHE.setdefault(key, cls(**kwargs))
    else:
        _SCORER_CACHE.move_to_end(key)
    return sc


def _brute_force_batch(batch: pd.DataFrame, **kwargs) -> pd.DataFrame:
    return _cached_scorer(_BruteForceScorer, **kwargs)(batch)


def _ivf_batch(batch: pd.DataFrame, **kwargs) -> pd.DataFrame:
    return _cached_scorer(_IVFScorer, **kwargs)(batch)


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
):
    """Exact cosine top-k for each query row.  Returns
    (q_id, <id_col>, cos_sim, rank), ties broken by id."""
    local = ds.map_batches(
        _brute_force_batch,
        fn_kwargs=dict(
            queries_ref=np.asarray(queries, dtype=np.float64), k=k,
            vec_col=vec_col, id_col=id_col,
        ),
        batch_format="pandas",
        batch_size=batch_size,
    )
    return _topk_tree(local, k, id_col)


# ----------------------------------------------------------------- IVF
def train_codebook(sample: np.ndarray, nlist: int, iters: int = 8, seed: int = 13) -> np.ndarray:
    """Small k-means (k-means++-ish init + Lloyd) on a driver-side sample."""
    rng = np.random.RandomState(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    centroids = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class _IVFScorer:
    def __init__(self, queries_ref, codebook_ref, k, nprobe, vec_col, id_col):
        self.q = _normalize(np.asarray(queries_ref, dtype=np.float64))
        self.cb = np.asarray(codebook_ref, dtype=np.float64)
        # per query: the nprobe closest centroids (sorted arrays: the
        # per-batch membership test is a vectorized np.isin, not a
        # Python set-containment loop over every row)
        qc = self.q @ self.cb.T
        self.probes = [np.sort(np.argsort(-qc[i])[:nprobe]) for i in range(len(self.q))]
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _typed_empty(self.id_col)
        m = _normalize(
            np.stack([np.asarray(v, dtype=np.float64) for v in batch[self.vec_col]])
        )
        ids = batch[self.id_col].to_numpy()
        cells = (m @ self.cb.T).argmax(axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(self.q)):
            mask = np.isin(cells, self.probes[qi])
            if not mask.any():
                continue
            sims = m[mask] @ self.q[qi]
            sel_ids = ids[mask]
            k = min(self.k, len(sel_ids))
            top = np.argpartition(-sims, k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(sel_ids[top])
            out_sim.extend(sims[top])
        if not out_q:
            return _typed_empty(self.id_col, ids.dtype)
        return pd.DataFrame(
            {"q_id": np.asarray(out_q, dtype="int64"),
             self.id_col: np.asarray(out_id, dtype=ids.dtype),
             "cos_sim": np.asarray(out_sim, dtype="float64")}
        )


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
):
    """Approximate top-k: IVF cell pruning (codebook from a sample) then
    exact rescoring inside probed cells.  Recall measured against
    brute_force_topk in tests.

    The training sample is a seeded ``random_sample`` across the whole
    dataset — ``limit(n)`` would take only the first file(s), and a
    codebook trained on one shard's distribution prunes the rest badly.
    """
    n = ds.count()
    frac = min(1.0, sample_rows / max(1, n))
    sampled = ds.random_sample(frac, seed=13).to_pandas()
    if len(sampled) == 0:  # degenerate tiny input
        sampled = ds.limit(sample_rows).to_pandas()
    sample = np.stack([np.asarray(v, dtype=np.float64) for v in sampled[vec_col]])
    cb = train_codebook(sample, nlist)
    local = ds.map_batches(
        _ivf_batch,
        fn_kwargs=dict(
            queries_ref=np.asarray(queries, dtype=np.float64), codebook_ref=cb,
            k=k, nprobe=nprobe, vec_col=vec_col, id_col=id_col,
        ),
        batch_format="pandas",
    )
    return _topk_tree(local, k, id_col)


def _assign_batch(b: pd.DataFrame, *, cents, vec_col, id_col) -> pd.DataFrame:
    """Nearest-centroid assignment for one batch: squared-L2 in float64,
    ties → smallest cluster index (argmin picks the first minimum — the
    same rule the SQL twin's ORDER BY dist, cluster encodes)."""
    import ray

    c = _KM_CACHE.get(cents.hex()) if isinstance(cents, ray.ObjectRef) else cents
    if c is None:
        if len(_KM_CACHE) >= 8:
            _KM_CACHE.pop(next(iter(_KM_CACHE)))
        c = _KM_CACHE.setdefault(cents.hex(), ray.get(cents))
    x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
    # direct (x-c)² per centroid (k vectorized passes, no n×k×d blob):
    # float32 differences are EXACT in float64 and their squares fit 50
    # bits, so this mirrors the SQL twin's list_distance arithmetic —
    # the expanded x·x-2x·c+c·c form rounds differently and can flip
    # near-tie argmins against the oracle
    d2 = np.empty((len(x), len(c)), dtype=np.float64)
    for j in range(len(c)):
        d2[:, j] = ((x - c[j]) ** 2).sum(axis=1)
    return pd.DataFrame(
        {
            id_col: b[id_col].astype("int64"),
            "cluster": np.argmin(d2, axis=1).astype("int64"),
        }
    )


_KM_CACHE: dict = {}


def kmeans(
    emb_ds,
    k: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Distributed Lloyd's k-means over an embedding column.

    Deterministic by construction: initial centroids are the ``k``
    vectors with the SMALLEST ids (found via a k-smallest merge tree, no
    driver scan), each iteration broadcasts the k×d centroid matrix
    (``ray.put`` once, per-worker cache) and runs one vectorized
    assignment + per-cluster partial vector sums through the bounded-key
    tree — the shuffle carries k rows per batch (cluster, Σvec, n),
    never points.  The driver touches only k×d floats per iteration.

    Returns ``(assignments_ds, centroids)``: a Dataset of
    ``(id, cluster)`` from the FINAL assignment pass and the final
    numpy centroid matrix.  At 100 TB each iteration is one streaming
    pass; the cross-iteration state is kilobytes.
    """
    import ray

    from nerpii_ray.stages.agg import tree_aggregate

    def k_smallest(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col, kind="stable").head(k)

    def pick_cols(b: pd.DataFrame) -> pd.DataFrame:
        return k_smallest(b[[id_col, vec_col]])

    init = tree_aggregate(emb_ds, pick_cols, k_smallest).to_pandas()
    cents = np.stack(init.sort_values(id_col)[vec_col].to_numpy()).astype(
        np.float64
    )

    def partial_sums(b: pd.DataFrame, *, cents) -> pd.DataFrame:
        a = _assign_batch(b, cents=cents, vec_col=vec_col, id_col=id_col)
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        out = []
        for cl in np.unique(a["cluster"].to_numpy()):
            m = (a["cluster"] == cl).to_numpy()
            out.append((int(cl), x[m].sum(axis=0), int(m.sum())))
        return pd.DataFrame(
            {"cluster": [o[0] for o in out],
             "vsum": [o[1] for o in out],
             "n": [o[2] for o in out]}
        )

    def merge_sums(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        g = df.groupby("cluster", sort=True, observed=True)
        return pd.DataFrame(
            {"cluster": list(g.groups),
             "vsum": [np.sum(np.stack(s.to_numpy()), axis=0)
                      for _, s in g["vsum"]],
             "n": g["n"].sum().to_numpy()}
        )

    for _ in range(n_iter):
        ref = ray.put(cents)
        sums = tree_aggregate(
            emb_ds,
            lambda b, _r=ref: partial_sums(b, cents=_r),
            merge_sums,
        ).to_pandas()  # k rows — groups-sized by construction
        new = cents.copy()
        for cl, vs, n in zip(sums["cluster"], sums["vsum"], sums["n"]):
            if n > 0:
                new[int(cl)] = np.asarray(vs, dtype=np.float64) / n
        if np.allclose(new, cents, rtol=0, atol=0):
            cents = new
            break
        cents = new

    ref = ray.put(cents)
    assigned = emb_ds.map_batches(
        _assign_batch,
        fn_kwargs=dict(cents=ref, vec_col=vec_col, id_col=id_col),
        batch_format="pandas",
    )
    return assigned, cents


def knn_self_join(
    ds,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1 << 20,
):
    """Exact k-nearest-neighbor SELF-join by cosine: for every vector,
    its top-``k`` most similar OTHER vectors, ties to the smaller
    neighbor id.  The srp_dup_pairs exactness discipline makes it
    hash-oracle-able: vectors fixed-point as ``floor(v·2^20)`` int64,
    Gram products exact in int64, and the one double division
    ``dot/(√nn_a·√nn_b)`` last — the SQL twin replays the identical
    arithmetic, so even the tie ORDER is bit-stable.

    Physical plan: the fixed-point matrix broadcasts ONCE (``ray.put``,
    read per task — never re-shipped per batch) and each batch runs one
    integer matmul against it: exact all-pairs scoring streams the
    probe side and never shuffles.  Contract: the corpus-sized build
    side must fit a worker heap — this is the exact small-corpus /
    rerank-stage form; past that, bucket by IVF cell
    (``ivf_topk``-style: score only within probed cells) and accept
    approximate recall.  Output: (id_col, nbr_id, cos_sim, rank).
    """
    import ray

    mat = ds.to_pandas()
    ids = mat[id_col].to_numpy(np.int64)
    F = np.floor(
        np.stack(
            [np.asarray(v, dtype=np.float64) for v in mat[vec_col]]
        ) * scale
    ).astype(np.int64)
    order = np.argsort(ids)
    ids, F = ids[order], F[order]
    nn = (F * F).sum(axis=1)
    ref = ray.put((ids, F, nn))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        aids, AF, ann = ray.get(ref)
        bids = b[id_col].to_numpy(np.int64)
        BF = np.floor(
            np.stack(
                [np.asarray(v, dtype=np.float64) for v in b[vec_col]]
            ) * scale
        ).astype(np.int64)
        bnn = (BF * BF).sum(axis=1)
        G = (BF @ AF.T).astype(np.float64)
        cos = G / (np.sqrt(bnn.astype(np.float64))[:, None]
                   * np.sqrt(ann.astype(np.float64))[None, :])
        cos[bids[:, None] == aids[None, :]] = -np.inf  # exclude self
        outq, outn, outc, outr = [], [], [], []
        for r in range(len(bids)):
            # top-k by (cos desc, id asc): lexsort is ascending, so
            # negate cos; aids is already ascending for the tiebreak
            ordr = np.lexsort((aids, -cos[r]))[:k]
            outq.extend([bids[r]] * len(ordr))
            outn.extend(aids[ordr])
            outc.extend(cos[r][ordr])
            outr.extend(range(1, len(ordr) + 1))
        return pd.DataFrame(
            {
                id_col: pd.Series(outq, dtype="int64"),
                "nbr_id": pd.Series(outn, dtype="int64"),
                "cos_sim": pd.Series(outc, dtype="float64"),
                "rank": pd.Series(outr, dtype="int64"),
            }
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=4096)


def power_iteration_top_component(
    ds,
    vec_col: str = "embedding",
    scale: int = 1000,
    iters: int = 2,
):
    """Dominant singular direction of the (uncentered) embedding matrix
    by FIXED-POINT power iteration — the spectral sibling of
    pagerank_fp (stages/graph.py): float matvecs are merge-order-
    dependent and could never hash-match an oracle, so the operator is
    DEFINED in exact integer arithmetic.

    Components quantize to ``round(e * scale)`` ints.  Each iteration
    is ONE streaming pass: every batch computes its rows' projections
    u = E v inline (int64 matmul against the broadcast 64-int vector)
    and emits a d-row partial of w = Eᵀ u as PYTHON ints; partials
    merge through the tree with object-int sums (the moments-op
    overflow discipline), and the driver rescales v ← trunc-div(w ·
    scale, max|w|) — TRUNCATING division, matching DuckDB's ``//``.
    Driver state is d ints per iteration; nothing data-sized leaves
    the tree.  The sign is canonicalized so the largest-|component|
    dimension (smallest index on ties) is positive.
    """
    from nerpii_ray.stages.agg import tree_aggregate

    first = ds.take(1)
    if not first:
        return pd.DataFrame(
            {"dim": pd.Series(dtype="int64"),
             "comp": pd.Series(dtype="int64")}
        )
    d = len(first[0][vec_col])
    v = [scale] * d  # v0: every component = 1.0 in fixed point

    def trunc_div(a: int, b: int) -> int:
        # DuckDB // truncates toward zero; Python floors — match DuckDB
        return -((-a) // b) if a < 0 else a // b

    for _ in range(iters):
        def partial(b: pd.DataFrame, v_now=tuple(v)) -> pd.DataFrame:
            E = np.stack(
                [np.asarray(x, dtype=np.float64) for x in b[vec_col]]
            )
            Q = np.round(E * scale).astype(np.int64)
            u = Q @ np.asarray(v_now, dtype=np.int64)
            w = Q.T @ u  # int64-safe per batch; object ints for merge
            return pd.DataFrame(
                {
                    "dim": np.arange(1, d + 1, dtype=np.int64),
                    "w": pd.Series([int(x) for x in w], dtype=object),
                }
            )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            return (
                df.groupby("dim", as_index=False)["w"]
                .agg(lambda s: sum(int(x) for x in s))
            )

        wt = tree_aggregate(ds, partial, merge).to_pandas()
        wt = wt.sort_values("dim")
        w = [int(x) for x in wt["w"]]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [trunc_div(x * scale, m) for x in w]

    j = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[j] < 0:
        v = [-x for x in v]
    return pd.DataFrame(
        {
            "dim": pd.Series(range(1, d + 1), dtype="int64"),
            "comp": pd.Series(v, dtype="int64"),
        }
    )


def radius_search(
    ds,
    query_vec,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1 << 20,
):
    """Range / radius similarity search: every vector whose cosine
    similarity to ONE broadcast query vector is ≥ ``threshold`` — the
    retrieval primitive dual to top-k (``brute_force_topk``): k-NN cuts
    by rank, radius search cuts by score (dedup gates, recall-oriented
    candidate generation).

    The ``knn_self_join`` exactness discipline: both sides fixed-point
    as ``floor(v·2^20)`` int64, dot products exact in int64, ONE double
    division last, so the ≥ comparison — and therefore the result SET —
    is bit-stable and SQL-replayable.  The query vector ships via
    ``ray.put`` once (never per batch); scoring streams the corpus with
    one integer matvec per batch and never shuffles — output is
    result-sized.  Output: (id_col, cos_sim) for matches.
    """
    import ray

    q = np.floor(
        np.asarray(query_vec, dtype=np.float64) * scale
    ).astype(np.int64)
    qnn = float(np.sqrt(float((q * q).sum())))
    ref = ray.put(q)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(ref)
        if not len(b):
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "cos_sim": pd.Series(dtype="float64")}
            )
        F = np.floor(
            np.stack(
                [np.asarray(v, dtype=np.float64) for v in b[vec_col]]
            ) * scale
        ).astype(np.int64)
        nn = (F * F).sum(axis=1)
        cos = (F @ qv).astype(np.float64) / (
            np.sqrt(nn.astype(np.float64)) * qnn
        )
        keep = cos >= threshold
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64)[keep],
                "cos_sim": cos[keep],
            }
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=4096)
