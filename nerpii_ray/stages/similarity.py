"""Similarity search over an embedding column (list<float>).

* brute_force_topk — the exact baseline: the query matrix is broadcast
  once as an actor-pool constructor argument (Ray stores ctor args in the
  object store once; each actor deserializes them a single time in
  ``__init__`` — never per batch).  Each batch does ONE float matmul and
  emits its local top-k per query; a tiny groupby merge produces the
  global top-k.  Shuffle volume is O(k × batches × queries), never
  O(rows).  (A bare ``ray.put`` ref inside ``fn_constructor_kwargs``
  deadlocks restartable actor pools — Ray issue 53727 — hence args by
  value.)
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
            return df
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

    return tree_aggregate(local_ds, merge, merge, final_fn=finalize)


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency=(1, 4),
    batch_size: int = 4096,
):
    """Exact cosine top-k for each query row.  Returns
    (q_id, <id_col>, cos_sim, rank), ties broken by id."""
    local = ds.map_batches(
        _BruteForceScorer,
        fn_constructor_kwargs=dict(
            queries_ref=np.asarray(queries, dtype=np.float64), k=k,
            vec_col=vec_col, id_col=id_col,
        ),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
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
    concurrency=(1, 4),
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
        _IVFScorer,
        fn_constructor_kwargs=dict(
            queries_ref=np.asarray(queries, dtype=np.float64), codebook_ref=cb,
            k=k, nprobe=nprobe, vec_col=vec_col, id_col=id_col,
        ),
        batch_format="pandas",
        concurrency=concurrency,
    )
    return _topk_tree(local, k, id_col)
