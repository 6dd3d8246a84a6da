"""Graph analytics over the constructed knowledge graph.

The reference stops at emitting entity assignments (its "graph" is the
per-column dict, ``named_entity_recognizer.py:317``); an engine that
BUILDS a graph at 10^12-turn scale also needs to analyze it.  Alongside
``dedup.connected_components`` (component structure), this module holds
the iterative value-propagation family, starting with PageRank.

Design rule for iterative float algorithms on Datasets: floating-point
sums are merge-order-dependent, so a classic double-precision PageRank
can never hash-match an oracle.  ``pagerank_fp`` therefore runs in
INTEGER FIXED-POINT (rank mass scaled to 10^12, floor division
everywhere): integer sums are order-independent, the result is
bit-identical on any partitioning, and the SQL twin replays the exact
same arithmetic — the same discipline as ``agg.grouped_moments``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank_fp(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000_000_000,
    damp_pct: int = 85,
    path: str = "auto",
):
    """Fixed-iteration PageRank over a directed edge list, in integer
    fixed-point.

    Per node: ``r_0 = scale // N``; per iteration
    ``r'(v) = ((100−damp) · (scale // N)) // 100
    + (damp · Σ_{u→v} (r(u) // outdeg(u))) // 100``.  Dangling mass
    (sink nodes, ``outdeg = 0``) leaks, as in the plain power-iteration
    formulation — stated, deterministic, and replayed identically by
    the SQL twin.

    Physical plan per iteration (nothing driver-sized except N):
    one keyed-exchange hash join (current ranks onto the
    degree-annotated edges, key-complete buckets) and one combiner-tree
    grouped sum of contributions unioned with a zero row per node (so
    in-degree-0 nodes keep the base term without a second join).  The
    degree-annotated edge table is materialized once and reused by
    every iteration.  All arithmetic is int64 (rank mass ≤ scale, and
    ``damp · Σ ≤ 100·scale`` fits comfortably).

    ``path`` picks the physical plan, cardinality-aware like every root
    in this engine (the node/edge tables are the AGGREGATED mention
    graph — output-sized, orders below the corpus):
    * ``"small"`` / ``"auto"``-under-threshold — ONE task runs the whole
      iteration loop over the edge frame (a 3-iteration loop over a
      block-sized graph is milliseconds of numpy; the distributed form
      pays ~16 fixed-cost dataset executions for the same answer);
    * ``"exchange"`` / ``"auto"``-past-threshold — the distributed
      iterative plan described above, ranks never on one node.
    Both paths compute the identical integer arithmetic (pinned by a
    cross-path equality test).

    Returns a Dataset ``(node, pagerank_fp:int64)``.
    """
    from nerpii_ray.stages.agg import (
        ROOT_THRESHOLD_DEFAULT,
        grouped_sum,
        tree_dedup,
    )
    from nerpii_ray.stages.joins import partitioned_hash_join

    e = edges_ds.materialize()
    if path == "auto":
        path = "small" if e.count() <= ROOT_THRESHOLD_DEFAULT else "exchange"
    if path == "small":

        def whole_graph_kernel(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {"node": pd.Series(dtype="object"),
                     "pagerank_fp": pd.Series(dtype="int64")}
                )
            src = df[src_col].to_numpy()
            dst = df[dst_col].to_numpy()
            nodes, codes = np.unique(
                np.concatenate([src, dst]), return_inverse=True
            )
            s_idx, d_idx = codes[: len(src)], codes[len(src):]
            n = len(nodes)
            base = scale // n
            outdeg = np.bincount(s_idx, minlength=n)
            r = np.full(n, base, dtype=np.int64)
            keep_term = ((100 - damp_pct) * base) // 100
            for _ in range(iters):
                per_edge = r[s_idx] // outdeg[s_idx]
                s = np.zeros(n, dtype=np.int64)
                np.add.at(s, d_idx, per_edge)
                r = keep_term + (damp_pct * s) // 100
            return pd.DataFrame({"node": nodes, "pagerank_fp": r})

        return e.repartition(1).map_batches(
            whole_graph_kernel, batch_format="pandas", batch_size=None
        )
    if path != "exchange":
        raise ValueError(f"pagerank_fp: unknown path {path!r}")

    nodes = tree_dedup(
        e.map_batches(
            lambda b: pd.DataFrame(
                {"node": np.concatenate(
                    [b[src_col].to_numpy(), b[dst_col].to_numpy()]
                )}
            ),
            batch_format="pandas",
        ),
        keys=["node"],
    ).map_batches(
        lambda b: b, batch_format="pandas", batch_size=None
    ).materialize()
    n = nodes.count()
    if n == 0:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({"node": pd.Series(dtype="object"),
                          "pagerank_fp": pd.Series(dtype="int64")})
        )
    base = scale // n

    deg = grouped_sum(
        e.map_batches(
            lambda b: pd.DataFrame({"node": b[src_col], "outdeg": 1}),
            batch_format="pandas",
        ),
        ["node"], ["outdeg"],
    )
    e_deg = partitioned_hash_join(
        e.map_batches(
            lambda b: pd.DataFrame({"node": b[src_col], "dst": b[dst_col]}),
            batch_format="pandas",
        ),
        deg,
        on=["node"],
        path=path,
    ).map_batches(
        lambda b: b, batch_format="pandas", batch_size=None
    ).materialize()

    rank = nodes.map_batches(
        lambda b: pd.DataFrame(
            {"node": b["node"],
             "r": np.full(len(b), base, dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    keep = 100 - damp_pct
    for _ in range(iters):
        j = partitioned_hash_join(e_deg, rank, on=["node"], path=path)
        contrib = j.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["dst"],
                 "s": b["r"].to_numpy().astype(np.int64)
                      // b["outdeg"].to_numpy().astype(np.int64)}
            ),
            batch_format="pandas",
        )
        zero = nodes.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"], "s": np.zeros(len(b), dtype=np.int64)}
            ),
            batch_format="pandas",
        )
        summed = grouped_sum(contrib.union(zero), ["node"], ["s"])
        rank = summed.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"],
                 "r": (keep * base) // 100
                      + (damp_pct * b["s"].to_numpy().astype(np.int64))
                      // 100}
            ),
            batch_format="pandas",
        ).materialize()
    return rank.map_batches(
        lambda b: pd.DataFrame(
            {"node": b["node"], "pagerank_fp": b["r"].astype("int64")}
        ),
        batch_format="pandas",
    )
