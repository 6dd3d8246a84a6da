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


def triangle_count(
    edges_ds,
    u_col: str = "u",
    v_col: str = "v",
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Exact global triangle count over an undirected edge list (rows
    are canonical ``u < v`` pairs, already distinct), via degree-based
    orientation + wedge closing — the standard scale-out plan (each
    edge is oriented from its lower-(degree, id) endpoint to the
    higher, which bounds every out-degree by O(√m) and therefore the
    wedge volume by O(m^1.5) regardless of hub skew).

    Plan: one bounded-key degree tree over the exploded endpoints; two
    partitioned hash joins attach (deg_u, deg_v) to each edge; a keyed
    co-location on the oriented source emits each out-neighbor pair
    once, ordered by (deg, id); one more partitioned hash join closes
    wedges against the oriented edges; a scalar sum tree counts the
    matches.  Nothing driver-sized anywhere; every join key is a node
    id.  Orientation choice does not affect the result — any acyclic
    orientation counts each triangle exactly once — so the SQL twin is
    the plain ``a < b < c`` triple self-join.
    """
    from nerpii_ray.stages.agg import grouped_sum, tree_aggregate
    from nerpii_ray.stages.colocate import keyed_partition_apply
    from nerpii_ray.stages.joins import partitioned_hash_join

    # degree per node: explode endpoints, bounded-ish key space (node
    # count), cardinality-aware tree
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "node": np.concatenate(
                    [b[u_col].to_numpy(), b[v_col].to_numpy()]
                )
            }
        )
        out["deg"] = np.int64(1)
        return out.groupby("node", sort=False)["deg"].sum().reset_index()

    deg = grouped_sum(
        edges_ds.map_batches(explode, batch_format="pandas"),
        ["node"], ["deg"], partial_fn=lambda b: b,
    )

    e_u = partitioned_hash_join(
        edges_ds,
        deg.map_batches(
            lambda b: b.rename(columns={"node": u_col, "deg": "du"}),
            batch_format="pandas",
        ),
        on=[u_col], num_buckets=num_buckets, path=path,
    )
    e_uv = partitioned_hash_join(
        e_u,
        deg.map_batches(
            lambda b: b.rename(columns={"node": v_col, "deg": "dv"}),
            batch_format="pandas",
        ),
        on=[v_col], num_buckets=num_buckets, path=path,
    )

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        u = b[u_col].astype("int64").to_numpy()
        v = b[v_col].astype("int64").to_numpy()
        du = b["du"].astype("int64").to_numpy()
        dv = b["dv"].astype("int64").to_numpy()
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pd.DataFrame(
            {
                "src": np.where(fwd, u, v),
                "dst": np.where(fwd, v, u),
                "ddst": np.where(fwd, dv, du),
            }
        )

    oriented = e_uv.map_batches(orient, batch_format="pandas")

    # wedges: per oriented source, each unordered out-neighbor pair
    # once, as (x, y) in (deg, id) order — the orientation the closing
    # edge, if present, must carry
    def wedge_kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype="int64"),
                    "dst": pd.Series(dtype="int64"),
                }
            )
        p = g[["src", "dst", "ddst"]].merge(
            g[["src", "dst", "ddst"]], on="src", suffixes=("_a", "_b")
        )
        keep = (p["ddst_a"] < p["ddst_b"]) | (
            (p["ddst_a"] == p["ddst_b"]) & (p["dst_a"] < p["dst_b"])
        )
        p = p[keep]
        return pd.DataFrame(
            {
                "src": p["dst_a"].astype("int64").to_numpy(),
                "dst": p["dst_b"].astype("int64").to_numpy(),
            }
        )

    wedges = keyed_partition_apply(
        oriented, ["src"], wedge_kernel, num_buckets, path="exchange"
    )

    closed = partitioned_hash_join(
        wedges,
        oriented.map_batches(
            lambda b: pd.DataFrame(
                {
                    "src": b["src"].astype("int64"),
                    "dst": b["dst"].astype("int64"),
                    "is_edge": np.int64(1),
                }
            ),
            batch_format="pandas",
        ),
        on=["src", "dst"], num_buckets=num_buckets, path="exchange",
    )

    # per-batch row counts, seeded with a literal zero row so a graph
    # with NO closed wedge at all (zero-block join output) still
    # produces the single-row result instead of an empty dataset
    import ray.data as rd

    cnt = closed.map_batches(
        lambda df: pd.DataFrame(
            {"n_triangles": pd.array([len(df)], dtype="int64")}
        ),
        batch_format="pandas",
    ).union(rd.from_pandas(pd.DataFrame({"n_triangles": pd.array([0], dtype="int64")})))

    def count(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n_triangles"].sum()) if len(df) else 0
        return pd.DataFrame({"n_triangles": pd.array([n], dtype="int64")})

    return tree_aggregate(cnt, count, count)


def bfs_levels(
    edges_ds,
    u_col: str = "u",
    v_col: str = "v",
    source: int | None = None,
    max_hops: int = 3,
    path: str = "auto",
):
    """Breadth-first hop distances from ``source`` over an UNDIRECTED
    edge list, bounded at ``max_hops`` — the traversal primitive
    (reachability, ego networks, neighborhood features) alongside
    ``pagerank_fp`` (value propagation) and
    ``dedup.connected_components`` (global structure).  ``source=None``
    starts from the smallest node id (deterministic).

    Integer distances are order-independent, so the result is
    bit-identical on any partitioning and a SQL twin can unroll the
    hops as k NOT-IN set differences.

    ``path`` — the ``pagerank_fp`` discipline:
    * small/auto-under-threshold: ONE task runs the whole frontier loop
      in numpy (graph tables are output-sized; the distributed form
      pays ~3 fixed-cost dataset executions per hop for the same
      answer);
    * exchange/auto-past-threshold: per hop, one partitioned hash join
      (frontier onto the direction-doubled edges) + a distinct tree +
      a LEFT-join filter against the accumulated labels — frontier and
      labels stay node-sized datasets, never driver-sized.
    Cross-path equality is pytest-pinned.

    Returns (node, dist:int64) for every node within ``max_hops``.
    """
    from nerpii_ray.stages.agg import ROOT_THRESHOLD_DEFAULT, tree_dedup
    from nerpii_ray.stages.joins import partitioned_hash_join

    e = edges_ds.materialize()
    if path == "auto":
        path = "small" if e.count() <= ROOT_THRESHOLD_DEFAULT else "exchange"

    if path == "small":

        def whole(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "dist": pd.Series(dtype="int64")}
            )
            if df.empty:
                return empty
            u = df[u_col].to_numpy()
            v = df[v_col].to_numpy()
            nodes, codes = np.unique(
                np.concatenate([u, v]), return_inverse=True
            )
            ui, vi = codes[: len(u)], codes[len(u):]
            src_i = (
                0 if source is None
                else int(np.searchsorted(nodes, source))
            )
            if source is not None and (
                src_i >= len(nodes) or nodes[src_i] != source
            ):
                return empty
            dist = np.full(len(nodes), -1, dtype=np.int64)
            dist[src_i] = 0
            frontier = np.array([src_i])
            for d in range(1, max_hops + 1):
                mask_u = np.isin(ui, frontier)
                mask_v = np.isin(vi, frontier)
                nbrs = np.unique(
                    np.concatenate([vi[mask_u], ui[mask_v]])
                )
                nbrs = nbrs[dist[nbrs] < 0]
                if not len(nbrs):
                    break
                dist[nbrs] = d
                frontier = nbrs
            keep = dist >= 0
            return pd.DataFrame(
                {
                    "node": nodes[keep].astype("int64"),
                    "dist": dist[keep],
                }
            )

        return e.repartition(1).map_batches(
            whole, batch_format="pandas", batch_size=None
        )

    if path != "exchange":
        raise ValueError(f"bfs_levels: unknown path {path!r}")

    import ray.data as rd

    both = e.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": np.concatenate(
                    [b[u_col].to_numpy(), b[v_col].to_numpy()]
                ).astype("int64"),
                "nbr": np.concatenate(
                    [b[v_col].to_numpy(), b[u_col].to_numpy()]
                ).astype("int64"),
            }
        ),
        batch_format="pandas",
    ).materialize()

    if source is None:
        mins = both.map_batches(
            lambda b: pd.DataFrame(
                {"m": [int(b["node"].min())] if len(b) else []},
                dtype="int64",
            ),
            batch_format="pandas",
        ).to_pandas()
        if mins.empty:
            return rd.from_pandas(
                pd.DataFrame(
                    {"node": pd.Series(dtype="int64"),
                     "dist": pd.Series(dtype="int64")}
                )
            )
        source = int(mins["m"].min())

    labels = rd.from_pandas(
        pd.DataFrame({"node": pd.array([source], dtype="int64"),
                      "dist": pd.array([0], dtype="int64")})
    ).materialize()
    frontier = labels

    for d in range(1, max_hops + 1):
        nbrs = partitioned_hash_join(
            frontier.map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["node"].astype("int64")}
                ),
                batch_format="pandas",
            ),
            both, on=["node"], path="exchange",
        ).map_batches(
            lambda b: pd.DataFrame(
                {"node": b["nbr"].astype("int64")}
            ),
            batch_format="pandas",
        )
        cand = tree_dedup(nbrs, ["node"])
        seen = partitioned_hash_join(
            cand, labels.map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["node"].astype("int64"),
                     "dist": b["dist"].astype("int64")}
                ),
                batch_format="pandas",
            ),
            on=["node"], how="left", path="exchange",
        )
        fresh = seen.map_batches(
            lambda b, _d=d: pd.DataFrame(
                {
                    "node": b.loc[b["dist"].isna(), "node"].astype("int64"),
                    "dist": np.int64(_d),
                }
            ),
            batch_format="pandas",
        ).materialize()
        if fresh.count() == 0:
            break
        labels = labels.union(fresh).materialize()
        frontier = fresh

    return labels


def node_triangle_counts(
    edges_ds,
    u_col: str = "u",
    v_col: str = "v",
    num_buckets: int | None = None,
    path: str = "auto",
):
    """Per-NODE exact triangle counts over an undirected canonical
    (u < v, distinct) edge list — the numerator of the local
    clustering coefficient.  Same degree-oriented wedge-closing plan
    as ``triangle_count`` (out-degrees bounded O(√m), wedge volume
    O(m^1.5) under any hub skew) with one change: wedges carry their
    CENTER, and every closed wedge attributes its triangle to all
    three corners via a 3-row flat map into a keyed count tree.
    Returns (node, tri) for nodes in ≥1 triangle; attach degrees and
    LEFT-join zeros at the call site.
    """
    from nerpii_ray.stages.agg import grouped_sum, tree_aggregate
    from nerpii_ray.stages.colocate import keyed_partition_apply
    from nerpii_ray.stages.joins import partitioned_hash_join

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "node": np.concatenate(
                    [b[u_col].to_numpy(), b[v_col].to_numpy()]
                )
            }
        )
        out["deg"] = np.int64(1)
        return out.groupby("node", sort=False)["deg"].sum().reset_index()

    deg = grouped_sum(
        edges_ds.map_batches(explode, batch_format="pandas"),
        ["node"], ["deg"], partial_fn=lambda b: b,
    )

    e_u = partitioned_hash_join(
        edges_ds,
        deg.map_batches(
            lambda b: b.rename(columns={"node": u_col, "deg": "du"}),
            batch_format="pandas",
        ),
        on=[u_col], num_buckets=num_buckets, path=path,
    )
    e_uv = partitioned_hash_join(
        e_u,
        deg.map_batches(
            lambda b: b.rename(columns={"node": v_col, "deg": "dv"}),
            batch_format="pandas",
        ),
        on=[v_col], num_buckets=num_buckets, path=path,
    )

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        u = b[u_col].astype("int64").to_numpy()
        v = b[v_col].astype("int64").to_numpy()
        du = b["du"].astype("int64").to_numpy()
        dv = b["dv"].astype("int64").to_numpy()
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pd.DataFrame(
            {
                "src": np.where(fwd, u, v),
                "dst": np.where(fwd, v, u),
                "ddst": np.where(fwd, dv, du),
            }
        )

    oriented = e_uv.map_batches(orient, batch_format="pandas")

    def wedge_kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "center": pd.Series(dtype="int64"),
                    "src": pd.Series(dtype="int64"),
                    "dst": pd.Series(dtype="int64"),
                }
            )
        p = g[["src", "dst", "ddst"]].merge(
            g[["src", "dst", "ddst"]], on="src", suffixes=("_a", "_b")
        )
        keep = (p["ddst_a"] < p["ddst_b"]) | (
            (p["ddst_a"] == p["ddst_b"]) & (p["dst_a"] < p["dst_b"])
        )
        p = p[keep]
        return pd.DataFrame(
            {
                "center": p["src"].astype("int64").to_numpy(),
                "src": p["dst_a"].astype("int64").to_numpy(),
                "dst": p["dst_b"].astype("int64").to_numpy(),
            }
        )

    wedges = keyed_partition_apply(
        oriented, ["src"], wedge_kernel, num_buckets, path="exchange"
    )

    closed = partitioned_hash_join(
        wedges,
        oriented.map_batches(
            lambda b: pd.DataFrame(
                {
                    "src": b["src"].astype("int64"),
                    "dst": b["dst"].astype("int64"),
                    "is_edge": np.int64(1),
                }
            ),
            batch_format="pandas",
        ),
        on=["src", "dst"], num_buckets=num_buckets, path="exchange",
    )

    def corners(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "tri": pd.Series(dtype="int64")}
            )
        nodes = np.concatenate(
            [
                b["center"].astype("int64").to_numpy(),
                b["src"].astype("int64").to_numpy(),
                b["dst"].astype("int64").to_numpy(),
            ]
        )
        d = pd.DataFrame({"node": nodes, "tri": np.int64(1)})
        return d.groupby("node", sort=False)["tri"].sum().reset_index()

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        return b.groupby("node", as_index=False)["tri"].sum()

    return tree_aggregate(closed, corners, merge, keys=["node"])


def kcore(
    edges_ds,
    k: int,
    u_col: str = "u",
    v_col: str = "v",
    path: str = "auto",
    max_rounds: int = 64,
):
    """k-core decomposition membership: iteratively peel nodes whose
    degree among the SURVIVORS is < ``k`` until fixpoint; return every
    surviving node with its in-core degree — the classic density filter
    for co-occurrence graphs (spam-cluster mining, community seeds)
    beside ``bfs_levels`` (traversal) and ``pagerank_fp`` (value
    propagation).  Peeling is monotone and its result is independent of
    removal order, so the answer is bit-identical on any partitioning
    and a SQL twin can unroll the rounds (extra rounds past the
    fixpoint are no-ops).

    ``path`` — the ``pagerank_fp`` discipline:
    * small/auto-under-threshold: ONE task runs the whole peel loop in
      numpy over code-compressed endpoints (graph tables are
      output-sized; the distributed form pays ~3 fixed-cost dataset
      executions per round for the same answer);
    * exchange/auto-past-threshold: per round, one grouped-sum degree
      tree over the direction-doubled edges + two partitioned hash
      semi-joins filtering edges to surviving endpoints — edges and
      degree tables stay node/edge-sized datasets, never driver-sized.
      Convergence is read from one driver scalar per round (surviving-
      node count); RAISES after ``max_rounds`` rather than silently
      returning a non-fixpoint (the ``connected_components``
      discipline).

    Returns (node:int64, deg:int64), deg = degree within the k-core.
    """
    from nerpii_ray.stages.agg import (
        ROOT_THRESHOLD_DEFAULT,
        grouped_sum,
        tree_aggregate,
    )

    e = edges_ds.materialize()
    if path == "auto":
        path = "small" if e.count() <= ROOT_THRESHOLD_DEFAULT else "exchange"

    empty = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "deg": pd.Series(dtype="int64")}
    )

    if path == "small":

        def whole(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return empty
            u = df[u_col].to_numpy()
            v = df[v_col].to_numpy()
            nodes, codes = np.unique(
                np.concatenate([u, v]), return_inverse=True
            )
            ui, vi = codes[: len(u)], codes[len(u):]
            alive = np.ones(len(nodes), dtype=bool)
            for _ in range(max_rounds):
                m = alive[ui] & alive[vi]
                deg = (
                    np.bincount(ui[m], minlength=len(nodes))
                    + np.bincount(vi[m], minlength=len(nodes))
                )
                rm = alive & (deg < k)
                if not rm.any():
                    keep = alive & (deg >= k)
                    return pd.DataFrame(
                        {
                            "node": nodes[keep].astype("int64"),
                            "deg": deg[keep].astype("int64"),
                        }
                    )
                alive &= ~rm
            raise RuntimeError(
                f"kcore: no fixpoint after {max_rounds} rounds"
            )

        return e.repartition(1).map_batches(
            whole, batch_format="pandas", batch_size=None
        )

    if path != "exchange":
        raise ValueError(f"kcore: unknown path {path!r}")

    from nerpii_ray.stages.joins import partitioned_hash_join

    edges = e.map_batches(
        lambda b: pd.DataFrame(
            {
                "u": b[u_col].astype("int64").to_numpy(),
                "v": b[v_col].astype("int64").to_numpy(),
            }
        ),
        batch_format="pandas",
    ).materialize()
    prev_nodes = None

    for _ in range(max_rounds):

        def both(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": np.concatenate(
                        [b["u"].to_numpy(), b["v"].to_numpy()]
                    ).astype("int64"),
                    "deg": np.int64(1),
                }
            )

        deg = grouped_sum(
            edges, ["node"], ["deg"], partial_fn=lambda b: both(b)
            .groupby("node", as_index=False)["deg"].sum(),
        ).materialize()
        good = deg.map_batches(
            lambda b: b[b["deg"] >= k].reset_index(drop=True),
            batch_format="pandas",
        ).materialize()
        n_good = good.count()
        if prev_nodes is not None and n_good == prev_nodes:
            return good
        if n_good == 0:
            import ray.data as rd

            return rd.from_pandas(empty)
        prev_nodes = n_good
        nodes_only = good.map_batches(
            lambda b: pd.DataFrame({"node": b["node"].astype("int64")}),
            batch_format="pandas",
        )
        for side in ("u", "v"):
            edges = partitioned_hash_join(
                edges.map_batches(
                    lambda b, s=side: b.rename(columns={s: "node"}),
                    batch_format="pandas",
                ),
                nodes_only, on=["node"], path="exchange",
            ).map_batches(
                lambda b, s=side: b.rename(columns={"node": s})[
                    ["u", "v"]
                ],
                batch_format="pandas",
            )
        edges = edges.materialize()
    raise RuntimeError(f"kcore: no fixpoint after {max_rounds} rounds")


def hits_fp(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    path: str = "auto",
):
    """Two-iteration HITS (hubs & authorities, Kleinberg JACM'99) over
    a directed edge list, in EXACT unnormalized integers — the float
    L2 normalization of the textbook form is merge-order-dependent and
    could never hash-match, so the operator is defined as the raw
    mutual-reinforcement recurrence: a₁ = in-degree, h₁(u) = Σ_{u→v}
    a₁(v), a₂(v) = Σ_{u→v} h₁(u), h₂(u) = Σ_{u→v} a₂(v).  Rankings are
    normalization-invariant, and integer growth is bounded by D⁴ for
    max degree D (int64-safe to D ≈ 46k; past that rescale by the
    global max between iterations — stated contract, like every keyed
    op's skew note).

    Physical plan, cardinality-aware like ``pagerank_fp``:
    * small / auto-under-threshold — ONE task, numpy ``np.add.at``
      gather-scatter over the codes array;
    * exchange / auto-past — each half-iteration is one keyed-exchange
      hash join (scores onto edges) + one combiner-tree grouped sum;
      nothing driver-sized.
    Cross-path equality is pinned by pytest.  Returns a Dataset
    ``(node, authority_fp:int64, hub_fp:int64)`` over ALL nodes
    (missing side → 0).
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
                     "authority_fp": pd.Series(dtype="int64"),
                     "hub_fp": pd.Series(dtype="int64")}
                )
            src = df[src_col].to_numpy()
            dst = df[dst_col].to_numpy()
            nodes, codes = np.unique(
                np.concatenate([src, dst]), return_inverse=True
            )
            s_idx, d_idx = codes[: len(src)], codes[len(src):]
            n = len(nodes)
            a1 = np.bincount(d_idx, minlength=n).astype(np.int64)
            h1 = np.zeros(n, dtype=np.int64)
            np.add.at(h1, s_idx, a1[d_idx])
            a2 = np.zeros(n, dtype=np.int64)
            np.add.at(a2, d_idx, h1[s_idx])
            h2 = np.zeros(n, dtype=np.int64)
            np.add.at(h2, s_idx, a2[d_idx])
            return pd.DataFrame(
                {"node": nodes, "authority_fp": a2, "hub_fp": h2}
            )

        return e.repartition(1).map_batches(
            whole_graph_kernel, batch_format="pandas", batch_size=None
        )
    if path != "exchange":
        raise ValueError(f"hits_fp: unknown path {path!r}")

    pairs = e.map_batches(
        lambda b: pd.DataFrame({"src": b[src_col], "dst": b[dst_col]}),
        batch_format="pandas",
    ).materialize()

    def _score_sum(joined, group_col: str, score_col: str, out_col: str):
        return grouped_sum(
            joined.map_batches(
                lambda b, g=group_col, s=score_col, o=out_col: pd.DataFrame(
                    {"node": b[g], o: b[s].to_numpy().astype(np.int64)}
                ),
                batch_format="pandas",
            ),
            ["node"], [out_col],
        )

    # a1 = in-degree
    a1 = grouped_sum(
        pairs.map_batches(
            lambda b: pd.DataFrame({"node": b["dst"], "a": 1}),
            batch_format="pandas",
        ),
        ["node"], ["a"],
    )
    # h1(u) = sum of a1 over u's out-neighbors: join scores onto dst
    j = partitioned_hash_join(
        pairs, a1.map_batches(
            lambda b: pd.DataFrame({"dst": b["node"], "a": b["a"]}),
            batch_format="pandas"),
        on=["dst"], path=path,
    )
    h1 = _score_sum(j, "src", "a", "h")
    # a2(v) = sum of h1 over v's in-neighbors: join scores onto src
    j = partitioned_hash_join(
        pairs, h1.map_batches(
            lambda b: pd.DataFrame({"src": b["node"], "h": b["h"]}),
            batch_format="pandas"),
        on=["src"], path=path,
    )
    a2 = _score_sum(j, "dst", "h", "a2")
    # h2(u) = sum of a2 over u's out-neighbors
    j = partitioned_hash_join(
        pairs, a2.map_batches(
            lambda b: pd.DataFrame({"dst": b["node"], "a2": b["a2"]}),
            batch_format="pandas"),
        on=["dst"], path=path,
    )
    h2 = _score_sum(j, "src", "a2", "h2")

    nodes = tree_dedup(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {"node": np.concatenate(
                    [b["src"].to_numpy(), b["dst"].to_numpy()]
                )}
            ),
            batch_format="pandas",
        ),
        keys=["node"],
    )
    out = partitioned_hash_join(nodes, a2, on=["node"], how="left", path=path)
    out = partitioned_hash_join(out, h2, on=["node"], how="left", path=path)
    return out.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": b["node"],
                "authority_fp": b["a2"].fillna(0).astype("int64"),
                "hub_fp": b["h2"].fillna(0).astype("int64"),
            }
        ),
        batch_format="pandas",
    )
