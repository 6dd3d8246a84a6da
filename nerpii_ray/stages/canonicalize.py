"""Canonicalization: normalized surfaces → deterministic node IDs → the
distinct-nodes table (SURVEY §7 step 6 — the engine's FakerGenerator
analogue for graph entities).

Scale design:

* The canonical ID is a *pure function* of (entity_type, normalized
  surface) — ``substr(md5(type || ':' || norm), 1, 16)`` — so attaching
  IDs to mentions/edges needs NO shuffle at all; only building the
  distinct nodes table does.
* Skew: hot surfaces ("Acme Corp" in 10 % of turns) would hammer one
  groupby partition.  Each batch first collapses to its local distinct
  set (``drop_duplicates`` — the salting-equivalent combiner: a surface
  appearing 10^6 times in a batch contributes ONE row to the shuffle),
  so post-shuffle group sizes are bounded by the number of batches, not
  by surface frequency.
* A ``top_surfaces`` census (partial count → tiny groupby → sort/limit)
  reports the hottest surfaces for skew monitoring and for choosing
  explicit salt factors when a downstream op must group raw mentions.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from nerpii_ray.config import EngineConfig
from nerpii_ray.functions.pseudonym import pseudonym_for
from nerpii_ray.functions.textfns import md5_of_strings, normalize_surface
from nerpii_ray.state.registry import PRESIDIO_STAGES, STAGE_MODEL_SPAN

#: mention stages that become graph entity nodes
NODE_STAGES = tuple(PRESIDIO_STAGES) + (STAGE_MODEL_SPAN,)


def add_canonical_ids(batch: pd.DataFrame, keep_all: bool = False) -> pd.DataFrame:
    """Vectorized per-batch: add norm_surface + node_id to mention rows.

    Equivalent SQL for the ID:
    ``substr(md5(entity || ':' || lower(surface)), 1, 16)``.

    ``keep_all=False`` keeps only node-bearing stages (drops model token
    labels and count partials).  ``keep_all=True`` keeps every row, with
    null node_id on non-node rows — used by run_kg so ONE pinned
    intermediate serves the assignment aggregate (which needs model/count
    rows) AND the triple/node builds (which filter to node rows).
    """
    is_node = batch["stage"].isin(NODE_STAGES)
    if not keep_all:
        batch = batch[is_node].copy()
        node_part = batch
    else:
        batch = batch.copy()
        node_part = batch[is_node]
    norm = normalize_surface(node_part["surface"])
    keys = node_part["entity"].astype(str) + ":" + norm
    # hash each distinct surface once per batch — hot surfaces ("Acme
    # Corp" in 10% of turns) repeat heavily, so this halves md5 work
    uniq = keys.drop_duplicates()
    lut = dict(zip(uniq, md5_of_strings(uniq).str[:16]))
    batch["norm_surface"] = norm  # aligned; non-node rows get NaN
    batch["node_id"] = keys.map(lut)
    return batch


def node_rows(batch: pd.DataFrame) -> pd.DataFrame:
    """Filter a keep_all ``add_canonical_ids`` output to node-bearing rows."""
    return batch[batch["node_id"].notna()]


def _distinct_nodes_in_batch(batch: pd.DataFrame) -> pd.DataFrame:
    out = (
        batch[["node_id", "entity", "norm_surface"]]
        .dropna(subset=["node_id"])  # keep_all inputs carry null-id rows
        .drop_duplicates("node_id")
    )
    # entity may arrive dictionary-encoded; nodes union with the plain-
    # string ACTOR/TOOL node table, so normalize the dtype here
    out = out.assign(entity=out["entity"].astype(str))
    return out.rename(columns={"entity": "entity_type", "norm_surface": "canonical_name"})


def add_pseudonyms(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic Faker-style pseudonym per canonical node
    (``faker_generator.py`` F2-F13 semantics, seeded per surface)."""
    batch = batch.copy()
    batch["pseudonym"] = [
        pseudonym_for(t, s)
        for t, s in zip(batch["entity_type"], batch["canonical_name"])
    ]
    return batch


def build_nodes(mentions_with_ids_ds, config: Optional[EngineConfig] = None):
    """Mentions (with node_id) → distinct nodes Dataset
    (node_id, entity_type, canonical_name, pseudonym).

    Per-batch distinct (combiner) → tree dedup (stages/agg.py — a
    surface appearing 10^6 times still contributes one row per batch to
    the exchange) → pseudonym map.
    """
    from nerpii_ray.stages.agg import tree_dedup

    cfg = config or EngineConfig()
    distinct = tree_dedup(
        mentions_with_ids_ds,
        keys=["node_id"],
        partial_fn=_distinct_nodes_in_batch,
        batch_size=cfg.batch_size,
    )
    return distinct.map_batches(
        add_pseudonyms, batch_format="pandas", batch_size=cfg.batch_size
    )


def top_surfaces(mentions_with_ids_ds, k: int = 20,
                 config: Optional[EngineConfig] = None) -> pd.DataFrame:
    """Top-k hottest canonical surfaces (skew census, SURVEY §2.7):
    per-batch partial counts → tree sum (adaptive root — one row per
    distinct surface) → distributed top-k cut (each block keeps its
    local top k, a tiny merge tree keeps the global top k; the driver
    only ever sees k rows, never the distinct-surface table)."""
    from nerpii_ray.stages.agg import grouped_sum, tree_aggregate

    cfg = config or EngineConfig()

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # observed=True: entity arrives dictionary-encoded; the pandas
        # default would expand to the full category product (see agg.py)
        return (
            batch.groupby(
                ["node_id", "entity", "norm_surface"], sort=False, observed=True
            )
            .size()
            .reset_index(name="cnt")
        )

    agg = grouped_sum(
        mentions_with_ids_ds,
        ["node_id", "entity", "norm_surface"],
        ["cnt"],
        partial_fn=partial,
        batch_size=cfg.batch_size,
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.nlargest(min(k, len(df)), "cnt") if len(df) else df

    out = tree_aggregate(agg, topk, topk, final_fn=topk)
    return (
        out.to_pandas()
        .sort_values("cnt", ascending=False)
        .reset_index(drop=True)
    )
