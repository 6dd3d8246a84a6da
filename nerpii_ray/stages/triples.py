"""Triple extraction: mention rows → (subj, pred, obj) edge rows.

Stateless ``map_batches`` stage (SURVEY §7 step 5).  All rules are
per-turn, and every mention of a turn lands in the same batch (the
recognizer explodes one input row's mentions contiguously), so extraction
needs no shuffle.  The rule table:

  pred            | subj                     | obj                 | when
  ----------------+--------------------------+---------------------+--------------------------
  mentions        | ACTOR conv:<id>:<role>   | each entity node    | any node-bearing mention
  used_tool       | ACTOR conv:<id>:<role>   | TOOL <tool>         | turn has tool != none
  sent_email_to   | ACTOR conv:<id>:<role>   | EMAIL node          | tool == send_email
  works_for       | first PERSON of turn     | first ORGANIZATION  | both present in turn
  located_in      | first PERSON of turn     | first LOCATION      | both present in turn

"first" = smallest mention start offset; ties by surface.  The oracle
(:mod:`nerpii_ray.oracle.reference_oracle`) implements the same table
independently, which is what the P/R ≥ 0.95 gate compares.

Edge identity for dedup is the natural key
``(subj_id, pred, obj_id, conv_id, turn_idx)`` — deduplicated directly
on those columns rather than through a derived digest (a per-row md5
here was 2-3 hash calls per edge in the hottest stage, for a key no
consumer reads).  Duplicates cannot arise from a single well-formed
input (one turn = one input row = one batch slice), so global dedup is
an optional hash-partitioned exchange for at-least-once upstreams
(``EngineConfig``).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from nerpii_ray.config import EngineConfig
from nerpii_ray.functions.textfns import md5_of_strings

EDGE_COLUMNS = [
    "subj_id", "subj_type", "pred", "obj_id", "obj_type",
    "conv_id", "turn_idx", "score",
]

#: natural edge identity — the dedup key (no derived digest)
EDGE_KEY_COLS = ("subj_id", "pred", "obj_id", "conv_id", "turn_idx")


def actor_node_ids(conv_ids: pd.Series, roles: pd.Series) -> pd.Series:
    names = conv_ids.astype(str) + ":" + roles.astype(str)
    return md5_of_strings("ACTOR:" + names).str[:16]


def tool_node_ids(tools: pd.Series) -> pd.Series:
    return md5_of_strings("TOOL:" + tools.astype(str)).str[:16]


def extract_triples(batch: pd.DataFrame) -> pd.DataFrame:
    """Mention rows (with node_id, from ``add_canonical_ids``) → edges."""
    if len(batch) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in EDGE_COLUMNS})

    b = batch.copy()
    b["actor_id"] = actor_node_ids(b["conv_id"], b["role"])
    edges = []

    # mentions: one edge per entity mention
    m = pd.DataFrame(
        {
            "subj_id": b["actor_id"],
            "subj_type": "ACTOR",
            "pred": "mentions",
            "obj_id": b["node_id"],
            # cast: entity may arrive dictionary-encoded (categorical) and
            # must union/write as plain strings
            "obj_type": b["entity"].astype(str),
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"],
            "score": b["score"],
        }
    )
    edges.append(m)

    # sent_email_to: EMAIL mentions in send_email turns
    se = b[(b["tool"] == "send_email") & (b["entity"] == "EMAIL_ADDRESS")]
    if len(se):
        edges.append(
            pd.DataFrame(
                {
                    "subj_id": se["actor_id"],
                    "subj_type": "ACTOR",
                    "pred": "sent_email_to",
                    "obj_id": se["node_id"],
                    "obj_type": "EMAIL_ADDRESS",
                    "conv_id": se["conv_id"],
                    "turn_idx": se["turn_idx"],
                    "score": se["score"],
                }
            )
        )

    # co-occurrence rules: first PERSON × first ORGANIZATION / LOCATION
    firsts = (
        b.sort_values(["conv_id", "turn_idx", "start"], kind="stable")
        # observed=True: dictionary-encoded (categorical) entity columns
        # must not produce phantom all-category groups with NaN node ids
        .groupby(["conv_id", "turn_idx", "entity"], sort=False, observed=True)
        .first()
        .reset_index()
    )
    per = firsts[firsts["entity"] == "PERSON"]
    for other, pred in (("ORGANIZATION", "works_for"), ("LOCATION", "located_in")):
        oth = firsts[firsts["entity"] == other]
        j = per.merge(oth, on=["conv_id", "turn_idx"], suffixes=("_p", "_o"))
        if len(j):
            edges.append(
                pd.DataFrame(
                    {
                        "subj_id": j["node_id_p"],
                        "subj_type": "PERSON",
                        "pred": pred,
                        "obj_id": j["node_id_o"],
                        "obj_type": other,
                        "conv_id": j["conv_id"],
                        "turn_idx": j["turn_idx"],
                        "score": j["score_p"].astype(float) * j["score_o"].astype(float),
                    }
                )
            )

    out = pd.concat(edges, ignore_index=True)
    # local dedup (combiner): duplicates within a turn collapse here
    out = out.drop_duplicates(EDGE_KEY_COLS).reset_index(drop=True)
    return out


def extract_tool_edges(turns_batch: pd.DataFrame) -> pd.DataFrame:
    """used_tool edges straight from the TURNS table (not mentions): a turn
    with a tool but no detected entities still yields its edge."""
    t = turns_batch[
        turns_batch["tool"].notna() & (turns_batch["tool"] != "none")
    ]
    out = pd.DataFrame(
        {
            "subj_id": actor_node_ids(t["conv_id"], t["role"]),
            "subj_type": "ACTOR",
            "pred": "used_tool",
            "obj_id": tool_node_ids(t["tool"]),
            "obj_type": "TOOL",
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "score": 1.0,
        }
    )
    return out.reset_index(drop=True)


def dedup_edges_global(edges_ds, config: Optional[EngineConfig] = None):
    """Optional exact global dedup by the natural edge key (SURVEY §2.7)
    via the cardinality-aware tree (local dedup per batch happened in
    extract_triples, so the exchange only carries already-unique-per-
    batch rows).  Needed only for at-least-once inputs."""
    from nerpii_ray.stages.agg import tree_dedup

    return tree_dedup(edges_ds, keys=list(EDGE_KEY_COLS))
