"""Entity-assignment aggregate: nerpii's threshold cascade, distributed.

The reference collapses per-cell mention labels into one column-level
entity via a cascade of frequency rules (SURVEY §2.4).  Here the same
rules run as: per-batch partial histograms inside ``map_batches`` (combiner
— no raw mention ever crosses the shuffle), a small
``groupby(group_key, kind, label).sum(cnt)`` exchange, and a pure,
unit-testable cascade function on the merged histograms.  Counts stay
integers until the final divide, so the partials merge associatively
(cf. ``frequency``, ``named_entity_recognizer.py:78-94``).

Cascade precedence (``named_entity_recognizer.py:26-27, 557-574`` and
README): Presidio assign (30 % gate → LOCATION override → majority vote),
then the manual column-name rules OVERWRITING, then the model B-ORG rule
filling only groups still unassigned.
"""

from __future__ import annotations

from typing import Dict, Optional

import pandas as pd

from nerpii_ray.config import EngineConfig
from nerpii_ray.stages.recognize import ROWS_LABEL
from nerpii_ray.state.registry import PRESIDIO_STAGES, STAGE_MODEL

KIND_PRESIDIO = "presidio"
KIND_MODEL = "model"
KIND_ROWS = "rows"


def partial_label_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """Combiner: mention rows → (group_key, kind, label, cnt) partials.

    * presidio kind: only the primary mention per turn counts — the
      reference keeps ``single_value_type[0].entity_type`` per cell
      (``named_entity_recognizer.py:442-446``);
    * model kind: every BERT-style token label counts
      (``named_entity_recognizer.py:499-503``);
    * rows kind: group row counts (denominator of the 30 % gate).
    """
    presidio = batch[batch["stage"].isin(PRESIDIO_STAGES) & batch["is_primary"]]
    model = batch[batch["stage"] == STAGE_MODEL]
    rows = batch[batch["entity"] == ROWS_LABEL]
    parts = []
    for kind, df in ((KIND_PRESIDIO, presidio), (KIND_MODEL, model), (KIND_ROWS, rows)):
        if len(df):
            g = (
                df.groupby(["group_key", "entity"], sort=False, observed=True)["cnt"]
                .sum()
                .reset_index()
            )
            g["kind"] = kind
            parts.append(g[["group_key", "kind", "entity", "cnt"]])
    if not parts:
        return pd.DataFrame(
            {"group_key": pd.Series(dtype=str), "kind": pd.Series(dtype=str),
             "entity": pd.Series(dtype=str), "cnt": pd.Series(dtype="int64")}
        )
    return pd.concat(parts, ignore_index=True)


def aggregate_label_histograms(mentions_ds, config: Optional[EngineConfig] = None):
    """mentions Dataset → tiny merged histogram pandas DataFrame.

    Tree aggregate (stages/agg.py): the exchange moves at most
    (groups × labels) rows per batch — combiner output, never mentions.
    """
    from nerpii_ray.stages.agg import grouped_sum

    cfg = config or EngineConfig()
    out = grouped_sum(
        mentions_ds,
        ["group_key", "kind", "entity"],
        ["cnt"],
        partial_fn=partial_label_counts,
        batch_size=cfg.batch_size,
        # key space = groups x kinds x label vocabulary — bounded by
        # schema, not data; skip the adaptive barrier
        adaptive=False,
    )
    return out.to_pandas()  # tiny: one row per (group, kind, label)


def histograms_to_dicts(hist_df: pd.DataFrame) -> Dict[str, dict]:
    """Pivot the merged histogram table into per-group dicts."""
    groups: Dict[str, dict] = {}
    if hist_df.empty or "group_key" not in hist_df.columns:
        return groups
    for gk, kind, label, cnt in hist_df[
        ["group_key", "kind", "entity", "cnt"]
    ].itertuples(index=False):
        g = groups.setdefault(
            gk, {KIND_PRESIDIO: {}, KIND_MODEL: {}, KIND_ROWS: 0}
        )
        if kind == KIND_ROWS:
            g[KIND_ROWS] += int(cnt)
        else:
            g[kind][label] = g[kind].get(label, 0) + int(cnt)
    return groups


def cascade_assign(
    presidio_hist: Dict[str, int],
    model_hist: Dict[str, int],
    n_rows: int,
    group_name: str,
    config: Optional[EngineConfig] = None,
) -> Optional[dict]:
    """The full A1-A5 rule cascade on merged histograms (pure function).

    Returns ``{"entity": str, "confidence_score": float}`` or ``None`` —
    the reference's ``dict_global_entities`` value contract
    (``named_entity_recognizer.py:327, 471-474, 486-489``).

    Divergence (documented): the reference's majority vote
    ``max(set(l), key=l.count)`` breaks ties by set iteration order, which
    is not deterministic across processes; here ties break by (count desc,
    label asc) so retries and resumed runs agree.
    """
    cfg = config or EngineConfig()
    name_l = group_name.lower()
    assignment: Optional[dict] = None

    total = sum(presidio_hist.values())
    # A1: support gate — strictly more than 30 % of rows carry a mention
    # (named_entity_recognizer.py:449)
    if n_rows > 0 and total > cfg.support_gate * n_rows:
        loc = presidio_hist.get("LOCATION", 0)
        loc_freq = loc / total if total else 0.0
        # A2: LOCATION override (named_entity_recognizer.py:465-469)
        if loc > 0 and "name" not in name_l and loc_freq > cfg.location_threshold:
            assignment = {"entity": "LOCATION", "confidence_score": loc_freq}
        else:
            # A3: majority vote (named_entity_recognizer.py:485-489);
            # ties break by label asc for determinism
            best_cnt = max(presidio_hist.values())
            most_label = min(
                lbl for lbl, c in presidio_hist.items() if c == best_cnt
            )
            assignment = {
                "entity": most_label,
                "confidence_score": presidio_hist[most_label] / total,
            }

    # A5: manual column-name rules, score pinned 1.0, OVERWRITING
    # (named_entity_recognizer.py:536-555)
    if cfg.manual_zipcode_rule and (
        ("postal" in name_l and "code" in name_l)
        or ("zip" in name_l)
        or ("cap" in name_l)
    ):
        assignment = {"entity": "ZIPCODE", "confidence_score": 1.0}
    if cfg.manual_credit_card_rule and (
        (("credit" in name_l) or ("card" in name_l)) and ("number" in name_l)
        or (("carta" in name_l) and ("credito" in name_l))
    ):
        assignment = {"entity": "CREDIT_CARD_NUMBER", "confidence_score": 1.0}

    # A4: model fill-in for still-unassigned groups only
    # (named_entity_recognizer.py:496-497, 505-521)
    if assignment is None and model_hist:
        mtotal = sum(model_hist.values())
        borg = model_hist.get("B-ORG", 0)
        if borg > 0 and mtotal and borg / mtotal > cfg.org_threshold:
            assignment = {
                "entity": "ORGANIZATION",
                "confidence_score": borg / mtotal,
            }
    return assignment


def assign_entities(
    mentions_ds,
    config: Optional[EngineConfig] = None,
    extra_group_names: Optional[list] = None,
) -> Dict[str, Optional[dict]]:
    """mentions Dataset → assignments dict (the ``dict_global_entities``
    analogue, tiny — broadcast back into later stages as a plain dict).

    ``extra_group_names`` adds groups never seen in the data (e.g. numeric
    columns in parity mode) so the manual name rules can still hit them,
    as the reference iterates ALL columns (``named_entity_recognizer.py:536``).
    """
    cfg = config or EngineConfig()
    hist_df = aggregate_label_histograms(mentions_ds, cfg)
    groups = histograms_to_dicts(hist_df)
    for g in extra_group_names or []:
        groups.setdefault(g, {KIND_PRESIDIO: {}, KIND_MODEL: {}, KIND_ROWS: 0})
    return {
        gk: cascade_assign(
            h[KIND_PRESIDIO], h[KIND_MODEL], h[KIND_ROWS], gk, cfg
        )
        for gk, h in sorted(groups.items())
    }


def assignments_to_table(assignments: Dict[str, Optional[dict]]) -> pd.DataFrame:
    """Assignments dict → small relational table
    (group_key, entity, confidence_score) for SQL-checkable output."""
    rows = [
        (gk, a["entity"], float(a["confidence_score"]))
        for gk, a in sorted(assignments.items())
        if a is not None
    ]
    return pd.DataFrame(rows, columns=["group_key", "entity", "confidence_score"])
