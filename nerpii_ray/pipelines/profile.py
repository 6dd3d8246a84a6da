"""Profile pipeline — nerpii parity mode.

Reproduces the reference's end-to-end column-entity assignment
(EP1 in SURVEY §3: ``NamedEntityRecognizer`` construct →
``assign_entities_with_presidio`` → ``assign_entities_manually`` →
``assign_organization_entity_with_model``) on Ray Data:

  columnar table → melt to (row_idx, group_key=column_name, text) →
  recognizer actor pool → histogram aggregate → threshold cascade →
  ``dict_global_entities``-shaped assignments dict.

The reference analyzes only pandas ``object`` columns
(``named_entity_recognizer.py:317``) but keeps every column as a key in
``dict_global_entities`` (``:327``) so the manual name rules can hit
numeric columns too (``:536-555``) — both behaviours are kept.
"""

from __future__ import annotations

from typing import Dict, Optional

import pandas as pd
import ray.data as rd

from nerpii_ray.config import EngineConfig
from nerpii_ray.functions.textfns import gender_of_first_names
from nerpii_ray.stages.assign import assign_entities
from nerpii_ray.stages.recognize import recognize_mentions
from nerpii_ray.state.registry import RecognizerRegistry


def melt_table(df: pd.DataFrame, nan_filler: str = "?") -> pd.DataFrame:
    """Columnar table → long form (row_idx, group_key, text), object
    columns only.  NaN → ``nan_filler`` (``named_entity_recognizer.py:318-321``)."""
    object_cols = list(df.select_dtypes(["object"]).columns)
    out = (
        df[object_cols]
        .fillna(nan_filler)
        .astype(str)
        .reset_index(drop=True)
        .reset_index(names="row_idx")
        .melt(id_vars="row_idx", var_name="group_key", value_name="text")
    )
    return out


def add_gender_column(df: pd.DataFrame) -> pd.DataFrame:
    """Gender enrichment (``named_entity_recognizer.py:203-231``): for every
    column whose name contains "first" and "name", append a
    ``first_name_gender`` column."""
    for column in df.columns:
        cl = column.lower()
        if "first" in cl and "name" in cl:
            df = df.copy()
            df["first_name_gender"] = gender_of_first_names(df[column])
            break
    return df


def profile_table(
    df: pd.DataFrame,
    config: Optional[EngineConfig] = None,
    registry: Optional[RecognizerRegistry] = None,
    get_gender_option: bool = False,
    data_sample: Optional[int] = None,
    seed: int = 42,
) -> Dict[str, Optional[dict]]:
    """Full NER profile of a columnar table → assignments dict.

    The melt and the final cascade run on the driver (both tiny); the scan
    and the histogram aggregate run distributed.

    ``data_sample`` reproduces the reference's row sampler
    (``df.sample(n=min(data_sample, n))``, ``named_entity_recognizer.py:316``)
    as a fast profile mode — but SEEDED, fixing the reference's
    nondeterminism above 500 rows (FIXTURES.md "Known reference defects").
    Default None = profile everything (the engine processes full data).
    """
    cfg = config or EngineConfig()
    if data_sample is not None:
        df = df.sample(n=min(data_sample, len(df)), random_state=seed)
    if registry is None:
        # per-cell analysis mode, as the reference's analyze_dict treats
        # each cell as its own text (named_entity_recognizer.py:417-430):
        # enables the TitleCase-cell PERSON fallback (state/registry.py)
        registry = RecognizerRegistry(
            add_addresses_recognizer=cfg.add_addresses_recognizer,
            cell_mode=True,
            lang=cfg.lang,
        )
        if cfg.additional_addresses:
            registry.add_addresses(cfg.additional_addresses)
    if get_gender_option:
        df = add_gender_column(df)
    melted = melt_table(df, cfg.nan_filler)
    ds = rd.from_pandas(melted)
    mentions = recognize_mentions(
        ds,
        config=cfg,
        registry=registry,
        text_col="text",
        key_cols=("row_idx",),
        group_col="group_key",
        group_from=None,
    )
    all_columns = [str(c) for c in df.columns]
    assignments = assign_entities(mentions, cfg, extra_group_names=all_columns)
    # restrict to the table's columns, preserving non-object None entries
    return {c: assignments.get(c) for c in all_columns}
