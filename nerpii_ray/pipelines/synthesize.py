"""Synthesis pipeline — the FakerGenerator analogue (SURVEY §2.5, EP2).

Given a table and an assignments dict (the ``dict_global_entities``
contract), re-synthesize the PII-bearing columns with deterministic
pseudonym providers:

* column selection reproduces F1-F13's selectors exactly — entity match
  plus the column-name rules (``faker_generator.py:93-596``), gated on
  confidence_score > 0.3 (``:105``);
* null cells stay null; ``generation_mark="*"`` replaces only marked
  cells (``:56, 91, 138-145``);
* first/last-name/email stay consistent per row: the email is
  ``first.last@domain`` built from the SAME row's generated name columns
  (``:342-353``);
* gender-consistent first names via the ``first_name_gender`` column
  (``:198-263``) — per ROW, fixing the reference's bug where one row's
  gender decided the whole column (``:208-227``; FIXTURES.md "Known
  reference defects");
* unlike Faker's global RNG, every replacement is a deterministic
  function of the original normalized value, so re-running (or retrying
  a Ray task) reproduces the same output, and equal inputs get equal
  pseudonyms across the whole dataset.

Runs as a stateless ``map_batches`` stage; the assignments dict is tiny
and ships inside the task closure (broadcast, not shuffled).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, Optional

import pandas as pd

from nerpii_ray.config import EngineConfig
from nerpii_ray.functions import pseudonym as pv
from nerpii_ray.functions.textfns import normalize_surface_one

_LAST_NAME_RE = re.compile(r".*?last.*?name.*?")


@dataclass
class SynthesisPlan:
    """Which provider touches which column — the engine's explicit version
    of F1's bookkeeping lists (``faker_generator.py:88-118, 598-606``)."""

    provider_by_column: Dict[str, str] = field(default_factory=dict)
    columns_not_synthesized: list = field(default_factory=list)
    first_name_cols: list = field(default_factory=list)
    last_name_cols: list = field(default_factory=list)
    email_cols: list = field(default_factory=list)


def build_plan(
    assignments: Dict[str, Optional[dict]],
    all_columns: list[str],
    config: Optional[EngineConfig] = None,
) -> SynthesisPlan:
    cfg = config or EngineConfig()
    plan = SynthesisPlan()
    assigned = {
        col: a["entity"]
        for col, a in assignments.items()
        if a is not None and a.get("confidence_score", 0) > cfg.synth_confidence_gate
    }
    plan.columns_not_synthesized = [
        [col, a["entity"]]
        for col, a in assignments.items()
        if a is not None
        and a.get("confidence_score", 0) <= cfg.synth_confidence_gate
        and not _LAST_NAME_RE.match(col.lower())
    ]

    for col, entity in assigned.items():
        cl = col.lower()
        # F2 get_address (faker_generator.py:126-135)
        if (
            entity == "ADDRESS"
            or "indirizzo" in cl
            or (entity == "LOCATION" and ("address" in cl or "indirizzo" in cl))
        ):
            plan.provider_by_column[col] = "street_address"
        # F3 phone (:162-164)
        elif entity == "PHONE_NUMBER":
            plan.provider_by_column[col] = "phone_number"
        # F4 first name (:191-196)
        elif entity == "PERSON" and "first" in cl and "name" in cl:
            plan.provider_by_column[col] = "first_name"
            plan.first_name_cols.append(col)
        # F5 last name (:282-287)
        elif entity == "PERSON" and "last" in cl and "name" in cl:
            plan.provider_by_column[col] = "last_name"
            plan.last_name_cols.append(col)
        # F6 email (:336-338)
        elif entity == "EMAIL_ADDRESS":
            plan.provider_by_column[col] = "email"
            plan.email_cols.append(col)
        # F7 city (:377-382)
        elif entity == "LOCATION" and ("city" in cl or "cities" in cl):
            plan.provider_by_column[col] = "city"
        # F8 state (:405-409)
        elif entity == "LOCATION" and "state" in cl:
            plan.provider_by_column[col] = "state"
        # F9 url (:453)
        elif entity == "URL":
            plan.provider_by_column[col] = "url"
        # F10 zipcode (:476)
        elif entity == "ZIPCODE":
            plan.provider_by_column[col] = "zipcode"
        # F11 credit card (:521-525)
        elif entity in ("CREDIT_CARD_NUMBER", "CREDIT_CARD"):
            plan.provider_by_column[col] = "credit_card"
        # F12 ssn (:554)
        elif entity == "US_SSN":
            plan.provider_by_column[col] = "ssn"
        # F13 country (:577-581)
        elif entity == "LOCATION" and "country" in cl:
            plan.provider_by_column[col] = "country"
        else:
            plan.columns_not_synthesized.append([col, entity])

    # F5 fallback: columns NAMED like a last name synthesize even without
    # an assigned entity (faker_generator.py:309-313)
    if not plan.last_name_cols:
        for col in all_columns:
            cl = col.lower()
            if "last" in cl and "name" in cl and col not in plan.provider_by_column:
                plan.provider_by_column[col] = "last_name"
                plan.last_name_cols.append(col)
    return plan


_SIMPLE_PROVIDERS = {
    "street_address": pv.street_address,
    "phone_number": pv.phone_number,
    "last_name": pv.last_name,
    "city": pv.city,
    "url": pv.url,
    "zipcode": pv.zipcode,
    "credit_card": pv.credit_card_number,
    "ssn": pv.ssn,
    "country": pv.country,
}


def _map_unique(values: pd.Series, fn) -> pd.Series:
    """Apply a per-value provider via the distinct-value set (hot values
    computed once per batch)."""
    uniq = values.dropna().unique()
    lut = {u: fn(normalize_surface_one(str(u))) for u in uniq}
    return values.map(lut)


class Synthesizer:
    """Callable for ``map_batches`` (stateless; plain function semantics,
    class only to carry the plan/config)."""

    def __init__(
        self,
        assignments: Dict[str, Optional[dict]],
        config: Optional[EngineConfig] = None,
    ):
        self.cfg = config or EngineConfig()
        self.assignments = assignments
        self.mark = self.cfg.generation_mark

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        plan = build_plan(self.assignments, [str(c) for c in df.columns], self.cfg)
        df = df.copy()
        gender = df["first_name_gender"] if "first_name_gender" in df.columns else None

        # Marked-cell re-synthesis (faker_generator.py:138-145): the
        # reference draws a FRESH faker value per marked cell.  Our
        # providers key off the original cell value — which for a marked
        # cell is always the literal mark, so every marked cell in a
        # column would collapse to one pseudonym.  Substitute a surrogate
        # key derived from the row's full content + column name before
        # key derivation: distinct rows get distinct pseudonyms, and the
        # key is a pure function of row content, so re-runs/retries (and
        # any re-batching) reproduce identical output.
        marked_masks: Dict[str, pd.Series] = {}
        if self.mark == "*":
            synth_cols = [
                c
                for c in dict.fromkeys(
                    plan.first_name_cols
                    + plan.last_name_cols
                    + list(plan.provider_by_column)
                )
                if c in df.columns
            ]
            row_ids = pd.util.hash_pandas_object(df.astype(str), index=False).astype(str)
            row_ids.index = df.index
            for col in synth_cols:
                m = df[col] == self.mark
                if m.any():
                    marked_masks[col] = m
                    # \x1f separator, NOT \x00: pandas' string hashtable
                    # treats values as NUL-terminated C strings, so a \x00
                    # separator would collapse every surrogate into one
                    df[col] = df[col].mask(m, self.mark + "\x1f" + col + "\x1f" + row_ids)

        def replace(col: str, generated: pd.Series) -> None:
            orig = df[col]
            if self.mark == "*":
                # targeted re-synthesis: only cells that arrived marked
                # change (mask recorded before surrogate substitution)
                m = marked_masks.get(col)
                if m is not None:
                    df[col] = orig.mask(m, generated)
            else:
                df[col] = generated.where(orig.notna(), None)

        first_by_row: Optional[pd.Series] = None
        last_by_row: Optional[pd.Series] = None

        lang = self.cfg.lang

        for col in plan.first_name_cols:
            keys = df[col].map(
                lambda v: normalize_surface_one(str(v)) if pd.notna(v) else ""
            )
            if gender is not None:
                gen = pd.Series(
                    [pv.first_name(k, g, lang=lang) for k, g in zip(keys, gender)],
                    index=df.index,
                )
            else:
                gen = keys.map(lambda k: pv.first_name(k, lang=lang))
            replace(col, gen)
            if first_by_row is None:
                first_by_row = df[col]

        for col in plan.last_name_cols:
            gen = _map_unique(df[col], lambda k: pv.last_name(k, lang=lang))
            replace(col, gen)
            if last_by_row is None:
                last_by_row = df[col]

        for col, provider in plan.provider_by_column.items():
            if provider in ("first_name", "last_name"):
                continue
            if provider == "email":
                # row-consistency join (faker_generator.py:342-353)
                key = df[col].map(
                    lambda v: normalize_surface_one(str(v)) if pd.notna(v) else ""
                )
                domains = key.map(
                    lambda k: pv.email_address(k, lang=lang).rsplit("@", 1)[1]
                )
                if first_by_row is not None and last_by_row is not None:
                    gen = (
                        first_by_row.astype(str).str.lower().str.replace(" ", "")
                        + "."
                        + last_by_row.astype(str).str.lower().str.replace(" ", "")
                        + "@"
                        + domains
                    )
                else:
                    gen = key.map(lambda k: pv.email_address(k, lang=lang))
                replace(col, gen)
                continue
            if provider == "state":
                # 2-char values get abbreviations; per VALUE, improving on
                # the reference's first-row-only sniff (faker_generator.py:412)
                gen = df[col].map(
                    lambda v: (
                        pv.state(
                            normalize_surface_one(str(v)),
                            abbr=len(str(v)) == 2,
                            lang=lang,
                        )
                        if pd.notna(v)
                        else None
                    )
                )
            else:
                fn = _SIMPLE_PROVIDERS[provider]
                gen = _map_unique(df[col], lambda k, f=fn: f(k, lang=lang))
            replace(col, gen)
        return df


def synthesize_dataset(ds, assignments, config: Optional[EngineConfig] = None):
    """Dataset-level synthesis: stateless map_batches, assignments dict
    broadcast in the closure."""
    cfg = config or EngineConfig()
    synth = Synthesizer(assignments, cfg)
    return ds.map_batches(synth, batch_format="pandas", batch_size=cfg.batch_size)


def synthesize_table(
    df: pd.DataFrame, assignments, config: Optional[EngineConfig] = None
) -> pd.DataFrame:
    """Driver-side convenience for small parity tables."""
    return Synthesizer(assignments, config)(df)


def synthesis_report(data, assignments, config: Optional[EngineConfig] = None) -> dict:
    """Structured per-stage synthesis metrics — the engine's F15
    (``synthesis_message``, ``faker_generator.py:608-620``, which only
    prints colored lines; here a machine-readable lineage record).

    ``data`` may be a pandas DataFrame or a ``ray.data.Dataset``; cell
    counts for a Dataset are computed with a combiner-first tree sum
    (one tiny row per column per batch crosses the exchange)."""
    import ray.data as rd

    cfg = config or EngineConfig()
    if isinstance(data, rd.Dataset):
        columns = [str(f) for f in data.schema().names]
    else:
        columns = [str(c) for c in data.columns]
    plan = build_plan(assignments, columns, cfg)
    cols = list(
        dict.fromkeys(
            plan.first_name_cols + plan.last_name_cols + list(plan.provider_by_column)
        )
    )
    cols = [c for c in cols if c in columns]

    def counts_partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            replaced = (
                int((b[c] == cfg.generation_mark).sum())
                if cfg.generation_mark == "*"
                else int(b[c].notna().sum())
            )
            rows.append((c, len(b), replaced))
        return pd.DataFrame(rows, columns=["column", "cells_total", "cells_replaced"])

    if isinstance(data, rd.Dataset):
        from nerpii_ray.stages.agg import grouped_sum

        counts = grouped_sum(
            data, ["column"], ["cells_total", "cells_replaced"],
            partial_fn=counts_partial, adaptive=False,  # keys = table columns
        )
        counts = counts.to_pandas() if isinstance(counts, rd.Dataset) else counts
    else:
        counts = counts_partial(data)
    by_col = counts.set_index("column") if len(counts) else counts

    synthesized = []
    for c in cols:
        a = assignments.get(c)
        synthesized.append(
            {
                "column": c,
                "provider": plan.provider_by_column.get(c),
                "entity": a["entity"] if a else None,
                "cells_total": int(by_col.loc[c, "cells_total"]) if c in getattr(by_col, "index", []) else 0,
                "cells_replaced": int(by_col.loc[c, "cells_replaced"]) if c in getattr(by_col, "index", []) else 0,
            }
        )
    return {
        "synthesized": synthesized,
        "not_synthesized": [list(p) for p in plan.columns_not_synthesized],
        "generation_mark": cfg.generation_mark,
        "lang": cfg.lang,
    }
