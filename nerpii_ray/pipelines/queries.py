"""Registered queries + DuckDB oracle SQL for the driver's correctness
gate (``__ray_entry__.queries()`` / ``oracle_sql()``).

Each entry is one operator/pipeline from SURVEY §2 (or a training-data
op), expressed Ray-Data-first over the driver testdata tables.  Column
names match the SQL exactly; floats are avoided or rounded identically on
both sides so the driver's value-hash comparison is stable.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

QUERIES: Dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: Dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco
