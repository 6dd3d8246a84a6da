"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).  Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in nerpii_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic transcripts at sf0.001 →
    full KG construction (recognizer actor pool → assignments → triples →
    canonical nodes) → the edges Dataset."""
    import ray.data as rd

    from nerpii_ray.config import EngineConfig
    from nerpii_ray.pipelines.kg import run_kg
    from nerpii_ray.testgen import transcripts_for_sf

    tdir = transcripts_for_sf(0.001)
    turns = rd.read_parquet(tdir)
    res = run_kg(turns, EngineConfig(), with_assignments=False)
    return res["edges"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from nerpii_ray.pipelines import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from nerpii_ray.pipelines import queries as q

    return q.ORACLE_SQL
