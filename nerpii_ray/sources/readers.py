"""Sources (SURVEY §2.1 S1).

The reference loads eagerly with ``pd.read_csv`` when given a path
(``named_entity_recognizer.py:310-311``, ``faker_generator.py:78-79``).
The engine's primary contract is Parquet via ``ray.data.read_parquet``
with column pruning pushed to the read; CSV is kept for nerpii-parity
fixtures.
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data as rd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(path: str, columns: Optional[Sequence[str]] = None):
    """Read a transcript Parquet dir/file, pruning to the needed columns.

    The recognizer path never needs ``ts``, so the default projection
    drops it at the read (row groups for unused columns never leave
    storage).
    """
    cols = list(columns) if columns is not None else ["conv_id", "turn_idx", "role", "text", "tool"]
    return rd.read_parquet(path, columns=cols)


def read_table(path: str, columns: Optional[Sequence[str]] = None):
    return rd.read_parquet(path, columns=list(columns) if columns else None)


def read_csv_table(path: str):
    """nerpii-parity CSV ingestion (named_entity_recognizer.py:310-311)."""
    return rd.read_csv(path)


def read_jsonl_table(path: str):
    """JSONL ingestion (``ray.data.read_json``): the interchange format
    training-data drops usually arrive in before they are parqueted.
    Schema is inferred per block; pair with an explicit projection +
    cast stage downstream when the corpus is heterogenous."""
    return rd.read_json(path)


def write_jsonl_table(ds, path: str):
    """JSONL export twin of ``read_jsonl_table`` (one file per block)."""
    ds.write_json(path)
