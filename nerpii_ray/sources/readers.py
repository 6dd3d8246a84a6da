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


def write_ipc_table(ds, path: str) -> int:
    """Arrow IPC (Feather V2) sink: one ``.arrow`` file per block,
    written inside the map tasks (never via the driver).  The companion
    of ``read_ipc_table`` for zero-copy interchange with Arrow-native
    tools; returns the number of files written.

    Retry/lineage safety (ADVICE r4): the filename derives from the
    writing task's identity + per-attempt block ordinal (the exchange's
    fingerprint discipline, stages/exchange.py), NOT a fresh uuid — a
    task re-executed after publishing (worker death post-rename, object
    reconstruction) atomically overwrites the SAME part file instead of
    adding a duplicate, so ``read_ipc_table`` round-trips exactly once.
    """
    import os

    import pyarrow as pa
    import pyarrow.ipc as ipc

    from nerpii_ray.stages.exchange import _batch_fingerprint

    os.makedirs(path, exist_ok=True)

    def write_block(tbl: "pa.Table") -> "pa.Table":
        fp = _batch_fingerprint().replace(":", "-")
        fname = os.path.join(path, f"part-{fp}.arrow")
        tmp = fname + ".inprogress"
        with ipc.new_file(tmp, tbl.schema) as w:
            w.write_table(tbl)
        os.rename(tmp, fname)  # atomic publish, resumable-sink style
        return pa.table({"path": [fname], "rows": [tbl.num_rows]})

    return ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).count()


def read_ipc_table(path: str):
    """Arrow IPC (Feather V2) source: list the directory's ``.arrow``
    files and decode each INSIDE a task (``read_binary_files`` streams
    the bytes through the object store; decode is zero-copy from the
    mmap-able IPC layout) — the driver never holds file contents."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    def decode(b: dict) -> "pa.Table":
        tables = [
            ipc.open_file(pa.BufferReader(raw)).read_all() for raw in b["bytes"]
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return rd.read_binary_files(path, file_extensions=["arrow"]).map_batches(
        decode, batch_format="numpy", batch_size=1
    )
