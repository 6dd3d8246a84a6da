"""Sinks: resumable partitioned Parquet output (SURVEY §2.1 S2, §4).

The reference has no writer at all (in-place DataFrame mutation).  At
100 TB the sink must be restartable: each logical partition writes to its
own directory, commits atomically (temp dir → rename), and drops a
``_SUCCESS`` marker plus a lineage JSON (inputs, row counts, stage
versions).  A resumed run skips any partition whose marker exists — that
is the checkpoint story for a batch pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

import nerpii_ray

SUCCESS = "_SUCCESS"
LINEAGE = "_lineage.json"


def partition_done(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, SUCCESS))


def write_partition(
    ds,
    out_dir: str,
    lineage: Optional[dict] = None,
    min_rows_per_file: int = 500_000,
) -> dict:
    """Write one partition's Dataset atomically; skip if already done.

    Returns the lineage record (from disk when skipping).
    """
    marker = os.path.join(out_dir, SUCCESS)
    lineage_path = os.path.join(out_dir, LINEAGE)
    if os.path.exists(marker):
        with open(lineage_path) as f:
            return json.load(f)

    tmp = out_dir.rstrip("/") + ".inprogress"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # stale half-write from a killed run
    os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    ds.write_parquet(tmp, min_rows_per_file=min_rows_per_file)

    record = dict(lineage or {})
    record.update(
        engine_version=nerpii_ray.__version__,
        wall_sec=round(time.monotonic() - t0, 3),
        out_dir=out_dir,
    )
    with open(os.path.join(tmp, LINEAGE), "w") as f:
        json.dump(record, f, indent=1)
    with open(os.path.join(tmp, SUCCESS), "w") as f:
        f.write("")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    return record
