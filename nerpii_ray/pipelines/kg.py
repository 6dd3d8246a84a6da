"""The flagship pipeline: transcripts → knowledge graph (north rule).

DAG (SURVEY §3 "Engine lifecycle"):

  read_parquet(transcripts, pruned columns)
    → RecognizerActor pool (stateful map_batches; mentions + count rows)
    → [A] histogram combiner → groupby(group_key) → cascade → assignments
          (tiny table; shuffle #1 moves only per-batch partials)
    → [B] canonical IDs fused into the scan (pure fn) → extract_triples
          (stateless map_batches) ∪ tool edges from turns
    → [C] nodes: per-batch distinct → groupby(node_id) first (shuffle #2,
          skew-proof via local distinct) → deterministic pseudonyms
    → write_parquet nodes/ edges/ (+ assignments, lineage, _SUCCESS)

Resume: ``run_kg_partitioned`` processes input shards independently, one
output partition each; shards with a ``_SUCCESS`` marker are skipped.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

from nerpii_ray.config import EngineConfig
from nerpii_ray.sources.readers import read_transcripts
from nerpii_ray.sources.writers import partition_done, write_partition
from nerpii_ray.stages.assign import assign_entities, assignments_to_table
from nerpii_ray.stages.canonicalize import build_nodes
from nerpii_ray.stages.recognize import recognize_mentions
from nerpii_ray.stages.triples import (
    dedup_edges_global,
    extract_tool_edges,
    extract_triples,
)

import pandas as pd

from nerpii_ray.functions.textfns import md5_of_strings


def _actor_tool_nodes(turns_batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch distinct ACTOR / TOOL nodes from the turns table."""
    a = turns_batch[["conv_id", "role"]].drop_duplicates()
    actors = pd.DataFrame(
        {
            "canonical_name": a["conv_id"].astype(str) + ":" + a["role"].astype(str),
            "entity_type": "ACTOR",
        }
    )
    t = turns_batch[
        turns_batch["tool"].notna() & (turns_batch["tool"] != "none")
    ][["tool"]].drop_duplicates()
    tools = pd.DataFrame(
        {"canonical_name": t["tool"].astype(str), "entity_type": "TOOL"}
    )
    out = pd.concat([actors, tools], ignore_index=True)
    out["node_id"] = md5_of_strings(
        out["entity_type"] + ":" + out["canonical_name"]
    ).str[:16]
    out["pseudonym"] = out["canonical_name"]
    return out[["node_id", "entity_type", "canonical_name", "pseudonym"]]


def run_kg(
    turns_ds,
    config: Optional[EngineConfig] = None,
    dedup_edges: bool = False,
    with_assignments: bool = True,
    redact: Optional[str] = None,
):
    """Transcripts Dataset → dict of result Datasets/tables.

    Returns {"mentions": Dataset, "edges": Dataset, "nodes": Dataset,
    "assignments": pandas.DataFrame | None, "redacted": Dataset | None}.

    ``redact`` ("pseudonym" | "tag") fuses redaction into the SAME scan
    that feeds the graph: the recognizer actors emit one redacted-text
    row per turn alongside the mention rows, so the privacy-preserving
    corpus and the KG cost one read of the input instead of two full
    scans.  Every KG consumer filters those rows out by construction
    (null node_id, non-presidio stage, non-count entity).
    """
    import time

    from nerpii_ray.stages.canonicalize import node_rows
    from nerpii_ray.stages.recognize import STAGE_REDACTED

    cfg = config or EngineConfig()
    metrics: dict = {}
    # Three consumers read the mentions (assignment aggregate, triple
    # extraction, node build); without pinning, each would re-run the
    # recognizer scan from scratch.  One materialized intermediate serves
    # all three.  Canonical IDs are FUSED into the recognizer actors
    # (attach_ids): while the actor pool holds the cluster's CPU slots, a
    # separate task stage for IDs would be starved to the leftover slots —
    # measured as a flat 52 s at BOTH 8 and 32 CPUs before fusing.
    t0 = time.monotonic()
    with_ids = recognize_mentions(
        turns_ds, config=cfg, attach_ids=True, emit_redacted=redact
    ).materialize()
    metrics["scan"] = {
        "wall_sec": round(time.monotonic() - t0, 3),
        "mention_rows": with_ids.count(),  # metadata-only on materialized
    }

    redacted = None
    if redact is not None:
        def redacted_turns(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["stage"].astype(str) == STAGE_REDACTED]
            return pd.DataFrame(
                {
                    "conv_id": b["conv_id"],
                    "turn_idx": b["turn_idx"],
                    "role": b["role"].astype(str),
                    "text": b["norm_surface"],
                    "tool": b["tool"].astype(str),
                }
            )

        redacted = with_ids.map_batches(
            redacted_turns, batch_format="pandas", batch_size=cfg.batch_size
        )

    assignments = None
    if with_assignments:
        t0 = time.monotonic()
        assignments = assignments_to_table(assign_entities(with_ids, cfg))
        metrics["assign"] = {
            "wall_sec": round(time.monotonic() - t0, 3),
            "groups_assigned": int(len(assignments)),
        }

    # batch_size=None: process whole blocks.  Blocks are the recognizer's
    # per-input-batch outputs (row-sorted, turn-aligned), so a turn's
    # mentions are never split across calls — required by the per-turn
    # co-occurrence rules.  (Blocks stay far below target_max_block_size,
    # so Ray does not re-split them.)
    entity_edges = with_ids.map_batches(
        lambda b: extract_triples(node_rows(b)),
        batch_format="pandas",
        batch_size=None,
    )
    # tool edges / actor-tool nodes need only the metadata columns —
    # prune `text` (the bulk of the input bytes) so these two re-reads
    # scan kilobytes per row-group, not the corpus.  select_columns
    # pushes the projection into the parquet read.
    turns_meta = turns_ds.select_columns(["conv_id", "turn_idx", "role", "tool"])
    tool_edges = turns_meta.map_batches(
        extract_tool_edges, batch_format="pandas", batch_size=cfg.batch_size
    )
    edges = entity_edges.union(tool_edges)
    if dedup_edges:
        edges = dedup_edges_global(edges, cfg)

    from nerpii_ray.stages.agg import tree_dedup

    entity_nodes = build_nodes(with_ids, cfg)
    at_nodes = tree_dedup(
        turns_meta,
        keys=["node_id"],
        partial_fn=_actor_tool_nodes,
        batch_size=cfg.batch_size,
    )
    nodes = entity_nodes.union(at_nodes)

    return {
        "mentions": with_ids,
        "edges": edges,
        "nodes": nodes,
        "assignments": assignments,
        "redacted": redacted,
        # F15: structured per-stage metrics (lineage record).  edges /
        # nodes stay lazy here, so their rows/wall are recorded by the
        # sink that consumes them (write_graph / write_partition).
        "metrics": metrics,
    }


def write_graph(res: dict, out_dir: str) -> None:
    """Write edges/ and nodes/ concurrently — two independent datasets
    branching off the same materialized intermediate, so their executions
    overlap instead of serializing (driver-side threads; Ray Data
    supports concurrent dataset execution)."""
    from concurrent.futures import ThreadPoolExecutor

    # Ray's write path probes `from fsspec.implementations.http import
    # HTTPFileSystem`, catching only ModuleNotFoundError.  Without aiohttp
    # that import fails, and two threads racing it can observe a partially
    # initialized module → plain ImportError → crash.  Pin a stub module
    # once so the probe import is deterministic (the isinstance check
    # against the stub class is simply never true).
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        stub = types.ModuleType("fsspec.implementations.http")

        class _NeverHTTPFileSystem:
            pass

        stub.HTTPFileSystem = _NeverHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub

    import time

    os.makedirs(out_dir, exist_ok=True)

    def timed_write(key: str):
        t0 = time.monotonic()
        res[key].write_parquet(os.path.join(out_dir, key))
        return {"wall_sec": round(time.monotonic() - t0, 3)}

    with ThreadPoolExecutor(2) as ex:
        fe = ex.submit(timed_write, "edges")
        fn = ex.submit(timed_write, "nodes")
        rec_e, rec_n = fe.result(), fn.result()
    # complete the F15 lineage record with the sink stages and persist it
    metrics = dict(res.get("metrics") or {})
    metrics["write_edges"] = rec_e
    metrics["write_nodes"] = rec_n
    with open(os.path.join(out_dir, "_metrics.json"), "w") as f:
        import json

        json.dump(metrics, f, indent=1)


def run_kg_partitioned(
    in_dir: str,
    out_dir: str,
    config: Optional[EngineConfig] = None,
    files_per_partition: int = 8,
    dedup_edges: bool = False,
    redact: Optional[str] = None,
) -> list[dict]:
    """Checkpointed run: input shards → independent output partitions.

    Each partition is a full sub-pipeline over ``files_per_partition``
    input files (conversations never span files, per the testgen /
    ingest layout), written atomically with lineage; finished partitions
    are skipped on resume.  Assignments are computed per-partition and
    recorded in the partition lineage.
    """
    cfg = config or EngineConfig()
    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    records = []
    for p, lo in enumerate(range(0, len(files), files_per_partition)):
        part_files = files[lo : lo + files_per_partition]
        part_out = os.path.join(out_dir, f"part={p:05d}")
        if partition_done(os.path.join(part_out, "edges")) and partition_done(
            os.path.join(part_out, "nodes")
        ):
            records.append({"partition": p, "skipped": True})
            continue
        turns = read_transcripts(part_files)
        res = run_kg(turns, cfg, dedup_edges=dedup_edges, redact=redact)
        lineage = {
            "partition": p,
            "input_files": part_files,
            "n_assignment_groups": len(res["assignments"]) if res["assignments"] is not None else 0,
        }
        rec_e = write_partition(res["edges"], os.path.join(part_out, "edges"), lineage)
        rec_n = write_partition(res["nodes"], os.path.join(part_out, "nodes"), lineage)
        if res.get("redacted") is not None:
            write_partition(
                res["redacted"], os.path.join(part_out, "redacted"), lineage
            )
        if res["assignments"] is not None:
            os.makedirs(part_out, exist_ok=True)
            res["assignments"].to_parquet(
                os.path.join(part_out, "assignments.parquet")
            )
        records.append({"partition": p, "edges": rec_e, "nodes": rec_n})
    return records
