"""CLI driver — the ``ray job submit`` entry point (north rule).

Examples::

  # transcripts → knowledge graph, checkpointed per input shard
  python -m nerpii_ray kg --input /data/transcripts --output /out/graph

  # nerpii-parity profile of a CSV/Parquet table → assignments JSON
  python -m nerpii_ray profile --input people.csv --gender

  # redact transcripts (pseudonym or tag mode)
  python -m nerpii_ray redact --input /data/transcripts --output /out/red --mode tag

This is the ONLY module in the package that may initialise Ray, and it
guards with ``ray.is_initialized()`` so it also works under a driver
that already owns the session (``ray job submit`` / tests).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_kg(args) -> int:
    from nerpii_ray.config import EngineConfig
    from nerpii_ray.pipelines.kg import run_kg_partitioned

    cfg = EngineConfig()
    records = run_kg_partitioned(
        args.input,
        args.output,
        cfg,
        files_per_partition=args.files_per_partition,
        dedup_edges=args.dedup_edges,
        redact=args.redact,
    )
    done = sum(1 for r in records if not r.get("skipped"))
    skipped = sum(1 for r in records if r.get("skipped"))
    print(json.dumps({"partitions": len(records), "built": done, "resumed_skips": skipped}))
    return 0


def cmd_profile(args) -> int:
    import pandas as pd

    from nerpii_ray.pipelines.profile import profile_table

    if args.input.endswith(".csv"):
        df = pd.read_csv(args.input)
    else:
        df = pd.read_parquet(args.input)
    out = profile_table(
        df, get_gender_option=args.gender, data_sample=args.sample
    )
    print(json.dumps(out, indent=1))
    return 0


def cmd_redact(args) -> int:
    import ray.data as rd

    from nerpii_ray.config import EngineConfig
    from nerpii_ray.stages.redact import redact_transcripts

    ds = rd.read_parquet(args.input)
    out = redact_transcripts(ds, EngineConfig(), mode=args.mode)
    out.write_parquet(args.output)
    print(json.dumps({"rows": out.count(), "output": args.output, "mode": args.mode}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nerpii_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg", help="transcripts → node/edge parquet graph")
    kg.add_argument("--input", required=True)
    kg.add_argument("--output", required=True)
    kg.add_argument("--files-per-partition", type=int, default=8)
    kg.add_argument("--dedup-edges", action="store_true")
    kg.add_argument(
        "--redact", choices=["pseudonym", "tag"], default=None,
        help="also emit a redacted corpus per partition, fused into the "
             "same scan that builds the graph",
    )
    kg.set_defaults(fn=cmd_kg)

    pr = sub.add_parser("profile", help="table → column entity assignments")
    pr.add_argument("--input", required=True)
    pr.add_argument("--gender", action="store_true")
    pr.add_argument("--sample", type=int, default=None)
    pr.set_defaults(fn=cmd_profile)

    rd_ = sub.add_parser("redact", help="transcripts → redacted transcripts")
    rd_.add_argument("--input", required=True)
    rd_.add_argument("--output", required=True)
    rd_.add_argument("--mode", choices=["pseudonym", "tag"], default="pseudonym")
    rd_.set_defaults(fn=cmd_redact)

    args = p.parse_args(argv)
    _ensure_ray(args.num_cpus)
    try:
        return args.fn(args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
