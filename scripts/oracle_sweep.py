"""Driver-style correctness sweep: run every registered query AND its
SQL oracle at a given sf, compare rows / schema / values (sorted columns,
sorted rows — the driver's protocol), print one JSON report.

Usage: python scripts/oracle_sweep.py [sf_dir]  (default sf0.01)

Owns a Ray session (scripts only — library code never calls ray.init).
"""

from __future__ import annotations

import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, sqls = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    report, failures = {}, 0
    for name, fn in qs.items():
        rec: dict = {}
        try:
            out = fn(sf_dir)
            df = out.to_pandas() if hasattr(out, "to_pandas") else out
            if hasattr(df, "to_pandas"):  # pyarrow.Table
                df = df.to_pandas()
            rec["rows"] = int(len(df))
            if name in sqls:
                o = con.execute(sqls[name]).df()
                a, b = norm(df), norm(o)
                rec["oracle_rows"] = int(len(b))
                rec["rows_match"] = len(a) == len(b)
                rec["schema_match"] = list(a.columns) == list(b.columns)
                try:
                    pd.testing.assert_frame_equal(
                        a, b, check_dtype=False, atol=1e-9
                    )
                    rec["values_match"] = True
                except AssertionError as exc:
                    rec["values_match"] = False
                    rec["diff"] = str(exc).splitlines()[-1][:200]
                if not (rec["rows_match"] and rec["schema_match"]
                        and rec["values_match"]):
                    failures += 1
            else:
                rec["oracle"] = "rows-only"
        except Exception as exc:  # noqa: BLE001 - sweep must finish
            rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
            failures += 1
        report[name] = rec
    print(json.dumps(report, indent=1))
    oracled = sum(1 for r in report.values() if "values_match" in r)
    green = sum(1 for r in report.values() if r.get("values_match"))
    print(f"SWEEP: {green}/{oracled} oracled green, "
          f"{len(report) - oracled} rows-only, {failures} failures",
          file=sys.stderr)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
