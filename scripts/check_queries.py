"""Spot-check named queries against their SQL twins at one sf.

Usage: python scripts/check_queries.py <sf_dir> name [name ...]

Same compare protocol as oracle_sweep.py (sorted columns, sorted rows,
value equality); prints one line per query.  Owns a Ray session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    sf_dir, names = sys.argv[1], sys.argv[2:]
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
    rc = 0
    for name in names:
        try:
            import ray.data as _rd

            out = qs[name](sf_dir)
            df = out.to_pandas() if hasattr(out, "to_pandas") else out
            if hasattr(df, "to_pandas"):
                df = df.to_pandas()
            if (isinstance(out, _rd.Dataset) and df.shape[1] == 0
                    and not len(df)):
                # empty Dataset → rebuild typed columns from its schema
                import pyarrow as _pa

                sch = out.schema()
                df = pd.DataFrame({
                    n: pd.Series(dtype=(
                        t.to_pandas_dtype()
                        if isinstance(t, _pa.DataType) else t))
                    for n, t in zip(sch.names, sch.types)
                })
            if name not in sqls:
                print(f"{name}: rows-only, {len(df)} rows")
                continue
            o = con.execute(sqls[name]).df()
            a, b = norm(df), norm(o)
            ok_schema = list(a.columns) == list(b.columns)
            ok_rows = len(a) == len(b)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              atol=1e-9)
                ok_vals = True
                diff = ""
            except AssertionError as exc:
                ok_vals = False
                diff = str(exc).splitlines()[-1][:160]
            ok = ok_schema and ok_rows and ok_vals
            rc |= 0 if ok else 1
            print(f"{name}: rows {len(a)}/{len(b)} "
                  f"schema={ok_schema} values={ok_vals} "
                  f"{'OK' if ok else 'FAIL ' + diff}")
            if not ok_schema:
                print(f"  engine cols: {list(a.columns)}")
                print(f"  oracle cols: {list(b.columns)}")
        except Exception as exc:  # noqa: BLE001
            rc |= 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
