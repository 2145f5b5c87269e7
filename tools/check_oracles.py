"""Driver-equivalent oracle check: run queries() vs oracle_sql() in
DuckDB on the same parquet tables, compare row count, sorted-column
schema, and a value hash. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]

Defaults: sf_dir=/root/testdata/sf0.01, all SQL-oracled queries.
"""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.blake2b(digest_size=16)
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(6)
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return len(df), list(df.columns), h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, sql = E.queries(), E.oracle_sql()
    names = sys.argv[2:] or [n for n in qs if n in sql]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    failures = 0
    for name in names:
        if name not in sql:
            print(f"{name}: (no oracle, rows-only)")
            out = qs[name](sf_dir)
            print(f"  rows={out.count() if hasattr(out, 'count') else len(out)}")
            continue
        out = qs[name](sf_dir)
        if hasattr(out, "to_pandas"):
            out = out.to_pandas()
        elif not isinstance(out, pd.DataFrame):
            out = pd.DataFrame(out)
        mine = canon(out)
        ref = canon(con.execute(sql[name]).df())
        ok = mine == ref
        failures += not ok
        print(f"{name}: {'PASS' if ok else 'FAIL'}")
        if not ok:
            print(f"  mine: rows={mine[0]} cols={mine[1]} hash={mine[2]}")
            print(f"  ref : rows={ref[0]} cols={ref[1]} hash={ref[2]}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
