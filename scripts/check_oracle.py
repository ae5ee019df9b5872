"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same parquet tables; compare row count, schema (column names),
and an order-insensitive value hash (columns sorted by name, rows sorted,
values stringified). Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_cell)
    rows = sorted(df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def _cell(v) -> str:
    if v is None or v != v:
        return "\\N"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)) or "ndarray" in type(v).__name__:
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from smart_crawler_spark.session import spark_session

    spark = spark_session(app_name="oracle-check", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            if len(sdf) == 0:
                failures.append(name)
                print(f"FAIL {name}: rows-only query returned 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"schema {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            merged = _first_diff(sdf, odf)
            if merged is not None:
                problems.append(f"first diff: {merged}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match")
    spark.stop()
    scope = "" if ran == len(qs) else f" ({len(qs) - ran} skipped by filter)"
    print(f"\n{ran - len(failures)}/{ran} queries pass{scope}")
    return 1 if failures else 0


def _first_diff(sdf: pd.DataFrame, odf: pd.DataFrame):
    cols = sorted(sdf.columns)
    a = sorted(
        sdf[cols].apply(lambda r: tuple(_cell(v) for v in r), axis=1).tolist()
    )
    b = sorted(
        odf[cols].apply(lambda r: tuple(_cell(v) for v in r), axis=1).tolist()
    )
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return f"row {i}: spark={x} oracle={y}"
    return f"len {len(a)} vs {len(b)}"


if __name__ == "__main__":
    raise SystemExit(main())
