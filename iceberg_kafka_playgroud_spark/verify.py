"""Local oracle-parity harness.

Mirrors the driver's correctness gate: run each ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet
fixtures, then compare row count + column names + order-insensitive
values EXACTLY (no float tolerance — the engine is designed so floats
match bit-for-bit; see ``functions.scalar``).

Usage:  python -m iceberg_kafka_playgroud_spark.verify [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import sys
from decimal import Decimal

from pyspark.sql import DataFrame

from .schema import FIXTURE_TABLES


def _norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return _normalize(cols, rows)


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return _normalize(cols, rows)


def register_duckdb_views(con, sf_dir: str) -> None:
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )


def compare(name: str, s: tuple, d: tuple) -> list[str]:
    errs: list[str] = []
    s_cols, s_rows = s
    d_cols, d_rows = d
    if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
        errs.append(f"{name}: columns differ spark={s_cols} duckdb={d_cols}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"{name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            errs.append(f"{name}: first diff at sorted-row {i}:\n  spark ={a}\n  duckdb={b}")
            break
    return errs


def main() -> int:
    import duckdb

    from . import session as sess

    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.001"
    only = set(a for a in argv if "/" not in a)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = sess.get_spark("oracle-parity")
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)

    n_ok = n_bad = n_skip = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            # rows-only check, like the driver's weaker path
            try:
                cnt = fn(spark, sf_dir).count()
                print(f"  ~ {name}: rows-only ({cnt} rows)")
                n_skip += 1
            except Exception as e:  # noqa: BLE001
                print(f"  ✗ {name}: FAILED rows-only: {e}")
                n_bad += 1
            continue
        try:
            s = spark_result(fn(spark, sf_dir))
            d = duckdb_result(con, oracles[name])
            errs = compare(name, s, d)
        except Exception as e:  # noqa: BLE001
            errs = [f"{name}: EXception {type(e).__name__}: {e}"]
        if errs:
            n_bad += 1
            for e in errs:
                print(f"  ✗ {e}")
        else:
            n_ok += 1
            print(f"  ✓ {name} ({len(s[1])} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad, {n_skip} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
