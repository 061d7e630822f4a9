"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle SQL on DuckDB, compare
row count, column names, per-column dtype KIND, and an order-insensitive
multiset of REPRESENTATION-STRICT values.

Strictness contract (learned from the round-1 driver gate): the driver's
hash is dtype-strict — DuckDB ``sum(BIGINT)`` returns HUGEINT which
materializes as float64 via ``.df()`` and therefore hash-mismatches a
Spark LongType column even when every value is numerically equal.  This
checker reproduces that failure mode locally:

- integers and floats canonicalize differently (``i:1`` vs ``f:1.0``);
- floats use full ``repr`` (no rounding — if the engines disagree in the
  last bit, that's a real finding, fix the query not the checker);
- any DuckDB HUGEINT/DECIMAL output column is flagged loudly as a dtype
  mismatch (the fix is ``CAST(... AS BIGINT)`` / ``::DOUBLE`` in the
  oracle SQL).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

import duckdb

_INT_KINDS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
              "USMALLINT", "UINTEGER"}
_BAD_DUCK = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def duck_kind(t: str) -> str:
    t = str(t).upper()
    if t in _INT_KINDS:
        return "int"
    if t in _BAD_DUCK or t.startswith("DECIMAL"):
        return f"BAD({t})"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "ts"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "BLOB"):
        return "str"
    return t.lower()


def spark_kind(dt: str) -> str:
    d = dt.lower()
    if d in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "int"
    if d in ("double", "float"):
        return "float"
    if d.startswith("timestamp") or d == "date":
        return "ts"
    if d == "boolean":
        return "bool"
    if d in ("string", "binary"):
        return "str"
    return d


def canon(v) -> str:
    """Representation-strict canonical form: int vs float DISTINCT."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "b:" + str(v).lower()
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:" + repr(v)
    if isinstance(v, datetime):
        return "t:" + v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return "t:" + v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        return "DECIMAL:" + str(v)  # deliberately never equal to int/float
    return "s:" + str(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from ts_process_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            skinds = {f.name: spark_kind(f.dataType.simpleString())
                      for f in sdf.schema.fields}
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:28s} SPARK ERROR: {e}")
            continue
        if sql is None:
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        try:
            rel = con.sql(sql)
            dcols = rel.columns
            dkinds = {c: duck_kind(t) for c, t in zip(rel.columns, rel.types)}
            drows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:28s} DUCKDB ERROR: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            for c in scols:
                if dkinds[c].startswith("BAD("):
                    problems.append(
                        f"dtype {c}: duck {dkinds[c]} — CAST it in the oracle"
                    )
                elif skinds[c] != dkinds[c]:
                    problems.append(
                        f"dtype {c}: spark={skinds[c]} duck={dkinds[c]}"
                    )
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sm = df_multiset(scols, [tuple(r) for r in srows])
            dm = df_multiset(dcols, drows)
            if sm != dm:
                diff = [
                    (a, b) for a, b in zip(sm, dm) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"{name:28s} MISMATCH: {'; '.join(problems)[:400]}")
        else:
            print(f"{name:28s} OK ({len(srows)} rows)")
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
