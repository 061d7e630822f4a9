"""Pandas-route replica of the driver's correctness gate: DuckDB
``.df()`` vs Spark ``.toPandas()``, DTYPE-EXACT and VALUE-EXACT.

tools/check_oracles.py canonicalizes values itself; this twin instead
materializes both sides through the same pandas path the driver's hash
plausibly takes, so dtype drift that canonicalization would mask
(float64-via-HUGEINT, int32 vs int64, object columns) shows up as a
hard mismatch.  Round-2 learned that running BOTH predictors catches
strictly more than either alone.

Usage: python tools/check_oracles_pandas.py [sf_dir] [name ...]
(default: every registry query at sf0.01)
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    import __spark_entry__ as E
    from ts_process_spark.session import get_spark

    spark = get_spark("pd_gate_replica", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    q, o = E.queries(), E.oracle_sql()
    names = names or [n for n in q if n in o]
    fails = 0
    for name in names:
        try:
            sp = q[name](spark, sf_dir).toPandas()
            du = con.execute(o[name]).df()
            cols = sorted(sp.columns)
            assert sorted(du.columns) == cols, f"columns {list(du.columns)}"
            sp = sp[cols].sort_values(cols).reset_index(drop=True)
            du = du[cols].sort_values(cols).reset_index(drop=True)
            assert len(sp) == len(du), f"rows {len(sp)} vs {len(du)}"
            for c in cols:
                assert sp[c].dtype == du[c].dtype, (
                    f"dtype[{c}] {sp[c].dtype} vs {du[c].dtype}"
                )
                if sp[c].dtype == object:
                    same = (sp[c].fillna("\0") == du[c].fillna("\0")).all()
                else:
                    a, b = sp[c].values, du[c].values
                    same = ((a == b) | ((a != a) & (b != b))).all()  # NaN==NaN
                assert same, f"values[{c}] differ"
            print(f"{name:28s} OK ({len(sp)} rows, dtypes+values exact)")
        except Exception as e:  # noqa: BLE001 - report and continue
            fails += 1
            print(f"{name:28s} FAIL {e}")
    print(f"\n{fails} failures")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
