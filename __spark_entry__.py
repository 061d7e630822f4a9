"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — maps the sf0.001 events stream into the
  engine's transcript shape and runs the raw→1m rollup tier (gap-fill +
  aggregates + Gorilla/DoD blobs), returning the tier DataFrame.
- ``queries()``: operator inventory from SURVEY.md §2 as (spark, sf_dir)
  callables over the driver's testdata tables.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (omitted only for
  genuinely non-SQL-expressible kernels → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ts_process_spark.operators.rollup import rollup_raw_to_1m

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    raw = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),  # parquet NTZ → TS (UTC session)
    )
    return rollup_raw_to_1m(raw)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE: the driver evaluates the FIRST 50 registry entries in
    # insertion order; the three modules below register exactly 50
    # (19 ts + 24 docs + 7 signals) so every entry gets a CORRECTNESS
    # row.  A silent import failure here would shrink the registry
    # without anyone noticing — fail loudly instead.
    import sys
    import traceback

    out: dict[str, Callable] = {}
    for mod, fn in (
        ("ts_process_spark.queries_ts", "queries_ts"),
        ("ts_process_spark.queries_docs", "queries_docs"),
        ("ts_process_spark.queries_signals", "queries_signals"),
    ):
        try:
            m = __import__(mod, fromlist=[fn])
            out.update(getattr(m, fn)())
        except Exception:
            print(f"REGISTRY IMPORT FAILED: {mod}", file=sys.stderr)
            traceback.print_exc()
    # the registry is a CONTRACT: exactly 50 entries, enforced by
    # tests/test_training_ops.py::test_registry_contract.  At driver
    # runtime, degrade gracefully: a single module import failure should
    # score the surviving partial registry, not zero out all 50 (and
    # oracle_sql() below already degrades the same way).
    if len(out) != 50:
        print(
            f"REGISTRY CONTRACT VIOLATED: {len(out)} entries != 50 "
            "(see stderr for any module import tracebacks); "
            "returning the partial registry",
            file=sys.stderr,
        )
        # make the degradation OBSERVABLE in the scored output, not just
        # a stderr line: a sentinel row the driver will record (rows-only,
        # no oracle) so a shrunken registry cannot pass unnoticed
        n_present = len(out)

        def _registry_degraded_sentinel(spark, sf_dir, _n=n_present):
            return spark.createDataFrame(
                [(_n, 50, "see driver stderr for import tracebacks")],
                "n_present INT, n_expected INT, note STRING",
            )

        out["zz_registry_degraded"] = _registry_degraded_sentinel
    return out


def oracle_sql() -> dict[str, str]:
    import sys
    import traceback

    out: dict[str, str] = {}
    for mod, fn in (
        ("ts_process_spark.queries_ts", "oracles_ts"),
        ("ts_process_spark.queries_docs", "oracles_docs"),
        ("ts_process_spark.queries_signals", "oracles_signals"),
    ):
        try:
            m = __import__(mod, fromlist=[fn])
            out.update(getattr(m, fn)())
        except Exception:
            print(f"ORACLE IMPORT FAILED: {mod}", file=sys.stderr)
            traceback.print_exc()
    return {k: v for k, v in out.items() if v is not None}
