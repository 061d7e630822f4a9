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
    from ts_process_spark.queries_ts import queries_ts

    out: dict[str, Callable] = {}
    out.update(queries_ts())
    try:
        from ts_process_spark.queries_docs import queries_docs

        out.update(queries_docs())
    except ImportError:
        pass
    try:
        from ts_process_spark.queries_signals import queries_signals

        out.update(queries_signals())
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from ts_process_spark.queries_ts import oracles_ts

    out: dict[str, str] = {}
    out.update(oracles_ts())
    try:
        from ts_process_spark.queries_docs import oracles_docs

        out.update(oracles_docs())
    except ImportError:
        pass
    return {k: v for k, v in out.items() if v is not None}
