"""Linear-interpolation gap-fill of missing turn timestamps.

Reference analog: ts-process resamples every series to a common dt with
interpolation (`/root/reference/ts_process/ts_library.py:896-962`; the
linear kernel is its Fortran `InterpTime`,
`/root/reference/ts_process/rotd50/rotd50.f:284-305`).  Our input is a
transcript table where ~2% of turns have ``ts IS NULL``; the engine
reconstructs them by linear interpolation between the nearest non-null
timestamps *in turn order*, exactly and deterministically:

    ts[i] = prev_ts + ((next_ts - prev_ts) * (i - prev_i)) DIV (next_i - prev_i)

— all int64 microsecond arithmetic with floor division, so the result is
bit-stable regardless of partitioning and reproducible in the DuckDB
oracle with the same integer expression.  Leading (no previous known) and
trailing (no next known) nulls clamp to the nearest known timestamp.

Implementation is pure JVM window functions — no UDF, whole-stage
codegen end to end; the only shuffle is the per-``conv_id`` exchange,
which the downstream rollup's ``groupBy(conv_id, bucket)`` reuses
(HashPartitioning(conv_id) satisfies the clustered distribution), so
gap-fill + rollup is a single-shuffle plan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_ts(df: DataFrame) -> DataFrame:
    """Add ``ts_filled`` (timestamp, never null if the conv has ≥1 known
    ts) and ``gapfilled`` (boolean) to a transcript DataFrame."""
    # Both lookups use GROWING frames (unboundedPreceding → current row),
    # which Spark evaluates incrementally in O(n); the tempting
    # first(ignorenulls) over an unbounded-FOLLOWING frame re-aggregates
    # the frame per row — O(n²) on a hot conversation — so "next known"
    # is a last() over the reverse ordering instead.
    w_fwd = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_bwd = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    known = F.when(
        F.col("ts").isNotNull(),
        F.struct(F.col("turn_idx").alias("i"), F.unix_micros("ts").alias("us")),
    )
    prev = F.last(known, ignorenulls=True).over(w_fwd)
    nxt = F.last(known, ignorenulls=True).over(w_bwd)
    out = (
        df.withColumn("_prev_i", prev["i"])
        .withColumn("_prev_us", prev["us"])
        .withColumn("_next_i", nxt["i"])
        .withColumn("_next_us", nxt["us"])
    )
    # interior: exact int64 interp with `div` (both operands positive, so
    # Spark's truncating div == DuckDB's `//`); edges: clamp to nearest.
    interp_us = F.when(
        F.col("_prev_us").isNotNull()
        & F.col("_next_us").isNotNull()
        & (F.col("_next_i") != F.col("_prev_i")),
        F.expr(
            "_prev_us + ((_next_us - _prev_us) * (cast(turn_idx as bigint) - _prev_i))"
            " div (_next_i - _prev_i)"
        ),
    ).otherwise(F.coalesce(F.col("_prev_us"), F.col("_next_us")))
    return (
        out.withColumn(
            "ts_filled",
            F.when(F.col("ts").isNotNull(), F.col("ts")).otherwise(
                F.timestamp_micros(interp_us)
            ),
        )
        .withColumn("gapfilled", F.col("ts").isNull() & F.col("ts_filled").isNotNull())
        .drop("_prev_i", "_prev_us", "_next_i", "_next_us")
    )


# The DuckDB oracle SQL for gap-fill lives inline in
# queries_ts._SQL_CASCADE_FILLED / SQL_GAPFILL_LINEAR (the forms the
# driver actually runs); an earlier template here drifted from the
# engine's gapfilled definition on all-null conversations and was
# removed rather than fixed (review finding: dead code with divergent
# semantics is worse than no code).
