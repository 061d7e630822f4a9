"""Oracle-checked time-series + relational queries over the driver's
testdata tables (events / lineitem / orders / customer / nation / region).

Each entry is ``(spark_fn, oracle_sql)`` where the Spark DataFrame and
the DuckDB SQL produce identical row sets (same column names, rounded
floats, string-formatted timestamps so the hash compare is
representation-stable).  Together these cover the SURVEY.md §2 operator
inventory on the relational side: scans (S1), filters (P1-P7),
joins (J1-J3), aggregations (A1-A6), window functions (W1-W7 analogs),
sorts/top-k (O1-O4), scalar functions (F1-F12).

Reference citations are per-function; the mapping is semantic — e.g. the
"derivative" here is the reference's first-difference kernel
(/root/reference/ts_process/ts_library.py:111-124) re-expressed as a lag
window over an event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

R = 6  # float rounding for oracle hash stability


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parquet timestamps come in as TIMESTAMP_NTZ; session TZ is pinned to
    # UTC so the cast is value-preserving and enables unix_micros etc.
    return spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _cents(col) -> "F.Column":
    """Exact integer surrogate for a 2-decimal double.

    Sums of doubles are order-dependent across engines; sums of int64
    cents are exact and associative, so oracle hash comparison is stable
    (and the same trick is what a production engine would do with
    DecimalType at 100 TB — no float drift across partial aggregates).
    """
    return F.round(col * 100).cast("long")


# ------------------------------------------------------------------ rollups


def q_rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-minute rollup per user (SURVEY §2.4 A6; the raw→1m
    tier on the events stream): count, sum, peak |value| (A1,
    rotd50.f:272-281), first/last event."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id", F.date_trunc("minute", "ts").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_value_c"),
            F.round(F.max(F.abs(F.col("value"))), R).alias("peak_abs_value"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
        .select(
            "user_id",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            "n_events",
            "sum_value_c",
            "peak_abs_value",
            "first_event_id",
            "last_event_id",
        )
    )


SQL_ROLLUP_1M = f"""
SELECT user_id,
       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) AS sum_value_c,
       round(max(abs(value)), {R}) AS peak_abs_value,
       min(event_id) AS first_event_id,
       max(event_id) AS last_event_id
FROM events
GROUP BY 1, date_trunc('minute', ts)
"""


def _rollup_tier(spark: SparkSession, sf_dir: str, unit: str) -> DataFrame:
    """Coarser tiers built by *re-aggregating the 1m tier* (the cascade,
    SURVEY §2.4 A6 / ts_library.py:919-925 decimate fast path) — the
    oracle aggregates raw directly, so this checks cascade == direct."""
    ev = _events(spark, sf_dir)
    t1m = ev.groupBy("user_id", F.date_trunc("minute", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents(F.col("value"))).alias("sum_value_c"),
        F.max(F.abs(F.col("value"))).alias("peak_abs_value"),
    )
    return (
        t1m.groupBy("user_id", F.date_trunc(unit, "bucket").alias("bucket"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_c").alias("sum_value_c"),
            F.round(F.max("peak_abs_value"), R).alias("peak_abs_value"),
        )
        .select(
            "user_id",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            "n_events",
            "sum_value_c",
            "peak_abs_value",
        )
    )


def q_rollup_1h(spark, sf_dir):
    return _rollup_tier(spark, sf_dir, "hour")


def q_rollup_1d(spark, sf_dir):
    return _rollup_tier(spark, sf_dir, "day")


def _sql_rollup_tier(unit: str) -> str:
    return f"""
SELECT user_id,
       strftime(date_trunc('{unit}', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) AS sum_value_c,
       round(max(abs(value)), {R}) AS peak_abs_value
FROM events
GROUP BY 1, date_trunc('{unit}', ts)
"""


# --------------------------------------------------------- window kernels


def q_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interp gap fill (ts_library.py:896-962 linear mode /
    rotd50.f:284-305 InterpTime): null out value on every 50th event,
    reconstruct between prev/next known per user in (ts, event_id) order."""
    ev = _events(spark, sf_dir).withColumn(
        "v", F.when(F.col("event_id") % 50 != 0, F.col("value"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    ev = ev.withColumn("rn", rn)
    known = F.when(F.col("v").isNotNull(), F.struct("rn", "v"))
    # growing frames in both directions — O(n), see operators/gapfill.py
    prev = F.last(known, ignorenulls=True).over(
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = F.last(known, ignorenulls=True).over(
        Window.partitionBy("user_id")
        .orderBy(F.col("rn").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            prev.isNotNull() & nxt.isNotNull(),
            prev["v"]
            + (nxt["v"] - prev["v"])
            * (F.col("rn") - prev["rn"])
            / (nxt["rn"] - prev["rn"]),
        ).otherwise(F.coalesce(prev["v"], nxt["v"]))
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(filled, R).alias("value_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


SQL_GAPFILL_LINEAR = f"""
WITH base AS (
    SELECT event_id, user_id,
           CASE WHEN event_id % 50 <> 0 THEN value END AS v,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
), marked AS (
    SELECT *,
        last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING) AS prev_rn,
        last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING) AS prev_v,
        first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_rn,
        first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
    FROM base
)
SELECT event_id, user_id,
    round(CASE WHEN v IS NOT NULL THEN v
               WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                   THEN prev_v + (next_v - prev_v) * (rn - prev_rn) / (next_rn - prev_rn)
               ELSE coalesce(prev_v, next_v) END, {R}) AS value_filled,
    (v IS NULL) AS was_gap
FROM marked
"""


def q_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First difference / elapsed seconds per user — the reference's
    `derivative` kernel (ts_library.py:111-124) as a lag window."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dtv = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    dval = F.col("value") - F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.when(dtv > 0, dval / (dtv / 1e6)).otherwise(F.lit(0.0)), R
        ).alias("dvalue_dt"),
    )


SQL_DERIVATIVE = f"""
SELECT event_id, user_id,
    round(CASE WHEN dt_us > 0 THEN dval / (dt_us / 1e6) ELSE 0.0 END, {R}) AS dvalue_dt
FROM (
    SELECT event_id, user_id,
        epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_us,
        value - lag(value) OVER w AS dval
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
"""


def q_integrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative trapezoid per user (ts_library.py:96-109, incl. the
    v[0]*dt/2-style half-step first term analog = 0 here)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    step = F.when(
        F.lag("value").over(w).isNotNull(),
        (F.col("value") + F.lag("value").over(w))
        / 2.0
        * ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1e6),
    ).otherwise(F.lit(0.0))
    ev = ev.withColumn("step", step)
    cum = F.sum("step").over(w.rowsBetween(Window.unboundedPreceding, 0))
    # report in value·hours: /3600 makes the decimals non-terminating so
    # round() never lands on a representable decimal tie in either engine
    return ev.select(
        "event_id", "user_id", F.round(cum / 3600.0, R).alias("cum_integral_h")
    )


SQL_INTEGRATE = f"""
SELECT event_id, user_id,
    round(sum(step) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) / 3600.0, {R}) AS cum_integral_h
FROM (
    SELECT event_id, user_id, ts,
        coalesce((value + lag(value) OVER w) / 2.0
                 * ((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6), 0.0) AS step
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
"""


def q_smooth_fir3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-point (0.25, 0.5, 0.25) FIR smoother — the pure-FIR variant of
    the reference's in-place `smooth` (ts_library.py:393-409); edges keep
    the raw sample, matching its boundary behavior."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev, nxt = F.lag("value").over(w), F.lead("value").over(w)
    sm = F.when(
        prev.isNotNull() & nxt.isNotNull(),
        0.25 * prev + 0.5 * F.col("value") + 0.25 * nxt,
    ).otherwise(F.col("value"))
    return ev.select("event_id", "user_id", F.round(sm, R).alias("smoothed"))


SQL_SMOOTH_FIR3 = f"""
SELECT event_id, user_id,
    round(CASE WHEN lag(value) OVER w IS NOT NULL AND lead(value) OVER w IS NOT NULL
          THEN 0.25 * lag(value) OVER w + 0.5 * value + 0.25 * lead(value) OVER w
          ELSE value END, {R}) AS smoothed
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_dc_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtract the per-user mean — the reference's `rdc` DC-removal
    (rotd50/ft_th.f:1-30, iflag 0)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    # exact integer form: (value - mean) * 100 * n  ==  cents*n - sum_cents
    # (float mean subtraction is order-dependent across engines; the int64
    # surrogate is associative and hash-stable)
    dev = _cents(F.col("value")) * F.count(F.lit(1)).over(w) - F.sum(
        _cents(F.col("value"))
    ).over(w)
    return ev.select("event_id", "user_id", dev.alias("dc_dev_scaled"))


SQL_DC_REMOVAL = """
SELECT event_id, user_id,
    CAST(round(value * 100) AS BIGINT) * count(*) OVER w
      - sum(CAST(round(value * 100) AS BIGINT)) OVER w AS dc_dev_scaled
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


# ---------------------------------------------------- aggregates / search


def q_peak_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak = max|x| (Calc_Sa, rotd50/rotd50.f:272-281; PGA
    calcrsp.f:26-47) + event count per user."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.round(F.max(F.abs(F.col("value"))), R).alias("peak_abs"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_PEAK_PER_USER = f"""
SELECT user_id, round(max(abs(value)), {R}) AS peak_abs, count(*) AS n_events
FROM events GROUP BY user_id
"""


def q_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per event_type — the D50 median of the
    RotD50 aggregate (rotd50.f:233-235 + sort.f)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), R).alias("median_value"),
        F.round(F.expr("percentile(value, 0.95)"), R).alias("p95_value"),
    )


SQL_MEDIAN_BY_TYPE = f"""
SELECT event_type,
       round(quantile_cont(value, 0.5), {R}) AS median_value,
       round(quantile_cont(value, 0.95), {R}) AS p95_value
FROM events GROUP BY event_type
"""


def q_first_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First timestamp where |value| ≥ 1.5× the user's mean |value| — the
    Famp1.5 first-crossing search (rotd50.f:238-246): min over a filtered
    set, not a sort."""
    ev = _events(spark, sf_dir)
    thr = ev.groupBy("user_id").agg(
        (1.5 * F.avg(F.abs(F.col("value")))).alias("thr")
    )
    j = ev.join(F.broadcast(thr), "user_id")
    return (
        j.where(F.abs(F.col("value")) >= F.col("thr"))
        .groupBy("user_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_crossing_ts"
            )
        )
    )


SQL_FIRST_CROSSING = """
WITH thr AS (
    SELECT user_id, 1.5 * avg(abs(value)) AS thr FROM events GROUP BY user_id
)
SELECT e.user_id,
       strftime(min(e.ts), '%Y-%m-%d %H:%M:%S') AS first_crossing_ts
FROM events e JOIN thr USING (user_id)
WHERE abs(e.value) >= thr.thr
GROUP BY e.user_id
"""


def q_argmax_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-index tracking (calcrsp.f:81-95) as ranking: the event id at
    each user's max |value| (row_number desc, event_id tie-break)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("value")).desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("peak_event_id"))
    )


SQL_ARGMAX_EVENT = """
SELECT user_id, event_id AS peak_event_id
FROM (
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY abs(value) DESC, event_id) AS rn
    FROM events
) WHERE rn = 1
"""


def q_decimate4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-factor downsample: keep every 4th event per user in time
    order (the `decimate` fast path, ts_library.py:919-925)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") - 1) % 4 == 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.sum("value"), 2).alias("sum_kept"),
        )
    )


SQL_DECIMATE4 = """
SELECT user_id, count(*) AS n_kept, round(sum(value), 2) AS sum_kept
FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
) WHERE (rn - 1) % 4 = 0
GROUP BY user_id
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap per user (the
    synchronize/time-alignment family, process_timeseries.py:45-141,
    recast as the standard lag+cumsum session pattern)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    ev = ev.withColumn(
        "session_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return ev.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.round(
            F.count(F.lit(1)) / F.max("session_id"), R
        ).alias("avg_events_per_session"),
    )


SQL_SESSIONIZE = f"""
WITH g AS (
    SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_s
    FROM events
), s AS (
    SELECT user_id,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_id
    FROM g
)
SELECT user_id, max(session_id) AS n_sessions,
       round(count(*) / max(session_id), {R}) AS avg_events_per_session
FROM s GROUP BY user_id
"""


# ----------------------------------------------------------------- joins


def q_sync_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer alignment of two event streams on a shared 1-minute
    grid per user — `synchronize_all_stations` recast as a time-grid
    join (process_timeseries.py:53-138; 1-sample repair → coalesce 0)."""
    ev = _events(spark, sf_dir)
    types = [r[0] for r in ev.select("event_type").distinct().orderBy("event_type").limit(2).collect()]
    a = (
        ev.where(F.col("event_type") == types[0])
        .groupBy("user_id", F.date_trunc("minute", "ts").alias("bucket"))
        .agg(F.sum(_cents(F.col("value"))).alias("va_c"))
    )
    b = (
        ev.where(F.col("event_type") == types[1])
        .groupBy("user_id", F.date_trunc("minute", "ts").alias("bucket"))
        .agg(F.sum(_cents(F.col("value"))).alias("vb_c"))
    )
    j = a.join(b, ["user_id", "bucket"], "full_outer")
    return j.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.coalesce(F.col("va_c"), F.lit(0)).alias("va_c"),
        F.coalesce(F.col("vb_c"), F.lit(0)).alias("vb_c"),
    )


def _sql_sync_streams(sf_dir: str) -> str:
    import duckdb

    types = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT event_type FROM '{sf_dir}/events.parquet' ORDER BY 1 LIMIT 2"
        ).fetchall()
    ]
    return f"""
WITH a AS (
    SELECT user_id, date_trunc('minute', ts) AS bucket,
           sum(CAST(round(value * 100) AS BIGINT)) AS va_c
    FROM events WHERE event_type = '{types[0]}' GROUP BY 1, 2
), b AS (
    SELECT user_id, date_trunc('minute', ts) AS bucket,
           sum(CAST(round(value * 100) AS BIGINT)) AS vb_c
    FROM events WHERE event_type = '{types[1]}' GROUP BY 1, 2
)
SELECT coalesce(a.user_id, b.user_id) AS user_id,
       strftime(coalesce(a.bucket, b.bucket), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       coalesce(va_c, 0) AS va_c,
       coalesce(vb_c, 0) AS vb_c
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id AND a.bucket = b.bucket
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J1 time alignment as a join): for each event, the
    user's most recent order placed at or before the event timestamp.
    Spark lacks a native as-of join; composed as equi-join on the key +
    range predicate + row_number pick (the engine's scalable variant —
    bucketed merge_asof in applyInPandas — lives in
    operators/analytics.py)."""
    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("custkey"), "ts", "event_id"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    )
    cand = ev.join(orders, "custkey").where(F.col("o_orderdate") <= F.col("ts"))
    # max_by over the (date, orderkey) composite instead of a
    # row_number sort-window: a hash aggregate with map-side partial
    # combine — the shuffle carries one row per event, not one per
    # candidate (the difference between O(events) and O(events×orders)
    # shuffle bytes at scale).
    picked = cand.groupBy("event_id").agg(
        F.max_by(
            F.struct("o_orderkey", "o_totalprice"),
            F.struct("o_orderdate", "o_orderkey"),
        ).alias("best")
    )
    return picked.select(
        "event_id",
        F.col("best.o_orderkey").alias("asof_orderkey"),
        _cents(F.col("best.o_totalprice")).alias("asof_totalprice_c"),
    )


SQL_ASOF_JOIN = """
SELECT event_id, o_orderkey AS asof_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS asof_totalprice_c
FROM (
    SELECT e.event_id, o.o_orderkey, o.o_totalprice,
           row_number() OVER (PARTITION BY e.event_id
                              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
    FROM events e JOIN orders o ON o.o_custkey = e.user_id
    WHERE o.o_orderdate <= e.ts
) WHERE rn = 1
"""


def q_user_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join (J2, station-list lookup): events → customer →
    nation, event stats per nation."""
    ev = _events(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return (
        ev.join(F.broadcast(cust), "user_id")
        .join(F.broadcast(nation), "c_nationkey")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_value_c"),
        )
    )


SQL_USER_NATION_ROLLUP = """
SELECT n.n_name, count(*) AS n_events,
       sum(CAST(round(e.value * 100) AS BIGINT)) AS sum_value_c
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


# ------------------------------------------------- relational classics


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the canonical multi-agg groupBy
    (SURVEY §2.4; Catalyst partial+final hash aggregate)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_c"),
            # price(2dp) × (1-disc)(2dp) = exact 4dp → ×1e4 integer sum
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("sum_disc_price_e4"),
            F.sum(_cents(F.col("l_discount"))).alias("sum_disc_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_c,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS sum_disc_price_e4,
       sum(CAST(round(l_discount * 100) AS BIGINT)) AS sum_disc_c,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style filtered agg — predicate pushdown showcase."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000).cast(
                "long"
            )
        ).alias("revenue_e4")
    )


SQL_REVENUE_FORECAST = """
SELECT sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q_top3_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (SURVEY §2.6 — absent in reference, free in
    Spark): 3 highest-price lineitems per supplier."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "l_suppkey",
            "rnk",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


SQL_TOP3_PER_SUPPLIER = """
SELECT l_suppkey, rnk, l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM (
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           row_number() OVER (PARTITION BY l_suppkey
                              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
    FROM lineitem
) WHERE rnk <= 3
"""


# --------------------------------------------------- scalar function ops


def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine great-circle distance (ts_library.py:126-151) as a pure
    column expression over synthetic coords derived from lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lat1, lon1 = F.radians(F.col("l_discount") * 900 - 45), F.radians(
        F.col("l_tax") * 1800 - 90
    )
    lat2, lon2 = F.radians(F.col("l_quantity") * 1.5 - 37), F.radians(
        F.col("l_extendedprice") % 360 - 180
    )
    h = (
        F.sin((lat2 - lat1) / 2) ** 2
        + F.cos(lat1) * F.cos(lat2) * F.sin((lon2 - lon1) / 2) ** 2
    )
    dist = 2 * 6371.0 * F.asin(F.sqrt(h))
    return li.select(
        "l_orderkey", "l_linenumber", F.round(dist, 4).alias("dist_km")
    )


SQL_HAVERSINE = """
SELECT l_orderkey, l_linenumber,
    round(2 * 6371.0 * asin(sqrt(
        pow(sin((radians(l_quantity * 1.5 - 37) - radians(l_discount * 900 - 45)) / 2), 2)
        + cos(radians(l_discount * 900 - 45)) * cos(radians(l_quantity * 1.5 - 37))
          * pow(sin((radians(fmod(l_extendedprice, 360) - 180)
                     - radians(l_tax * 1800 - 90)) / 2), 2)
    )), 4) AS dist_km
FROM lineitem
"""


def q_rotate30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 horizontal rotation (rotate_timeseries, ts_library.py:730-740)
    over per-user (h1, h2) pairs built from two event-type sums."""
    ev = _events(spark, sf_dir)
    piv = ev.groupBy("user_id").agg(
        (
            F.coalesce(F.sum(F.when(F.col("event_id") % 2 == 0, _cents(F.col("value")))), F.lit(0))
            / 100.0
        ).alias("h1"),
        (
            F.coalesce(F.sum(F.when(F.col("event_id") % 2 == 1, _cents(F.col("value")))), F.lit(0))
            / 100.0
        ).alias("h2"),
    )
    theta = F.radians(F.lit(30.0))
    return piv.select(
        "user_id",
        F.round(F.cos(theta) * F.col("h1") - F.sin(theta) * F.col("h2"), 4).alias(
            "h1_rot"
        ),
        F.round(F.sin(theta) * F.col("h1") + F.cos(theta) * F.col("h2"), 4).alias(
            "h2_rot"
        ),
    )


SQL_ROTATE30 = """
SELECT user_id,
    round(cos(radians(30.0)) * h1 - sin(radians(30.0)) * h2, 4) AS h1_rot,
    round(sin(radians(30.0)) * h1 + cos(radians(30.0)) * h2, 4) AS h2_rot
FROM (
    SELECT user_id,
        coalesce(sum(CASE WHEN event_id % 2 = 0
                     THEN CAST(round(value * 100) AS BIGINT) END), 0) / 100.0 AS h1,
        coalesce(sum(CASE WHEN event_id % 2 = 1
                     THEN CAST(round(value * 100) AS BIGINT) END), 0) / 100.0 AS h2
    FROM events GROUP BY user_id
)
"""


def q_unit_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit projections: m→cm ×100 (file_utilities.py:59-67), g→cm/s²
    ×980.665 (ts_library.py:57), vertical sign flip
    (file_utilities.py:46-57)."""
    ev = _events(spark, sf_dir)
    # outputs are exact decimals (2dp input × decimal constants) →
    # integer-scale so Spark's BigDecimal rounding and DuckDB's
    # multiply-round can't disagree on a decimal tie
    return ev.select(
        "event_id",
        _cents(F.col("value")).alias("value_cm_c"),  # ×100 = cm in centi-units
        # 2dp value × 3dp constant = 5dp exact decimal → ×1e5 is integer
        F.round(F.col("value") * 980.665 * 100000).cast("long").alias("value_cmss_e5"),
        (-_cents(F.col("value"))).alias("value_flipped_c"),
    )


SQL_UNIT_SCALE = """
SELECT event_id,
       CAST(round(value * 100) AS BIGINT) AS value_cm_c,
       CAST(round(value * 980.665 * 100000) AS BIGINT) AS value_cmss_e5,
       -CAST(round(value * 100) AS BIGINT) AS value_flipped_c
FROM events
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column (engine metrics pattern —
    SURVEY §2.8 notes JSON only for lineage metrics) + aggregate."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k.isNull(), 1)).alias("n_null_k"),
    )


SQL_JSON_PROPS = """
SELECT event_type,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       count(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END)
           AS n_null_k
FROM events GROUP BY event_type
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.7 — absent in reference, union analog
    compare_timeseries.py:302-310): users seen in the lexicographically
    first event type but not the second, unioned with the reverse,
    tagged."""
    ev = _events(spark, sf_dir)
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())[:2]
    a = ev.where(F.col("event_type") == types[0]).select("user_id").distinct()
    b = ev.where(F.col("event_type") == types[1]).select("user_id").distinct()
    only_a = a.exceptAll(b).withColumn("side", F.lit("a_not_b"))
    only_b = b.exceptAll(a).withColumn("side", F.lit("b_not_a"))
    both = a.intersect(b).withColumn("side", F.lit("both"))
    return only_a.unionByName(only_b).unionByName(both)


def _sql_set_ops(sf_dir: str) -> str:
    import duckdb

    types = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT event_type FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    )[:2]
    return f"""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = '{types[0]}'),
     b AS (SELECT DISTINCT user_id FROM events WHERE event_type = '{types[1]}')
SELECT user_id, 'a_not_b' AS side FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)
UNION ALL
SELECT user_id, 'b_not_a' AS side FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM a)
UNION ALL
SELECT user_id, 'both' AS side FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
"""


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day) — multi-dimensional rollup metrics
    (free in Spark; SURVEY §2.4 'absent in reference')."""
    ev = _events(spark, sf_dir).withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    return ev.cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_cents(F.col("value"))).alias("sum_value_c"),
    )


SQL_CUBE_COUNTS = """
SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) AS sum_value_c
FROM events
GROUP BY CUBE (event_type, day)
"""


def q_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types to columns per user (conditional aggregation —
    identical semantics spelled as CASE sums in the oracle)."""
    ev = _events(spark, sf_dir)
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())[:3]
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.sum(_cents(F.col("value"))))
    )
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(f"`{t}`"), F.lit(0)).alias(f"sum_{t}_c") for t in types
    ]
    return piv.select(*cols)


def _sql_pivot_types(sf_dir: str) -> str:
    import duckdb

    types = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT event_type FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    )[:3]
    cases = ",\n       ".join(
        f"coalesce(sum(CASE WHEN event_type = '{t}' THEN CAST(round(value * 100) AS BIGINT) END), 0) AS sum_{t}_c"
        for t in types
    )
    return f"SELECT user_id,\n       {cases}\nFROM events GROUP BY user_id"


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct cardinalities (approx_count_distinct is available
    for engine metrics but not cross-engine comparable)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_remove_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 remove_padding (remove_bbp_padding.py:49-110) on the events
    stream: drop the first/last 5 rows per user in (ts, event_id)
    order and renumber from 0."""
    pad = 5
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    df = ev.withColumn("i", F.row_number().over(w) - 1).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    return (
        df.where((F.col("i") >= pad) & (F.col("i") < F.col("n") - pad))
        .select(
            "user_id",
            (F.col("i") - pad).alias("i"),
            "event_id",
            _cents(F.col("value")).alias("value_c"),
        )
    )


SQL_REMOVE_PADDING = """
WITH t AS (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
)
SELECT user_id, i - 5 AS i, event_id,
       CAST(round(value * 100) AS BIGINT) AS value_c
FROM t WHERE i >= 5 AND i < n - 5
"""


# ----------------------------------------- oracle-checked streaming tier


def q_streaming_rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming raw→1m over the events table (10-minute
    watermark, tumbling 1-minute windows, append mode, driven to
    completion with processAllAvailable).  Append emits FINALIZED
    windows only — window_end ≤ max(event time) − watermark — and the
    DuckDB oracle applies exactly that cutoff, so even the streaming
    path is value-checked."""
    import os
    import tempfile
    import uuid

    src = os.path.join(sf_dir, "events.parquet")
    d = tempfile.mkdtemp(prefix="stream_events_")
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(src), link)
    schema = spark.read.parquet(src).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    agg = (
        raw.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.window("ts", "1 minute").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_value_c"),
            F.max(F.abs(F.col("value"))).alias("peak_abs_value"),
        )
    )
    name = "q1m_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").select(
        "user_id",
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n_events",
        "sum_value_c",
        F.round("peak_abs_value", R).alias("peak_abs_value"),
    )


SQL_STREAMING_ROLLUP_1M = f"""
WITH w AS (
    SELECT user_id, date_trunc('minute', ts) AS b,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) AS sum_value_c,
           round(max(abs(value)), {R}) AS peak_abs_value
    FROM events GROUP BY 1, 2
), mx AS (SELECT max(ts) AS m FROM events)
SELECT user_id, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       n_events, sum_value_c, peak_abs_value
FROM w, mx
WHERE b + INTERVAL 1 MINUTE <= m - INTERVAL 10 MINUTE
"""


# ------------------------------------------- oracle-checked tier cascade


def _events_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events mapped into the engine's transcript shape
    (BASELINE.json input_hint), with every 37th turn's ts nulled so the
    cascade exercises linear gap-fill (rotd50.f:284-305 InterpTime
    semantics) under oracle check."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.when(F.col("event_id") % 37 != 0, F.col("ts")).alias("ts"),
    )


def q_cascade_1m_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship raw→1m rollup (gap-fill + one hash-aggregate), in
    md5-hash mode so every non-blob column — including the per-turn-text
    chain hash — is DuckDB-checkable."""
    from ts_process_spark.operators.rollup import rollup_raw_to_1m

    t = rollup_raw_to_1m(_events_as_transcripts(spark, sf_dir), hash_name="md5")
    return t.select(
        "conv_id",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n_turns",
        "n_gapfilled",
        "sum_text_len",
        "peak_text_len",
        F.col("mean_text_len"),
        "first_turn_idx",
        "last_turn_idx",
        F.unix_micros("first_ts").alias("first_us"),
        F.unix_micros("last_ts").alias("last_us"),
        F.col("mean_gap_s"),
        "text_hash",
    )


def q_cascade_1d_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full raw→1m→1h→1d chain; the 1d text_hash is a 3-deep chain of
    bucket-ordered child hashes, reproduced in the oracle's nested
    CTEs — an exact-tier-point check across every retention tier."""
    from ts_process_spark.operators.rollup import full_cascade

    t = full_cascade(_events_as_transcripts(spark, sf_dir), hash_name="md5")["1d"]
    return t.select(
        "conv_id",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n_turns",
        "n_gapfilled",
        "sum_text_len",
        "peak_text_len",
        "first_turn_idx",
        "last_turn_idx",
        F.unix_micros("first_ts").alias("first_us"),
        F.unix_micros("last_ts").alias("last_us"),
        F.col("mean_gap_s"),
        "text_hash",
    )


_SQL_CASCADE_FILLED = """
WITH raw AS (
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx,
           length(props) AS text_len,
           md5(props) AS th,
           CASE WHEN event_id % 37 <> 0 THEN epoch_us(ts) END AS us
    FROM events
), marked AS (
    SELECT *,
        last_value(CASE WHEN us IS NOT NULL THEN turn_idx END IGNORE NULLS)
            OVER w_f AS prev_i,
        last_value(CASE WHEN us IS NOT NULL THEN us END IGNORE NULLS)
            OVER w_f AS prev_us,
        first_value(CASE WHEN us IS NOT NULL THEN turn_idx END IGNORE NULLS)
            OVER w_b AS next_i,
        first_value(CASE WHEN us IS NOT NULL THEN us END IGNORE NULLS)
            OVER w_b AS next_us
    FROM raw
    WINDOW
        w_f AS (PARTITION BY conv_id ORDER BY turn_idx
                ROWS UNBOUNDED PRECEDING),
        w_b AS (PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), filled AS (
    SELECT conv_id, turn_idx, text_len, th,
        CASE WHEN us IS NULL THEN 1 ELSE 0 END AS gf,
        CASE WHEN us IS NOT NULL THEN us
             WHEN prev_us IS NOT NULL AND next_us IS NOT NULL
                  AND next_i <> prev_i
                 THEN prev_us + ((next_us - prev_us) * (turn_idx - prev_i))
                      // (next_i - prev_i)
             ELSE coalesce(prev_us, next_us) END AS us_f
    FROM marked
), t1m AS (
    SELECT conv_id,
        date_trunc('minute', make_timestamp(us_f)) AS bucket_1m,
        count(*) AS n_turns,
        sum(gf) AS n_gapfilled,
        sum(text_len) AS sum_text_len,
        max(text_len) AS peak_text_len,
        min(turn_idx) AS first_turn_idx,
        max(turn_idx) AS last_turn_idx,
        min(us_f) AS first_us,
        max(us_f) AS last_us,
        md5(string_agg(th, chr(31) ORDER BY turn_idx)) AS text_hash
    FROM filled
    WHERE us_f IS NOT NULL
    GROUP BY 1, 2
)
"""

SQL_CASCADE_1M_EVENTS = _SQL_CASCADE_FILLED + f"""
SELECT conv_id,
    strftime(bucket_1m, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
    n_turns, n_gapfilled, sum_text_len, peak_text_len,
    sum_text_len::DOUBLE / n_turns AS mean_text_len,
    first_turn_idx, last_turn_idx, first_us, last_us,
    CASE WHEN n_turns > 1
         THEN (last_us - first_us) / 1e6 / (n_turns - 1) END AS mean_gap_s,
    text_hash
FROM t1m
"""

SQL_CASCADE_1D_EVENTS = _SQL_CASCADE_FILLED + f"""
, t1h AS (
    SELECT conv_id,
        date_trunc('hour', bucket_1m) AS bucket_1h,
        sum(n_turns) AS n_turns,
        sum(n_gapfilled) AS n_gapfilled,
        sum(sum_text_len) AS sum_text_len,
        max(peak_text_len) AS peak_text_len,
        min(first_turn_idx) AS first_turn_idx,
        max(last_turn_idx) AS last_turn_idx,
        min(first_us) AS first_us,
        max(last_us) AS last_us,
        md5(string_agg(text_hash, chr(31) ORDER BY bucket_1m)) AS text_hash
    FROM t1m GROUP BY 1, 2
), t1d AS (
    SELECT conv_id,
        date_trunc('day', bucket_1h) AS bucket_1d,
        sum(n_turns) AS n_turns,
        sum(n_gapfilled) AS n_gapfilled,
        sum(sum_text_len) AS sum_text_len,
        max(peak_text_len) AS peak_text_len,
        min(first_turn_idx) AS first_turn_idx,
        max(last_turn_idx) AS last_turn_idx,
        min(first_us) AS first_us,
        max(last_us) AS last_us,
        md5(string_agg(text_hash, chr(31) ORDER BY bucket_1h)) AS text_hash
    FROM t1h GROUP BY 1, 2
)
SELECT conv_id,
    strftime(bucket_1d, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
    n_turns, n_gapfilled, sum_text_len, peak_text_len,
    first_turn_idx, last_turn_idx, first_us, last_us,
    CASE WHEN n_turns > 1
         THEN (last_us - first_us) / 1e6 / (n_turns - 1) END AS mean_gap_s,
    text_hash
FROM t1d
"""


def queries_ts() -> dict[str, object]:
    return {
        "cascade_1m_events": q_cascade_1m_events,
        "cascade_1d_events": q_cascade_1d_events,
        "streaming_rollup_1m": q_streaming_rollup_1m,
        "remove_padding": q_remove_padding,
        "rollup_1m": q_rollup_1m,
        "rollup_1h": q_rollup_1h,
        "rollup_1d": q_rollup_1d,
        "gapfill_linear": q_gapfill_linear,
        "derivative": q_derivative,
        "integrate_trapezoid": q_integrate,
        "smooth_fir3": q_smooth_fir3,
        "dc_removal": q_dc_removal,
        "peak_per_user": q_peak_per_user,
        "median_by_type": q_median_by_type,
        "first_crossing": q_first_crossing,
        "argmax_event": q_argmax_event,
        "decimate4": q_decimate4,
        "sessionize": q_sessionize,
        "sync_streams": q_sync_streams,
        "asof_join": q_asof_join,
        "user_nation_rollup": q_user_nation_rollup,
        "pricing_summary": q_pricing_summary,
        "revenue_forecast": q_revenue_forecast,
        "top3_per_supplier": q_top3_per_supplier,
        "haversine": q_haversine,
        "rotate30": q_rotate30,
        "unit_scale": q_unit_scale,
        "json_props": q_json_props,
        "set_ops": q_set_ops,
        "cube_counts": q_cube_counts,
        "pivot_types": q_pivot_types,
        "distinct_users": q_distinct_users,
    }


def oracles_ts(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    return {
        "cascade_1m_events": SQL_CASCADE_1M_EVENTS,
        "cascade_1d_events": SQL_CASCADE_1D_EVENTS,
        "streaming_rollup_1m": SQL_STREAMING_ROLLUP_1M,
        "remove_padding": SQL_REMOVE_PADDING,
        "rollup_1m": SQL_ROLLUP_1M,
        "rollup_1h": _sql_rollup_tier("hour"),
        "rollup_1d": _sql_rollup_tier("day"),
        "gapfill_linear": SQL_GAPFILL_LINEAR,
        "derivative": SQL_DERIVATIVE,
        "integrate_trapezoid": SQL_INTEGRATE,
        "smooth_fir3": SQL_SMOOTH_FIR3,
        "dc_removal": SQL_DC_REMOVAL,
        "peak_per_user": SQL_PEAK_PER_USER,
        "median_by_type": SQL_MEDIAN_BY_TYPE,
        "first_crossing": SQL_FIRST_CROSSING,
        "argmax_event": SQL_ARGMAX_EVENT,
        "decimate4": SQL_DECIMATE4,
        "sessionize": SQL_SESSIONIZE,
        "sync_streams": _sql_sync_streams(sf_dir),
        "asof_join": SQL_ASOF_JOIN,
        "user_nation_rollup": SQL_USER_NATION_ROLLUP,
        "pricing_summary": SQL_PRICING_SUMMARY,
        "revenue_forecast": SQL_REVENUE_FORECAST,
        "top3_per_supplier": SQL_TOP3_PER_SUPPLIER,
        "haversine": SQL_HAVERSINE,
        "rotate30": SQL_ROTATE30,
        "unit_scale": SQL_UNIT_SCALE,
        "json_props": SQL_JSON_PROPS,
        "set_ops": _sql_set_ops(sf_dir),
        "cube_counts": SQL_CUBE_COUNTS,
        "pivot_types": _sql_pivot_types(sf_dir),
        "distinct_users": SQL_DISTINCT_USERS,
    }
