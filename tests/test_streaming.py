"""Streaming raw→1m tier == batch aggregate for every finalized window
(append mode emits only windows sealed by the watermark)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts_process_spark.datagen import transcripts
from ts_process_spark.streaming.ingest import run_stream_to_memory


@pytest.mark.parametrize("n_convs", [6])
def test_stream_matches_batch(spark, tmp_path, n_convs):
    path = str(tmp_path / "raw")
    raw = transcripts(spark, n_convs=n_convs, seed=5, median_turns=15)
    raw.repartition(4).write.mode("overwrite").parquet(path)
    static = spark.read.parquet(path).where(F.col("ts").isNotNull())

    got = run_stream_to_memory(spark, path).cache()

    # batch reference, restricted to windows the stream has finalized:
    # window end ≤ final watermark = max(ts) − 10 min
    max_ts = static.agg(F.max("ts")).first()[0]
    batch = (
        static.groupBy("conv_id", F.window("ts", "1 minute").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.max(F.length("text")).alias("peak_text_len"),
            F.min("turn_idx").alias("first_turn_idx"),
            F.max("turn_idx").alias("last_turn_idx"),
        )
        .where(
            F.col("win.end") <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
        )
        .select(
            "conv_id", F.col("win.start").alias("bucket_ts"),
            "n_turns", "sum_text_len", "peak_text_len",
            "first_turn_idx", "last_turn_idx",
        )
    )
    got_pd = got.orderBy("conv_id", "bucket_ts").toPandas()
    exp_pd = batch.orderBy("conv_id", "bucket_ts").toPandas()
    # the stream may additionally emit some not-yet-due windows on the
    # final trigger boundary; every batch-finalized window must be there
    # with identical values
    merged = exp_pd.merge(
        got_pd, on=["conv_id", "bucket_ts"], how="left", suffixes=("", "_s")
    )
    assert not merged["n_turns_s"].isna().any()
    for c in ("n_turns", "sum_text_len", "peak_text_len",
              "first_turn_idx", "last_turn_idx"):
        assert (merged[c] == merged[f"{c}_s"]).all(), c
    assert len(exp_pd) > 0


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """The stateful streaming sessionizer (applyInPandasWithState) must
    emit exactly the batch-computed sessions that are sealed by the
    final watermark — same boundaries, counts, and text-length sums —
    regardless of file/batch arrival order."""
    from ts_process_spark.streaming.ingest import run_sessionize_stream_to_memory

    path = str(tmp_path / "raw_s")
    raw = transcripts(spark, n_convs=8, seed=11, median_turns=25)
    raw.repartition(5).write.mode("overwrite").parquet(path)
    static = spark.read.parquet(path).where(F.col("ts").isNotNull())

    gap_s = 120  # small gap so the fixture has many sessions
    got = run_sessionize_stream_to_memory(spark, path, gap_s=gap_s).cache()

    # batch reference: lag+cumsum sessionization, keep sessions sealed
    # by the final watermark (max ts − 10 min)
    from pyspark.sql import Window

    max_ts = static.agg(F.max("ts")).first()[0]
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1).otherwise(0)
    sessed = static.withColumn(
        "session_id", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    batch = (
        sessed.groupBy("conv_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("sum_text_len"),
        )
        .where(
            # STRICT <, matching the stream's seal rule: a session whose
            # merge window still touches the watermark stays open (an
            # admissible event at ts == watermark with ts − end == gap
            # would merge under batch semantics)
            F.col("session_end") + F.expr(f"INTERVAL {gap_s} SECONDS")
            < F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
        )
        .select("conv_id", "session_start", "session_end", "n_turns", "sum_text_len")
    )
    got_rows = sorted(map(tuple, got.collect()))
    batch_rows = sorted(map(tuple, batch.collect()))
    assert len(batch_rows) > 5  # fixture actually exercises sealing
    assert got_rows == batch_rows


def test_stream_exact_dedup(spark, tmp_path):
    """Streaming exact dedup keeps one row per (conv, text-digest)
    within the watermark horizon and never emits a duplicate, matching
    batch dropDuplicates on the same keys."""
    import pandas as pd
    import uuid

    from ts_process_spark.datagen import TRANSCRIPT_SCHEMA
    from ts_process_spark.streaming.ingest import stream_exact_dedup, stream_raw

    path = str(tmp_path / "raw_d")
    raw = transcripts(spark, n_convs=6, seed=7, median_turns=12)
    # force real duplicates: union the table with itself.  ONE file →
    # one microbatch → watermark 0 while it processes, so no conv can be
    # dropped as late and the equality below is deterministic (the
    # multi-batch late-drop behavior is the rollup test's subject).
    raw.unionByName(raw).coalesce(1).write.mode("overwrite").parquet(path)

    name = "dedup_" + uuid.uuid4().hex[:8]
    q = (
        stream_exact_dedup(stream_raw(spark, path))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(f"SELECT conv_id, digest, count(*) c FROM {name} "
                    "GROUP BY 1, 2 HAVING count(*) > 1")
    assert got.count() == 0  # no key emitted twice
    static = spark.read.parquet(path).where(F.col("ts").isNotNull())
    n_keys = (
        static.select("conv_id", F.xxhash64("text").alias("digest"))
        .distinct()
        .count()
    )
    n_got = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
    assert n_got == n_keys  # every distinct key survives exactly once


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join == the batch join for every pair
    whose interval both watermarks have sealed; join state is evicted
    (bounded) by the time-range condition + watermarks."""
    from ts_process_spark.streaming.ingest import run_interval_join_to_memory

    tpath = str(tmp_path / "turns")
    apath = str(tmp_path / "acks")
    raw = transcripts(spark, n_convs=6, seed=9, median_turns=15).where(
        F.col("ts").isNotNull()
    )
    raw.repartition(4).write.mode("overwrite").parquet(tpath)
    # acks: every third turn acknowledged 30s later
    (
        raw.where(F.col("turn_idx") % 3 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 SECONDS"))
        .repartition(4)
        .write.mode("overwrite")
        .parquet(apath)
    )
    got = run_interval_join_to_memory(spark, tpath, apath, max_delay_s=120)
    turns = spark.read.parquet(tpath)
    acks = spark.read.parquet(apath)
    batch = (
        turns.alias("t")
        .join(
            acks.alias("a"),
            (F.col("t.conv_id") == F.col("a.conv_id"))
            & (F.col("a.ts") > F.col("t.ts"))
            & (F.col("a.ts") <= F.col("t.ts") + F.expr("INTERVAL 120 SECONDS")),
        )
        .select(
            F.col("t.conv_id").alias("conv_id"),
            F.col("t.turn_idx").alias("turn_idx"),
            F.col("t.ts").alias("turn_ts"),
            F.col("a.ts").alias("ack_ts"),
            F.col("a.role").alias("ack_role"),
        )
    )
    # append mode emits pairs sealed by both watermarks (10 min before
    # each side's max event time); restrict the batch reference the
    # same way
    wm_t = turns.agg(F.max("ts")).first()[0]
    wm_a = acks.agg(F.max("ts")).first()[0]
    import datetime as _dt

    seal = min(wm_t, wm_a) - _dt.timedelta(minutes=10)
    sealed = batch.where(
        (F.col("ack_ts") < F.lit(seal)) & (F.col("turn_ts") < F.lit(seal))
    )
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in sealed.collect()}
    assert want_rows, "fixture produced no sealed pairs"
    assert want_rows <= got_rows  # every sealed pair emitted
    all_rows = {tuple(r) for r in batch.collect()}
    assert got_rows <= all_rows  # nothing invented
