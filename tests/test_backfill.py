"""Resume-protocol tests: kill the cascade mid-backfill, re-run, assert
identical final state and no double-processing (SURVEY §5.4)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts_process_spark.datagen import transcripts
from ts_process_spark.operators.rollup import full_cascade
from ts_process_spark.plans.backfill import TableSet, backfill, verify_lineage

N_CONVS = 8
N_BUCKETS = 4


@pytest.fixture(scope="module")
def raw(spark):
    return transcripts(spark, n_convs=N_CONVS, seed=3, median_turns=10).cache()


def _tier_frame(df):
    return (
        df.select(
            "conv_id", "bucket_ts", "n_turns", "sum_text_len", "text_hash",
            F.md5("ts_blob").alias("tsb"), F.md5("val_blob").alias("vlb"),
        )
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
    )


def test_backfill_crash_and_resume(spark, raw, tmp_path):
    tables = TableSet(str(tmp_path / "t"))
    # crash after 5 units, after the 5th data write but before its lineage
    r1 = backfill(spark, raw, tables, n_buckets=N_BUCKETS, fail_after=5)
    assert r1.get("crashed")
    assert r1["committed"] == 4
    assert len(tables.committed()) == 4

    # resume: must redo the uncommitted 5th unit, skip the 4 committed
    r2 = backfill(spark, raw, tables, n_buckets=N_BUCKETS)
    assert r2["skipped"] == 4
    assert r2["committed"] == 3 * N_BUCKETS - 4
    assert len(tables.committed()) == 3 * N_BUCKETS

    # final tiers == direct full cascade (blobs and hashes included)
    direct = full_cascade(raw)
    for tier in ("1m", "1h", "1d"):
        got = _tier_frame(tables.read_tier(spark, tier))
        exp = _tier_frame(direct[tier])
        pd.testing.assert_frame_equal(got, exp)

    # idempotence: a third run does nothing and lineage doesn't grow
    n_lineage = len(tables.read_lineage())
    r3 = backfill(spark, raw, tables, n_buckets=N_BUCKETS)
    assert r3["committed"] == 0 and r3["skipped"] == 3 * N_BUCKETS
    assert len(tables.read_lineage()) == n_lineage

    # integrity sweep
    assert verify_lineage(spark, tables) == []


def test_lineage_detects_tamper(spark, raw, tmp_path):
    tables = TableSet(str(tmp_path / "t2"))
    backfill(spark, raw, tables, n_buckets=2)
    # overwrite one committed partition with wrong content
    victim = tables.partition_dir("1d", 0)
    tables.read_tier(spark, "1d").limit(1).write.mode("overwrite").parquet(victim)
    problems = verify_lineage(spark, tables)
    assert any("1d/0" in p for p in problems)


def test_backfill_parallel_matches_serial(spark, raw, tmp_path):
    """parallelism=4 must produce the SAME committed set and per-unit
    value hashes as the serial run (bucket chains are independent; the
    commit protocol is per unit), and resuming a parallel backfill must
    skip everything."""
    ser = TableSet(str(tmp_path / "ser"))
    par = TableSet(str(tmp_path / "par"))
    backfill(spark, raw, ser, n_buckets=N_BUCKETS)
    r = backfill(spark, raw, par, n_buckets=N_BUCKETS, parallelism=4)
    assert r["committed"] == 3 * N_BUCKETS

    def key_hashes(t):
        return {
            (rec["tier"], rec["bucket_id"]): (rec["rows_out"], rec["value_hash"])
            for rec in t.read_lineage()
        }

    assert key_hashes(par) == key_hashes(ser)
    assert verify_lineage(spark, par) == []

    r2 = backfill(spark, raw, par, n_buckets=N_BUCKETS, parallelism=4)
    assert r2["skipped"] == 3 * N_BUCKETS and r2["committed"] == 0

    with pytest.raises(ValueError):
        backfill(spark, raw, par, n_buckets=N_BUCKETS, parallelism=2, fail_after=1)
