"""Checkpoint-resumable tier backfill with per-partition lineage.

Design (SURVEY §7.5; BASELINE.json "resumable from checkpoint with
per-partition lineage + metrics"):

- **Partition unit = conversation hash-bucket**
  ``bucket_id = pmod(xxhash64(conv_id), n_buckets)`` — each unit holds
  *whole* conversations, so gap-fill (which needs a conv's neighbor
  turns) is self-contained per unit: no cross-partition overlap reads,
  no day-boundary interpolation hazards.  This is the local emulation of
  Iceberg's ``bucket(N, conv_id)`` partition transform; time-range
  pruning inside a bucket comes from parquet row-group stats after
  ``sortWithinPartitions(conv_id, bucket_ts)``.
- **Commit protocol**: for each pending (tier, bucket): write the tier
  partition directory (an idempotent full overwrite of that directory),
  THEN append the lineage record.  A crash between the two leaves a
  partition without lineage — the re-run simply overwrites it.  Lineage
  is the source of truth for completeness, never the data files.
- **Lineage row**: run_id, tier, bucket_id, rows_in, rows_out,
  value_hash (xor-fold of row xxhash64s — order-independent, cheap to
  verify), started/committed wall times.  ``resume`` = anti-join of the
  pending set against committed lineage keys.

On a real cluster this layer sits on Iceberg (snapshot ids instead of
directory overwrites); the jar is not in this sandbox, so the same
protocol is implemented over partitioned parquet directories — the
commit-ordering and resume logic is identical.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_process_spark.operators.rollup import rollup_cascade, rollup_raw_to_1m

TIER_ORDER = ["1m", "1h", "1d"]


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def value_hash(df: DataFrame, cols: list[str]) -> int:
    """Order-independent content hash: bit-xor fold of per-row xxhash64
    over the checked columns (blob columns excluded — codec
    correctness is tested separately, SURVEY §7.4.5)."""
    return count_and_hash(df, cols)[1]


def count_and_hash(df: DataFrame, cols: list[str]) -> tuple[int, int]:
    """(row count, value_hash) in ONE aggregation job — the commit and
    verify paths each need both, and two separate actions doubled the
    post-write read cost per unit (review finding)."""
    row = (
        df.select(F.xxhash64(*cols).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("coalesce(bit_xor(h), 0)").alias("x"),
        )
        .first()
    )
    return int(row["n"]), int(row["x"])


HASH_COLS = [
    "conv_id",
    "bucket_ts",
    "n_turns",
    "n_gapfilled",
    "sum_text_len",
    "peak_text_len",
    "first_turn_idx",
    "last_turn_idx",
    "first_ts",
    "last_ts",
    "text_hash",
]


@dataclass
class TableSet:
    """Directory layout for one lineage of tier tables."""

    root: str

    def tier_dir(self, tier: str) -> str:
        return os.path.join(self.root, f"tier_{tier}")

    def partition_dir(self, tier: str, bucket_id: int) -> str:
        return os.path.join(self.tier_dir(tier), f"bucket_id={bucket_id}")

    @property
    def lineage_path(self) -> str:
        return os.path.join(self.root, "_lineage.jsonl")

    def read_lineage(self) -> list[dict]:
        if not os.path.exists(self.lineage_path):
            return []
        with open(self.lineage_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def committed(self) -> set[tuple[str, int]]:
        return {(r["tier"], r["bucket_id"]) for r in self.read_lineage()}

    def append_lineage(self, rec: dict) -> None:
        # single-writer append; on Iceberg this is the snapshot commit
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.read.parquet(self.tier_dir(tier))


def backfill(
    spark: SparkSession,
    raw: DataFrame,
    tables: TableSet,
    n_buckets: int = 8,
    max_units: int | None = None,
    fail_after: int | None = None,
    parallelism: int = 1,
) -> dict:
    """Run (or resume) the raw→1m→1h→1d cascade bucket by bucket.

    ``max_units`` / ``fail_after`` exist for the resume tests: stop after
    N (tier, bucket) commits, simulating a mid-backfill crash (serial
    mode only).  Returns {"committed": k, "skipped": s}.

    ``parallelism > 1`` runs BUCKET CHAINS concurrently (round-2 VERDICT
    #6): buckets are independent by construction (whole conversations
    per bucket), so each worker thread drives its own chain of Spark
    jobs — tiers stay ordered within a bucket, the lineage append is the
    only serialized step (one lock), and each thread tags its jobs with
    a scheduler pool so a straggler bucket can't starve the rest.  The
    commit protocol (overwrite THEN lineage) is per unit and unchanged,
    so crash-resume semantics are identical at any parallelism."""
    import threading

    run_id = uuid.uuid4().hex[:12]
    os.makedirs(tables.root, exist_ok=True)
    done = tables.committed()
    bucketed = with_bucket(raw, n_buckets)
    if parallelism > 1 and (max_units is not None or fail_after is not None):
        raise ValueError("crash-simulation knobs require parallelism=1")

    lock = threading.Lock()
    counts = {"committed": 0, "skipped": 0}

    def run_bucket(bucket_id: int) -> bool:
        """One bucket's tier chain; returns False on early stop."""
        if parallelism > 1:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"backfill-{bucket_id % parallelism}"
            )
        src = bucketed.where(F.col("bucket_id") == bucket_id).drop("bucket_id")
        child: DataFrame | None = None
        for tier in TIER_ORDER:
            key = (tier, bucket_id)
            if key in done:
                with lock:
                    counts["skipped"] += 1
                # defer the committed-partition reader: on a fully
                # committed resume nothing consumes it, and eager
                # spark.read.parquet per tier issued n_buckets*3 footer
                # reads for discarded DataFrames (review finding)
                child = None
                child_dir = tables.partition_dir(tier, bucket_id)
                continue
            if max_units is not None and counts["committed"] >= max_units:
                return False
            started = time.time()
            if tier == "1m":
                out = rollup_raw_to_1m(src)
                rows_in = src.count()
            else:
                if child is None:  # previous tier was a skipped commit
                    child = spark.read.parquet(child_dir)
                out = rollup_cascade(child, tier)
                rows_in = child.count()
            out = out.sortWithinPartitions("conv_id", "bucket_ts")
            pdir = tables.partition_dir(tier, bucket_id)
            out.write.mode("overwrite").parquet(pdir)  # idempotent overwrite
            if fail_after is not None and counts["committed"] + 1 >= fail_after:
                # simulate a crash AFTER data write, BEFORE lineage commit:
                # the resume run must redo this unit
                counts["crashed"] = True
                return False
            written = spark.read.parquet(pdir)
            rows_out, vhash = count_and_hash(written, HASH_COLS)
            rec = {
                "run_id": run_id,
                "tier": tier,
                "bucket_id": bucket_id,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "value_hash": vhash,
                "started_at": started,
                "committed_at": time.time(),
            }
            with lock:
                tables.append_lineage(rec)
                counts["committed"] += 1
            child = written
        return True

    if parallelism <= 1:
        for bucket_id in range(n_buckets):
            if not run_bucket(bucket_id):
                break
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=parallelism) as pool:
            list(pool.map(run_bucket, range(n_buckets)))
    return dict(counts)


def verify_lineage(spark: SparkSession, tables: TableSet) -> list[str]:
    """Re-hash every committed partition against its lineage record —
    the post-backfill integrity sweep."""
    problems = []
    for rec in tables.read_lineage():
        pdir = tables.partition_dir(rec["tier"], rec["bucket_id"])
        n, vhash = count_and_hash(spark.read.parquet(pdir), HASH_COLS)
        if n != rec["rows_out"]:
            problems.append(f"{rec['tier']}/{rec['bucket_id']}: rowcount drift")
        elif vhash != rec["value_hash"]:
            problems.append(f"{rec['tier']}/{rec['bucket_id']}: value hash drift")
    return problems
