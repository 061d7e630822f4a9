"""Stage-level profile of the cascade at two parallelism levels.
Usage: python tools/profile_cascade.py [n_convs]"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cores: int, raw_path: str) -> None:
    import pyspark.sql.functions as F

    from ts_process_spark.operators.gapfill import gapfill_ts
    from ts_process_spark.operators.rollup import (
        rollup_cascade,
        rollup_raw_to_1m,
    )
    from ts_process_spark.session import get_spark

    spark = get_spark(f"prof{cores}", cores=cores, shuffle_partitions=cores)
    raw = spark.read.parquet(raw_path)
    times = {}

    def t(name, fn):
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 2)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t("scan", lambda: noop(raw))
    slim = raw.select(
        "conv_id", "turn_idx", "ts",
        F.length("text").cast("long").alias("text_len"),
        F.xxhash64("text").alias("th"),
    )
    t("gapfill", lambda: noop(gapfill_ts(slim)))
    t1m_df = rollup_raw_to_1m(raw)
    t("t1m_noblob", lambda: noop(t1m_df.drop("ts_blob", "val_blob")))
    t("t1m_full", lambda: noop(t1m_df))
    tmp = tempfile.mkdtemp(prefix=f"prof{cores}_")
    t("t1m_write", lambda: t1m_df.write.mode("overwrite").parquet(f"{tmp}/t1m"))
    t1m_r = spark.read.parquet(f"{tmp}/t1m")
    t("t1h", lambda: rollup_cascade(t1m_r, "1h").write.mode("overwrite").parquet(f"{tmp}/t1h"))
    t1h_r = spark.read.parquet(f"{tmp}/t1h")
    t("t1d", lambda: rollup_cascade(t1h_r, "1d").write.mode("overwrite").parquet(f"{tmp}/t1d"))
    print("PROFILE " + json.dumps({"cores": cores, "times": times}))
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        worker(int(sys.argv[2]), sys.argv[3])
        return
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    from ts_process_spark.datagen import transcripts
    from ts_process_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="prof_raw_")
    spark = get_spark("prof_datagen", cores=32, shuffle_partitions=32)
    transcripts(spark, n_convs=n_convs, seed=42, partitions=128).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/raw")
    spark.stop()
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), f"{tmp}/raw"],
            capture_output=True, text=True, cwd=REPO,
        )
        print(
            [l for l in out.stdout.splitlines() if l.startswith("PROFILE")]
            or out.stderr[-2000:]
        )


if __name__ == "__main__":
    main()
