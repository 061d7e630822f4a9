"""Two-cluster-size scaling evidence (the sandbox stand-in for N vs 4N
executors, per BASELINE.json): run the identical cascade job on the
identical input at local[8] and local[32], report throughput at both,
scaling efficiency, and output-hash equality.

Usage:
    python tools/scaling_run.py [n_convs] [out_md]

Each level runs in its own subprocess (fresh JVM) via the --worker
entry; the parent writes BENCH/BASELINE.md.
"""

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
    from pyspark.sql import functions as F

    from ts_process_spark.operators.rollup import rollup_cascade, rollup_raw_to_1m
    from ts_process_spark.session import get_spark

    spark = get_spark(f"scale_{cores}", cores=cores, shuffle_partitions=cores)
    raw = spark.read.parquet(raw_path)
    n_turns = raw.count()
    with tempfile.TemporaryDirectory(prefix=f"scale{cores}_") as tmp:
        t0 = time.time()
        rollup_raw_to_1m(raw).write.mode("overwrite").parquet(f"{tmp}/t1m")
        t1m = spark.read.parquet(f"{tmp}/t1m")
        rollup_cascade(t1m, "1h").write.mode("overwrite").parquet(f"{tmp}/t1h")
        t1h = spark.read.parquet(f"{tmp}/t1h")
        rollup_cascade(t1h, "1d").write.mode("overwrite").parquet(f"{tmp}/t1d")
        sec = time.time() - t0
        hashes = {}
        for tier in ("t1m", "t1h", "t1d"):
            df = spark.read.parquet(f"{tmp}/{tier}")
            h = (
                df.select(
                    F.xxhash64(
                        "conv_id", "bucket_ts", "n_turns", "n_gapfilled",
                        "sum_text_len", "peak_text_len", "first_turn_idx",
                        "last_turn_idx", "first_ts", "last_ts", "text_hash",
                        F.md5("ts_blob"), F.md5("val_blob"),
                    ).alias("h")
                )
                .agg(F.expr("coalesce(bit_xor(h), 0)"))
                .first()[0]
            )
            hashes[tier] = int(h)
    print(
        "RESULT " + json.dumps(
            {"cores": cores, "turns": n_turns, "sec": round(sec, 2),
             "tps": round(n_turns / sec, 1), "hashes": hashes}
        )
    )
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        worker(int(sys.argv[2]), sys.argv[3])
        return
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH", "BASELINE.md")

    from ts_process_spark.datagen import transcripts
    from ts_process_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="scaling_raw_")
    raw_path = f"{tmp}/raw"
    spark = get_spark("scaling_datagen", cores=32, shuffle_partitions=32)
    transcripts(spark, n_convs=n_convs, seed=42, partitions=64).write.mode(
        "overwrite"
    ).parquet(raw_path)
    spark.stop()

    results = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), raw_path],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-3000:], proc.stderr[-3000:])
            raise SystemExit(f"worker {cores} failed")
        results[cores] = json.loads(line[0][len("RESULT "):])
        print(results[cores])

    r8, r32 = results[8], results[32]
    eff = r32["tps"] / (4.0 * r8["tps"])
    identical = r8["hashes"] == r32["hashes"]
    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as f:
        f.write(f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Sandbox stand-in for the N vs 4N executor rule (BASELINE.json:2,14):
the identical raw→1m→1h→1d cascade job on the identical pre-generated
transcript table ({r8['turns']:,} turns, seed=42, {n_convs} convs,
heavy-tailed lengths incl. hot-conversation skew), run at local[8] and
local[32] in separate JVMs on a 32-core box.

| parallelism | wall (s) | throughput (turns/sec) |
|---|---|---|
| local[8]  (N)  | {r8['sec']} | {r8['tps']:,} |
| local[32] (4N) | {r32['sec']} | {r32['tps']:,} |

- **Scaling efficiency** = tps(4N) / (4 × tps(N)) = **{eff:.3f}**
  (target ≥ 0.8)
- **Output byte-equality across parallelism levels**: {"PASS" if identical else "FAIL"}
  (xor-fold xxhash64 over every tier row incl. md5 of both compressed
  blobs: {'identical at 1m/1h/1d' if identical else r8['hashes']})

Why it scales: the whole cascade is one exchange on conv_id (window
gap-fill and the 1m group-by share the same hash partitioning), tiers
re-aggregate bounded child sets (≤60/24 rows), and the only Python
stage is one ArrowEvalPython projection per tier for the blob codecs.
Skew from hot conversations is bounded at raw→1m by the bucket grain
(a hot conv spreads across its minutes) and AQE handles residual
partition imbalance.
""")
    print(f"efficiency={eff:.3f} identical={identical} → {out_md}")


if __name__ == "__main__":
    main()
