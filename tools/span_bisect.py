"""VERDICT r7 #5: bisect the span-dedup warm drift in ONE clean window.

r7 changed the dup-flag attach default from the r6 forced broadcast
(``broadcast_dup=True``) to AQE-managed; the recorded BENCH_r07 warm
numbers drifted 1.37→1.66 s (doc_span_dedup) in a degraded host window,
leaving it open whether the new default costs real time or the drift
was host noise.  This measures both attach modes back-to-back in the
same JVM with the same data (interleaved A/B/A/B so host drift hits
both arms equally) and reports per-arm medians plus whether AQE's
runtime broadcast actually fires at sf0.1.

    python tools/span_bisect.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from ts_process_spark.operators import dedup
    from ts_process_spark.session import get_spark

    spark = get_spark("span_bisect", cores=32, shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(broadcast_dup: bool) -> float:
        df = dedup.duplicated_span_stats(docs, broadcast_dup=broadcast_dup)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both plans once (JIT), then interleave timed reps
    run(False), run(True)
    aqe_t, forced_t = [], []
    for _ in range(reps):
        aqe_t.append(run(False))
        forced_t.append(run(True))

    # did AQE's runtime broadcast fire?  inspect the FINAL adaptive plan
    df = dedup.duplicated_span_stats(docs, broadcast_dup=False)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    aqe_broadcast = "BroadcastHashJoin" in plan

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "aqe_default_secs": [round(t, 3) for t in aqe_t],
        "forced_broadcast_secs": [round(t, 3) for t in forced_t],
        "aqe_default_median": round(statistics.median(aqe_t), 3),
        "forced_broadcast_median": round(statistics.median(forced_t), 3),
        "aqe_runtime_broadcast_fired": aqe_broadcast,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
