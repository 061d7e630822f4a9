"""Physical-plan shape regression tests — the 100-TB guarantees.

These pin the *plan*, not the results: filter/column pushdown reaching
the parquet scan, broadcast (never shuffle) joins against small dims,
exactly one exchange per cascade tier, whole-stage codegen on the
rollup aggregate, and no cartesian/nested-loop joins in the near-dup
pipelines.  A regression here is invisible at test scale but fatal at
1000 executors, which is why they are asserted, not eyeballed.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ts_process_spark import datagen
from ts_process_spark.operators.rollup import full_cascade

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_and_column_pushdown(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id") == 7)
        .select("event_id", "value")
    )
    plan = _plan(ev)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "EqualTo(user_id,7)" in m.group(1), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # projection pruned to the 2 selected + 1 filter column — never full width
    assert cols == {"event_id", "user_id", "value"}, cols


def test_cascade_one_exchange_per_tier(spark):
    raw = datagen.transcripts(spark, n_convs=10, seed=3)
    tiers = full_cascade(raw)
    for tier, want in (("1m", 1), ("1h", 2), ("1d", 3)):
        plan = _plan(tiers[tier])
        n = plan.count("Exchange") - plan.count("ReusedExchange")
        assert n == want, f"{tier}: {n} exchanges (want {want})\n{plan}"


def test_rollup_aggregate_shape(spark):
    """The 1m tier's aggregate must (a) combine map-side — partial
    aggregation before the exchange is what keeps the shuffle
    O(buckets) instead of O(turns) — and (b) touch Python only through
    the single Arrow batch stage for the blob codecs (never row-wise)."""
    raw = datagen.transcripts(spark, n_convs=5, seed=3)
    plan = _plan(full_cascade(raw)["1m"])
    assert "partial_count" in plan and "partial_collect_list" in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan, plan  # no per-row Python, ever


def test_jvm_rollup_is_hash_aggregate(spark):
    """The pure-JVM events rollup (no array payloads) must stay in
    codegen-capable HashAggregate with no Python stages at all."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["rollup_1m"](spark, SF_DIR))
    assert "HashAggregate" in plan, plan
    assert "EvalPython" not in plan, plan


def test_dim_join_is_broadcast(spark):
    # user_nation_rollup rotated out of the 50-slot gate in round 8
    # (value pin in test_rotated_out_slots); its broadcast plan shape
    # stays pinned here
    from ts_process_spark.queries_ts import q_user_nation_rollup

    df = q_user_nation_rollup(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_neardup_has_no_cartesian(spark):
    """Both the xxhash64 production paths (not driver-registered) and
    the md5 registry entries must stay bucketed equi-joins."""
    import __spark_entry__ as E
    from ts_process_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (
        dedup.minhash_dedup_pairs(docs, threshold=0.9),
        dedup.simhash_pairs(docs, max_hamming=3),
        E.queries()["doc_minhash_md5_neardup"](spark, SF_DIR),
        E.queries()["doc_simhash_md5_pairs"](spark, SF_DIR),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_gapfill_windows_are_growing_frames(spark):
    """The O(n²) regression guard: both gap-fill lookups must be
    incremental growing frames, never unbounded-following re-scans."""
    from ts_process_spark.operators.gapfill import gapfill_ts

    raw = datagen.transcripts(spark, n_convs=5, seed=3)
    plan = _plan(gapfill_ts(raw))
    assert "unboundedfollowing" not in plan.lower(), plan


def test_emb_neardup_default_is_blocked(spark):
    """The r1 scale bug: embedding_neardup_pairs defaulted to an
    a.id < b.id cartesian self-join.  The SRP-blocked default must plan
    as equi-joins only."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["emb_neardup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rotmax_and_taper_stay_jvm(spark):
    """The new oracle-checked signal kernels are pure JVM plans: no
    Python stages, hash aggregates present, parquet scan pruned to the
    needed columns."""
    import re

    import __spark_entry__ as E

    for name in ("rotmax_scan", "taper_tukey", "window_kernels"):
        plan = _plan(E.queries()[name](spark, SF_DIR))
        assert "EvalPython" not in plan, name
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",")}
        assert "props" not in cols, (name, cols)  # widest column pruned


def test_registry_contract():
    """The driver evaluates exactly the first 50 registry entries in
    insertion order; the three query modules must register exactly 50
    with a non-None oracle for every SQL-expressible entry.  Enforced
    here (CI) rather than at driver runtime, where a partial registry
    should still be scored (__spark_entry__.queries degrades gracefully)."""
    import __spark_entry__ as E

    q = E.queries()
    assert len(q) == 50, sorted(q)
    o = E.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_asof_join_is_union_stream(spark):
    """The registered as-of join must be the union-stream + running
    last() form: no join node at all (the equi-join + range-predicate
    form materializes O(events × prior-orders) candidate rows per key —
    the round-2 VERDICT scale-killer), and exactly one exchange."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["asof_join"](spark, SF_DIR))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan


def test_signal_queries_prune_events_scan(spark):
    """The event-derived signal kernels must push column pruning to the
    events parquet scan — props (the widest column) never read."""
    import __spark_entry__ as E

    for name in ("signal_baseline_correct", "signal_process_dt",
                 "signal_synchronize", "signal_rotd50_grid63"):
        plan = _plan(E.queries()[name](spark, SF_DIR))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",")}
        assert "props" not in cols, (name, cols)


def test_dropped_registry_variants(spark):
    """Queries rotated out of the 50-slot registry keep correctness
    coverage here: decimate4 (slot freed round 4 for the decoded-media
    gate query) still matches its DuckDB oracle at sf0.001."""
    import duckdb

    from ts_process_spark.queries_ts import SQL_DECIMATE4, q_decimate4

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r[0], r[1], float(r[2]))
        for r in q_decimate4(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    want = sorted(
        (r[0], r[1], float(r[2]))
        for r in con.execute(SQL_DECIMATE4).fetchall()
    )
    assert got == want


def test_minhash_plan_shapes(spark):
    """Round-4 scale shapes stay pinned: (a) the signature pipeline is a
    single-exchange plan (keyed spread reused by the wide aggregate);
    (b) the verify stage broadcasts the CANDIDATE side — corpus token
    sets are never shuffled or broadcast."""
    from ts_process_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs_plan = _plan(dedup.minhash_signatures(docs, hash_mode="md5"))
    assert sigs_plan.count("Exchange hashpartitioning") == 1, sigs_plan
    full_plan = _plan(dedup.minhash_dedup_pairs(docs, 0.9, hash_mode="md5"))
    assert "SortMergeJoin" not in full_plan, full_plan
    # ONE broadcast probe of the bare pair ids against a single corpus
    # scan (token sets reassembled by hash aggregation, never broadcast)
    assert full_plan.count("BroadcastHashJoin") == 1, full_plan


def test_span_dedup_plan_shape(spark):
    """Span-level dedup stays JVM-side and join-bounded: no Python
    stages, no cartesian/nested-loop joins, exactly one per-doc Window
    (the interval union), and the occurrence count keeps its map-side
    partial aggregation — the properties that let the bounded
    len/stride explode survive a 100-TB corpus.

    Round-7 hardening (VERDICT r6 #4) pins the hot-gram-skew shape of
    the FORCED broadcast attach (``broadcast_dup=True`` — the mode for
    corpora whose duplicated-hash set is known to fit memory; the
    default leaves the attach strategy to AQE, which broadcasts small
    dup sets at runtime and skew-splits big ones):
    (a) the ONLY content-hash exchange in the plan is the occurrence
    count's post-combine shuffle, and it sits ABOVE the partial
    aggregate — a boilerplate gram occurring 10⁸ times crosses the
    wire as one row per map task, never as raw windows; (b) the
    dup-flag attach is a BROADCAST join, so the window stream is never
    hash-partitioned by gram content at all; (c) totals + interval
    union + per-doc agg ride ONE id-clustered pass — no separate
    ``tot`` branch re-exchanging on id (the r6 triple-consumption)."""
    from ts_process_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # default (AQE-managed) mode: the non-negotiables hold regardless
    # of join strategy — map-side combine below the h exchange, one
    # Window, no Python, no cartesian
    dplan = _plan(dedup.duplicated_span_stats(docs))
    assert "pythonUDF" not in dplan and "ArrowEvalPython" not in dplan, dplan
    assert "CartesianProduct" not in dplan, dplan
    assert dplan.count("Window ") == 1, dplan
    m = re.search(
        r"HashAggregate\(keys=\[h#[^\]]*\], functions=\[partial_count", dplan
    )
    assert m, dplan
    for hash_mode in ("xxhash64", "md5"):
        plan = _plan(
            dedup.duplicated_span_stats(
                docs, hash_mode=hash_mode, broadcast_dup=True
            )
        )
        assert "pythonUDF" not in plan and "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "SortMergeJoin" not in plan, plan
        # one window operator: the per-doc running-max interval union
        assert plan.count("Window ") == 1, plan
        # the h-groupBy occurrence count runs partial (map-side combine
        # collapses hot boilerplate grams before the exchange)
        m_partial = re.search(
            r"HashAggregate\(keys=\[h#[^\]]*\], functions=\[partial_count",
            plan,
        )
        assert m_partial, plan
        # (a) exactly ONE exchange keyed on the content hash, and it is
        # the PARENT of the partial agg (tree prints parent-first), i.e.
        # only combined (h, count) rows ever shuffle on gram content
        h_exchanges = [
            m.start()
            for m in re.finditer(r"Exchange hashpartitioning\(h#", plan)
        ]
        assert len(h_exchanges) == 1, plan
        assert h_exchanges[0] < m_partial.start(), plan
        # (b) the dup-flag attach broadcasts the duplicated-hash set
        assert re.search(
            r"BroadcastHashJoin \[h#[^\]]*\], \[h#", plan
        ), plan
        # (c) single id-clustered pass: one final id aggregate, fed by
        # the Window's sort — not a second id exchange for totals
        id_aggs = re.findall(
            r"HashAggregate\(keys=\[id#[^\]]*\], functions=\[count\(1\)",
            plan,
        )
        assert len(id_aggs) == 1, plan
