"""Deterministic sampling / domain mixing: the selection must be a
pure function of (salt, id) — identical across runs, partitionings and
engines — and the rates must be exact integer arithmetic, not float
luck.  Twinned against DuckDB (same md5-60 draw) and a pure-Python
hashlib replica."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from ts_process_spark.operators import sampling

SF = "/root/testdata/sf0.001"


def _draw(salt: str, i: int) -> int:
    return int(
        hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16
    )


def test_sample_by_rate_matches_duckdb_and_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rate = 250_000  # 25%
    kept = sorted(
        r["doc_id"]
        for r in sampling.sample_by_rate(docs, rate, salt="s1")
        .select("doc_id")
        .collect()
    )
    thr = sampling._threshold(rate)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE "
            "('0x' || substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 15))"
            f"::BIGINT < {thr}"
        ).fetchall()
    )
    assert kept == want
    # pure-Python replica agrees too (the draw really is md5-of-string)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert kept == sorted(i for i in ids if _draw("s1", i) < thr)
    # the rate is honest (binomial(500, .25): ±5 sigma ≈ ±48)
    assert abs(len(kept) - 125) < 50
    # partition-invariant and re-run-stable
    again = sorted(
        r["doc_id"]
        for r in sampling.sample_by_rate(
            docs.repartition(7), rate, salt="s1"
        ).select("doc_id").collect()
    )
    assert again == kept
    # a different salt re-rolls the sample
    other = sorted(
        r["doc_id"]
        for r in sampling.sample_by_rate(docs, rate, salt="s2")
        .select("doc_id")
        .collect()
    )
    assert other != kept
    with pytest.raises(ValueError, match="rate_ppm"):
        sampling.sample_by_rate(docs, -1)
    with pytest.raises(ValueError, match="rate_ppm"):
        sampling.sample_by_rate(docs, 1_000_001)


def test_stratified_sample_matches_duckdb(spark):
    """Domain-weighted mixing: four synthetic domains at distinct ppm
    rates plus a dropped default, replicated exactly in SQL."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "domain",
        F.element_at(
            F.array(F.lit("wiki"), F.lit("web"), F.lit("code"), F.lit("books")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ),
    )
    weights = {"wiki": 900_000, "web": 200_000, "code": 500_000}
    got = sorted(
        (r["doc_id"], r["domain"])
        for r in sampling.stratified_sample(
            docs, weights, salt="mix1"
        ).select("doc_id", "domain").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    case = " ".join(
        f"WHEN '{d}' THEN {sampling._threshold(p)}"
        for d, p in weights.items()
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
WITH d AS (
  SELECT doc_id,
         ['wiki','web','code','books'][(doc_id % 4 + 1)::INT] AS domain
  FROM documents
)
SELECT doc_id, domain FROM d
WHERE ('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      < (CASE domain {case} ELSE 0 END)
"""
            ).fetchall(),
        )
    )
    assert got == want
    # 'books' has no weight → allowlist posture drops it entirely
    assert not any(d == "books" for _, d in got)
    assert {d for _, d in got} == {"wiki", "web", "code"}


def test_upsample_epochs_exact(spark):
    """2.4 epochs: every doc appears 2 or 3 times with 0-based copy
    indices, the third copy decided by the salted fractional draw —
    pinned against the hashlib replica, mean factor sane."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = sampling.upsample_epochs(docs, 2_400_000, salt="up1")
    rows = [
        (r["doc_id"], r["epoch_copy"])
        for r in out.select("doc_id", "epoch_copy").collect()
    ]
    per_id: dict[int, list[int]] = {}
    for i, c in rows:
        per_id.setdefault(i, []).append(c)
    thr = sampling._threshold(400_000)
    n = 0
    for i, copies in per_id.items():
        # salt composition is "up1:frac2" then ":id"
        want = 3 if _draw("up1:frac2", i) < thr else 2
        assert sorted(copies) == list(range(want)), (i, copies)
        n += want
    assert len(per_id) == 500
    assert abs(n / 500 - 2.4) < 0.12  # ±5 sigma of binomial(500, .4)/500
    # factor < 1 degenerates to a plain deterministic subsample
    sub = sampling.upsample_epochs(docs, 300_000, salt="up2")
    ids = [r["doc_id"] for r in sub.select("doc_id").collect()]
    assert len(ids) == len(set(ids))
    assert set(ids) == {
        i for i in per_id if _draw("up2:frac0", i) < sampling._threshold(300_000)
    }
    with pytest.raises(ValueError, match="non-negative"):
        sampling.upsample_epochs(docs, -5)


def test_assign_split_matches_duckdb(spark):
    """Split assignment is exhaustive (every row labeled), exclusive
    (one label per row), replayed exactly by DuckDB range arithmetic,
    stable under incremental arrival (a subset gets identical labels),
    and loud about shares that don't sum to 10^6."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    splits = {"train": 980_000, "val": 10_000, "test": 10_000}
    got = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_split(docs, splits).select(
            "doc_id", "split"
        ).collect()
    }
    assert len(got) == 500 and set(got.values()) <= set(splits)
    # DuckDB replica: contiguous ranges over the same draw, names in
    # sorted order (test < train < val)
    bounds, acc = [], 0
    for name in sorted(splits):
        acc += splits[name]
        bounds.append((name, sampling._threshold(acc)))
    case = " ".join(
        f"WHEN d < {thr} THEN '{name}'" for name, thr in bounds
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = dict(
        con.execute(
            f"""
SELECT doc_id, CASE {case} END FROM (
  SELECT doc_id,
         ('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)),
                         1, 15))::BIGINT AS d
  FROM documents)
"""
        ).fetchall()
    )
    assert got == want
    # hashlib replica and share sanity
    py = {
        i: next(n for n, t in bounds if _draw("split-v1", i) < t)
        for i in got
    }
    assert py == got
    assert sum(1 for v in got.values() if v == "train") > 440
    # incremental arrival: a filtered subset keeps identical labels
    sub = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_split(
            docs.where("doc_id % 3 = 0"), splits
        ).select("doc_id", "split").collect()
    }
    assert all(got[i] == s for i, s in sub.items())
    with pytest.raises(ValueError, match="sum to exactly"):
        sampling.assign_split(docs, {"train": 990_000, "val": 10_001})
    with pytest.raises(ValueError, match="positive"):
        sampling.assign_split(docs, {"train": 1_000_001, "val": -1})


def test_sampling_plan_is_scan_filter(spark):
    """Sampling must never cost a shuffle or a Python stage: one scan,
    one filter, literal thresholds."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "domain", F.lit("web")
    )
    for df in (
        sampling.sample_by_rate(docs, 123_456),
        sampling.stratified_sample(docs, {"web": 700_000}),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan, plan
        assert "Filter" in plan, plan
