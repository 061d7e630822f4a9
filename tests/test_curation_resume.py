"""Resume-protocol tests for the staged curation pipeline (VERDICT r7
#4), in the style of test_backfill.py: kill the run mid-pipeline,
re-run, assert identical final output and no recomputation of
committed stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts_process_spark.plans.curation import (
    CURATION_STAGE_ORDER,
    CurationConfig,
    StageLedger,
    run_curation,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    """A small corpus with a domain column + a held-out benchmark,
    written once for the module."""
    base = tmp_path_factory.mktemp("curation_io")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("doc_id") < 200)
        .withColumn(
            "domain",
            F.when(F.col("doc_id") % 2 == 0, "web").otherwise("wiki"),
        )
    )
    corpus_path = str(base / "corpus")
    bench_path = str(base / "bench")
    docs.where(F.col("doc_id") % 20 != 0).write.parquet(corpus_path)
    docs.where(F.col("doc_id") % 20 == 0).select(
        "doc_id", "text"
    ).write.parquet(bench_path)
    return corpus_path, bench_path


def _cfg(**kw) -> CurationConfig:
    return CurationConfig(
        decontam_n=8,
        weights={"web": 800_000, "wiki": 950_000},
        **kw,
    )


def _final(spark, res):
    df = spark.read.parquet(res["final_path"])
    return sorted(tuple(r) for r in df.select("doc_id", "text").collect())


def test_curation_crash_and_resume(spark, paths, tmp_path):
    corpus, bench = paths
    root = str(tmp_path / "run")
    ledger = StageLedger(root)

    # crash after the 3rd executed stage's data write, before its
    # lineage commit
    with pytest.raises(RuntimeError, match="injected crash"):
        run_curation(
            spark, corpus, root, _cfg(), benchmark_path=bench, fail_after=3
        )
    assert [r["stage"] for r in ledger.read_lineage()] == [
        "exact", "neardup"
    ]

    # resume: the two committed stages are SKIPPED (their lineage rows
    # are reused, no Spark recomputation); the crashed 3rd stage is
    # redone idempotently; the remaining stages run
    res = run_curation(spark, corpus, root, _cfg(), benchmark_path=bench)
    assert res["skipped"] == ["exact", "neardup"]
    assert res["committed"] == [
        "quality", "lines", "span", "decontam", "pii", "mix"
    ]

    # final output identical to a fresh, uncrashed run in another root
    # (stage-for-stage: every lineage row carries the same count and
    # order-independent value hash)
    root2 = str(tmp_path / "fresh")
    res2 = run_curation(spark, corpus, root2, _cfg(), benchmark_path=bench)
    assert res2["committed"] == [s for s in CURATION_STAGE_ORDER]
    assert _final(spark, res) == _final(spark, res2)
    by_stage = {r["stage"]: r for r in ledger.read_lineage()}
    by_stage2 = {r["stage"]: r for r in StageLedger(root2).read_lineage()}
    for s in CURATION_STAGE_ORDER:
        assert (by_stage[s]["rows"], by_stage[s]["value_hash"]) == (
            by_stage2[s]["rows"], by_stage2[s]["value_hash"]
        ), s
    # the pipeline genuinely filters on this fixture
    assert by_stage["mix"]["rows"] < by_stage["exact"]["rows"]

    # idempotence: a third run skips everything, lineage doesn't grow
    n_lineage = len(ledger.read_lineage())
    res3 = run_curation(spark, corpus, root, _cfg(), benchmark_path=bench)
    assert res3["committed"] == [] and res3["skipped"] == list(
        CURATION_STAGE_ORDER
    )
    assert len(ledger.read_lineage()) == n_lineage
    assert _final(spark, res3) == _final(spark, res)


def test_curation_fingerprint_invalidation(spark, paths, tmp_path):
    """Changing a mid-pipeline flag recomputes that stage AND
    everything downstream, while upstream stages stay skipped — the
    fingerprint chain at work."""
    corpus, bench = paths
    root = str(tmp_path / "run")
    run_curation(spark, corpus, root, _cfg(), benchmark_path=bench)
    res = run_curation(
        spark, corpus, root, _cfg(max_dup_pct=90), benchmark_path=bench
    )
    assert res["skipped"] == ["exact", "neardup", "quality", "lines"]
    assert res["committed"] == ["span", "decontam", "pii", "mix"]


def test_curation_rejects_missing_inputs(spark, paths, tmp_path):
    corpus, bench = paths
    with pytest.raises(ValueError, match="benchmark_path"):
        run_curation(
            spark, corpus, str(tmp_path / "x"),
            _cfg(), benchmark_path=None,
        )
    with pytest.raises(ValueError, match="weights"):
        run_curation(
            spark, corpus, str(tmp_path / "y"),
            CurationConfig(weights=None), benchmark_path=bench,
        )


def test_curation_stale_stage_dir_reexecuted(spark, paths, tmp_path):
    """ADVICE r8 (stale-skip window): a crashed run with a CHANGED
    config can overwrite a stage dir without committing its lineage; a
    later resume under the ORIGINAL config matches the old fingerprint
    and must NOT serve the mismatched data.  The skip path re-verifies
    the dir against the lineage record (rows + value hash) and
    re-executes on mismatch."""
    import shutil

    corpus, bench = paths
    root = str(tmp_path / "run")
    ledger = StageLedger(root)
    res0 = run_curation(spark, corpus, root, _cfg(), benchmark_path=bench)
    assert res0["committed"] == list(CURATION_STAGE_ORDER)

    # simulate the crash window: the 'quality' stage dir now holds data
    # from a DIFFERENT config (here: a prefix of the corpus), while its
    # committed lineage row still matches the original fingerprint
    qdir = ledger.stage_dir("quality")
    shutil.rmtree(qdir)
    spark.read.parquet(corpus).limit(7).write.parquet(qdir)

    res = run_curation(spark, corpus, root, _cfg(), benchmark_path=bench)
    # upstream stages verify clean and stay skipped; the aliased stage
    # is re-executed (and downstream stages, re-verified against their
    # own records, stay skipped — deterministic stages reproduce the
    # identical output)
    assert "quality" in res["committed"]
    assert res["skipped"][:2] == ["exact", "neardup"]
    assert _final(spark, res) == _final(spark, res0)
