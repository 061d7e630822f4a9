"""Round-9 optimization measurement harness (bench.py is FROZEN; this
file is the guide-§1 noop-sink isolation bench: per-query timing +
.explain("formatted") capture for plan-diff evidence).

Usage:
    python bench_extra.py [--sf-dir DIR] [--runs N] [--plans-dir DIR]
                          [--queries a,b,c] [--no-plans]

Times each selected query with the noop sink (same methodology as
bench.py: first run = cold, then warm runs), prints one line per query,
and writes plans/<tag>/<query>.txt with the formatted physical plan.
Includes the same non-registry "prod" entries bench.py times.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def build_query_fns(spark, sf_dir):
    """name -> zero-arg DataFrame factory, mirroring bench.py's list
    plus the full 50-slot registry."""
    import __spark_entry__ as entry
    from ts_process_spark import queries_ts as QT
    from ts_process_spark.operators import dedup, similarity, textstats

    qs = entry.queries()
    fns = {}
    for name in qs:
        fns[name] = (lambda n=name: qs[n](spark, sf_dir))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fns["top3_per_supplier"] = lambda: QT.q_top3_per_supplier(spark, sf_dir)
    fns["sessionize"] = lambda: QT.q_sessionize(spark, sf_dir)
    fns["pricing_summary"] = lambda: QT.q_pricing_summary(spark, sf_dir)
    fns["doc_minhash_neardup_prod"] = lambda: dedup.minhash_dedup_pairs(
        docs, 0.9
    )
    fns["doc_simhash_pairs_prod"] = lambda: dedup.simhash_pairs(
        docs, max_hamming=3
    )
    fns["doc_span_dedup_prod"] = lambda: dedup.duplicated_span_stats(docs)
    fns["doc_decontam_prod"] = lambda: dedup.decontaminate_stats(
        docs.where("doc_id % 20 != 0"), docs.where("doc_id % 20 = 0"), n=8
    )
    fns["doc_bm25_prod"] = lambda: textstats.bm25_scores(
        docs, ["the", "data", "model", "training"]
    )
    _clf = {}

    def _classify():
        if "clf" not in _clf:
            _clf["clf"] = textstats.train_centroid_classifier(
                docs.where("doc_id % 2 = 0"), "lang"
            )
        return textstats.centroid_classify(docs, _clf["clf"])

    fns["doc_centroid_classify_prod"] = _classify
    fns["doc_tfidf_top5_prod"] = lambda: textstats.tfidf_top_terms(
        docs, top_k=5
    )
    fns["emb_semdedup_prod"] = lambda: similarity.semantic_dedup_stats(
        embs, n_cells=16, threshold=0.4
    )
    _pq = {}

    def _pq_cb():
        if "cb" not in _pq:
            _pq["cb"] = similarity.pq_train(embs, 16)
        return _pq["cb"]

    fns["emb_pq_ann_prod"] = lambda: similarity.pq_ann_topk(
        embs, k=3, n_queries=10, arrow_encode=True, codebook=_pq_cb()
    )
    fns["emb_ivfpq_ann_prod"] = lambda: similarity.ivfpq_ann_topk(
        embs, k=3, n_queries=10, arrow_encode=True, pq_codebook=_pq_cb()
    )
    return fns


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"
        )
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--queries", default=None, help="comma list; default all")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from ts_process_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    fns = build_query_fns(spark, args.sf_dir)
    names = (
        [n.strip() for n in args.queries.split(",")]
        if args.queries
        else list(fns)
    )
    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
    results = {}
    for name in names:
        if name not in fns:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        try:
            df = fns[name]()
            if args.plans_dir:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                    f.write(plan)
            runs = []
            for i in range(args.runs):
                runs.append(_noop(fns[name]()))
            results[name] = runs
            print(
                f"{name}: cold={runs[0]:.3f} "
                f"warm_min={min(runs[1:] or runs):.3f} "
                f"runs={[round(r, 3) for r in runs]}",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAILED {e}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
