"""Slot rotations out of the 50-entry driver gate:

- round 5 (VERDICT r4 #1): haversine / unit_scale / json_props left so
  doc_bm25 / doc_tfidf_top5 / emb_pq_ann could be value-checked there.
- round 6 (VERDICT r5 #1): set_ops / pivot_types / revenue_forecast
  left so gopher_quality_flags / pack_documents / emb_ivfpq_ann could.
- round 6 late: top3_per_supplier (plain row_number rank) left so
  doc_span_dedup (span-level substring dedup) could.
- round 7 (VERDICT r6 #1/#3): median_by_type left so doc_pii_scrub
  could be value-checked; batch sessionize left so stream_sessionize
  (the applyInPandasWithState custom-state streaming class) could —
  the streaming query subsumes the batch session semantics.
- round 8 (VERDICT r7 #1/#2/#6/#7): cube_counts / pricing_summary
  (judge-named SQL-trivial), user_nation_rollup (broadcast-dim-join
  semantics also gate-covered by first_crossing) and sync_streams (J1
  grid alignment also gate-covered bit-exactly by signal_synchronize)
  left so doc_decontam / emb_semdedup / multimodal_media_metadata /
  stream_dedup could be value-checked.

The rotated-out queries and their oracles stay in queries_ts.py; this
test keeps them green with the same strict value compare the gate
applies, so rotating them back in (or citing them as covered) stays
honest.
"""

from __future__ import annotations

import duckdb

import ts_process_spark.queries_ts as QT

SF = "/root/testdata/sf0.001"


def test_rotated_out_slots_match_oracles(spark):
    con = duckdb.connect()
    for t in ("events", "lineitem", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    pairs = [
        (QT.q_haversine, QT.SQL_HAVERSINE),
        (QT.q_unit_scale, QT.SQL_UNIT_SCALE),
        (QT.q_json_props, QT.SQL_JSON_PROPS),
        (QT.q_set_ops, QT.SQL_SET_OPS),
        (QT.q_pivot_types, QT.SQL_PIVOT_TYPES),
        (QT.q_revenue_forecast, QT.SQL_REVENUE_FORECAST),
        (QT.q_top3_per_supplier, QT.SQL_TOP3_PER_SUPPLIER),
        (QT.q_median_by_type, QT.SQL_MEDIAN_BY_TYPE),
        (QT.q_sessionize, QT.SQL_SESSIONIZE),
        (QT.q_cube_counts, QT.SQL_CUBE_COUNTS),
        (QT.q_pricing_summary, QT.SQL_PRICING_SUMMARY),
        (QT.q_user_nation_rollup, QT.SQL_USER_NATION_ROLLUP),
        (QT.q_sync_streams, QT.SQL_SYNC_STREAMS),
    ]
    # None-safe sort key: CUBE rows carry NULL grouping cells
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for fn, sql in pairs:
        df = fn(spark, SF)
        cols = df.columns
        got = sorted((tuple(r[c] for c in cols) for r in df.collect()),
                     key=key)
        want_rel = con.execute(sql)
        duck_cols = [d[0] for d in want_rel.description]
        assert duck_cols == cols, (fn.__name__, duck_cols, cols)
        want = sorted((tuple(r) for r in want_rel.fetchall()), key=key)
        assert got == want, fn.__name__
