"""Chunk+overlap kernel execution: bounded-memory chunks of a hot group
approximate the whole-series kernel within float noise when the overlap
is sized by the reference pad rule (ts_library.py:805-818)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts_process_spark.datagen import gen_signal_pdf, signals
from ts_process_spark.functions import dsp
from ts_process_spark.operators.skew import chunked_apply, salted_repartition


def test_chunked_filter_close_to_whole_series(spark):
    n = 4096
    df = signals(spark, cases=["lowpass"], n=n)
    h1 = df.where(F.col("series_id") == "lowpass-h1")

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        out["acc"] = dsp.filter_data(
            pdf["acc"].to_numpy(np.float64), 0.01, "lowpass", fmax=5.0
        )
        return out

    got = chunked_apply(
        h1, key="series_id", order_col="i", fn=kern, chunk_size=1024, overlap=300
    )
    got_arr = np.array(
        [r["acc"] for r in got.orderBy("i").collect()]
    )
    exp = dsp.filter_data(
        gen_signal_pdf("lowpass", "h1", n=n)["acc"].to_numpy(), 0.01, "lowpass",
        fmax=5.0,
    )
    assert len(got_arr) == n
    scale = np.max(np.abs(exp))
    assert np.max(np.abs(got_arr - exp)) / scale < 1e-6


def test_chunked_apply_preserves_rows(spark):
    df = signals(spark, cases=["lowpass"], n=512)

    def ident(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    got = chunked_apply(
        df, key="series_id", order_col="i", fn=ident, chunk_size=100, overlap=20
    )
    assert got.count() == df.count()
    # exactly one copy of every (series, i)
    dup = got.groupBy("series_id", "i").count().where(F.col("count") > 1).count()
    assert dup == 0


def test_salted_repartition_spreads_hot_key(spark):
    pdf = pd.DataFrame({"k": ["hot"] * 1000 + ["cold"] * 10, "v": range(1010)})
    df = spark.createDataFrame(pdf)
    # AQE's partition coalescing would re-merge this tiny shuffle and
    # hide the salting; disable it for the assertion only
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        salted = salted_repartition(df, "k", salt_n=8)
        parts = salted.rdd.glom().map(len).collect()
        nonempty = [p for p in parts if p > 0]
        # the hot key must not land in a single partition
        assert max(nonempty) < 1000
        assert len(nonempty) > 1
        assert salted.count() == 1010
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
