"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct; feature extraction runs as Arrow-batched pandas UDFs over
``mapInPandas``.

The FEATURE CONTRACT IS BYTE-LEVEL and fully implemented: per-payload
byte mean, byte-histogram Shannon entropy, and a folded-histogram
feature vector — the standard cheap corpus-QA features (truncation,
corruption and format drift all move them) that need no codec.  They
are exact functions of the payload bytes and are value-checked against
a DuckDB oracle at the driver gate (queries_docs.q_multimodal_features).
``decode_image`` is the pluggable boundary where a real codec
(PIL/libjpeg, unavailable in this container) would slot in for
pixel-level features; it raises NotImplementedError by design rather
than pretending.

At scale: payloads stay columnar (no Python touches them until the
mapInPandas stage), batches bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, and feature extraction
parallelism is ordinary partition parallelism.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_bytes", T.IntegerType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: the UTF-8
    bytes of the text stand in for an encoded payload."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode would live here (PIL/libjpeg not in this
    container)."""
    raise NotImplementedError("image codecs unavailable in this environment")


def byte_features(payload: bytes, n_dims: int = 8) -> tuple[float, float, list[float]]:
    """Byte-level payload features: mean byte value, byte-histogram
    Shannon entropy, and an n_dims folded-histogram vector — exact
    functions of the bytes, codec-free."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return 0.0, 0.0, [0.0] * n_dims
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    p = hist / hist.sum()
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    feat = hist.reshape(n_dims, -1).sum(axis=1)
    feat = (feat / feat.sum()).tolist()
    return float(arr.mean()), entropy, feat


def extract_features(media: DataFrame, n_dims: int = 8) -> DataFrame:
    """mapInPandas feature extraction — Arrow batches in, vectorized
    NumPy per payload, schema-stable output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, ents, feats = [], [], []
            for payload in pdf["payload"]:
                m, e, f = byte_features(
                    bytes(payload) if payload is not None else b"", n_dims
                )
                means.append(m)
                ents.append(e)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "byte_mean": means,
                    "byte_entropy": ents,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
