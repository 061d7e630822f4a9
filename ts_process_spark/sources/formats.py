"""Seismogram interchange formats as Spark sources/sinks.

Reference surface (SURVEY §2.1): BBP 4-column ASCII with '#' headers
(S1/S2/S11, /root/reference/ts_process/file_utilities.py:204-299,
335-479), Hercules 10-column (S3, :301-333), AWP with its NS/EW channel
swap (S6, awp2bbp.py:79-121), RWG/EDGE with the negative-time row
filter (S7/S8, rwg2bbp.py:82-128), and the BBP writer with regenerated
time axis + deterministic formatting (K1, file_utilities.py:525-665).

Engine position: parquet/Iceberg is the bulk path; these ASCII formats
are interchange/golden-file surfaces.  Readers are distributed
(spark.read.text → column expressions — a directory of station files
parallelizes per file); header metadata is parsed driver-side from the
head of each file (headers are O(10) lines by format definition).
Writers emit the reference's exact row format for golden-file
comparison and are driver-side by design (one station = one small
file, the reference's own unit of output).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _data_rows(spark: SparkSession, path: str, n_cols: int) -> DataFrame:
    """Comment-skipping whitespace-split numeric parse (the
    read_file_bbp2 semantics: '#'/'%' comments, inline-comment trim)."""
    lines = spark.read.text(path)
    clean = lines.select(
        F.trim(F.split(F.col("value"), "[#%]").getItem(0)).alias("v")
    ).where(F.col("v") != "")
    parts = F.split(F.col("v"), r"\s+")
    cols = [parts.getItem(i).cast("double").alias(f"c{i}") for i in range(n_cols)]
    return clean.select(*cols).where(F.col("c0").isNotNull())


def read_bbp_headers(path: str) -> dict:
    """Header metadata from '#' lines (units=/padding=/orientation=/
    time=/lp=/hp=; file_utilities.py:335-479)."""
    meta: dict = {}
    with open(path) as f:
        for line in f:
            if not line.startswith(("#", "%")):
                break
            low = line.lower()
            for key, cast in (
                ("units", str), ("padding", int), ("lp", float), ("hp", float),
            ):
                m = re.search(rf"{key}\s*=\s*([^\s,]+)", low)
                if m:
                    try:
                        meta[key] = cast(m.group(1))
                    except ValueError:
                        pass
            m = re.search(r"orientation\s*=\s*(.+)", low)
            if m:
                meta["orientation"] = [
                    o.strip() for o in m.group(1).replace(",", " ").split()
                ]
            m = re.search(r"time\s*=\s*(\d+):(\d+):([\d.]+)", low)
            if m:
                meta["time"] = [float(m.group(i)) for i in (1, 2, 3)]
    return meta


def read_bbp(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """One BBP file (time, h1, h2, vertical) → tall rows
    (i, t, h1, h2, ver) + header metadata.  dt is inferred from the
    first two time values (get_dt, file_utilities.py:69-100) but
    carried as data — the engine never re-infers it downstream."""
    meta = read_bbp_headers(path)
    df = _data_rows(spark, path, 4).select(
        F.col("c0").alias("t"),
        F.col("c1").alias("h1"),
        F.col("c2").alias("h2"),
        F.col("c3").alias("ver"),
    )
    first_two = [r["t"] for r in df.orderBy("t").limit(2).collect()]
    meta["dt"] = round(first_two[1] - first_two[0], 9) if len(first_two) > 1 else None
    w = F.round(F.col("t") / meta["dt"]).cast("int") if meta["dt"] else F.lit(0)
    return df.withColumn("i", w), meta


def read_hercules(spark: SparkSession, path: str) -> DataFrame:
    """Hercules 10-column (time, dis×3, vel×3, acc×3), hardcoded
    orientations 0/90/up (file_utilities.py:301-333) → tall signal rows
    (component, i-by-order, dis/vel/acc)."""
    df = _data_rows(spark, path, 10)
    names = ["t", "dis_h1", "dis_h2", "dis_ver", "vel_h1", "vel_h2", "vel_ver",
             "acc_h1", "acc_h2", "acc_ver"]
    df = df.select(*[F.col(f"c{i}").alias(n) for i, n in enumerate(names)])
    stacked = df.selectExpr(
        "t",
        "stack(3, "
        "'h1', 0.0D, dis_h1, vel_h1, acc_h1, "
        "'h2', 90.0D, dis_h2, vel_h2, acc_h2, "
        "'ver', CAST(NULL AS DOUBLE), dis_ver, vel_ver, acc_ver"
        ") as (component, orientation_deg, dis, vel, acc)"
    )
    return stacked


def read_awp(spark: SparkSession, path: str, dt: float) -> DataFrame:
    """AWP 4-col; the reference SWAPS channel order EW/NS → NS/EW
    (awp2bbp.py:102-107) and synthesizes the time axis from dt."""
    df = _data_rows(spark, path, 4)
    return df.select(
        (F.col("c0")).alias("t_raw"),
        F.col("c2").alias("h1"),   # NS ← column 2 (the swap)
        F.col("c1").alias("h2"),   # EW ← column 1
        F.col("c3").alias("ver"),
    ).withColumn("i", F.round(F.col("t_raw") / dt).cast("int")).withColumn(
        "t", F.col("i") * dt
    ).drop("t_raw")


def read_rwg(spark: SparkSession, path: str) -> DataFrame:
    """RWG velocity reader: DROPS rows with negative time
    (rwg2bbp.py:107-109)."""
    df = _data_rows(spark, path, 4)
    return df.where(F.col("c0") >= 0).select(
        F.col("c0").alias("t"),
        F.col("c1").alias("h1"),
        F.col("c2").alias("h2"),
        F.col("c3").alias("ver"),
    )


read_edge = read_rwg  # EDGE shares the skip-negative-time semantics
# (edge2bbp.py:82-128)


def write_bbp(
    pdf: pd.DataFrame,
    path: str,
    units: str = "cm",
    orientation: str = "0,90,up",
    lp: float | None = None,
    hp: float | None = None,
    padding: int = 0,
) -> None:
    """Golden-file BBP sink: regenerated time axis from 0 and the
    reference's deterministic '%5.7f %5.9e ...' row format
    (file_utilities.py:545-550, 657-660).  pdf columns: dt, h1, h2, ver."""
    dt = float(pdf["dt"].iloc[0])
    n = len(pdf)
    t = np.zeros(n)
    for i in range(1, n):
        t[i] = t[i - 1] + dt  # reference regenerates by accumulation
    with open(path, "w") as f:
        f.write(f"# units={units}\n")
        f.write(f"# padding={padding}\n")
        f.write(f"# orientation={orientation}\n")
        if lp is not None:
            f.write(f"# lp={lp}\n")
        if hp is not None:
            f.write(f"# hp={hp}\n")
        f.write("# Column 1: Time (s)\n")
        for i in range(n):
            f.write(
                "%5.7f   %5.9e   %5.9e   %5.9e\n"
                % (t[i], pdf["h1"].iloc[i], pdf["h2"].iloc[i], pdf["ver"].iloc[i])
            )


def station_to_signal_table(df: DataFrame, station: str, dt: float,
                            measure: str = "vel") -> DataFrame:
    """(i, h1, h2, ver) wide rows → the tall signal table used by
    operators/analytics.py."""
    stacked = df.selectExpr(
        "i",
        "stack(3, 'h1', 0.0D, h1, 'h2', 90.0D, h2, "
        "'ver', CAST(NULL AS DOUBLE), ver) as (component, orientation_deg, v)"
    )
    measures = {
        m: (F.col("v") if m == measure else F.lit(0.0)) for m in ("acc", "vel", "dis")
    }
    return stacked.select(
        F.concat(F.lit(station + "-"), F.col("component")).alias("series_id"),
        "component",
        "orientation_deg",
        F.col("i").cast("int").alias("i"),
        F.lit(dt).alias("dt"),
        measures["acc"].alias("acc"),
        measures["vel"].alias("vel"),
        measures["dis"].alias("dis"),
    )
