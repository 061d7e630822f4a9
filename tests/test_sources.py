"""Format source/sink tests: BBP round-trip with header metadata, AWP
channel swap, RWG negative-time filter, Hercules unpivot."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts_process_spark.sources import formats


@pytest.fixture()
def station_pdf():
    rng = np.random.default_rng(9)
    n = 200
    return pd.DataFrame(
        {
            "dt": 0.01,
            "h1": rng.normal(0, 1, n),
            "h2": rng.normal(0, 1, n),
            "ver": rng.normal(0, 1, n),
        }
    )


def test_bbp_roundtrip(spark, tmp_path, station_pdf):
    path = str(tmp_path / "st.vel.bbp")
    formats.write_bbp(station_pdf, path, units="cm", lp=5.0, hp=0.1, padding=3)
    df, meta = formats.read_bbp(spark, path)
    assert meta["units"] == "cm"
    assert meta["lp"] == 5.0 and meta["hp"] == 0.1 and meta["padding"] == 3
    assert meta["orientation"] == ["0", "90", "up"]
    assert meta["dt"] == pytest.approx(0.01)
    got = df.orderBy("i").toPandas()
    assert len(got) == len(station_pdf)
    # %5.9e keeps ~9 significant digits
    np.testing.assert_allclose(got["h1"], station_pdf["h1"], rtol=1e-8)
    np.testing.assert_allclose(got["ver"], station_pdf["ver"], rtol=1e-8)
    # regenerated time axis starts at 0 with uniform dt
    assert got["t"].iloc[0] == 0.0
    assert np.allclose(np.diff(got["t"]), 0.01, atol=1e-6)


def test_awp_channel_swap(spark, tmp_path):
    # AWP column order: t, EW, NS, UD → engine must emit h1=NS, h2=EW
    path = str(tmp_path / "awp.txt")
    with open(path, "w") as f:
        f.write("# comment line\n")
        f.write("0.00  1.0  2.0  3.0\n")
        f.write("0.02  10.0  20.0  30.0\n")
    got = formats.read_awp(spark, path, dt=0.02).orderBy("i").collect()
    assert got[0]["h1"] == 2.0 and got[0]["h2"] == 1.0 and got[0]["ver"] == 3.0
    assert got[1]["i"] == 1 and got[1]["t"] == pytest.approx(0.02)


def test_rwg_negative_time_filter(spark, tmp_path):
    path = str(tmp_path / "rwg.txt")
    with open(path, "w") as f:
        f.write("-0.5 9.0 9.0 9.0\n")
        f.write("0.0 1.0 2.0 3.0\n")
        f.write("0.1 4.0 5.0 6.0\n")
    got = formats.read_rwg(spark, path).orderBy("t").collect()
    assert len(got) == 2 and got[0]["t"] == 0.0  # negative-time row dropped


def test_hercules_unpivot(spark, tmp_path):
    path = str(tmp_path / "her.txt")
    with open(path, "w") as f:
        f.write("% header\n")
        f.write("0.0 " + " ".join(str(float(i)) for i in range(1, 10)) + "\n")
    got = formats.read_hercules(spark, path).collect()
    rows = {r["component"]: r for r in got}
    assert rows["h1"]["dis"] == 1.0 and rows["h1"]["vel"] == 4.0 and rows["h1"]["acc"] == 7.0
    assert rows["ver"]["dis"] == 3.0 and rows["ver"]["orientation_deg"] is None
    assert rows["h2"]["orientation_deg"] == 90.0


def test_station_to_signal_table(spark, tmp_path, station_pdf):
    path = str(tmp_path / "st2.vel.bbp")
    formats.write_bbp(station_pdf, path)
    df, meta = formats.read_bbp(spark, path)
    sig = formats.station_to_signal_table(df, "st2", meta["dt"], measure="vel")
    assert sig.count() == 3 * len(station_pdf)
    assert set(r["series_id"] for r in sig.select("series_id").distinct().collect()) == {
        "st2-h1", "st2-h2", "st2-ver"
    }
    # pluggable into the analytics operators
    from ts_process_spark.operators.analytics import filter_signals

    out = filter_signals(sig, "lowpass", fmax=10.0, cols=("vel",))
    assert out.count() == sig.count()
