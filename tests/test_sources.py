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


# ------------------------------------------------------------------ SMC


def _fill(n):
    return [f"filler line {j}" for j in range(n)]


def _smc_v1_channel(orientation: str, values: list[float]) -> list[str]:
    lines = ["Uncorrected accelerogram data follows"]
    lines += _fill(2)  # 1-2
    lines.append("hdr".ljust(37) + "rec on 01/02/03, 10:15:30.5 PST -")  # 3
    lines.append("loc lat lon 34.05N, -118.25")  # 4
    lines.append("TEST STATION")  # 5
    lines.append(f"chan az {orientation} deg")  # 6
    lines += _fill(7)  # 7-13
    lines.append("10 15 30 500")  # 14
    lines += _fill(12)  # 15-26
    lines.append(f"{len(values)} points of data: 50 samples-per-sec")  # 27
    half = len(values) // 2
    lines.append(" ".join(f"{v:10.6f}" for v in values[:half]))
    lines.append(" ".join(f"{v:10.6f}" for v in values[half:]))
    return lines


def _smc_v2_channel(orientation_code: int, acc, vel, dis) -> list[str]:
    lines = ["Corrected accelerogram processed"]
    lines += _fill(3)  # 1-3
    lines.append("hdr".ljust(37) + "rec on 04/05/06, 11:22:33.4 GMT x")  # 4
    lines.append("loc lat lon 34.05N, -118.25")  # 5
    lines.append("TEST STATION V2")  # 6
    lines += _fill(7)  # 7-13
    lines.append("flt a b c d e f g 0.10 hz 23.0 hz")  # 14
    lines += _fill(11)  # 15-25
    lines.append("int hdr".ljust(50) + f"{orientation_code:5d}")  # 26
    lines += _fill(18)  # 27-44
    for kind, vals in (("accel", acc), ("veloc", vel), ("displ", dis)):
        lines.append(
            f"{len(acc)} points of {kind} data at equally spaced 0.02 sec"
        )
        lines.append(" ".join(f"{v:10.6f}" for v in vals))
    return lines


def _write_smc(path, channels):
    with open(path, "w") as f:
        for lines in channels:
            f.write("\n".join(lines) + "\n/&\n")


def test_smc_v1(spark, tmp_path):
    from ts_process_spark.functions.dsp import integrate

    vals = [0.001, -0.002, 0.003, -0.001, 0.002, 0.0, -0.003, 0.001]
    path = str(tmp_path / "CETST01.V1")
    _write_smc(path, [_smc_v1_channel("90", vals), _smc_v1_channel("360", vals)])
    sig = formats.read_smc_signals(spark, path, version="v1").toPandas()
    meta = formats.read_smc_metadata(spark, path, version="v1").collect()[0]
    assert meta["network"] == "CE" and meta["station_id"] == "TST01"
    assert meta["type"] == "V1" and meta["date"] == "01/02/03"
    assert meta["time"] == "10:15:30.500 PST"
    assert meta["latitude"] == "34.05N" and meta["longitude"] == "-118.25"
    assert meta["high_pass"] == -1.0 and meta["low_pass"] == -1.0
    c0 = sig[sig.component == 0].sort_values("i")
    c1 = sig[sig.component == 1].sort_values("i")
    assert list(c0["orientation_deg"].unique()) == [90.0]
    assert list(c1["orientation_deg"].unique()) == [0.0]  # 360 -> 0
    # g -> cm/s^2 scaling and double integration
    acc = np.array(vals) * formats.G2CMSS
    np.testing.assert_allclose(c0["acc"], acc, rtol=1e-9)
    np.testing.assert_allclose(c0["vel"], integrate(acc, 0.02), rtol=1e-9)
    np.testing.assert_allclose(
        c0["dis"], integrate(integrate(acc, 0.02), 0.02), rtol=1e-9
    )
    assert (c0["dt"] == 0.02).all()


def test_smc_v2(spark, tmp_path):
    acc = [0.5, -1.5, 2.5, -0.5]
    vel = [0.1, 0.2, -0.3, 0.4]
    dis = [1.0, 2.0, 3.0, -4.0]
    path = str(tmp_path / "CETST02.V2")
    _write_smc(
        path,
        [
            _smc_v2_channel(360, acc, vel, dis),
            _smc_v2_channel(500, acc, vel, dis),
            _smc_v2_channel(90, acc, vel, dis),
        ],
    )
    sig = formats.read_smc_signals(spark, path, version="v2").toPandas()
    meta = formats.read_smc_metadata(spark, path, version="v2").collect()[0]
    assert meta["type"] == "V2" and meta["date"] == "04/05/06"
    assert meta["time"] == "11:22:33.4 GMT"
    assert meta["high_pass"] == 0.10 and meta["low_pass"] == 23.0
    by_comp = {c: g.sort_values("i") for c, g in sig.groupby("component")}
    assert by_comp[0]["orientation"].iloc[0] == "0.0"          # 360 -> 0
    assert by_comp[0]["orientation_deg"].iloc[0] == 0.0
    assert by_comp[1]["orientation"].iloc[0] == "up"           # 500 -> up
    assert np.isnan(by_comp[1]["orientation_deg"].iloc[0])
    assert by_comp[2]["orientation_deg"].iloc[0] == 90.0
    np.testing.assert_allclose(by_comp[2]["acc"], acc, rtol=1e-9)
    np.testing.assert_allclose(by_comp[2]["vel"], vel, rtol=1e-9)
    np.testing.assert_allclose(by_comp[2]["dis"], dis, rtol=1e-9)
    assert (sig["dt"] == 0.02).all()


def test_hercules_write_read_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(4)
    n = 50
    pdf = pd.DataFrame(
        {
            "dt": [0.01] * n,
            **{
                f"{m}_{c}": rng.normal(0, 1, n)
                for m in ("dis", "vel", "acc")
                for c in ("ns", "ew", "up")
            },
        }
    )
    path = str(tmp_path / "st.her")
    formats.write_hercules(pdf, path)
    got = (
        formats.read_hercules(spark, path)
        .orderBy("t", "component")
        .toPandas()
    )
    assert len(got) == 3 * n
    h1 = got[got.component == "h1"].sort_values("t")
    # {:>12.7f} keeps 7 decimals
    np.testing.assert_allclose(h1["dis"], pdf["dis_ns"], atol=1e-6)
    np.testing.assert_allclose(h1["acc"], pdf["acc_ns"], atol=1e-6)
    ver = got[got.component == "ver"].sort_values("t")
    np.testing.assert_allclose(ver["vel"], pdf["vel_up"], atol=1e-6)


def test_bbp_bulk_directory_single_job(spark, tmp_path, station_pdf):
    """read_bbp_bulk ingests a directory of BBP files in one
    distributed pass: per-file dt derived in-plan (no driver collect),
    headers as columns, values matching the per-file reader."""
    import pandas as pd

    for k, dt in ((0, 0.01), (1, 0.02), (2, 0.01)):
        pdf = station_pdf.copy()
        pdf["dt"] = dt
        formats.write_bbp(
            pdf, str(tmp_path / f"st{k}.vel.bbp"), units="cm",
            lp=5.0 + k, hp=0.1, padding=k,
        )
    sig, hdr = formats.read_bbp_bulk(spark, str(tmp_path))
    assert "collect" not in sig._jdf.queryExecution().analyzed().toString().lower()
    got = sig.toPandas()
    assert sorted(got["file"].str.extract(r"st(\d)")[0].unique()) == ["0", "1", "2"]
    for k, dt in ((0, 0.01), (1, 0.02), (2, 0.01)):
        g = got[got["file"].str.endswith(f"st{k}.vel.bbp")].sort_values("i")
        assert len(g) == len(station_pdf)
        assert g["dt"].iloc[0] == pytest.approx(dt)
        assert list(g["i"]) == list(range(len(station_pdf)))
        np.testing.assert_allclose(g["h1"], station_pdf["h1"], rtol=1e-8)
        # per-file reader agrees
        df1, meta = formats.read_bbp(spark, str(tmp_path / f"st{k}.vel.bbp"))
        assert meta["dt"] == pytest.approx(dt)
        p1 = df1.orderBy("i").toPandas()
        np.testing.assert_allclose(g["ver"].to_numpy(), p1["ver"].to_numpy())
    h = {r["file"].rsplit("/", 1)[-1]: r for r in hdr.collect()}
    assert h["st1.vel.bbp"]["lp"] == 6.0 and h["st2.vel.bbp"]["padding"] == 2
    assert h["st0.vel.bbp"]["units"] == "cm"
    assert "0,90,up" in h["st0.vel.bbp"]["orientation"]


def test_bbp_bulk_hostile_files(spark, tmp_path, station_pdf):
    """Review-found failure modes stay fixed: sparse headers (missing
    optional keys), a corrected header (last match wins, matching
    read_bbp_headers), comment lines after the data block (ignored),
    a dt=0 file (duplicated first timestamps), and a malformed data
    line — each costs at most its own rows, never the bulk job."""
    good = tmp_path / "good.bbp"
    formats.write_bbp(station_pdf, str(good), units="cm", lp=5.0)
    sparse = tmp_path / "sparse.bbp"
    with open(sparse, "w") as f:
        f.write("# units=cm\n")           # no padding/lp/hp
        f.write("# padding=5\n")
        f.write("# padding=10\n")         # corrected: 10 must win
        f.write("0.00 1.0 2.0 3.0\n")
        f.write("0.02 4.0 5.0 6.0\n")
        f.write("# lp=99\n")              # after data: ignored
        f.write("0.04 bad 7.0 8.0\n")     # malformed token -> null col
    dtzero = tmp_path / "dtzero.bbp"
    with open(dtzero, "w") as f:
        f.write("0.00 1.0 2.0 3.0\n")
        f.write("0.00 1.5 2.5 3.5\n")     # duplicate first timestamp
    sig, hdr = formats.read_bbp_bulk(spark, str(tmp_path))
    got = sig.toPandas()
    h = {r["file"].rsplit("/", 1)[-1]: r for r in hdr.collect()}
    assert h["sparse.bbp"]["padding"] == 10          # last match wins
    assert h["sparse.bbp"]["lp"] is None             # post-data ignored
    assert h["sparse.bbp"]["units"] == "cm"
    assert h["good.bbp"]["lp"] == 5.0
    # read_bbp_headers agrees on the corrected header
    assert formats.read_bbp_headers(str(sparse))["padding"] == 10
    assert "lp" not in formats.read_bbp_headers(str(sparse))
    sp = got[got["file"].str.endswith("sparse.bbp")].sort_values("t")
    assert list(sp["i"]) == [0, 1, 2] and sp["dt"].iloc[0] == 0.02
    assert np.isnan(sp["h1"].iloc[2])                # bad token -> null
    dz = got[got["file"].str.endswith("dtzero.bbp")]
    assert set(dz["i"]) == {0} and len(dz) == 2      # dt=0 -> degrade
    gd = got[got["file"].str.endswith("good.bbp")]
    assert len(gd) == len(station_pdf)               # unaffected


def test_bbp_bulk_multisplit_header_classification(spark, tmp_path):
    """ADVICE r4: with a file larger than one input split, Spark packs
    splits by DESCENDING size, so monotonically_increasing_id does not
    follow file offset — the old header pass could misread a post-data
    comment as a header.  The wholetext header pass sees true in-file
    line order: the trailing '# lp = 999' must NOT override the leading
    block's value, at a split size that forces many splits."""
    lines = ["# units = cm/s", "# lp = 1.5"]
    lines += [f"{i * 0.01:.2f} 1.0 2.0 3.0" for i in range(3000)]
    lines += ["# lp = 999.0", "# padding = 77"]
    p = tmp_path / "big.bbp"
    p.write_text("\n".join(lines) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        n_parts = spark.read.text(str(p)).rdd.getNumPartitions()
        assert n_parts > 4  # the data pass really is multi-split
        sig, hdr = formats.read_bbp_bulk(spark, str(p))
        h = hdr.collect()[0]
        assert h["units"] == "cm/s"
        assert h["lp"] == 1.5  # leading block wins, not the trailing line
        assert h["padding"] is None  # post-data comment keys don't exist
        assert sig.count() == 3000
        assert sig.where("dt is null or dt != 0.01").count() == 0
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_her_to_bbp_vertical_flip_roundtrip(spark, tmp_path):
    """her→BBP composition (her2bbp.py:145-157): read_hercules →
    hercules_to_bbp (vertical sign flip) → write_bbp → read_bbp must
    hand back h1/h2 unchanged and ver NEGATED vs the Hercules source —
    the one reader-composition path not previously end-to-end
    (VERDICT r4 #8)."""
    rng = np.random.default_rng(11)
    n = 40
    pdf = pd.DataFrame(
        {
            "dt": [0.01] * n,
            **{
                f"{m}_{c}": rng.normal(0, 1, n)
                for m in ("dis", "vel", "acc")
                for c in ("ns", "ew", "up")
            },
        }
    )
    her_path = str(tmp_path / "st.her")
    formats.write_hercules(pdf, her_path)
    her = formats.read_hercules(spark, her_path)
    for quantity in ("dis", "acc"):
        wide = (
            formats.hercules_to_bbp(her, quantity)
            .orderBy("t")
            .toPandas()
        )
        np.testing.assert_allclose(
            wide["h1"], pdf[f"{quantity}_ns"], atol=1e-6
        )
        np.testing.assert_allclose(
            wide["h2"], pdf[f"{quantity}_ew"], atol=1e-6
        )
        # the P6 flip: BBP vertical = − Hercules vertical
        np.testing.assert_allclose(
            wide["ver"], -pdf[f"{quantity}_up"], atol=1e-6
        )
        # dt derived in-plan — the converter output composes with
        # write_bbp directly (review r5 #1: no hand-injected column)
        assert (wide["dt"] == 0.01).all()
        bbp_path = str(tmp_path / f"st.{quantity}.bbp")
        formats.write_bbp(wide, bbp_path, units="cm")
        back, meta = formats.read_bbp(spark, bbp_path)
        got = back.orderBy("t").toPandas()
        assert meta["dt"] == 0.01
        np.testing.assert_allclose(
            got["ver"], -pdf[f"{quantity}_up"], atol=1e-6
        )
    with pytest.raises(ValueError):
        formats.hercules_to_bbp(her, "nope")
    # two stations read as one DataFrame must FAIL, not interleave
    # (review r5 #2)
    formats.write_hercules(pdf, str(tmp_path / "st2.her"))
    both = formats.read_hercules(spark, str(tmp_path) + "/*.her")
    with pytest.raises(Exception) as ei:
        formats.hercules_to_bbp(both, "acc").collect()
    assert "single station" in str(ei.value)


def test_bbp_bulk_crlf_and_cr_only_headers(spark, tmp_path):
    """Review r5: the wholetext header pass must normalize CRLF and
    bare-CR terminators like the Hadoop line reader does — no trailing
    \r inside captured values, and a CR-only file must not collapse
    into one giant 'comment line' (which would let a post-data comment
    override the leading block)."""
    data = "".join(f"{i * 0.01:.2f} 1.0 2.0 3.0\n" for i in range(20))
    (tmp_path / "crlf.bbp").write_bytes(
        ("# units = cm/s\n# orientation = 0,90,up\n" + data + "# lp = 9\n")
        .replace("\n", "\r\n").encode()
    )
    (tmp_path / "cr.bbp").write_bytes(
        ("# units = m\n# lp = 1.5\n" + data + "# lp = 999\n")
        .replace("\n", "\r").encode()
    )
    sig, hdr = formats.read_bbp_bulk(spark, str(tmp_path))
    h = {r["file"].rsplit("/", 1)[-1]: r for r in hdr.collect()}
    assert h["crlf.bbp"]["units"] == "cm/s"  # no trailing \r
    assert h["crlf.bbp"]["orientation"] == "0,90,up"  # (.+) capture clean
    assert h["crlf.bbp"]["lp"] is None  # post-data comment ignored
    assert h["cr.bbp"]["units"] == "m"
    assert h["cr.bbp"]["lp"] == 1.5  # leading block wins, not 999
    g = sig.toPandas()
    assert (g.groupby(g["file"].str.rsplit("/", n=1).str[-1]).size() == 20).all()
