"""MP3 frame-header metadata (VERDICT r6 #5): the header walk is pure
integer math, so — unlike the (honestly absent) psychoacoustic sample
decode — it is exactness-oracle-able.  These tests pin the parser
against hand-derived frame arithmetic, the strict-failure posture, and
the Spark operator against a DuckDB twin that RECOMPUTES every output
column from the generation parameters (not from the parser)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts_process_spark.functions.mp3 import parse_mp3, synth_mp3
from ts_process_spark.operators import multimodal


def _meta(payload: bytes) -> dict:
    """MEDIA_SCHEMA's meta struct (non-nullable n_bytes)."""
    return {"width": None, "height": None, "sample_rate": None,
            "n_bytes": len(payload)}

# ------------------------------------------------------------- parser


def test_cbr_mpeg1_arithmetic():
    # MPEG-1 Layer III, 44100 Hz, bitrate index 9 = 128 kbps, stereo:
    # frame_len = 144*128000/44100 = 417 (floor), spf = 1152
    b = synth_mp3(n_frames=5, version="1", sr_idx=0, bitrate_indices=9)
    m = parse_mp3(b)
    assert m["version"] == "1" and m["sample_rate"] == 44100
    assert m["channels"] == 2 and m["n_frames"] == 5
    assert m["n_samples"] == 5 * 1152
    assert m["bitrate_kbps"] == 128 and m["is_cbr"] is True
    assert m["n_audio_bytes"] == 5 * 417
    assert m["duration_us"] == 5 * 1152 * 1_000_000 // 44100
    assert len(b) == 5 * 417  # synth emits exactly the promised bytes


def test_padding_and_vbr():
    # padding adds exactly one byte to padded frames; mixed bitrate
    # indices flip is_cbr and keep bitrate_kbps = FIRST frame's rate
    b = synth_mp3(
        n_frames=6, version="1", sr_idx=1,  # 48000 Hz
        bitrate_indices=[9, 9, 11, 9, 14, 9], pad_every=3,
    )
    m = parse_mp3(b)
    assert m["is_cbr"] is False and m["bitrate_kbps"] == 128
    # 48000: 128k(idx 9)->384, 192k(idx 11)->576, 320k(idx 14)->960;
    # frames 3 and 6 (1-based) padded
    assert m["n_audio_bytes"] == 384 + 384 + (576 + 1) + 384 + 960 + (384 + 1)
    assert m["n_frames"] == 6 and m["n_samples"] == 6 * 1152


def test_mpeg2_and_25_mono():
    # MPEG-2 Layer III: spf 576, V2 bitrate table (idx 9 = 80 kbps)
    b2 = synth_mp3(n_frames=4, version="2", sr_idx=2, bitrate_indices=9,
                   mono=True)
    m2 = parse_mp3(b2)
    assert (m2["version"], m2["sample_rate"], m2["channels"]) == ("2", 16000, 1)
    assert m2["n_samples"] == 4 * 576
    assert m2["bitrate_kbps"] == 80
    assert m2["n_audio_bytes"] == 4 * (72 * 80000 // 16000)
    b25 = synth_mp3(n_frames=3, version="2.5", sr_idx=2, bitrate_indices=1)
    m25 = parse_mp3(b25)
    assert (m25["version"], m25["sample_rate"]) == ("2.5", 8000)
    assert m25["bitrate_kbps"] == 8 and m25["duration_us"] == 3 * 576 * 1_000_000 // 8000


def test_id3_tags():
    b = synth_mp3(n_frames=2, id3v2_body=77, id3v1=True)
    m = parse_mp3(b)
    assert m["has_id3v2"] is True and m["has_id3v1"] is True
    assert m["n_frames"] == 2
    plain = synth_mp3(n_frames=2)
    mp = parse_mp3(plain)
    assert mp["has_id3v2"] is False and mp["has_id3v1"] is False
    assert mp["n_frames"] == 2 and mp["n_audio_bytes"] == m["n_audio_bytes"]


def test_strict_failures():
    good = synth_mp3(n_frames=3)
    with pytest.raises(ValueError, match="sync"):
        parse_mp3(b"\x00\x00\x00\x00" + good)
    with pytest.raises(ValueError, match="truncated frame"):
        parse_mp3(good[:-10])
    with pytest.raises(ValueError, match="trailing bytes"):
        parse_mp3(good + b"\x01\x02\x03")  # junk that is not ID3v1
    # mid-stream sample-rate change = structurally invalid concatenation
    with pytest.raises(ValueError, match="mid-stream"):
        parse_mp3(synth_mp3(2, sr_idx=0) + synth_mp3(2, sr_idx=1))
    # Layer II header (layer bits 0b10)
    l2 = bytearray(good)
    l2[1] = (l2[1] & ~0b110) | 0b100
    with pytest.raises(NotImplementedError, match="Layer 2"):
        parse_mp3(bytes(l2))
    # free-format bitrate index 0
    ff = bytearray(good)
    ff[2] = ff[2] & 0x0F
    with pytest.raises(NotImplementedError, match="free-format"):
        parse_mp3(bytes(ff))
    # reserved sample-rate index 3
    rs = bytearray(good)
    rs[2] |= 0b1100
    with pytest.raises(ValueError, match="reserved sample-rate"):
        parse_mp3(bytes(rs))
    with pytest.raises(ValueError, match="no frames|too short"):
        parse_mp3(b"")


def test_mp3_parse_synth_property():
    """Property: for ANY structurally-valid synthesized stream, the
    parser recovers exactly the generation parameters — version, rate,
    channel count, frame count, per-frame bitrate arithmetic (via
    n_audio_bytes), CBR flag, tag presence."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ts_process_spark.functions.mp3 import (
        _BITRATE_V1_L3, _BITRATE_V2_L3, _RATES, _SPF,
    )

    @settings(max_examples=150, deadline=None)
    @given(
        version=st.sampled_from(["1", "2", "2.5"]),
        sr_idx=st.integers(0, 2),
        brs=st.lists(st.integers(1, 14), min_size=1, max_size=12),
        mono=st.booleans(),
        id3v2=st.integers(0, 64),
        id3v1=st.booleans(),
        pad_every=st.integers(0, 4),
        seed=st.integers(0, 1000),
    )
    def check(version, sr_idx, brs, mono, id3v2, id3v1, pad_every, seed):
        b = synth_mp3(
            n_frames=len(brs), version=version, sr_idx=sr_idx,
            bitrate_indices=brs, mono=mono, id3v2_body=id3v2,
            id3v1=id3v1, pad_every=pad_every, seed=seed,
        )
        m = parse_mp3(b)
        table = _BITRATE_V1_L3 if version == "1" else _BITRATE_V2_L3
        rate = _RATES[version][sr_idx]
        spf = _SPF[version]
        want_bytes = sum(
            (spf // 8) * table[i] * 1000 // rate
            + (1 if pad_every and (fr + 1) % pad_every == 0 else 0)
            for fr, i in enumerate(brs)
        )
        assert m["version"] == version
        assert m["sample_rate"] == rate
        assert m["channels"] == (1 if mono else 2)
        assert m["n_frames"] == len(brs)
        assert m["n_samples"] == len(brs) * spf
        assert m["bitrate_kbps"] == table[brs[0]]
        assert m["is_cbr"] == (len(set(brs)) == 1)
        assert m["n_audio_bytes"] == want_bytes
        assert m["duration_us"] == len(brs) * spf * 1_000_000 // rate
        assert m["has_id3v2"] == (id3v2 > 0)
        assert m["has_id3v1"] == id3v1
        # and the parse is strict about tail truncation
        with pytest.raises(ValueError):
            parse_mp3(b[:-1])

    check()


def test_decode_audio_mp3_boundary():
    """decode_audio stays the loud sample boundary but now names the
    metadata path; decoded_stats downgrades it to decoded_ok=false."""
    with pytest.raises(NotImplementedError, match="extract_media_metadata"):
        multimodal.decode_audio(synth_mp3(2))


# ----------------------------------------------- Spark operator + twin


def _params(n: int = 48) -> pd.DataFrame:
    """Deterministic per-media generation parameters: version / rate /
    bitrate / frame count / padding cadence / tags all pure functions
    of media_id, so the DuckDB twin can recompute the expected metadata
    with SQL integer arithmetic alone."""
    rows = []
    for mid in range(n):
        version = ("1", "2", "2.5")[mid % 3]
        sr_idx = mid % 3
        br_idx = 1 + (mid % 14)
        rows.append(
            {
                "media_id": mid,
                "version": version,
                "sr_idx": sr_idx,
                "br_idx": br_idx,
                "n_frames": 2 + mid % 9,
                "pad_every": mid % 4,
                "mono": mid % 2 == 1,
                "id3v2_body": (mid % 5) * 13,
                "id3v1": mid % 3 == 0,
            }
        )
    return pd.DataFrame(rows)


_RATE_SQL = """
CASE version
  WHEN '1'   THEN CASE sr_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
  WHEN '2'   THEN CASE sr_idx WHEN 0 THEN 22050 WHEN 1 THEN 24000 ELSE 16000 END
  ELSE            CASE sr_idx WHEN 0 THEN 11025 WHEN 1 THEN 12000 ELSE  8000 END
END
"""

_KBPS_SQL = """
CASE WHEN version = '1'
  THEN list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320], br_idx)
  ELSE list_extract([8,16,24,32,40,48,56,64,80,96,112,128,144,160], br_idx)
END
"""


def test_media_metadata_matches_duckdb(spark):
    """The full Spark path (synthesized payload bytes → mapInPandas →
    header walk) against a DuckDB twin that never sees the bytes: every
    column is re-derived from the generation parameters with integer
    SQL.  A single off-by-one in the frame-length or duration math on
    either side breaks the multiset compare."""
    pdf = _params()
    payloads = []
    for r in pdf.itertuples():
        b = synth_mp3(
            n_frames=int(r.n_frames),
            version=r.version,
            sr_idx=int(r.sr_idx),
            bitrate_indices=int(r.br_idx),
            mono=bool(r.mono),
            id3v2_body=int(r.id3v2_body),
            id3v1=bool(r.id3v1),
            pad_every=int(r.pad_every),
            seed=int(r.media_id),
        )
        payloads.append((int(r.media_id), "audio", b, _meta(b)))
    media = spark.createDataFrame(payloads, multimodal.MEDIA_SCHEMA)
    got = sorted(
        (
            r["media_id"], r["container"], r["meta_ok"], r["sample_rate"],
            r["channels"], r["n_frames"], r["n_samples"],
            r["bitrate_kbps"], r["is_cbr"], r["duration_us"],
        )
        for r in multimodal.extract_media_metadata(media).collect()
    )
    con = duckdb.connect()
    con.register("params", pdf)
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
WITH p AS (
  SELECT media_id, n_frames,
         {_RATE_SQL} AS rate, {_KBPS_SQL} AS kbps,
         CASE WHEN version = '1' THEN 1152 ELSE 576 END AS spf,
         pad_every, mono
  FROM params
)
SELECT media_id, 'mp3' AS container, TRUE AS meta_ok,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(CASE WHEN mono THEN 1 ELSE 2 END AS BIGINT) AS channels,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(n_frames * spf AS BIGINT) AS n_samples,
       CAST(kbps AS BIGINT) AS bitrate_kbps,
       TRUE AS is_cbr,
       CAST(n_frames * spf * 1000000 // rate AS BIGINT) AS duration_us
FROM p ORDER BY media_id
"""
            ).fetchall(),
        )
    )
    assert got == want


def test_media_metadata_wav_flac_and_poison(spark):
    """Routing: WAV and FLAC payloads produce exact metadata from their
    own headers, an MP3 with a torn tail produces meta_ok=false with
    the error preserved, an image payload is identified but carries no
    audio fields — all in one schema-stable pass."""
    import numpy as np

    from ts_process_spark.functions.flac import encode_flac

    s = (np.arange(400, dtype=np.int64) * 37 % 1000 - 500).astype(np.int16)
    wav = multimodal.encode_wav(s, 16000)
    flac = encode_flac(s, 16000)
    bmp = multimodal.encode_bmp(
        (np.arange(64, dtype=np.int64) % 256).astype(np.uint8).reshape(8, 8)
    )
    torn = synth_mp3(3)[:-5]
    media = spark.createDataFrame(
        [
            (0, "audio", wav, _meta(wav)),
            (1, "audio", flac, _meta(flac)),
            (2, "audio", torn, _meta(torn)),
            (3, "image", bmp, _meta(bmp)),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.extract_media_metadata(media).collect()
    }
    w = rows[0]
    assert (w["container"], w["meta_ok"]) == ("wav", True)
    assert (w["sample_rate"], w["channels"], w["n_samples"]) == (16000, 1, 400)
    assert w["bitrate_kbps"] == 256 and w["is_cbr"] is True
    assert w["duration_us"] == 400 * 1_000_000 // 16000
    f = rows[1]
    assert (f["container"], f["meta_ok"]) == ("flac", True)
    assert (f["sample_rate"], f["channels"], f["n_samples"]) == (16000, 1, 400)
    assert f["bitrate_kbps"] is None and f["is_cbr"] is None
    assert f["duration_us"] == w["duration_us"]
    t = rows[2]
    assert (t["container"], t["meta_ok"]) == ("mp3", False)
    assert "truncated frame" in t["err"]
    i = rows[3]
    assert (i["container"], i["meta_ok"]) == ("bmp", False)
    assert i["sample_rate"] is None


def test_media_metadata_hostile_headers(spark):
    """Review-r7 poisoned-header cases: (a) a FLAC whose STREAMINFO
    total-samples field is 0 means UNKNOWN length (RFC 9639 streaming
    encoders) — the row must carry NULL n_samples/duration with
    meta_ok=true, never 'exactly 0'; (b) a WAV with channels=0 or
    sample_rate=0 must produce ONE meta_ok=false row, not a
    ZeroDivisionError task crash."""
    import struct as st

    from ts_process_spark.functions import flac as flacmod

    # hand-build fLaC + STREAMINFO with total=0 (unknown)
    w = flacmod._BitWriter()
    w.write(4096, 16)  # min blocksize
    w.write(4096, 16)  # max blocksize
    w.write(0, 24)
    w.write(0, 24)
    w.write(16000, 20)  # sample rate
    w.write(0, 3)       # channels-1
    w.write(15, 5)      # bps-1
    w.write(0, 36)      # total samples UNKNOWN
    si = bytes(w.buf) + b"\x00" * (34 - len(w.buf))  # md5 field padding
    payload = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    # a WAV with a zero channel count in fmt
    bad_wav = (
        b"RIFF" + st.pack("<I", 36) + b"WAVE"
        + b"fmt " + st.pack("<I", 16)
        + st.pack("<HHIIHH", 1, 0, 16000, 0, 2, 16)
        + b"data" + st.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    media = spark.createDataFrame(
        [(0, "audio", payload, _meta(payload)),
         (1, "audio", bad_wav, _meta(bad_wav))],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.extract_media_metadata(media).collect()
    }
    f = rows[0]
    assert (f["container"], f["meta_ok"]) == ("flac", True)
    assert f["sample_rate"] == 16000 and f["channels"] == 1
    assert f["n_samples"] is None and f["duration_us"] is None
    wv = rows[1]
    assert (wv["container"], wv["meta_ok"]) == ("wav", False)
    assert "channels=0" in wv["err"]


def test_media_metadata_truncated_wav(spark):
    """ADVICE r7: a WAV cut mid-data-chunk (the web-crawl truncation
    case) must triage to ONE meta_ok=false row with the truncation
    named — never a meta_ok=true row with a silently reduced
    n_samples/duration — matching parse_mp3's truncated-frame and
    decode_flac's trailing-byte strictness.  decode_wav must refuse the
    same payload rather than fabricate a shorter sample array."""
    import numpy as np

    s = (np.arange(100, dtype=np.int64) * 13 % 512 - 256).astype(np.int16)
    wav = multimodal.encode_wav(s, 16000)
    torn = wav[:-7]  # data header still promises 200 bytes
    media = spark.createDataFrame(
        [(0, "audio", torn, _meta(torn))], multimodal.MEDIA_SCHEMA
    )
    (r,) = multimodal.extract_media_metadata(media).collect()
    assert (r["container"], r["meta_ok"]) == ("wav", False)
    assert "truncated data chunk" in r["err"]
    assert r["n_samples"] is None and r["duration_us"] is None
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_wav(torn)


def test_media_metadata_plan_is_single_pass(spark):
    """Triage must stay a single Arrow scan: no exchange, no join, one
    mapInPandas stage."""
    b = synth_mp3(2)
    media = spark.createDataFrame(
        [(0, "audio", b, _meta(b))], multimodal.MEDIA_SCHEMA
    )
    plan = (
        multimodal.extract_media_metadata(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan
