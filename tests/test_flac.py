"""Native FLAC codec tests.

The encoder (CONSTANT/VERBATIM/FIXED subframes, Rice partitions, real
CRCs) is the deterministic fixture source; decoder paths the encoder
does not emit — LPC subframes, stereo decorrelation, the 5-bit Rice
method, escape partitions, wasted bits, short block-size codes — are
exercised with hand-assembled bitstreams (the progressive-JPEG test
technique) whose expected sample values are replayed independently in
plain Python ints."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ts_process_spark.functions import flac
from ts_process_spark.functions.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
)


# ------------------------------------------------------------ roundtrip


def test_encode_decode_roundtrip_matrix():
    rng = np.random.default_rng(11)
    walk = np.clip(np.cumsum(rng.integers(-60, 60, 9000)), -32768, 32767)
    stereo = np.stack(
        [walk, np.clip(walk + rng.integers(-9, 9, walk.size), -32768, 32767)],
        axis=1,
    )
    cases = [
        ("auto", walk, {}),
        ("stereo", stereo, {}),
        ("constant", np.full(500, -7, np.int64), {}),
        ("verbatim", rng.integers(-32768, 32767, 4096), {"subframe": "verbatim"}),
        ("po2", walk[:4096], {"partition_order": 2}),
        ("multi-frame tail", walk[:5000], {"blocksize": 1024}),
        ("bps8", rng.integers(-128, 128, 650), {"bps": 8}),
    ]
    for name, data, kw in cases:
        enc = flac.encode_flac(np.asarray(data, np.int64), 22050, **kw)
        rate, dec = flac.decode_flac(enc)
        assert rate == 22050, name
        assert dec.shape == np.asarray(data).shape, name
        assert np.array_equal(dec, data), name
    # fixed predictors actually compress the walk
    enc = flac.encode_flac(walk, 16000)
    assert len(enc) < walk.size * 2 * 0.7


def test_encoder_edge_validation_and_fallbacks():
    """Review findings: encoder edges must fail loudly or fall back,
    never emit a stream its own decoder rejects."""
    rng = np.random.default_rng(3)
    # 32-bit samples whose residuals exceed the 31-bit escape width:
    # fixed mode falls back to verbatim and roundtrips exactly
    big = rng.integers(-(1 << 31), 1 << 31, 600, dtype=np.int64)
    rate, dec = flac.decode_flac(flac.encode_flac(big, 16000, bps=32))
    assert np.array_equal(dec, big)
    # noisy high-magnitude residuals route through the escape partition
    # (param >= 15) and roundtrip
    noisy = rng.integers(-(1 << 27), 1 << 27, 600, dtype=np.int64)
    rate, dec = flac.decode_flac(flac.encode_flac(noisy, 16000, bps=32))
    assert np.array_equal(dec, noisy)
    # a short tail frame drops the partition order per-frame instead of
    # failing: 4098 = 4096 + 2-sample tail at partition_order=2
    x = (np.arange(4098, dtype=np.int64) % 200) - 100
    rate, dec = flac.decode_flac(
        flac.encode_flac(x, 16000, blocksize=4096, partition_order=2)
    )
    assert np.array_equal(dec, x)
    # loud failures, not silently corrupt streams
    with pytest.raises(ValueError, match="empty"):
        flac.encode_flac(np.array([], dtype=np.int64))
    with pytest.raises(ValueError, match="blocksize"):
        flac.encode_flac(np.arange(100), blocksize=70000)
    with pytest.raises(ValueError, match="blocksize"):
        flac.encode_flac(np.arange(100), blocksize=8)


def test_multibyte_coded_frame_numbers():
    """>127 frames forces 2-byte UTF-8-style frame numbers end-to-end."""
    x = np.arange(2200, dtype=np.int64) % 251 - 125
    enc = flac.encode_flac(x, 8000, blocksize=16)
    rate, dec = flac.decode_flac(enc)
    assert rate == 8000 and np.array_equal(dec, x)
    assert _utf8_number(130) == bytes([0xC2, 0x82])
    assert _utf8_number(0x7FF) == bytes([0xDF, 0xBF])
    assert len(_utf8_number((1 << 36) - 1)) == 7


def test_crc_tamper_detection():
    x = np.arange(1024, dtype=np.int64) - 512
    enc = bytearray(flac.encode_flac(x, 16000))
    # frame payload bit → caught structurally or by CRC-16, never
    # silently decoded
    bad = bytearray(enc)
    bad[-30] ^= 0x10
    with pytest.raises(ValueError, match="CRC|truncated|reserved|invalid"):
        flac.decode_flac(bytes(bad))
    # flip the CRC-16 itself: structure intact, checksum must object
    bad = bytearray(enc)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC-16"):
        flac.decode_flac(bytes(bad))
    # frame header byte (blocksize low byte) → CRC-8 must catch it
    hdr_at = enc.index(b"\xff\xf8", 4)
    bad = bytearray(enc)
    bad[hdr_at + 5] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8|sync|reserved|coded"):
        flac.decode_flac(bytes(bad))
    # garbage magic
    with pytest.raises(ValueError, match="not a FLAC"):
        flac.decode_flac(b"ID3\x03" + bytes(enc))


# -------------------------------------- hand-assembled decoder fixtures


def _frame_header(w: _BitWriter, ca: int, bs: int, bps: int) -> None:
    w.write(0b11111111111110, 14)
    w.write(0, 2)  # reserved + fixed strategy
    w.write(0b0111, 4)  # 16-bit blocksize-1 follows
    w.write(0b0000, 4)  # rate from STREAMINFO
    w.write(ca, 4)
    w.write(flac._SAMPLE_SIZE_CODE[bps], 3)
    w.write(0, 1)
    w.write(0, 8)  # frame number 0
    w.write(bs - 1, 16)


def _stream(ch: int, bps: int, bs: int, ca: int, write_subframes) -> bytes:
    """One-frame FLAC stream with caller-controlled subframe bits."""
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16000, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(bs, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    w = _BitWriter()
    _frame_header(w, ca, bs, bps)
    w.write(_crc8(w.bytes()), 8)
    write_subframes(w)
    w.align()
    frame = w.bytes()
    return bytes(out) + frame + struct.pack(">H", _crc16(frame))


def _verbatim(w: _BitWriter, vals, bits: int) -> None:
    w.write(0, 1)
    w.write(0b000001, 6)
    w.write(0, 1)
    for v in vals:
        w.write(int(v), bits)


def test_decode_lpc_subframe():
    """LPC order 2, precision 5, shift 3: expected samples replayed as
    the integer recurrence x[i] = r[i] + ((c0*x[i-1] + c1*x[i-2]) >> 3)."""
    bs, bps = 12, 16
    warm = [100, 130]
    coefs = [9, -4]  # fit signed 5-bit precision
    shift = 3
    resid = [3, -2, 0, 5, -7, 1, 0, -1, 2, 4]

    def subframes(w: _BitWriter) -> None:
        w.write(0, 1)
        w.write(0b100000 | (2 - 1), 6)  # LPC order 2
        w.write(0, 1)  # no wasted bits
        for v in warm:
            w.write(v, bps)
        w.write(5 - 1, 4)  # precision code
        w.write(shift, 5)
        for c in coefs:
            w.write(c, 5)
        w.write(0, 2)  # 4-bit Rice method
        w.write(0, 4)  # partition order 0
        w.write(2, 4)  # rice parameter
        for r in resid:
            z = (r << 1) ^ (r >> 63) if r < 0 else r << 1
            w.write_unary(z >> 2)
            w.write(z, 2)

    rate, dec = flac.decode_flac(_stream(1, bps, bs, 0, subframes))
    x = list(warm)
    for r in resid:
        x.append(r + ((coefs[0] * x[-1] + coefs[1] * x[-2]) >> shift))
    assert rate == 16000
    assert dec.tolist() == x


def test_decode_stereo_decorrelation_modes():
    """left/side (ca=8), right/side (ca=9), mid/side (ca=10): the side
    channel carries bps+1 bits; expected L/R from the RFC formulas."""
    bps, bs = 16, 6
    left = [1000, -500, 32767, -32768, 7, 0]
    right = [990, -510, 32760, -32768, -7, 1]
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]

    def make(ca):
        def subframes(w: _BitWriter) -> None:
            if ca == 8:
                _verbatim(w, left, bps)
                _verbatim(w, side, bps + 1)
            elif ca == 9:
                _verbatim(w, side, bps + 1)
                _verbatim(w, right, bps)
            else:
                _verbatim(w, mid, bps)
                _verbatim(w, side, bps + 1)

        return _stream(2, bps, bs, ca, subframes)

    for ca in (8, 9, 10):
        rate, dec = flac.decode_flac(make(ca))
        assert dec.shape == (bs, 2), ca
        assert dec[:, 0].tolist() == left, ca
        assert dec[:, 1].tolist() == right, ca


def test_decode_wasted_bits_and_rice5_and_escape():
    """One frame, three subframe features the encoder never writes:
    channel 0 uses wasted bits (verbatim at bps-2, decoded <<2);
    channel 1 uses the 5-bit Rice method on a FIXED order-1 subframe;
    channel 2 uses an escape partition (raw 6-bit residuals)."""
    bps, bs = 16, 8
    c0 = [v << 2 for v in [3, -3, 100, -100, 0, 1, -1, 50]]
    c1_warm, c1_resid = [250], [4, -4, 9, 0, -1, 17, -30]
    c2_warm, c2_resid = [-12], [31, -32, 0, 5, -5, 12, -1]

    def subframes(w: _BitWriter) -> None:
        # ch 0: verbatim with wasted=2 (flag 1 then unary 1 -> "01")
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(1, 1)
        w.write(0b01, 2)  # unary 1 => wasted = 2
        for v in c0:
            w.write(v >> 2, bps - 2)
        # ch 1: fixed order 1, 5-bit rice method (method code 1)
        w.write(0, 1)
        w.write(0b001001, 6)
        w.write(0, 1)
        w.write(c1_warm[0], bps)
        w.write(1, 2)  # method 1: 5-bit params
        w.write(0, 4)
        w.write(3, 5)  # rice parameter 3
        for r in c1_resid:
            z = (r << 1) ^ (r >> 63) if r < 0 else r << 1
            w.write_unary(z >> 3)
            w.write(z, 3)
        # ch 2: fixed order 1, 4-bit method with escape partition
        w.write(0, 1)
        w.write(0b001001, 6)
        w.write(0, 1)
        w.write(c2_warm[0], bps)
        w.write(0, 2)
        w.write(0, 4)
        w.write(0xF, 4)  # escape
        w.write(6, 5)  # 6-bit raw residuals
        for r in c2_resid:
            w.write(r, 6)

    rate, dec = flac.decode_flac(_stream(3, bps, bs, 2, subframes))
    x1 = list(c1_warm)
    for r in c1_resid:
        x1.append(r + x1[-1])
    x2 = list(c2_warm)
    for r in c2_resid:
        x2.append(r + x2[-1])
    assert dec[:, 0].tolist() == c0
    assert dec[:, 1].tolist() == x1
    assert dec[:, 2].tolist() == x2


def test_decode_short_blocksize_codes():
    """Block-size codes 0001 (192) and 1000 (256) parse without an
    explicit length field."""
    for code, bs in ((0b0001, 192), (0b1000, 256)):
        vals = [((7 * i) % 200) - 100 for i in range(bs)]
        out = bytearray(b"fLaC")
        si = _BitWriter()
        si.write(bs, 16)
        si.write(bs, 16)
        si.write(0, 24)
        si.write(0, 24)
        si.write(44100, 20)
        si.write(0, 3)
        si.write(15, 5)
        si.write(bs, 36)
        body = si.bytes() + b"\x00" * 16
        out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 2)
        w.write(code, 4)
        w.write(0, 4)
        w.write(0, 4)
        w.write(flac._SAMPLE_SIZE_CODE[16], 3)
        w.write(0, 1)
        w.write(0, 8)
        w.write(_crc8(w.bytes()), 8)
        _verbatim(w, vals, 16)
        w.align()
        frame = w.bytes()
        rate, dec = flac.decode_flac(
            bytes(out) + frame + struct.pack(">H", _crc16(frame))
        )
        assert rate == 44100 and dec.tolist() == vals


# ---------------------------------------------------- pipeline plumbing


def test_decode_audio_dispatch(spark):
    from ts_process_spark.operators import multimodal

    s = (np.arange(300) % 101 - 50).astype(np.int16)
    rate, got = multimodal.decode_audio(multimodal.encode_wav(s, 16000))
    assert rate == 16000 and np.array_equal(got, s)
    rate, got = multimodal.decode_audio(flac.encode_flac(s.astype(np.int64)))
    assert rate == 16000 and np.array_equal(got, s)
    # MP3 sync bytes now route to the metadata-path error (r7), not
    # the generic unrecognized-format one
    with pytest.raises(NotImplementedError, match="extract_media_metadata"):
        multimodal.decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 64)  # MP3-ish
    with pytest.raises(NotImplementedError, match="WAV/FLAC"):
        multimodal.decode_audio(b"\x00\x01\x02\x03" + b"\x00" * 64)


def test_media_from_series_mixed_codec_stats_identical(spark):
    """decoded_stats over audio_codec='mixed' equals the all-WAV table:
    FLAC is lossless, so the decode-path swap is invisible to the
    integer functionals — the property that lets the gate query route
    half its audio payloads through FLAC under the unchanged oracle."""
    import pandas as pd

    from pyspark.sql import functions as F

    from ts_process_spark.operators import multimodal

    rows = []
    for mid in range(8):
        for i in range(40):
            rows.append((mid, "audio", i, ((mid * 37 + i * 13) % 3000) - 1500))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "i", "s"])
    )
    with pytest.raises(ValueError, match="audio_codec"):
        multimodal.media_from_series(df, audio_codec="mp3")
    mixed = multimodal.media_from_series(df, audio_codec="mixed")
    magics = {
        r["media_id"]: bytes(r["m"])
        for r in mixed.select(
            "media_id", F.substring("payload", 1, 4).alias("m")
        ).collect()
    }
    assert {m for k, m in magics.items() if k % 4 == 1} == {b"fLaC"}
    assert {m for k, m in magics.items() if k % 4 != 1} == {b"RIFF"}
    stats = lambda media: sorted(
        tuple(r)
        for r in multimodal.decoded_stats(media).collect()
    )
    wav = multimodal.media_from_series(df, audio_codec="wav")
    assert stats(mixed) == stats(wav)
    assert all(r[2] for r in stats(mixed))  # decoded_ok everywhere
