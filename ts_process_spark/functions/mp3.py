"""Native MPEG-audio (MP3) frame-header walker — the honest middle
ground for the one remaining media boundary (VERDICT r6 #5).

A full psychoacoustic Layer-III sample decode has no exactness oracle
(the spec permits implementation-defined rounding), so samples stay a
loud ``NotImplementedError`` in the multimodal decode path.  What IS
exactness-oracle-able is the frame header layer: every field below is
pure integer math over the 4-byte headers defined publicly in
ISO/IEC 11172-3 §2.4.1.3 (MPEG-1) and ISO/IEC 13818-3 (MPEG-2 /
unofficial 2.5 extension), so corpus triage — sample rate, channel
count, frame count, exact sample count, CBR/VBR shape, duration —
works on a 100-TB audio crawl without pretending to decode audio.

Reference parity: the reference engine has no MP3 surface at all; this
module exists for the training-data-pipeline tier (corpus triage of
web-crawled audio), same rationale as functions/flac.py.

Parsing posture mirrors the other native codecs (flac.py, jpeg.py):
strict, loud failures.  No resync scanning over garbage — the first
frame must start at byte 0 (after any ID3v2 tag), every subsequent
frame must start where the previous one ended, version/layer/sample
rate may not change mid-stream, and trailing bytes that are not an
ID3v1 tag raise.  A web corpus is full of truncated and mislabeled
payloads; silently "recovering" them is how wrong durations enter a
dataset.
"""

from __future__ import annotations

import struct

# bitrate tables, kbit/s, index 1..14 (0 = "free format", 15 = invalid)
# ISO 11172-3 Table B.2 (MPEG-1) / 13818-3 (MPEG-2, also used for 2.5)
_BITRATE_V1_L3 = (None, 32, 40, 48, 56, 64, 80, 96, 112,
                  128, 160, 192, 224, 256, 320, None)
_BITRATE_V2_L3 = (None, 8, 16, 24, 32, 40, 48, 56, 64,
                  80, 96, 112, 128, 144, 160, None)

# sample-rate tables by version, index 0..2 (3 = reserved)
_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}

# version-ID field (header bits 20-19) → version string; 0b01 reserved
_VERSION = {0b00: "2.5", 0b10: "2", 0b11: "1"}

# samples per Layer-III frame: 1152 (MPEG-1), 576 (MPEG-2/2.5)
_SPF = {"1": 1152, "2": 576, "2.5": 576}


def _id3v2_size(payload: bytes) -> int:
    """Byte length of a leading ID3v2 tag (0 if absent).  The size
    field is 4 synchsafe bytes (7 bits each, high bit must be clear);
    flag bit 0x10 appends a 10-byte footer."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    flags = payload[5]
    sz = payload[6:10]
    if any(b & 0x80 for b in sz):
        raise ValueError("ID3v2 size bytes are not synchsafe")
    size = (sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3]
    total = 10 + size + (10 if flags & 0x10 else 0)
    if total > len(payload):
        raise ValueError("ID3v2 tag size exceeds payload")
    return total


def _parse_header(hdr: int) -> dict:
    """Decode one 32-bit big-endian frame header into its fields,
    raising on anything this module does not cover (Layer I/II, free
    bitrate, reserved indices) — a loud boundary, not a guess."""
    if (hdr >> 21) & 0x7FF != 0x7FF:
        raise ValueError("lost MPEG frame sync")
    vbits = (hdr >> 19) & 0b11
    if vbits == 0b01:
        raise ValueError("reserved MPEG version ID")
    version = _VERSION[vbits]
    layer_bits = (hdr >> 17) & 0b11
    if layer_bits != 0b01:  # 01 = Layer III
        raise NotImplementedError(
            f"MPEG Layer {(4 - layer_bits)} not supported (MP3 = Layer III)"
        )
    crc_protected = ((hdr >> 16) & 1) == 0
    br_idx = (hdr >> 12) & 0xF
    if br_idx == 0xF:
        raise ValueError("invalid bitrate index 15")
    if br_idx == 0:
        raise NotImplementedError(
            "free-format bitrate (index 0): frame length is not "
            "derivable from the header"
        )
    table = _BITRATE_V1_L3 if version == "1" else _BITRATE_V2_L3
    bitrate_kbps = table[br_idx]
    sr_idx = (hdr >> 10) & 0b11
    if sr_idx == 0b11:
        raise ValueError("reserved sample-rate index 3")
    sample_rate = _RATES[version][sr_idx]
    padding = (hdr >> 9) & 1
    mode = (hdr >> 6) & 0b11  # 00 stereo / 01 joint / 10 dual / 11 mono
    # Layer III frame length: floor(spf/8 * bitrate / rate) + padding
    # (spf/8 = 144 for MPEG-1, 72 for MPEG-2/2.5; padding slot = 1 byte)
    spf = _SPF[version]
    frame_len = (spf // 8) * bitrate_kbps * 1000 // sample_rate + padding
    return {
        "version": version,
        "sample_rate": sample_rate,
        "bitrate_kbps": bitrate_kbps,
        "padding": padding,
        "channels": 1 if mode == 0b11 else 2,
        "crc_protected": crc_protected,
        "frame_len": frame_len,
        "spf": spf,
    }


def parse_mp3(payload: bytes) -> dict:
    """Walk every frame header of an MP3 stream and return its exact
    integer metadata:

    ``version`` ('1'/'2'/'2.5'), ``sample_rate``, ``channels``,
    ``n_frames``, ``n_samples`` (= n_frames × samples-per-frame — the
    exact decoded length a real decoder would produce),
    ``bitrate_kbps`` (first frame), ``is_cbr`` (every frame shares one
    bitrate index), ``n_audio_bytes`` (sum of frame lengths),
    ``duration_us`` (floor(n_samples · 10⁶ / sample_rate) — exact
    integer division, no float), ``has_id3v2`` / ``has_id3v1``,
    ``crc_protected``.

    Strict walk: frames must be contiguous from the first audio byte;
    version / sample rate / channel count may not change mid-stream
    (a concatenation of unlike streams is structurally invalid here);
    the only tolerated trailing bytes are one ID3v1 tag (exactly 128
    bytes starting ``TAG``)."""
    if len(payload) < 4:
        raise ValueError("payload too short for an MPEG frame header")
    pos = _id3v2_size(payload)
    has_id3v2 = pos > 0
    end = len(payload)
    has_id3v1 = end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG"
    if has_id3v1:
        end -= 128
    first = None
    n_frames = 0
    n_audio_bytes = 0
    bitrates: set[int] = set()
    while pos < end:
        if pos + 4 > end:
            raise ValueError(
                f"{end - pos} trailing bytes are not a frame header"
            )
        (hdr,) = struct.unpack_from(">I", payload, pos)
        f = _parse_header(hdr)
        if first is None:
            first = f
        elif (
            f["version"] != first["version"]
            or f["sample_rate"] != first["sample_rate"]
            or f["channels"] != first["channels"]
        ):
            raise ValueError(
                "version/sample-rate/channel change mid-stream at frame "
                f"{n_frames}"
            )
        if pos + f["frame_len"] > end:
            raise ValueError(
                f"truncated frame {n_frames}: header promises "
                f"{f['frame_len']} bytes, {end - pos} remain"
            )
        bitrates.add(f["bitrate_kbps"])
        n_audio_bytes += f["frame_len"]
        pos += f["frame_len"]
        n_frames += 1
    if first is None:
        raise ValueError("MP3 stream contains no frames")
    n_samples = n_frames * first["spf"]
    return {
        "version": first["version"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "n_samples": n_samples,
        "bitrate_kbps": first["bitrate_kbps"],
        "is_cbr": len(bitrates) == 1,
        "n_audio_bytes": n_audio_bytes,
        "duration_us": n_samples * 1_000_000 // first["sample_rate"],
        "has_id3v2": has_id3v2,
        "has_id3v1": has_id3v1,
        "crc_protected": first["crc_protected"],
    }


def synth_mp3(
    n_frames: int,
    version: str = "1",
    sr_idx: int = 0,
    bitrate_indices: "list[int] | int" = 9,
    mono: bool = False,
    id3v2_body: int = 0,
    id3v1: bool = False,
    pad_every: int = 0,
    seed: int = 0,
) -> bytes:
    """Deterministic structurally-valid MP3 synthesizer for tests and
    fixtures: real 4-byte headers with the requested version / sample
    rate / bitrate sequence, frame bodies filled with deterministic
    non-audio bytes (``(seed + frame·31 + offset) mod 256``).  The
    header walk — the only thing parse_mp3 reads — is exactly what a
    real encoder would emit; the bodies are explicitly fake, which is
    the documented posture for lossy media in this engine (plumbing
    real, sample decode stubbed loudly)."""
    vbits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    if isinstance(bitrate_indices, int):
        bitrate_indices = [bitrate_indices] * n_frames
    if len(bitrate_indices) != n_frames:
        raise ValueError("bitrate_indices length must equal n_frames")
    out = bytearray()
    if id3v2_body:
        if id3v2_body >= 1 << 28:
            raise ValueError("ID3v2 body too large for synchsafe size")
        out += b"ID3\x04\x00\x00"
        out += bytes(
            [
                (id3v2_body >> 21) & 0x7F,
                (id3v2_body >> 14) & 0x7F,
                (id3v2_body >> 7) & 0x7F,
                id3v2_body & 0x7F,
            ]
        )
        out += bytes((seed + j) % 256 for j in range(id3v2_body))
    table = _BITRATE_V1_L3 if version == "1" else _BITRATE_V2_L3
    rate = _RATES[version][sr_idx]
    spf = _SPF[version]
    for fr, br_idx in enumerate(bitrate_indices):
        padding = 1 if pad_every and (fr + 1) % pad_every == 0 else 0
        hdr = (
            (0x7FF << 21)
            | (vbits << 19)
            | (0b01 << 17)  # Layer III
            | (1 << 16)  # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (padding << 9)
            | ((0b11 if mono else 0b00) << 6)
        )
        frame_len = (spf // 8) * table[br_idx] * 1000 // rate + padding
        out += struct.pack(">I", hdr)
        out += bytes(
            (seed + fr * 31 + j) % 256 for j in range(frame_len - 4)
        )
    if id3v1:
        out += b"TAG" + bytes((seed + j) % 256 for j in range(125))
    return bytes(out)
