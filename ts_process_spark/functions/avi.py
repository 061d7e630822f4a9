"""Native AVI (RIFF) video container codec — uncompressed DIB frames.

Closes the video leg of the media triad the same way WAV/MP3 closed
audio (reference has no media layer; this is engine-native capability
for a multimodal training corpus): the container walk is pure integer
header math per the public Microsoft AVI RIFF spec (MainAVIHeader /
AVIStreamHeader / BITMAPINFOHEADER), so every metadata column is
EXACTLY recomputable from generation parameters by a SQL oracle, and
the frame payload is the uncompressed bottom-up BGR DIB of the BMP
codec — decode is exact, no psychoacoustic/DCT boundary to stub.

Strictness contract (same loud posture as parse_mp3 / decode_flac /
the r7 WAV truncation fix): any chunk whose declared size runs past
the payload raises ValueError; compressed fourccs raise
NotImplementedError.  Callers in the Spark layer catch both into
``meta_ok=false`` / ``decoded_ok=false`` triage rows — a torn
web-crawled file costs one row, never a task retry.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

_AVIH_FMT = "<IIIIIIIIII4I"  # 14 DWORDs = 56 bytes
_STRH_FMT = "<4s4sIHHIIIIIIII4H"


def _dib_stride(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def encode_avi(
    frames: list[np.ndarray], fps_num: int, fps_den: int = 1
) -> bytes:
    """Deterministic AVI writer: one 'vids' stream of uncompressed
    24-bit DIB frames ('00db' chunks, bottom-up BGR, 4-byte row
    padding — the same pixel layout as encode_bmp) plus an idx1 index.
    The fixture source for the decode/metadata paths."""
    if not frames:
        raise ValueError("need at least one frame")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError(f"invalid fps {fps_num}/{fps_den}")
    h, w = frames[0].shape[:2]
    stride = _dib_stride(w)
    frame_bytes = []
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share one geometry")
        if fr.ndim == 2:
            fr = np.stack([fr] * 3, axis=-1)
        if fr.ndim != 3 or fr.shape[2] != 3:
            # reject RGBA/odd channel counts at ENCODE time: serializing
            # 4 bytes/pixel against the declared 24-bit stride produces
            # a file that only fails later at decode with a confusing
            # geometry error (ADVICE r8)
            raise ValueError(
                f"frames must be HxW (grayscale) or HxWx3 (RGB), got "
                f"shape {fr.shape}"
            )
        img = fr[::-1, :, ::-1].astype(np.uint8)  # bottom-up, BGR
        pad = stride - w * 3
        frame_bytes.append(
            b"".join(img[r].tobytes() + b"\x00" * pad for r in range(h))
        )
    us_per_frame = fps_den * 1_000_000 // fps_num

    avih = b"avih" + struct.pack(
        "<I", 56
    ) + struct.pack(
        _AVIH_FMT,
        us_per_frame, stride * h * fps_num // max(fps_den, 1), 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack("<I", 56) + struct.pack(
        _STRH_FMT,
        b"vids", b"DIB ", 0, 0, 0, 0,
        fps_den, fps_num,  # dwScale, dwRate: fps = rate/scale EXACTLY
        0, len(frames), stride * h, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(strh) + len(strf)
    ) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack(
        "<I", 4 + len(avih) + len(strl)
    ) + b"hdrl" + avih + strl

    movi_body = b"".join(
        b"00db" + struct.pack("<I", len(fb)) + fb + b"\x00" * (len(fb) % 2)
        for fb in frame_bytes
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body

    idx_entries, off = [], 4  # offsets relative to 'movi' fourcc
    for fb in frame_bytes:
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, off, len(fb))
        )
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = b"idx1" + struct.pack(
        "<I", 16 * len(idx_entries)
    ) + b"".join(idx_entries)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, body_len) for chunks in [pos, end);
    raise loudly when a declared size runs past the payload."""
    while pos + 8 <= end:
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        if pos + 8 + clen > end:
            raise ValueError(
                f"truncated chunk {cid!r}: declares {clen} bytes, "
                f"{end - pos - 8} remain"
            )
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned


def parse_avi(payload: bytes) -> dict:
    """Strict AVI header walk → exact integer metadata dict: width,
    height, fps_num (dwRate), fps_den (dwScale), n_frames,
    us_per_frame, duration_us = n_frames·us_per_frame, codec fourcc,
    n_streams, bpp.  Raises ValueError on truncation/malformation and
    NotImplementedError on compressed video fourccs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    riff_len = struct.unpack_from("<I", payload, 4)[0]
    if 8 + riff_len > len(payload):
        raise ValueError(
            f"truncated RIFF: header says {riff_len} bytes, payload "
            f"carries {len(payload) - 8}"
        )
    meta: dict = {}
    for cid, start, clen in _walk(payload, 12, 8 + riff_len):
        if cid != b"LIST" or payload[start:start + 4] != b"hdrl":
            continue
        for c2, s2, l2 in _walk(payload, start + 4, start + clen):
            if c2 == b"avih":
                if l2 < 56:
                    raise ValueError(f"avih chunk too short ({l2} bytes)")
                v = struct.unpack_from(_AVIH_FMT, payload, s2)
                meta.update(
                    us_per_frame=v[0], n_frames=v[4], n_streams=v[6],
                    width=v[8], height=v[9],
                )
            elif c2 == b"LIST" and payload[s2:s2 + 4] == b"strl":
                for c3, s3, l3 in _walk(payload, s2 + 4, s2 + l2):
                    if c3 != b"strh" or l3 < 56:
                        continue
                    sv = struct.unpack_from(_STRH_FMT, payload, s3)
                    if sv[0] != b"vids" or "fps_num" in meta:
                        continue
                    meta.update(
                        # strip NULs too: real-world uncompressed AVIs
                        # commonly carry a NUL-padded fccHandler
                        # (b'\\x00\\x00\\x00\\x00'), which plain strip()
                        # leaves in place (ADVICE r8)
                        codec=sv[1].decode("ascii", "replace").strip(" \x00"),
                        fps_den=sv[6], fps_num=sv[7],
                    )
        break
    for key in ("us_per_frame", "fps_num"):
        if key not in meta:
            raise ValueError(f"missing {'avih' if key[0] == 'u' else 'vids strh'} header")
    if meta["fps_num"] <= 0 or meta["fps_den"] <= 0:
        raise ValueError(
            f"invalid fps {meta['fps_num']}/{meta['fps_den']}"
        )
    if meta["width"] <= 0 or meta["height"] <= 0:
        raise ValueError(
            f"invalid geometry {meta['width']}x{meta['height']}"
        )
    meta["duration_us"] = meta["n_frames"] * meta["us_per_frame"]
    return meta


def iter_avi_frames(payload: bytes) -> Iterator[tuple[int, np.ndarray]]:
    """Decode '00db' uncompressed DIB frames → (frame_idx, HxWx3 uint8
    RGB).  Only the 'DIB ' fourcc is supported (compressed codecs
    raise NotImplementedError — the honest boundary; there is no
    exactness oracle for lossy video).  Frame chunks whose size does
    not match the header geometry raise ValueError."""
    meta = parse_avi(payload)
    if meta.get("codec") not in ("DIB", ""):
        raise NotImplementedError(
            f"only uncompressed 'DIB ' frames supported, got "
            f"{meta.get('codec')!r}"
        )
    w, h = meta["width"], meta["height"]
    stride = _dib_stride(w)
    riff_len = struct.unpack_from("<I", payload, 4)[0]
    idx = 0
    for cid, start, clen in _walk(payload, 12, 8 + riff_len):
        if cid != b"LIST" or payload[start:start + 4] != b"movi":
            continue
        for c2, s2, l2 in _walk(payload, start + 4, start + clen):
            if c2[2:4] not in (b"db", b"dc"):
                continue
            if l2 != stride * h:
                raise ValueError(
                    f"frame {idx}: {l2} bytes, geometry needs {stride * h}"
                )
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=h * stride, offset=s2
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            yield idx, rows[::-1, :, ::-1].copy()  # top-down, RGB
            idx += 1
        return
    raise ValueError("missing movi LIST")
