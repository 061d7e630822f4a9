"""Native FLAC codec — pure Python + NumPy, no codec library.

Implements the FLAC bitstream per its public specification (RFC 9639):

- ``decode_flac``: STREAMINFO parse, frame-header parse (all block-size
  and sample-rate codes, UTF-8-style coded numbers, CRC-8 verify), all
  four subframe types (CONSTANT / VERBATIM / FIXED orders 0-4 / LPC
  orders 1-32), wasted bits, Rice-coded residual partitions in both
  4-bit and 5-bit parameter widths including the escape-to-raw case,
  all four channel assignments (independent, left/side, right/side,
  mid/side), and frame CRC-16 verify.
- ``encode_flac``: a spec-conformant subset encoder used as the
  deterministic fixture source (the zlib-for-PNG role): CONSTANT /
  VERBATIM / FIXED(0-2) subframes with Rice residuals at a chosen
  partition order, independent channels, correct CRC-8/CRC-16 — every
  byte the decoder is asked to verify is genuinely computed.

FLAC is lossless, so encode→decode is bit-identical and decoded-sample
statistics remain exact integer functionals of the source column — the
property the multimodal decoded-stats gate query relies on.

Closes the compressed-audio half of the media boundary
(ts-process has no media layer; this serves the training-pipeline brief
— reference: seismogram formats only, e.g. file_utilities.py readers).
MP3 remains the honest NotImplementedError boundary (lossy psychoacoustic
decode is out of scope for an exactness-gated engine).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_flac", "decode_flac"]


# ------------------------------------------------------------------ CRC

def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab.append(r & mask)
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TAB[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) ^ _CRC16_TAB[((r >> 8) ^ b) & 0xFF]) & 0xFFFF
    return r


# ------------------------------------------------------------- bit I/O

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        # RFC 9639 unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0  # bits consumed of data[byte], MSB first

    def read(self, nbits: int) -> int:
        v = 0
        while nbits > 0:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(avail, nbits)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            nbits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC unary code")
            cur = self.data[self.byte]
            rem = 8 - self.bit
            chunk = cur & ((1 << rem) - 1)
            if chunk == 0:
                q += rem
                self.bit = 0
                self.byte += 1
                continue
            lead = rem - chunk.bit_length()
            q += lead
            self.bit += lead + 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ------------------------------------------------------ coded numbers

def _utf8_number(n: int) -> bytes:
    """UTF-8-style variable-length coded number (extended to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2  # nbytes-byte form carries 1 + 5*nbytes payload bits
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    lead_bits = 7 - nbytes
    lead = (0xFF00 >> nbytes) & 0xFF | (n >> (6 * (nbytes - 1)))
    assert (n >> (6 * (nbytes - 1))) < (1 << lead_bits)
    out.append(lead)
    return bytes(reversed(out))


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    v = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_SAMPLE_SIZE_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SAMPLE_SIZE_BITS = {v: k for k, v in _SAMPLE_SIZE_CODE.items()}
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ------------------------------------------------------------- encoder

def _rice_param(resid: np.ndarray) -> int:
    """Smallest Rice parameter whose mean fits: standard mean-based pick.
    Not capped at the 4-bit field — a result >= 15 is the escape signal."""
    if resid.size == 0:
        return 0
    mean = int(np.abs(resid.astype(object)).sum()) // resid.size
    p = 0
    while (1 << p) < mean + 1 and p < 31:
        p += 1
    return p


def _write_residual(w: _BitWriter, resid: np.ndarray, blocksize: int,
                    order: int, partition_order: int) -> None:
    # partition order is a PER-FRAME field: a short tail frame that the
    # requested order does not divide (or whose first partition would be
    # empty) legitimately drops to a coarser order instead of failing
    po = partition_order
    while po and (blocksize % (1 << po) or (blocksize >> po) <= order):
        po -= 1
    w.write(0, 2)  # method 0: 4-bit Rice parameters
    w.write(po, 4)
    per = blocksize >> po
    start = 0
    for p in range(1 << po):
        cnt = per - order if p == 0 else per
        part = resid[start:start + cnt]
        start += cnt
        param = _rice_param(part)
        if param >= 15:
            # escape: raw 2's-complement at a width that must fit the
            # 5-bit field (callers bound residuals; see _encode_subframe)
            width = max(
                (int(v).bit_length() + 1 for v in part.tolist()), default=1
            )
            if width > 31:
                raise ValueError(
                    "residuals exceed the 31-bit escape width"
                )
            w.write(0xF, 4)
            w.write(width, 5)
            for v in part.tolist():
                w.write(int(v), width)
            continue
        w.write(param, 4)
        for v in part.tolist():
            z = (int(v) << 1) ^ (int(v) >> 63) if int(v) < 0 else int(v) << 1
            w.write_unary(z >> param)
            w.write(z, param)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int,
                     mode: str, partition_order: int) -> None:
    x = x.astype(np.int64)
    if mode == "auto":
        if np.all(x == x[0]):
            mode = "constant"
        else:
            mode = "fixed"
    if mode == "constant":
        if not np.all(x == x[0]):
            raise ValueError("constant subframe on non-constant data")
        w.write(0, 1)
        w.write(0b000000, 6)
        w.write(0, 1)  # no wasted bits
        w.write(int(x[0]), bps)
        return
    if mode == "verbatim":
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        for v in x.tolist():
            w.write(int(v), bps)
        return
    if mode == "fixed":
        # pick order 0-2 by total residual magnitude
        best_order, best_resid, best_cost = 0, x, None
        for order in range(0, 3):
            if x.size <= order:
                break
            coefs = _FIXED_COEF[order]
            resid = x[order:].copy()
            for j, c in enumerate(coefs):
                resid = resid - c * x[order - 1 - j:x.size - 1 - j]
            cost = int(np.abs(resid.astype(object)).sum())
            if best_cost is None or cost < best_cost:
                best_order, best_resid, best_cost = order, resid, cost
        if best_resid.size and (
            int(np.abs(best_resid.astype(object)).max()) >= 1 << 30
        ):
            # residuals would overflow the 31-bit escape width (possible
            # only near bps=32): verbatim encodes the samples exactly
            return _encode_subframe(w, x, bps, "verbatim", partition_order)
        w.write(0, 1)
        w.write(0b001000 | best_order, 6)
        w.write(0, 1)
        for v in x[:best_order].tolist():
            w.write(int(v), bps)
        _write_residual(w, best_resid, x.size, best_order, partition_order)
        return
    raise ValueError(f"unknown subframe mode {mode!r}")


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 16,
    blocksize: int = 4096,
    subframe: str = "auto",
    partition_order: int = 0,
) -> bytes:
    """Encode int samples (shape (n,) mono or (n, ch)) as a FLAC stream.

    Spec-conformant subset: independent channels, fixed blocking
    strategy, CONSTANT / VERBATIM / FIXED(0-2) subframes (``subframe``
    forces a mode; 'auto' picks), Rice residuals at ``partition_order``
    (escape-to-raw when the parameter range is exceeded).  All CRCs are
    computed for real — this is the decoder's adversarial fixture
    generator, not a shortcut writer."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if n == 0:
        raise ValueError("cannot encode an empty sample stream")
    if not 1 <= ch <= 8:
        raise ValueError("1-8 channels")
    if not 16 <= blocksize <= 65536:
        raise ValueError("blocksize must be in [16, 65536]")
    if bps not in _SAMPLE_SIZE_CODE:
        raise ValueError(f"unsupported bits-per-sample {bps}")
    lim = 1 << (bps - 1)
    if n and (x.min() < -lim or x.max() >= lim):
        raise ValueError(f"samples exceed {bps}-bit range")
    # STREAMINFO carries sample_rate in 20 bits and the total sample
    # count in 36; _BitWriter.write masks silently, so an oversized
    # value would emit a CRC-valid stream that decodes to the WRONG
    # rate/length — fail loudly instead (same policy as bps/blocksize).
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError(f"sample_rate {sample_rate} outside [1, 2^20)")
    if n >= 1 << 36:
        raise ValueError("total sample count exceeds 36-bit STREAMINFO field")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # MD5 unset (all zero) per spec
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    frame_idx = 0
    for start in range(0, n, blocksize):
        blk = x[start:start + blocksize]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize strategy
        w.write(0b0111, 4)  # blocksize-1 in 16 bits at header end
        w.write(0b0000, 4)  # sample rate from STREAMINFO
        w.write(ch - 1, 4)  # independent channels
        w.write(_SAMPLE_SIZE_CODE[bps], 3)
        w.write(0, 1)  # reserved
        for b in _utf8_number(frame_idx):
            w.write(b, 8)
        w.write(bs - 1, 16)
        hdr = w.bytes()
        w.write(_crc8(hdr), 8)
        for c in range(ch):
            _encode_subframe(w, blk[:, c], bps, subframe, partition_order)
        w.align()
        frame = w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_idx += 1
    return bytes(out)


# ------------------------------------------------------------- decoder

def _read_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    if blocksize % (1 << po):
        raise ValueError("partition order does not divide block size")
    per = blocksize >> po
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(1 << po):
        cnt = per - order if p == 0 else per
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        param = r.read(pbits)
        if param == escape:
            width = r.read(5)
            for _ in range(cnt):
                out[idx] = r.read_signed(width) if width else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = r.read_unary()
                z = (q << param) | r.read(param)
                out[idx] = (z >> 1) ^ -(z & 1)  # zigzag
                idx += 1
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if ftype == 0:
        x = np.full(blocksize, r.read_signed(bps), dtype=np.int64)
    elif ftype == 1:
        x = np.array([r.read_signed(bps) for _ in range(blocksize)],
                     dtype=np.int64)
    elif 8 <= ftype <= 12:
        order = ftype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEF[order]
        for i in range(order, blocksize):
            acc = resid[i - order]
            for j, c in enumerate(coefs):
                acc += c * x[i - 1 - j]
            x[i] = acc
    elif ftype & 0x20:
        order = (ftype & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * x[i - 1 - j]
            x[i] = resid[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {ftype:#08b}")
    return x << wasted if wasted else x


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, int32 samples) with shape
    (n,) for mono or (n, channels) otherwise.  Verifies every frame
    header CRC-8 and frame CRC-16; raises ValueError on any structural
    or checksum error (a corpus job downgrades that to a
    decoded_ok=false row in multimodal.decoded_stats)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = ch = bps = total = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            if ln != 34:
                raise ValueError("bad STREAMINFO length")
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + ln
    if rate is None:
        raise ValueError("missing STREAMINFO")

    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    got = 0
    while pos < len(payload) and (total is None or total == 0 or got < total):
        frame_start = pos
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("bad frame sync")
        if r.read(1):
            raise ValueError("reserved frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ca = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        fbps = bps if ss_code == 0 else _SAMPLE_SIZE_BITS.get(ss_code)
        if fbps is None:
            raise ValueError(f"reserved sample size code {ss_code}")
        if r.bit:
            raise ValueError("frame header not byte aligned")
        if _crc8(payload[frame_start:r.byte]) != r.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if ca <= 7:
            n_sub = ca + 1
            if n_sub != ch:
                raise ValueError("frame channel count != STREAMINFO")
            subs = [_read_subframe(r, bs, fbps) for _ in range(n_sub)]
        elif ca in (8, 9, 10):
            if ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # the difference (side) channel carries one extra bit
            if ca == 8:  # left/side
                left = _read_subframe(r, bs, fbps)
                side = _read_subframe(r, bs, fbps + 1)
                subs = [left, left - side]
            elif ca == 9:  # right/side
                side = _read_subframe(r, bs, fbps + 1)
                right = _read_subframe(r, bs, fbps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _read_subframe(r, bs, fbps)
                side = _read_subframe(r, bs, fbps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ca}")
        r.align()
        crc_calc = _crc16(payload[frame_start:r.byte])
        crc_read = r.read(16)
        if crc_calc != crc_read:
            raise ValueError("frame CRC-16 mismatch")
        for c in range(ch):
            chans[c].append(subs[c])
        got += bs
        pos = r.byte

    if pos < len(payload):
        # total satisfied but bytes remain: a bad concatenation or
        # corruption PAST the last frame would otherwise be silently
        # accepted — the stream is structurally invalid, say so.
        raise ValueError(
            f"{len(payload) - pos} trailing bytes after final FLAC frame"
        )
    if not chans[0]:
        raise ValueError("FLAC stream contains no frames")
    cols = [np.concatenate(parts) for parts in chans]
    n = cols[0].size
    if total:
        if n < total:
            raise ValueError("FLAC stream shorter than STREAMINFO total")
        cols = [c[:total] for c in cols]
    arr = np.stack(cols, axis=1).astype(np.int32)
    return rate, arr[:, 0] if ch == 1 else arr


def parse_streaminfo(payload: bytes) -> dict:
    """Metadata-only STREAMINFO read — the corpus-triage twin of
    decode_flac for ``multimodal.extract_media_metadata``: walks the
    metadata block list (same strictness as decode_flac) and returns
    ``{sample_rate, channels, bits_per_sample, n_samples}`` without
    touching a single audio frame, so a 100-TB triage pass costs bytes
    proportional to the header, not the audio."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    last = False
    info = None
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
        if pos + 4 + ln > len(payload):
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if ln != 34:
                raise ValueError("bad STREAMINFO length")
            br = _BitReader(payload[pos + 4:pos + 4 + ln])
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            info = {
                "sample_rate": br.read(20),
                "channels": br.read(3) + 1,
                "bits_per_sample": br.read(5) + 1,
                "n_samples": br.read(36),
            }
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + ln
    if info is None:
        raise ValueError("missing STREAMINFO")
    return info
