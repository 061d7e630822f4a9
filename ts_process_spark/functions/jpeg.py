"""Native baseline JPEG codec — pure NumPy, no libjpeg/PIL.

Decoder: baseline sequential (SOF0), 8-bit, grayscale and 3-component
YCbCr with arbitrary power-of-two sampling factors (4:4:4 / 4:2:2 /
4:2:0), restart intervals, marker-segment walking with byte-stuffed
entropy streams.  Verified against real libjpeg-encoded files shipped
inside this container (tests/test_training_ops.py::test_jpeg_codec —
a 4:2:0 photo with restart markers, a 4:4:4 color image, a grayscale
thumbnail).  Progressive/arithmetic/12-bit JPEG raise
NotImplementedError.

Encoder: grayscale or RGB 4:4:4 with a fixed quality-90-ish luminance
quant table and SELF-BUILT canonical Huffman tables (every RRRRSSSS
symbol gets an 8/9-bit code — deliberately suboptimal but spec-valid,
which is what lets this module avoid transcribing the Annex K tables);
used to generate deterministic fixtures for the decode path.

The per-block loops are Python — this codec runs inside mapInPandas
batches where the surrounding Spark plan is the part that must scale;
a throughput deployment would swap in libjpeg behind the same
decode_image seam.
"""
import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

QTABLE = np.array([
    [ 3,  2,  2,  3,  5,  8, 10, 12],
    [ 2,  2,  3,  4,  5, 12, 12, 11],
    [ 3,  3,  3,  5,  8, 11, 14, 11],
    [ 3,  3,  4,  6, 10, 17, 16, 12],
    [ 4,  4,  7, 11, 14, 22, 21, 15],
    [ 5,  7, 11, 13, 16, 21, 23, 18],
    [10, 13, 16, 17, 21, 24, 24, 20],
    [14, 18, 19, 20, 22, 20, 21, 20],
], dtype=np.int64)


def _dct_mat():
    C = np.zeros((8, 8))
    for k in range(8):
        a = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            C[k, n] = a * np.cos((2 * n + 1) * k * np.pi / 16)
    return C

_C = _dct_mat()

DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_BITS = [0] * 16
AC_BITS[7] = 127
AC_BITS[8] = 129
AC_VALS = list(range(256))


def _canonical_codes(bits, vals):
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for b in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> b) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _mag_bits(v):
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(bw, block, prev_dc, dc_codes, ac_codes, q):
    coef = _C @ block @ _C.T
    zz = np.round(coef / q).astype(np.int64).ravel()[ZIGZAG]
    diff = int(zz[0]) - prev_dc
    s, bitsv = _mag_bits(diff)
    c, ln = dc_codes[s]
    bw.put(c, ln)
    if s:
        bw.put(bitsv, s)
    last_nz = max([i for i in range(1, 64) if zz[i]] or [0])
    run = 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            if run == 16:
                c, ln = ac_codes[0xF0]
                bw.put(c, ln)
                run = 0
            continue
        s, bitsv = _mag_bits(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(bitsv, s)
        run = 0
    if last_nz != 63:
        c, ln = ac_codes[0x00]
        bw.put(c, ln)
    return int(zz[0])


def encode_jpeg(img):
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError("expected (H, W) gray or (H, W, 3) RGB uint8")
    h, w = img.shape[:2]
    nc = len(planes)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    padded = [
        np.pad(p, ((0, -h % 8), (0, -w % 8)), mode="edge") - 128.0
        for p in planes
    ]
    H, W = padded[0].shape
    bw = BitWriter()
    prev = [0] * nc
    q = QTABLE.astype(np.float64)
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            for ci in range(nc):  # 4:4:4 interleave: 1 block each
                prev[ci] = _encode_block(
                    bw, padded[ci][by:by+8, bx:bx+8], prev[ci],
                    dc_codes, ac_codes, q,
                )
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qz = QTABLE.ravel()[ZIGZAG]
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in qz))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bytes(bw.buf) + b"\xff\xd9"
    return out


class BitReader:
    def __init__(self, data):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self):
        if self.n == 0:
            if self.pos >= len(self.d):
                raise ValueError("truncated JPEG entropy stream")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.d):
                    raise ValueError("truncated JPEG after 0xFF")
                m = self.d[self.pos]
                self.pos += 1
                if m != 0x00:
                    raise ValueError(f"unexpected marker 0xFF{m:02x} in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self):
        self.n = 0  # drop partial byte padding
        if (self.pos + 1 >= len(self.d) or self.d[self.pos] != 0xFF
                or not 0xD0 <= self.d[self.pos + 1] <= 0xD7):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _decode_tree(bits, vals):
    """(length, code) -> symbol — the decode direction of the ONE
    canonical-Huffman walk (_canonical_codes)."""
    return {
        (ln, code): v for v, (code, ln) in _canonical_codes(bits, vals).items()
    }


def _read_sym(br, tree):
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if (ln, code) in tree:
            return tree[(ln, code)]
    raise ValueError("bad Huffman code")


def _extend(v, s):
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br, dctree, actree, prev_dc, q):
    zz = np.zeros(64, np.int64)
    s = _read_sym(br, dctree)
    diff = _extend(br.bits(s), s) if s else 0
    dc = prev_dc + diff
    zz[0] = dc
    i = 1
    while i < 64:
        sym = _read_sym(br, actree)
        if sym == 0x00:
            break
        run, size = sym >> 4, sym & 15
        if size == 0:
            if run == 15:
                i += 16
                continue
            raise ValueError("bad AC symbol")
        i += run
        if i > 63:
            raise ValueError("AC run overflow")
        zz[i] = _extend(br.bits(size), size)
        i += 1
    block = np.zeros(64, np.int64)
    block[ZIGZAG] = zz
    return dc, _C.T @ (block.reshape(8, 8) * q) @ _C


def decode_jpeg(payload):
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt, ht = {}, {}
    ri = 0
    h = w = None
    comps = []  # (cid, hsamp, vsamp, tq)
    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # skip legal 0xFF fill bytes before the marker code
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG marker")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("JPEG has no scan")
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        ln = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        pos += ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant table")
                tbl = np.zeros(64, np.int64)
                tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, i + 1)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                ht[(tc, th)] = _decode_tree(bits, list(body[i+17:i+17+nv]))
                i += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            for ci in range(nc):
                cid = body[6 + 3 * ci]
                samp = body[7 + 3 * ci]
                tq = body[8 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 15, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG")
        elif marker == 0xDD:
            ri = struct.unpack(">H", body)[0]
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError("multi-scan JPEG")
            tsel = {}
            for si in range(ns):
                cid = body[1 + 2 * si]
                tt = body[2 + 2 * si]
                tsel[cid] = (tt >> 4, tt & 15)
            # corrupt files referencing undefined tables/components must
            # fail with the loud-ValueError contract, not KeyError
            for cid, hs, vs, tq in comps:
                if cid not in tsel:
                    raise ValueError("SOS/SOF component id mismatch")
                if tq not in qt:
                    raise ValueError("undefined JPEG quant table")
                if (0, tsel[cid][0]) not in ht or (1, tsel[cid][1]) not in ht:
                    raise ValueError("undefined JPEG Huffman table")
            if ns == 1:
                # a one-component scan is NON-interleaved (T.81 B.2.3):
                # MCU = one 8x8 data unit in raster order regardless of
                # the SOF sampling factors
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            scan = payload[pos:]
            end = scan.rfind(b"\xff\xd9")
            if end < 0:
                raise ValueError("missing EOI")
            return _decode_frame(scan[:end], h, w, comps, tsel, qt, ht, ri)
    raise ValueError("no SOS marker")


def _decode_frame(data, h, w, comps, tsel, qt, ht, ri=0):
    br = BitReader(data)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), np.float64)
    prev = {c[0]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n_mcu and n_mcu % ri == 0:
                br.sync_restart()  # byte-align + reset DC predictors
                prev = {c[0]: 0 for c in comps}
            n_mcu += 1
            for cid, hs, vs, tq in comps:
                dct, act = ht[(0, tsel[cid][0])], ht[(1, tsel[cid][1])]
                for by in range(vs):
                    for bx in range(hs):
                        prev[cid], blk = _decode_block(
                            br, dct, act, prev[cid], qt[tq]
                        )
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0:y0+8, x0:x0+8] = blk
    full = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.clip(
            np.round(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)
    raise NotImplementedError(f"{len(full)}-component JPEG")
