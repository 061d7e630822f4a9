"""Native JPEG codec — pure NumPy, no libjpeg/PIL.

Decoder: baseline sequential (SOF0) AND progressive (SOF2, T.81
Annex G: spectral selection + successive approximation, DC/AC first
and refinement scans with EOB-run coding), 8-bit, grayscale and
3-component YCbCr with arbitrary power-of-two sampling factors
(4:4:4 / 4:2:2 / 4:2:0), restart intervals, marker-segment walking
with byte-stuffed entropy streams.  The baseline path is verified
against real libjpeg-encoded files shipped inside this container
(tests/test_training_ops.py::test_jpeg_codec — a 4:2:0 photo with
restart markers, a 4:4:4 color image, a grayscale thumbnail); the
progressive path is pinned by the invariant that a progressive file
carrying the same quantized coefficients decodes BIT-IDENTICALLY to
its baseline twin (scans only reorder coefficient bits).
Arithmetic-coded/12-bit/lossless/hierarchical JPEG raise
NotImplementedError.

Encoders: grayscale or RGB 4:4:4 with a fixed quality-90-ish luminance
quant table and SELF-BUILT canonical Huffman tables (every RRRRSSSS
symbol gets an 8/9-bit code — deliberately suboptimal but spec-valid,
which is what lets this module avoid transcribing the Annex K tables);
used to generate deterministic fixtures for the decode path.
``encode_jpeg_progressive`` emits a 4-kind scan script (DC first at
Al=1, DC refinement, per-component AC first at Al=1, per-component AC
refinement to Al=0) so every progressive decode path — EOB runs, ZRL,
correction bits — is exercised by roundtrips.

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


def _code_block_zz(bw, zz, prev_dc, dc_codes, ac_codes):
    """Baseline sequential Huffman coding of ONE quantized zigzag block
    (the entropy half of the encoder; the DCT/quantize half lives in
    _quantized_blocks, the ONE copy both encoders share — review r6)."""
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


def _comp_planes(img):
    """uint8 image → (h, w), list of float64 component planes
    (gray → [Y]; RGB → [Y, Cb, Cr]) — shared by both encoders."""
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
    return img.shape[:2], planes


def _seg(marker, body):
    """One FF-marker segment with its big-endian length framing."""
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _headers(h, w, nc, sof_marker, ri=0):
    """SOI + DQT + SOF + (DRI) + both DHT segments — shared by the
    sequential (SOF0) and progressive (SOF2) encoders."""
    qz = QTABLE.ravel()[ZIGZAG]
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in qz))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(sof_marker, sof)
    if ri:
        out += _seg(0xDD, struct.pack(">H", ri))
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    return out


def encode_jpeg(img):
    (h, w), planes = _comp_planes(img)
    nc = len(planes)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    ncy, ncx, zz = _quantized_blocks(planes, h, w)
    bw = BitWriter()
    prev = [0] * nc
    for by in range(ncy):
        for bx in range(ncx):
            for ci in range(nc):  # 4:4:4 interleave: 1 block each
                prev[ci] = _code_block_zz(
                    bw, zz[ci][by, bx], prev[ci], dc_codes, ac_codes
                )
    bw.flush()
    out = _headers(h, w, nc, 0xC0)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bytes(bw.buf) + b"\xff\xd9"
    return out


def _quantized_blocks(planes, h, w):
    """Pad to 8×8 blocks, forward-DCT and quantize: one (ncy, ncx, 64)
    zigzag int64 array per component — the ONE copy of the coefficient
    math; both encoders entropy-code from these arrays, which is what
    makes the progressive/baseline twin equality structural."""
    padded = [
        np.pad(p, ((0, -h % 8), (0, -w % 8)), mode="edge") - 128.0
        for p in planes
    ]
    H, W = padded[0].shape
    ncy, ncx = H // 8, W // 8
    q = QTABLE.astype(np.float64)
    out = []
    for p in padded:
        z = np.zeros((ncy, ncx, 64), np.int64)
        for by in range(ncy):
            for bx in range(ncx):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                z[by, bx] = np.round(
                    (_C @ blk @ _C.T) / q
                ).astype(np.int64).ravel()[ZIGZAG]
        out.append(z)
    return ncy, ncx, out


def _eob_sym(bw, ac_codes, eobrun):
    """Emit an EOBn code: category = floor(log2(run)), low bits appended
    (T.81 G.1.2.2) — the decoder reconstructs run-1 remaining blocks."""
    nb = eobrun.bit_length() - 1
    c, ln = ac_codes[nb << 4]
    bw.put(c, ln)
    if nb:
        bw.put(eobrun - (1 << nb), nb)


def _restart(bw, rst):
    """Byte-align and emit RSTn (cycling 0-7) into the entropy buffer."""
    bw.flush()
    bw.buf += bytes([0xFF, 0xD0 + rst % 8])
    return rst + 1


def _enc_ac_first(z, ss, se, al, ac_codes, ri=0):
    """AC first scan (Ah=0) of one component: point-transformed
    (truncate-toward-zero by Al) run/size coding with cross-block
    EOB runs.  ``ri``: restart interval in blocks (EOB run cannot
    straddle a restart)."""
    bw = BitWriter()
    eobrun = 0
    ncy, ncx = z.shape[:2]
    rst = unit = 0
    for by in range(ncy):
        for bx in range(ncx):
            if ri and unit and unit % ri == 0:
                if eobrun:
                    _eob_sym(bw, ac_codes, eobrun)
                    eobrun = 0
                rst = _restart(bw, rst)
            unit += 1
            band = z[by, bx, ss:se + 1]
            vals = np.sign(band) * (np.abs(band) >> al)
            r = 0
            for v in map(int, vals):
                if v == 0:
                    r += 1
                    continue
                if eobrun:
                    _eob_sym(bw, ac_codes, eobrun)
                    eobrun = 0
                while r > 15:
                    c, ln = ac_codes[0xF0]
                    bw.put(c, ln)
                    r -= 16
                s, bits = _mag_bits(v)
                c, ln = ac_codes[(r << 4) | s]
                bw.put(c, ln)
                bw.put(bits, s)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    _eob_sym(bw, ac_codes, eobrun)
                    eobrun = 0
    if eobrun:
        _eob_sym(bw, ac_codes, eobrun)
    bw.flush()
    return bw


def _enc_ac_refine(z, ss, se, al, ac_codes, ri=0):
    """AC refinement scan (Ah=Al+1) of one component — the
    correction-bit protocol (T.81 G.1.2.3, the flowchart libjpeg's
    encode_mcu_AC_refine implements): newly-nonzero coefficients are
    run/1 symbols whose runs count only zero-history positions; each
    nonzero-history coefficient passed buffers one correction bit,
    flushed after the next emitted symbol; ZRLs are emitted only up to
    the last newly-nonzero index (later ones fold into the EOB run),
    and the EOB run carries every tail correction bit of its blocks."""
    bw = BitWriter()
    eobrun = 0
    pending = []  # correction bits riding the open EOB run

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun == 0:
            return
        _eob_sym(bw, ac_codes, eobrun)
        for b in pending:
            bw.put(b, 1)
        pending = []
        eobrun = 0

    ncy, ncx = z.shape[:2]
    rst = unit = 0
    for by in range(ncy):
        for bx in range(ncx):
            if ri and unit and unit % ri == 0:
                flush_eob()
                rst = _restart(bw, rst)
            unit += 1
            band = [int(v) for v in z[by, bx, ss:se + 1]]
            absv = [abs(v) >> al for v in band]
            eob_idx = max(
                (i for i, a in enumerate(absv) if a == 1), default=-1
            )
            r = 0
            buf = []  # this block's correction bits since last symbol
            for i, (v, a) in enumerate(zip(band, absv)):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob_idx:
                    flush_eob()
                    c, ln = ac_codes[0xF0]
                    bw.put(c, ln)
                    r -= 16
                    for b in buf:
                        bw.put(b, 1)
                    buf = []
                if a > 1:
                    buf.append(a & 1)
                    continue
                flush_eob()
                c, ln = ac_codes[(r << 4) | 1]
                bw.put(c, ln)
                bw.put(1 if v > 0 else 0, 1)
                for b in buf:
                    bw.put(b, 1)
                buf = []
                r = 0
            if r > 0 or buf:
                eobrun += 1
                pending.extend(buf)
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
    bw.flush()
    return bw


def encode_jpeg_progressive(img, restart_interval=0):
    """Progressive (SOF2) twin of encode_jpeg: the SAME quantized
    coefficients, delivered by a scan script that exercises every
    progressive decode path — DC first at Al=1, DC refinement,
    per-component AC first at Al=1 (spectral band 1-63), per-component
    AC refinement to Al=0.  decode_jpeg(encode_jpeg_progressive(x)) is
    therefore BIT-IDENTICAL to decode_jpeg(encode_jpeg(x)).
    ``restart_interval`` (MCUs; 0 = none) additionally pins the
    progressive restart path — markers byte-align and reset DC
    predictors and EOB runs in every scan kind."""
    (h, w), planes = _comp_planes(img)
    nc = len(planes)
    ri = int(restart_interval)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    ncy, ncx, zz = _quantized_blocks(planes, h, w)

    scans = []  # (scan component indices, Ss, Se, Ah, Al, BitWriter)
    # DC first, interleaved (Al=1): diffs coded in the shifted domain
    bw = BitWriter()
    prev = [0] * nc
    rst = unit = 0
    for by in range(ncy):
        for bx in range(ncx):
            if ri and unit and unit % ri == 0:
                rst = _restart(bw, rst)
                prev = [0] * nc
            unit += 1
            for ci in range(nc):
                v = int(zz[ci][by, bx, 0]) >> 1  # arithmetic shift (G.1.2.1)
                s, bits = _mag_bits(v - prev[ci])
                c, ln = dc_codes[s]
                bw.put(c, ln)
                if s:
                    bw.put(bits, s)
                prev[ci] = v
    bw.flush()
    scans.append((list(range(nc)), 0, 0, 0, 1, bw))
    # DC refinement: one appended bit per block (two's-complement low
    # bit matches the decoder's |= of bit Al)
    bw = BitWriter()
    rst = unit = 0
    for by in range(ncy):
        for bx in range(ncx):
            if ri and unit and unit % ri == 0:
                rst = _restart(bw, rst)
            unit += 1
            for ci in range(nc):
                bw.put(int(zz[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    scans.append((list(range(nc)), 0, 0, 1, 0, bw))
    for ci in range(nc):
        scans.append(
            ([ci], 1, 63, 0, 1, _enc_ac_first(zz[ci], 1, 63, 1, ac_codes, ri))
        )
    for ci in range(nc):
        scans.append(
            ([ci], 1, 63, 1, 0, _enc_ac_refine(zz[ci], 1, 63, 0, ac_codes, ri))
        )

    out = _headers(h, w, nc, 0xC2, ri)
    for cis, ss, se, ah, al, bw in scans:
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += bytes(bw.buf)
    out += b"\xff\xd9"
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
    progressive = False
    coefs = None  # progressive: cid -> (nby, nbx, 64) zigzag int64
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
            if progressive and coefs is not None:
                return _reconstruct_progressive(coefs, comps, qt, h, w)
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
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            for ci in range(nc):
                cid = body[6 + 3 * ci]
                samp = body[7 + 3 * ci]
                tq = body[8 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 15, tq))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "unsupported JPEG coding process (arithmetic/12-bit/"
                "lossless/hierarchical)"
            )
        elif marker == 0xDD:
            ri = struct.unpack(">H", body)[0]
        elif marker == 0xDA:
            ns = body[0]
            scomps = []  # (cid, dc table, ac table) in scan order
            for si in range(ns):
                scomps.append(
                    (body[1 + 2 * si], body[2 + 2 * si] >> 4,
                     body[2 + 2 * si] & 15)
                )
            if h is None:
                raise ValueError("SOS before SOF")
            known = {c[0] for c in comps}
            if any(cid not in known for cid, _, _ in scomps):
                raise ValueError("SOS/SOF component id mismatch")
            if any(tq not in qt for _, _, _, tq in comps):
                raise ValueError("undefined JPEG quant table")
            if progressive:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 15
                if ss > se or se > 63 or (ss == 0) != (se == 0):
                    raise ValueError("bad progressive spectral band")
                if ss > 0 and ns != 1:
                    raise ValueError("interleaved progressive AC scan")
                # only the tables a scan of this kind actually reads
                # must exist (DC refinement scans use none at all)
                for cid, td, ta in scomps:
                    if ss == 0 and ah == 0 and (0, td) not in ht:
                        raise ValueError("undefined JPEG Huffman table")
                    if ss > 0 and (1, ta) not in ht:
                        raise ValueError("undefined JPEG Huffman table")
                if coefs is None:
                    hmax = max(c[1] for c in comps)
                    vmax = max(c[2] for c in comps)
                    mcux = -(-w // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    coefs = {
                        cid: np.zeros((mcuy * vs, mcux * hs, 64), np.int64)
                        for cid, hs, vs, tq in comps
                    }
                end = _entropy_end(payload, pos)
                _progressive_scan(
                    payload[pos:end], scomps, ss, se, ah, al,
                    comps, coefs, ht, ri, w, h,
                )
                pos = end
                continue
            # ---- baseline: exactly one scan, decode and return
            if ns != len(comps):
                raise NotImplementedError("multi-scan baseline JPEG")
            tsel = {cid: (td, ta) for cid, td, ta in scomps}
            # corrupt files referencing undefined tables/components must
            # fail with the loud-ValueError contract, not KeyError
            for cid, hs, vs, tq in comps:
                if cid not in tsel:
                    raise ValueError("SOS/SOF component id mismatch")
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
    if progressive and coefs is not None:
        raise ValueError("missing EOI")  # truncated progressive tail
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
    return _assemble(planes, comps, h, w, hmax, vmax)


def _assemble(planes, comps, h, w, hmax, vmax):
    """Upsample per-component planes, crop to (h, w), level-shift and
    color-convert — the shared tail of the baseline and progressive
    reconstruction paths."""
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


# ---------------------------------------------------------- progressive


def _entropy_end(payload, pos):
    """First offset ≥ pos of a real marker (0xFF followed by anything
    but a stuffed 0x00 or a restart code) — the end of a scan's
    entropy-coded span.  Jumps 0xFF-to-0xFF with bytes.find instead of
    walking every byte (this runs once per scan inside the mapInPandas
    decode path)."""
    i = pos
    while True:
        i = payload.find(b"\xff", i)
        if i < 0 or i + 1 >= len(payload):
            raise ValueError("unterminated JPEG scan")
        nxt = payload[i + 1]
        if nxt != 0x00 and not 0xD0 <= nxt <= 0xD7:
            return i
        i += 2


def _scan_units(scomps, comps, w, h):
    """Restart-interval units of one scan: each unit is the list of
    (cid, block_y, block_x) data units of one MCU.  Interleaved scans
    (ns > 1) walk the MCU grid with each component's sampling-factor
    sub-blocks; a single-component scan is NON-interleaved (T.81
    B.2.3): one data unit per MCU, raster order over THAT component's
    own (non-MCU-padded) block grid."""
    cinfo = {cid: (hs, vs) for cid, hs, vs, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(scomps) > 1:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for cid, _, _ in scomps:
                    hs, vs = cinfo[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            unit.append((cid, my * vs + by, mx * hs + bx))
                units.append(unit)
        return units
    cid = scomps[0][0]
    hs, vs = cinfo[cid]
    cw = -(-(w * hs) // hmax)  # component dims (T.81 A.1.1)
    ch = -(-(h * vs) // vmax)
    ncx = -(-cw // 8)
    ncy = -(-ch // 8)
    return [[(cid, by, bx)] for by in range(ncy) for bx in range(ncx)]


def _ac_first(br, cf, ss, se, al, eobrun, actree):
    """One block of an AC first scan (Ah=0): baseline run/size coding
    plus EOB-run codes (RRRR with SSSS=0 → skip 2^RRRR+bits blocks)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_sym(br, actree)
        r, s = sym >> 4, sym & 15
        if s:
            k += r
            if k > se:
                raise ValueError("AC run overflow")
            cf[k] = _extend(br.bits(s), s) << al
            k += 1
        elif r == 15:
            k += 16  # ZRL
        else:
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
    return eobrun


def _ac_refine(br, cf, ss, se, al, eobrun, actree):
    """One block of an AC refinement scan (Ah=Al+1): newly-nonzero
    coefficients arrive as run/1 symbols whose runs count only
    zero-history positions; every nonzero-history position passed (and,
    once in an EOB run, every one to the end of the band) consumes a
    correction bit (T.81 G.1.2.3)."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_sym(br, actree)
            r, s = sym >> 4, sym & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                val = p1 if br.bit() else -p1
            elif r < 15:
                # the run count INCLUDES this block: its correction-bit
                # tail below still runs, then the run decrements (the
                # AC-first path instead folds its decrement in at once,
                # since a first-scan block needs no tail processing)
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                break  # correction-bit tail below finishes the band
            # advance past r zero-history positions (16 for ZRL),
            # correcting every nonzero-history coefficient on the way
            while k <= se:
                if cf[k] != 0:
                    if br.bit() and (cf[k] & p1) == 0:
                        cf[k] += p1 if cf[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("AC refinement overflow")
                cf[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if cf[k] != 0:
                if br.bit() and (cf[k] & p1) == 0:
                    cf[k] += p1 if cf[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(data, scomps, ss, se, ah, al, comps, coefs, ht, ri,
                      w, h):
    """Apply one progressive scan's entropy data to the coefficient
    state: DC first (Ah=0, diff-coded then <<Al) / DC refinement (one
    appended bit per block) / AC first / AC refinement.  Restart
    markers byte-align and reset both DC predictors and the EOB run."""
    br = BitReader(data)
    units = _scan_units(scomps, comps, w, h)
    dctrees = {cid: ht.get((0, td)) for cid, td, _ in scomps}
    actree = ht.get((1, scomps[0][2])) if ss > 0 else None
    prev = {cid: 0 for cid, _, _ in scomps}
    eobrun = 0
    for ui, unit in enumerate(units):
        if ri and ui and ui % ri == 0:
            br.sync_restart()
            prev = {cid: 0 for cid, _, _ in scomps}
            eobrun = 0
        for cid, by, bx in unit:
            cf = coefs[cid][by, bx]
            if ss == 0:
                if ah == 0:
                    s = _read_sym(br, dctrees[cid])
                    prev[cid] += _extend(br.bits(s), s) if s else 0
                    cf[0] = prev[cid] << al
                elif br.bit():
                    cf[0] |= 1 << al
            elif ah == 0:
                eobrun = _ac_first(br, cf, ss, se, al, eobrun, actree)
            else:
                eobrun = _ac_refine(br, cf, ss, se, al, eobrun, actree)


def _reconstruct_progressive(coefs, comps, qt, h, w):
    """Dequantize + IDCT the accumulated coefficient state (vectorized
    over all blocks) and assemble exactly like the baseline path."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, hs, vs, tq in comps:
        arr = coefs[cid]
        nby, nbx = arr.shape[:2]
        dz = np.zeros((nby, nbx, 64), np.int64)
        dz[:, :, ZIGZAG] = arr
        blocks = dz.reshape(nby, nbx, 8, 8) * qt[tq]
        sp = np.einsum("ab,yxbc,cd->yxad", _C.T, blocks, _C)
        planes[cid] = sp.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return _assemble(planes, comps, h, w, hmax, vmax)
