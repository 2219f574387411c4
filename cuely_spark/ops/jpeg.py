"""Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) — stdlib + numpy.

Closes the last "compressed codec" substitution point in the
multimodal plumbing with a REAL decoder: no PIL/opencv in this
container, and the format is fully public (ITU-T T.81 / Annex K
tables). Reference role: the engine treats media payloads as opaque
binary columns (SURVEY §2 multimodal); decoding happens inside
Arrow-batched UDFs — this module is what those UDFs call for
image/jpeg payloads.

Decoder scope (what a baseline JFIF writer emits):
- markers SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI,
- 8-bit baseline sequential, 1 (grayscale) or 3 (YCbCr) components,
- sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:4:0, 4:2:0),
- restart markers, byte stuffing (FF 00).
Progressive/arithmetic/12-bit streams raise ValueError (loudly — the
caller's md5-stub fallback is for formats we genuinely cannot parse,
not for silently wrong pixels).

Encoder scope: 4:4:4 YCbCr (or grayscale), Annex-K quantization tables
scaled by a quality factor, Annex-K Huffman tables. The encoder exists
so round-trip tests pin the decoder against known pixels without any
external fixture.

Performance note: entropy decode is a per-symbol Python loop — correct
but not the 100-TB hot path. At scale the documented substitution is a
codec library inside the same mapInArrow UDF; the Spark-side plumbing
(schemas, batching, partitioning) is unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables (ITU-T T.81, public spec)

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# (bits[1..16], values) per Annex K
STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8x8 DCT-II matrix
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(0.125) if _u == 0 else 0.5
        _A[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


def _build_huff_codes(bits, values):
    """(value -> (code, length)) per T.81 C.2 canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huff_decoder(bits, values):
    """length -> {code: value} lookup for the per-bit decode walk."""
    table: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            d = table.setdefault(length, {})
            for _ in range(bits[length - 1]):
                d[code] = values[k]
                code += 1
                k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = (self.data[self.pos]
                       if self.pos < len(self.data) else 0)
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    # marker: rewind, feed zeros (segment over)
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            d = table.get(length)
            if d is not None and code in d:
                return d[code]
        raise ValueError("bad huffman code in entropy stream")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n-bit magnitude to signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category n, n-bit code)."""
    n = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << n) - 1
    return n, v


# ---------------------------------------------------------------------------
# encoder

def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int32)


def _subsample2(p: np.ndarray) -> np.ndarray:
    """2x2 box average (edge-replicated to even dims first)."""
    h, w = p.shape
    if h % 2:
        p = np.vstack([p, p[-1:]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2]
                   + p[1::2, 0::2] + p[1::2, 1::2])


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale -> baseline JFIF bytes
    (Annex-K tables scaled by `quality`; 4:4:4, or 4:2:0 with
    subsample=True — chroma box-averaged 2x2)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        comps = [pixels.astype(np.float64) - 128.0]
        factors = [(1, 1)]
    else:
        p = pixels.astype(np.float64)
        y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
        cb = -0.168736 * p[..., 0] - 0.331264 * p[..., 1] \
            + 0.5 * p[..., 2] + 128.0
        cr = 0.5 * p[..., 0] - 0.418688 * p[..., 1] \
            - 0.081312 * p[..., 2] + 128.0
        comps = [y - 128.0, cb - 128.0, cr - 128.0]
        if subsample:
            comps = [comps[0], _subsample2(comps[1]),
                     _subsample2(comps[2])]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1)] * 3
    qt = [_quality_scale(STD_LUMA_Q, quality),
          _quality_scale(STD_CHROMA_Q, quality)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
    for tid, q in enumerate(qt[: 1 if gray else 2]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(q[z]) for z in ZIGZAG)
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        ch, cv = factors[ci]
        out += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    huffs = [(0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)]
    if not gray:
        huffs += [(0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)]
    for tc_th, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])

    dc_codes = [_build_huff_codes(*STD_DC_LUMA),
                _build_huff_codes(*STD_DC_CHROMA)]
    ac_codes = [_build_huff_codes(*STD_AC_LUMA),
                _build_huff_codes(*STD_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0] * nc
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # edge-replicate each plane to its full MCU grid up front
    padded = []
    for ci in range(nc):
        ch, cv = factors[ci]
        plane = comps[ci]
        th, tw = mcus_y * cv * 8, mcus_x * ch * 8
        plane = np.pad(plane,
                       ((0, th - plane.shape[0]),
                        (0, tw - plane.shape[1])), mode="edge")
        padded.append(plane)

    def _emit_block(blk: np.ndarray, ci: int) -> None:
        tix = 0 if ci == 0 else 1
        coef = np.round(_dct2(blk)
                        / qt[tix].reshape(8, 8)).astype(int)
        zz = coef.flatten()[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        n, code = _magnitude(diff) if diff else (0, 0)
        hc, hl = dc_codes[tix][n]
        bw.write(hc, hl)
        if n:
            bw.write(code, n)
        run = 0
        last = np.nonzero(zz[1:])[0]
        last = int(last[-1]) + 1 if last.size else 0
        for i in range(1, last + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = ac_codes[tix][0xF0]
                bw.write(hc, hl)
                run -= 16
            n, code = _magnitude(v)
            hc, hl = ac_codes[tix][(run << 4) | n]
            bw.write(hc, hl)
            bw.write(code, n)
            run = 0
        if last < 63:
            hc, hl = ac_codes[tix][0x00]  # EOB
            bw.write(hc, hl)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                ch, cv = factors[ci]
                for v in range(cv):
                    for hh in range(ch):
                        ys = (my * cv + v) * 8
                        xs = (mx * ch + hh) * 8
                        _emit_block(
                            padded[ci][ys: ys + 8, xs: xs + 8], ci)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w, 3) RGB (grayscale replicated
    to 3 channels). Raises ValueError on progressive/arithmetic/12-bit
    streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", payload[pos: pos + 2])[0]
        seg = payload[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[off: off + 64],
                                    dtype=np.uint8).astype(np.int32)
                qt[tq] = tbl[UNZIGZAG].reshape(8, 8)
                off += 64
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci: 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG is supported")
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                off += 1
                bits = list(seg[off: off + 16])
                off += 16
                nvals = sum(bits)
                vals = list(seg[off: off + nvals])
                off += nvals
                tab = _build_huff_decoder(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = tab
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci: 3 + 2 * ci]
                scomps.append((cs, tt >> 4, tt & 0xF))
            scan = (scomps, pos + seglen)
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("truncated JPEG (no frame/scan)")

    h, w, comps = frame
    scomps, data_start = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors > 2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
    br = _BitReader(payload[data_start:])
    pred = {c[0]: 0 for c in comps}
    mcu = 0
    total = mcus_x * mcus_y
    while mcu < total:
        if restart_interval and mcu and mcu % restart_interval == 0:
            # byte-align and consume the RST marker
            br.nbits = 0
            br.acc = 0
            while (br.pos + 1 < len(br.data)
                   and not (br.data[br.pos] == 0xFF
                            and 0xD0 <= br.data[br.pos + 1] <= 0xD7)):
                br.pos += 1
            br.pos += 2
            pred = {c[0]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for cs, td, ta in scomps:
            _cid, ch, cv, tq = by_id[cs]
            for v in range(cv):
                for hh in range(ch):
                    s = br.read_huff(dc_tabs[td])
                    diff = _extend(br.read(s), s)
                    pred[cs] += diff
                    zz = np.zeros(64, dtype=np.int64)
                    zz[0] = pred[cs]
                    i = 1
                    while i < 64:
                        rs = br.read_huff(ac_tabs[ta])
                        r, s = rs >> 4, rs & 0xF
                        if rs == 0x00:
                            break
                        if rs == 0xF0:
                            i += 16
                            continue
                        i += r
                        if i > 63:
                            raise ValueError("AC index overflow")
                        zz[i] = _extend(br.read(s), s)
                        i += 1
                    coef = (zz[UNZIGZAG].reshape(8, 8)
                            * qt[tq]).astype(np.float64)
                    blk = _idct2(coef) + 128.0
                    ys = (my * cv + v) * 8
                    xs = (mx * ch + hh) * 8
                    planes[cs][ys: ys + 8, xs: xs + 8] = blk
        mcu += 1

    # upsample to full resolution and crop
    full = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0,
                   255).astype(np.uint8)
