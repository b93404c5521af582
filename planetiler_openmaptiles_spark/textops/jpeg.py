"""Baseline JPEG (ITU-T T.81 / JFIF) encode + decode in pure numpy.

No libjpeg: the DCT is an 8×8 orthonormal matrix product, Huffman coding
uses the spec's Annex K tables, and the bitstream layer is plain Python.
Supported profile — baseline sequential DCT, 8-bit, grayscale or YCbCr
4:4:4 / 4:2:0 / 4:2:2, optional restart intervals. Progressive,
arithmetic coding, and 12-bit are out of scope (raise ValueError).

This is the per-row kernel behind the multimodal image operators
(multimodal.py `_decode_image`): tiny images per Arrow batch, so clarity
beats raw throughput here — the distributed layer (mapInPandas batching,
binary-column pruning) is what carries the 100 TB story.

Reference parity note: planetiler-openmaptiles has no media pipeline;
this implements the training-data multimodal requirement (decode /
feature-extract / resize) with a real compressed format.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# Annex K.1 — standard quantization tables (quality 50 base).
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Zigzag order: _ZIGZAG[i] = flat index into the 8×8 block for scan pos i.
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((u, v) for u in range(8) for v in range(8)),
        key=lambda t: (t[0] + t[1], t[1] if (t[0] + t[1]) % 2 else t[0]),
    )
    return np.array([u * 8 + v for u, v in order], dtype=np.int64)

_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 — standard Huffman tables: (bits[1..16] counts, values).
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    # Orthonormal 8-point DCT-II: M @ block @ M.T is the 2-D forward DCT.
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2)
    return m

_DCT = _dct_matrix()


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    # libjpeg's quality→scale convention so qualities are comparable.
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int32)


# ----------------------------------------------------------- huffman core
def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman per T.81 C.2: value → (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value, for the bit-serial decoder."""
    out: dict[tuple[int, int], int] = {}
    for v, (code, length) in _build_codes(bits, values).items():
        out[(length, code)] = v
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Entropy-segment reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn inside _fill = stream overrun
                raise ValueError("JPEG entropy stream hit unexpected RST")
            else:
                self.marker = nxt
                raise ValueError("JPEG entropy stream hit marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume an RSTn marker boundary and reset bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: value → (size category, offset bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ------------------------------------------------------------------ encode
def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.168736, -0.331264, 0.5],
                  [0.5, -0.418688, -0.081312]])
    out = img.astype(np.float64) @ m.T
    out[..., 1:] += 128.0
    return out


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _encode_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """float plane (h,w) padded to multiples of 8 → (n, 64) quantized
    zigzag coefficient rows — fully vectorized."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
    q = np.round(coef / qt[None]).astype(np.int32).reshape(-1, 64)
    return q[:, _ZIGZAG]


def _entropy_encode_plane(
    w: _BitWriter, zz: np.ndarray, idx: int, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    row = zz[idx]
    dc = int(row[0])
    size, bits = _magnitude(dc - pred)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    nz = np.nonzero(row[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        w.write(c, ln)
        w.write(bits, size)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return dc


def _dht_segment(tc_th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, values = table
    payload = bytes([tc_th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h,w) grayscale or (h,w,3) RGB → baseline JFIF bytes.

    subsample: '444' (no chroma subsampling), '420', or '422'.
    restart_interval: MCUs between RSTn markers (0 = none).
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h,w) or (h,w,3)")
    if subsample not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    h, w = img.shape[:2]
    hs, vs = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsample]
    if gray:
        hs = vs = 1
    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if hs == 2 or vs == 2:
            # pad to sampling multiple, then box-average subsample
            ph, pw = -h % (8 * vs), -w % (8 * hs)
            cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            ch, cw = cb.shape
            cb = cb.reshape(ch // vs, vs, cw // hs, hs).mean(axis=(1, 3))
            cr = cr.reshape(ch // vs, vs, cw // hs, hs).mean(axis=(1, 3))
        planes = [y, cb, cr]

    zz = [
        _encode_blocks(p, qt_l if i == 0 else qt_c)
        for i, p in enumerate(planes)
    ]

    # header segments
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qt_l),) + (((1, qt_c),) if not gray else ()):
        payload = bytes([tid]) + bytes(qt.reshape(-1)[_ZIGZAG].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    samp = [(hs << 4) | vs, 0x11, 0x11]
    for cid in range(ncomp):
        sof += bytes([cid + 1, samp[cid], 0 if cid == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _DC_LUMA) + _dht_segment(0x10, _AC_LUMA)
    if not gray:
        out += _dht_segment(0x01, _DC_CHROMA) + _dht_segment(0x11, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid in range(ncomp):
        sos += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # entropy-coded data, MCU-interleaved
    dc_l, ac_l = _build_codes(*_DC_LUMA), _build_codes(*_AC_LUMA)
    dc_c, ac_c = _build_codes(*_DC_CHROMA), _build_codes(*_AC_CHROMA)
    mcux = (w + 8 * hs - 1) // (8 * hs)
    mcuy = (h + 8 * vs - 1) // (8 * vs)
    ybw = (planes[0].shape[1] + 7) // 8  # luma block-grid dims as encoded
    ybh = (planes[0].shape[0] + 7) // 8
    # pad luma zigzag grid so every MCU has hs×vs luma blocks
    need_w, need_h = mcux * hs, mcuy * vs
    yz = zz[0].reshape(ybh, ybw, 64)
    if ybw < need_w or ybh < need_h:
        yz = np.pad(yz, ((0, need_h - ybh), (0, need_w - ybw), (0, 0)), mode="edge")
    wtr = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    row = yz[my * vs + by, mx * hs + bx][None]
                    preds[0] = _entropy_encode_plane(wtr, row, 0, preds[0], dc_l, ac_l)
            if not gray:
                for c in (1, 2):
                    cbw = (planes[c].shape[1] + 7) // 8
                    idx = my * cbw + mx
                    preds[c] = _entropy_encode_plane(wtr, zz[c], idx, preds[c], dc_c, ac_c)
            mcu_count += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decode
def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (h,w) grayscale or (h,w,3) RGB."""
    d = content
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", d[pos:pos + 2])[0]
        seg = d[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                flat = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8).astype(np.int32)
                qt = np.zeros(64, dtype=np.int32)
                qt[_ZIGZAG] = flat
                qts[tq] = qt.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                huff[(tc, th)] = _build_decode_map(bits, values)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec = seg[0]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            for ci in range(n):
                cid, samp, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + si * 2:3 + si * 2]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 0xF})
            data_pos = pos + seglen
            return _decode_scan(d, data_pos, scan, qts, huff, h, w, restart_interval)
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_block(r: _BitReader, dc_map: dict, ac_map: dict, pred: int) -> tuple[np.ndarray, int]:
    def read_code(m: dict) -> int:
        code, length = 0, 0
        while True:
            code = (code << 1) | r.bit()
            length += 1
            if (length, code) in m:
                return m[(length, code)]
            if length > 16:
                raise ValueError("invalid Huffman code")

    zz = np.zeros(64, dtype=np.int32)
    size = read_code(dc_map)
    dc = pred + _extend(r.bits(size), size)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = read_code(ac_map)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflow")
        zz[k] = _extend(r.bits(size), size)
        k += 1
    return zz, dc


def _decode_scan(
    d: bytes, pos: int, scan: list[dict], qts: dict, huff: dict,
    h: int, w: int, restart_interval: int,
) -> np.ndarray:
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient grids
    grids = []
    for c in scan:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        grids.append(np.zeros((bh, bw, 64), dtype=np.int32))
    r = _BitReader(d, pos)
    preds = [0] * len(scan)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align_restart()
                preds = [0] * len(scan)
            for ci, c in enumerate(scan):
                dc_map = huff[(0, c["td"])]
                ac_map = huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[ci] = _decode_block(r, dc_map, ac_map, preds[ci])
                        grids[ci][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu += 1
    # dequantize + IDCT, vectorized per component
    planes = []
    for ci, c in enumerate(scan):
        g = grids[ci]
        bh, bw = g.shape[:2]
        coef = g[..., _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        coef *= qts[c["tq"]][None]
        blocks = np.einsum("xu,nuv,yv->nxy", _DCT.T, coef, _DCT.T)
        blocks = np.clip(np.round(blocks + 128.0), 0, 255)
        plane = (
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (nearest) then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
