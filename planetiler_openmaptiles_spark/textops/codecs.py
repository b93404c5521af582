"""Pure-numpy media codecs for self-describing uncompressed containers.

Real decoders (and matching encoders, used by tests/datagen to synthesize
deterministic fixtures) for the formats that need no external libraries:

  * BMP  — BITMAPINFOHEADER, uncompressed 8-bit grayscale / 24-bit BGR /
           32-bit BGRA, bottom-up or top-down rows, 4-byte row padding
  * PGM / PPM — binary netpbm (P5 grayscale, P6 RGB), maxval <= 255
  * WAV  — RIFF/PCM, 8-bit unsigned or 16-bit signed little-endian

PNG decodes/encodes for real too (stdlib zlib — see the PNG section),
baseline JPEG lives in the sibling `jpeg.py` (T.81 Huffman + IDCT, pure
numpy), and AVI video (DIB/MJPEG frame streams) is at the bottom of this
file. Formats beyond those (MP3/AAC audio, MP4/H.264 video) require
ffmpeg, not in this container — `sniff()` identifies what it can so the
Spark layer can raise a clear NotImplementedError instead of guessing.

Reference parity note: the reference pipeline treats media as opaque refs
(planetiler has no media decode); these codecs back the training-data
multimodal operators (decode / feature-extract / resize / frame-sample)
that a 100 TB LLM-data pipeline layers on top.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# format sniffing


def sniff(content: bytes | None) -> str:
    """Identify a media container from magic bytes.

    Returns one of 'bmp', 'pgm', 'ppm', 'wav', 'avi', 'jpeg', 'png',
    'unknown'.
    """
    b = content or b""
    if b[:2] == b"BM":
        return "bmp"
    if b[:2] == b"P5":
        return "pgm"
    if b[:2] == b"P6":
        return "ppm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return "avi"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


DECODABLE_IMAGE = ("bmp", "pgm", "ppm", "png", "jpeg", "gif")
DECODABLE_AUDIO = ("wav",)  # PCM 8/16-bit + G.711 u/A-law + IMA ADPCM

# ---------------------------------------------------------------------------
# BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 array (h, w) grayscale or (h, w, 3) RGB -> uncompressed BMP.

    Grayscale writes 8bpp + a 256-entry gray palette; RGB writes 24bpp.
    Rows are bottom-up and padded to 4 bytes, per the format.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        bpp, palette = 8, bytearray()
        for i in range(256):
            palette += bytes((i, i, i, 0))  # BGRA palette entries
        rows = img
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        bpp, palette = 24, b""
        rows = img[:, :, ::-1]  # RGB -> BGR storage order
    else:
        raise ValueError(f"encode_bmp: unsupported shape {img.shape}")
    row_bytes = w * (bpp // 8)
    stride = (row_bytes + 3) & ~3
    pixel_data = bytearray()
    pad = b"\x00" * (stride - row_bytes)
    for y in range(h - 1, -1, -1):  # bottom-up
        pixel_data += rows[y].tobytes() + pad
    offset = 14 + 40 + len(palette)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pixel_data), 2835, 2835,
        256 if bpp == 8 else 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    return bytes(header + dib + bytes(palette) + pixel_data)


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed BMP -> uint8 array (h, w) for 8bpp, (h, w, 3) RGB for
    24/32bpp. Supports bottom-up (height > 0) and top-down rows."""
    if content[:2] != b"BM" or len(content) < 54:
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", content, 10)[0]
    dib_size, w, h = struct.unpack_from("<Iii", content, 14)
    if dib_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    top_down = h < 0
    h = abs(h)
    nch = {8: 1, 24: 3, 32: 4}.get(bpp)
    if nch is None:
        raise ValueError(f"{bpp}bpp BMP not supported")
    stride = (w * nch + 3) & ~3
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * nch]
    if not top_down:
        rows = rows[::-1]
    if nch == 1:
        return np.ascontiguousarray(rows)
    px = rows.reshape(h, w, nch)
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) -> RGB, drop alpha


# ---------------------------------------------------------------------------
# netpbm (PGM / PPM)


def encode_netpbm(img: np.ndarray) -> bytes:
    """uint8 (h, w) -> binary PGM (P5); (h, w, 3) -> binary PPM (P6)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic, (h, w) = b"P5", img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        magic, (h, w) = b"P6", img.shape[:2]
    else:
        raise ValueError(f"encode_netpbm: unsupported shape {img.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_netpbm(content: bytes) -> np.ndarray:
    """Binary PGM/PPM -> uint8 (h, w) or (h, w, 3). Handles comments and
    arbitrary whitespace in the header, maxval <= 255."""
    if content[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    nch = 1 if content[:2] == b"P5" else 3
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end-of-line
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    arr = np.frombuffer(content, dtype=np.uint8, count=w * h * nch, offset=pos)
    return arr.reshape((h, w) if nch == 1 else (h, w, nch)).copy()


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (n,) or (n, channels) PCM samples -> RIFF/WAVE bytes."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM WAV -> (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate). Supports 8-bit unsigned and 16-bit signed PCM; walks the
    chunk list so extra chunks (LIST, fact, ...) are skipped correctly."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"non-PCM WAV (format {audio_format}) not supported")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM not supported")
    n = len(x) // ch
    return x[: n * ch].reshape(n, ch), rate


# ---------------------------------------------------------------------------
# image kernels (shared by decode/resize/thumbnail operators)


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """uint8 (h, w[, 3]) -> float32 (h, w) luma (ITU-R BT.601 weights)."""
    if img.ndim == 2:
        return img.astype(np.float32)
    w = np.array([0.299, 0.587, 0.114], dtype=np.float32)
    return img.astype(np.float32) @ w


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize of (h, w[, c]) — pure index arithmetic,
    deterministic across platforms (no float accumulation)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downsample of a 2-D float array by block averaging
    (each output pixel = mean of its source rectangle)."""
    h, w = img.shape
    # per-block source rectangles; when out > in a block would collapse to
    # zero width, so widen each to >= 1 source pixel (blocks then overlap —
    # that is just nearest-neighbour sampling, still deterministic)
    ys0 = (np.arange(out_h) * h) // out_h
    ys1 = np.maximum((np.arange(1, out_h + 1) * h) // out_h, ys0 + 1)
    xs0 = (np.arange(out_w) * w) // out_w
    xs1 = np.maximum((np.arange(1, out_w + 1) * w) // out_w, xs0 + 1)
    # integral image -> O(1) per block regardless of block size
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img, axis=0), axis=1)
    block = (
        ii[ys1][:, xs1] - ii[ys0][:, xs1] - ii[ys1][:, xs0] + ii[ys0][:, xs0]
    )
    area = (ys1 - ys0)[:, None].astype(np.float64) * (xs1 - xs0)[None, :]
    return (block / area).astype(np.float32)


def image_embedding(img: np.ndarray, dim: int = 8) -> np.ndarray:
    """Deterministic dim-float embedding: grayscale -> dim×dim block means
    -> column means, scaled to [0, 1]. A stand-in for a CNN/CLIP encoder
    with the same Spark-side shape (array<float> column)."""
    g = to_grayscale(img)
    return block_mean(g, dim, dim).mean(axis=0) / 255.0


# ---------------------------------------------------------------------------
# PNG — real decode/encode with only stdlib zlib (no libpng).
# Spec: W3C PNG (RFC 2083). Supported layout: 8-bit depth, non-interlaced,
# gray / gray+alpha / RGB / RGBA; all five scanline filters on decode
# (the encoder always emits filter 0). This closes the "compressed image"
# gap for the multimodal operators; JPEG/video stay gated (need libjpeg/
# ffmpeg, not in this container).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_COLOR_TO_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_CHANNELS_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    import zlib

    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, channels = img.shape
    color = _PNG_CHANNELS_TO_COLOR[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = img.reshape(h, w * channels)
    # one filter-type byte (0 = None) per scanline
    stream = np.concatenate(
        [np.zeros((h, 1), np.uint8), raw], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(stream, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray:
    import zlib

    b = bytes(content)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    ihdr = None
    idat = []
    pos = 8
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        tag = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG layout (depth={depth}, interlace={interlace})"
        )
    channels = _PNG_COLOR_TO_CHANNELS.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    flat = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = flat[:, 0]
    out = np.zeros((h, stride), np.uint16)  # uint16: sums before mod 256
    bpp = channels
    for y in range(h):
        f = int(filters[y])
        line = flat[y, 1:].astype(np.uint16)
        up = out[y - 1] if y > 0 else np.zeros(stride, np.uint16)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up — fully vectorized
            out[y] = (line + up) & 0xFF
        elif f == 1:  # Sub = per-lane prefix sum mod 256
            lanes = line.reshape(-1, bpp)
            out[y] = (np.cumsum(lanes, axis=0, dtype=np.uint64) & 0xFF).reshape(-1)
        else:  # Average (3) / Paeth (4): left-dependent, per-pixel walk
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                bb = int(up[x])
                if f == 3:
                    cur[x] = (int(line[x]) + ((a + bb) >> 1)) & 0xFF
                elif f == 4:
                    c = int(out[y - 1][x - bpp]) if (x >= bpp and y > 0) else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = bb
                    else:
                        pred = c
                    cur[x] = (int(line[x]) + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
    img = out.astype(np.uint8).reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


# ---------------------------------------------------------------------------
# AVI — uncompressed-DIB video (RIFF 'AVI ', '00db' frames, 24bpp BGR
# bottom-up like BMP). Enough of the container (avih + strl/strh/strf +
# movi + idx1) that mainstream tools read the output; the decoder also
# accepts files without an index. MJPEG ('00dc' + JPEG bytes) decodes via
# the baseline JPEG codec in jpeg.py.


def encode_avi(frames: np.ndarray, fps: int = 10, mjpeg: bool = False,
               quality: int = 85) -> bytes:
    """uint8 (n, h, w, 3) RGB frames -> AVI bytes (DIB or MJPEG stream)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi expects (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    stride = (w * 3 + 3) & ~3

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(tag: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", tag + payload)

    if mjpeg:
        from . import jpeg as _jpeg

        payloads = [_jpeg.encode_jpeg(f, quality=quality) for f in frames]
        fourcc, ctag, bisize = b"MJPG", b"00dc", 0
    else:
        payloads = []
        for f in frames:
            rows = f[:, :, ::-1]
            pad = b"\x00" * (stride - w * 3)
            payloads.append(
                b"".join(rows[y].tobytes() + pad for y in range(h - 1, -1, -1))
            )
        fourcc, ctag, bisize = b"\x00\x00\x00\x00", b"00db", stride * h
    max_bytes = max(len(p) for p in payloads) if payloads else 0

    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // max(fps, 1), max_bytes * fps, 0,
        0x10, n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", fourcc, 0, 0, 0, 0, 1, fps, 0, n,
        max_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24,
        b"MJPG" if mjpeg else b"\x00\x00\x00\x00", bisize, 2835, 2835, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = [chunk(ctag, p) for p in payloads]
    movi = lst(b"movi", b"".join(movi_chunks))
    idx, off = bytearray(), 4
    for i, c in enumerate(movi_chunks):
        idx += struct.pack("<4sIII", ctag, 0x10, off, len(payloads[i]))
        off += len(c)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(content: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes -> (frames uint8 (n, h, w, 3) RGB, fps). Supports the
    uncompressed-DIB and MJPEG profiles written by encode_avi."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    w = h = fps = 0
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, fps
        while pos + 8 <= end:
            tag = content[pos:pos + 4]
            size = struct.unpack_from("<I", content, pos + 4)[0]
            data_start = pos + 8
            if tag == b"LIST":
                walk(data_start + 4, data_start + size)
            elif tag == b"strh":
                scale, rate = struct.unpack_from("<II", content, data_start + 20)
                if scale:
                    fps = max(1, round(rate / scale))
            elif tag == b"strf":
                _, w, h = struct.unpack_from("<Iii", content, data_start)
                h = abs(h)
            elif tag[2:4] == b"db":
                stride = (w * 3 + 3) & ~3
                raw = np.frombuffer(content, np.uint8, stride * h, data_start)
                rows = raw.reshape(h, stride)[:, : w * 3][::-1]
                frames.append(np.ascontiguousarray(rows.reshape(h, w, 3)[:, :, ::-1]))
            elif tag[2:4] == b"dc" and size:
                from . import jpeg as _jpeg

                img = _jpeg.decode_jpeg(content[data_start:data_start + size])
                if img.ndim == 2:
                    img = np.stack([img] * 3, axis=-1)
                frames.append(img)
            pos = data_start + size + (size % 2)

    walk(12, len(content))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return np.stack(frames), fps or 1


# ---------------------------------------------------------------------------
# G.711 companded WAV (format 7 = mu-law, 6 = A-law) — ITU-T G.711 tables
# built from the published closed forms, vectorized via 256-entry LUTs.


def _ulaw_decode_table() -> np.ndarray:
    b = np.arange(256, dtype=np.int32) ^ 0xFF  # stored complemented
    sign = (b & 0x80) != 0
    e = (b >> 4) & 0x7
    m = b & 0xF
    mag = (((m << 3) + 0x84) << e) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    # CCITT alaw2linear: seg 0 → (m<<4)+8, seg 1 → (m<<4)+0x108,
    # seg e≥2 → ((m<<4)+0x108)<<(e-1); sign bit SET means positive
    b = np.arange(256, dtype=np.int32) ^ 0x55
    pos = (b & 0x80) != 0
    e = (b >> 4) & 0x7
    t = (b & 0xF) << 4
    mag = np.where(e == 0, t + 8,
                   (t + 0x108) << np.maximum(e - 1, 0))
    return np.where(pos, mag, -mag).astype(np.int16)


_ULAW_LUT = _ulaw_decode_table()
_ALAW_LUT = _alaw_decode_table()


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → mu-law bytes (G.711, bias 0x84, clip 0x7F7B)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    e = (np.floor(np.log2(mag)) - 7).astype(np.int32)  # exponent: msb pos - 7
    m = (mag >> (e + 3)) & 0xF
    return ((sign | (e << 4) | m) ^ 0xFF).astype(np.uint8)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → A-law bytes (CCITT linear2alaw): 13-bit magnitude,
    segment ends {0x1F,0x3F,...,0xFFF}, mantissa (mag>>1)&0xF for segments
    0-1 else (mag>>seg)&0xF, XOR mask 0xD5 positive / 0x55 negative."""
    x = np.asarray(samples, dtype=np.int32) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    bits = np.zeros_like(mag)
    nz = mag > 0
    bits[nz] = np.floor(np.log2(mag[nz])).astype(np.int32) + 1
    seg = np.minimum(np.maximum(bits - 5, 0), 7)  # mag ≤ 0x1F → seg 0
    m = np.where(seg < 2, (mag >> 1) & 0xF, (mag >> seg) & 0xF)
    return (((seg << 4) | m) ^ mask).astype(np.uint8)


# ---------------------------------------------------------------------------
# IMA ADPCM WAV (format 0x11) — 4-bit DVI/IMA ADPCM, block-structured.

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_block(data: bytes, n_samples: int) -> np.ndarray:
    pred = struct.unpack_from("<h", data, 0)[0]
    index = min(max(data[2], 0), 88)
    out = np.empty(n_samples, dtype=np.int16)
    out[0] = pred
    nibbles = np.frombuffer(data, dtype=np.uint8, offset=4)
    nib = np.empty(len(nibbles) * 2, dtype=np.uint8)
    nib[0::2] = nibbles & 0xF
    nib[1::2] = nibbles >> 4
    for i in range(1, n_samples):
        n = int(nib[i - 1])
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[n & 7])))
        out[i] = pred
    return out


def _ima_encode_block(samples: np.ndarray, index: int) -> tuple[bytes, int]:
    pred = int(samples[0])
    header = struct.pack("<hBB", pred, index, 0)
    nibs = []
    for s in samples[1:]:
        step = int(_IMA_STEPS[index])
        delta = int(s) - pred
        n = 8 if delta < 0 else 0
        delta = abs(delta)
        diff = step >> 3
        if delta >= step:
            n |= 4
            delta -= step
            diff += step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
            diff += step >> 1
        if delta >= step >> 2:
            n |= 1
            diff += step >> 2
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[n & 7])))
        nibs.append(n)
    if len(nibs) % 2:
        nibs.append(0)
    packed = bytes((nibs[i] | (nibs[i + 1] << 4)) for i in range(0, len(nibs), 2))
    return header + packed, index


def encode_wav_compressed(samples: np.ndarray, sample_rate: int,
                          codec: str = "ulaw") -> bytes:
    """Mono int16 PCM → compressed RIFF/WAVE ('ulaw' | 'alaw' | 'ima_adpcm')."""
    x = np.ascontiguousarray(samples, dtype=np.int16).reshape(-1)
    if codec in ("ulaw", "alaw"):
        fmt_code = 7 if codec == "ulaw" else 6
        data = (ulaw_encode if codec == "ulaw" else alaw_encode)(x).tobytes()
        fmt = struct.pack("<HHIIHHH", fmt_code, 1, sample_rate, sample_rate, 1, 8, 0)
    elif codec == "ima_adpcm":
        spb = 505  # samples per 256-byte block (mono)
        blocks, index = [], 0
        for i in range(0, len(x), spb):
            chunk = x[i : i + spb]
            block, index = _ima_encode_block(chunk, index)
            blocks.append(block)
        data = b"".join(blocks)
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate,
                          sample_rate * 256 // spb, 256, 4, 2, spb)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(x))
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_any(content: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (float32 (n, ch) in [-1,1], rate). PCM 8/16-bit plus
    G.711 mu-law/A-law (formats 7/6) and mono IMA ADPCM (format 0x11)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt_raw, data, n_fact = 12, None, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_raw = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            n_fact = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)
    if fmt_raw is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, block_align, bits = struct.unpack_from("<HHIIHH", fmt_raw, 0)
    if audio_format == 1:
        return decode_wav(content)
    if audio_format in (6, 7):
        lut = _ULAW_LUT if audio_format == 7 else _ALAW_LUT
        x = lut[np.frombuffer(data, dtype=np.uint8)].astype(np.float32) / 32768.0
        n = len(x) // ch
        return x[: n * ch].reshape(n, ch), rate
    if audio_format == 0x11:
        if ch != 1:
            raise ValueError("only mono IMA ADPCM supported")
        spb = struct.unpack_from("<H", fmt_raw, 18)[0] if len(fmt_raw) >= 20 else 505
        total = n_fact
        chunks, decoded = [], 0
        for off in range(0, len(data), block_align):
            block = data[off : off + block_align]
            if len(block) < 4:
                break
            # a short/partial block (or an overstated fact count) carries
            # only (len-4)*2 nibbles + the header sample
            n = min(spb, (len(block) - 4) * 2 + 1)
            if total is not None:
                n = min(n, total - decoded)
            if n <= 0:
                break
            chunks.append(_ima_decode_block(block, n))
            decoded += n
        x = np.concatenate(chunks).astype(np.float32) / 32768.0
        if total is not None:
            x = x[:total]
        return x.reshape(-1, 1), rate
    raise ValueError(f"WAV format {audio_format} not supported")


# ---------------------------------------------------------------------------
# GIF (87a/89a): palette images, LZW-compressed — real decompression, both
# interlaced and sequential row order; first frame of animations.


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    # byte-wise accumulator: a whole-stream bignum shifted per code is
    # O(n^2) in stream length (minutes for a megapixel GIF)
    acc, nacc, bytepos, nbytes = 0, 0, 0, len(data)
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nacc < code_size and bytepos < nbytes:
            acc |= data[bytepos] << nacc
            nacc += 8
            bytepos += 1
        if nacc < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nacc -= code_size
        if code == clear:
            table = table[: clear + 2]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out_bits: list[tuple[int, int]] = []  # (code, size)
    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    out_bits.append((clear, code_size))
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        out_bits.append((table[w], code_size))
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            out_bits.append((clear, code_size))
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = clear + 2
        w = bytes([b])
    if w:
        out_bits.append((table[w], code_size))
    out_bits.append((end, code_size))
    acc, nacc, raw = 0, 0, bytearray()
    for code, size in out_bits:
        acc |= code << nacc
        nacc += size
        while nacc >= 8:
            raw.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        raw.append(acc & 0xFF)
    return bytes(raw)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) RGB with ≤256 distinct colors →
    GIF89a bytes (real LZW compression)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors")
    pal_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal = np.zeros((1 << pal_bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate([np.arange(s, h, step)
                                for s, step in _GIF_INTERLACE_PASSES])
        idx = idx[order]
    min_code = max(2, pal_bits)
    lzw = _lzw_encode(idx.reshape(-1).tobytes(), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(content: bytes) -> np.ndarray:
    """GIF87a/89a → (h, w, 3) uint8 RGB (first image; interlace handled;
    transparency ignored — the opaque palette color renders)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _, _ = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(content):
        b0 = content[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif b0 == 0x2C:
            left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", content, pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x7)
                pal = np.frombuffer(content, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image without color table")
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while content[pos] != 0:
                ln = content[pos]
                data += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = np.frombuffer(bytes(_lzw_decode(bytes(data), min_code)),
                                    dtype=np.uint8)[: iw * ih].reshape(ih, iw)
            if iflags & 0x40:  # interlaced: invert the pass permutation
                order = np.concatenate([np.arange(s, ih, step)
                                        for s, step in _GIF_INTERLACE_PASSES])
                de = np.empty_like(indices)
                de[order] = indices
                indices = de
            canvas = np.zeros((h, w, 3), dtype=np.uint8)
            canvas[top : top + ih, left : left + iw] = pal[indices]
            return canvas
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image")
