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
    return "unknown"


DECODABLE_IMAGE = ("bmp", "pgm", "ppm")
DECODABLE_AUDIO = ("wav",)

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
