"""Pure-numpy media codec vectors: encode→decode byte/array roundtrips.

These prove the multimodal decode step is REAL (not a fake) for the
uncompressed containers — BMP, PGM/PPM, RIFF-PCM WAV — with exact array
equality, including the format's own quirks (bottom-up BMP rows, 4-byte
row padding, netpbm header comments, WAV chunk walking / word alignment).
No Spark session needed.
"""

import struct

import numpy as np
import pytest

from planetiler_openmaptiles_spark.textops import codecs
from planetiler_openmaptiles_spark.textops import codecs as C


def _rng():
    return np.random.default_rng(42)


def test_bmp_gray_roundtrip_odd_width():
    # odd width exercises the 4-byte row padding
    img = _rng().integers(0, 256, size=(5, 7), dtype=np.uint8)
    out = codecs.decode_bmp(codecs.encode_bmp(img))
    np.testing.assert_array_equal(out, img)


def test_bmp_rgb_roundtrip():
    img = _rng().integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    blob = codecs.encode_bmp(img)
    assert codecs.sniff(blob) == "bmp"
    np.testing.assert_array_equal(codecs.decode_bmp(blob), img)


def test_bmp_topdown_rows():
    # negative height = top-down storage; decoder must not flip
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    blob = bytearray(codecs.encode_bmp(img))
    h = struct.unpack_from("<i", blob, 22)[0]
    struct.pack_into("<i", blob, 22, -h)
    # rows were written bottom-up; flipping the sign flag means the decoder
    # reads them in storage order, i.e. vertically flipped
    np.testing.assert_array_equal(codecs.decode_bmp(bytes(blob)), img[::-1])


def test_bmp_rejects_compressed():
    blob = bytearray(codecs.encode_bmp(np.zeros((2, 2), dtype=np.uint8)))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        codecs.decode_bmp(bytes(blob))


def test_netpbm_roundtrip_and_comments():
    img = _rng().integers(0, 256, size=(3, 5), dtype=np.uint8)
    blob = codecs.encode_netpbm(img)
    assert codecs.sniff(blob) == "pgm"
    np.testing.assert_array_equal(codecs.decode_netpbm(blob), img)
    # header comments are legal netpbm; decoder must skip them
    commented = b"P5\n# made by a test\n5 3\n255\n" + img.tobytes()
    np.testing.assert_array_equal(codecs.decode_netpbm(commented), img)
    rgb = _rng().integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    blob6 = codecs.encode_netpbm(rgb)
    assert codecs.sniff(blob6) == "ppm"
    np.testing.assert_array_equal(codecs.decode_netpbm(blob6), rgb)


def test_wav_roundtrip_stereo_and_chunk_walk():
    samples = _rng().integers(-32768, 32767, size=(100, 2), dtype=np.int16)
    blob = codecs.encode_wav(samples, 8000)
    assert codecs.sniff(blob) == "wav"
    x, rate = codecs.decode_wav(blob)
    assert rate == 8000 and x.shape == (100, 2)
    np.testing.assert_array_equal((x * 32768.0).astype(np.int16), samples)
    # an extra odd-sized chunk before data must be skipped (word-aligned)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    patched = blob[:12] + extra + blob[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    x2, _ = codecs.decode_wav(patched)
    np.testing.assert_array_equal(x2, x)


def test_sniff_compressed_formats():
    assert codecs.sniff(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert codecs.sniff(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert codecs.sniff(b"??") == "unknown"
    assert codecs.sniff(None) == "unknown"


def test_resize_and_embedding_kernels():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    up = codecs.resize_nearest(img, 16, 16)
    assert up.shape == (16, 16) and up[0, 0] == img[0, 0] and up[15, 15] == img[7, 7]
    # block_mean of a constant image is that constant
    const = np.full((10, 6), 7.0, dtype=np.float32)
    np.testing.assert_allclose(codecs.block_mean(const, 3, 3), 7.0, rtol=1e-6)
    emb = codecs.image_embedding(img, dim=4)
    assert emb.shape == (4,) and np.all((emb >= 0) & (emb <= 1))
    # embedding is invariant to adding a color axis of identical channels
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    np.testing.assert_allclose(codecs.image_embedding(rgb, dim=4), emb, atol=1e-3)


def test_block_mean_upsampling_no_nan():
    # out dim > in dim must not divide by zero (1-pixel-wide image)
    tiny = np.array([[5.0]], dtype=np.float32)
    out = codecs.block_mean(tiny, 8, 8)
    np.testing.assert_allclose(out, 5.0)
    emb = codecs.image_embedding(np.full((2, 1), 37, dtype=np.uint8))
    np.testing.assert_allclose(emb, 37 / 255.0, rtol=1e-6)


def test_png_roundtrip_all_layouts():
    import numpy as np

    from planetiler_openmaptiles_spark.textops import codecs

    rng = np.random.default_rng(11)
    for shape in [(5, 7), (4, 6, 3), (3, 3, 4), (2, 5, 2)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        blob = codecs.encode_png(img)
        assert codecs.sniff(blob) == "png"
        np.testing.assert_array_equal(codecs.decode_png(blob), img)


def test_png_decode_all_filters():
    """Hand-filter scanlines with every PNG filter type and check the
    decoder reconstructs the original pixels (encoder only emits 0)."""
    import struct
    import zlib

    import numpy as np

    from planetiler_openmaptiles_spark.textops import codecs

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    raw = img.reshape(h, w * ch).astype(int)
    bpp = ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    stream = b""
    for y, f in zip(range(h), [0, 1, 2, 3, 4]):
        line = []
        for x in range(w * ch):
            a = raw[y][x - bpp] if x >= bpp else 0
            b = raw[y - 1][x] if y > 0 else 0
            c = raw[y - 1][x - bpp] if (x >= bpp and y > 0) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            line.append((raw[y][x] - pred) & 0xFF)
        stream += bytes([f]) + bytes(line)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(stream))
        + codecs._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(blob), img)


# --------------------------------------------------------------------- JPEG


def test_jpeg_flat_blocks_near_exact():
    from planetiler_openmaptiles_spark.textops import jpeg

    # flat blocks have only a DC coefficient: quantization error ≈ 0
    gray = np.full((16, 16), 128, dtype=np.uint8)
    np.testing.assert_array_equal(jpeg.decode_jpeg(jpeg.encode_jpeg(gray)), gray)
    rgb = np.full((16, 24, 3), [200, 30, 90], dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=90))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_jpeg_gradient_roundtrip_odd_dims():
    from planetiler_openmaptiles_spark.textops import jpeg

    g = np.linspace(0, 255, 23 * 17).reshape(23, 17).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4

    x, y = np.linspace(0, 255, 40), np.linspace(0, 255, 25)
    rgb = np.stack(
        np.broadcast_arrays(x[None, :], y[:, None], (x[None, :] + y[:, None]) / 2),
        axis=-1,
    ).astype(np.uint8)
    for sub, tol in (("444", 8), ("422", 16), ("420", 16)):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=95, subsample=sub))
        assert out.shape == rgb.shape, sub
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= tol, sub


def test_jpeg_restart_intervals():
    from planetiler_openmaptiles_spark.textops import jpeg

    rng = _rng()
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    b = jpeg.encode_jpeg(img, quality=90, restart_interval=2)
    assert any(  # RSTn markers actually present
        b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7 for i in range(len(b) - 1)
    )
    np.testing.assert_array_equal(jpeg.decode_jpeg(b), plain)


def test_jpeg_rejects_progressive_and_garbage():
    from planetiler_openmaptiles_spark.textops import jpeg

    b = bytearray(jpeg.encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = bytes(b).find(b"\xff\xc0")
    b[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(b))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")


# ---------------------------------------------------------------------- AVI


def test_avi_dib_roundtrip_exact():
    rng = _rng()
    frames = rng.integers(0, 256, size=(5, 9, 13, 3), dtype=np.uint8)
    b = codecs.encode_avi(frames, fps=4)
    assert codecs.sniff(b) == "avi"
    out, fps = codecs.decode_avi(b)
    assert fps == 4
    np.testing.assert_array_equal(out, frames)


def test_avi_mjpeg_roundtrip_and_errors():
    smooth = np.zeros((3, 16, 16, 3), np.uint8)
    for i in range(3):
        smooth[i, :, :, 0] = 40 * i + 50
        smooth[i, :, :, 1] = 100
        smooth[i, :, :, 2] = np.linspace(0, 250, 16)[None, :].astype(np.uint8)
    out, fps = codecs.decode_avi(codecs.encode_avi(smooth, fps=2, mjpeg=True, quality=95))
    assert fps == 2 and out.shape == smooth.shape
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 12
    with pytest.raises(ValueError):
        codecs.decode_avi(b"RIFF\x00\x00\x00\x00WAVE")


# ---------------------------------------------------------------- G.711


def test_g711_canonical_values():
    # CCITT reference identities: silence and full-scale bytes
    assert C.alaw_encode(np.array([0]))[0] == 0xD5
    assert C.ulaw_encode(np.array([0]))[0] == 0xFF
    assert C._ALAW_LUT[C.alaw_encode(np.array([32000]))[0]] == 32256
    assert C._ALAW_LUT[C.alaw_encode(np.array([-32000]))[0]] == -32256
    # decode tables are odd-symmetric around the sign bit
    assert C._ULAW_LUT[0x7F] == -C._ULAW_LUT[0xFF]


def test_g711_companding_error_bound():
    rng = np.random.RandomState(11)
    x = (rng.randn(50000) * 9000).clip(-32768, 32767).astype(np.int16)
    for enc, lut in ((C.ulaw_encode, C._ULAW_LUT), (C.alaw_encode, C._ALAW_LUT)):
        y = lut[enc(x)].astype(np.int32)
        rel = np.abs(y - x.astype(np.int32)) / np.maximum(np.abs(x.astype(np.int32)), 256)
        assert rel.max() < 0.07, (enc.__name__, rel.max())  # 4-bit mantissa floor


def test_compressed_wav_decode_all_codecs():
    t = np.arange(4000)
    sine = (9000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    ref = sine.astype(np.float32) / 32768.0
    for codec, min_snr in (("ulaw", 30.0), ("alaw", 30.0), ("ima_adpcm", 20.0)):
        wav = C.encode_wav_compressed(sine, 8000, codec)
        assert C.sniff(wav) == "wav"
        x, rate = C.decode_wav_any(wav)
        assert rate == 8000 and x.shape == (4000, 1)
        err = x[:, 0] - ref
        snr = 10 * np.log10(np.mean(ref**2) / np.mean(err**2))
        assert snr > min_snr, (codec, snr)
    # plain PCM still routes through decode_wav_any
    pcm = C.encode_wav(sine, 8000)
    x, rate = C.decode_wav_any(pcm)
    assert np.allclose(x[:, 0], ref, atol=1 / 32768)


def test_ima_adpcm_block_boundaries():
    # length that spans multiple 505-sample blocks with a ragged tail
    n = 505 * 3 + 123
    x = (6000 * np.sin(np.linspace(0, 40, n))).astype(np.int16)
    out, _ = C.decode_wav_any(C.encode_wav_compressed(x, 16000, "ima_adpcm"))
    assert out.shape[0] == n  # fact-chunk count trims the padded tail


# ------------------------------------------------------------------ GIF


def test_gif_hand_vector_2x1():
    """Hand-built GIF (spec layout): 2x1, 2-color palette, LZW stream
    [clear, 0, 1, end] at 3-bit codes = bits 100 000 001 101 LSB-first."""
    lzw = bytes([0x44, 0x0A])
    raw = (b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
           + bytes([10, 20, 30, 200, 210, 220])
           + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
           + bytes([2, len(lzw)]) + lzw + b"\x00\x3b")
    img = C.decode_gif(raw)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert img[0, 1].tolist() == [200, 210, 220]


def test_gif_roundtrip_gray_rgb_interlaced():
    rng = np.random.RandomState(3)
    gray = (rng.randint(0, 7, (41, 29)) * 36).astype(np.uint8)
    for il in (False, True):
        back = C.decode_gif(C.encode_gif(gray, interlace=il))
        assert np.array_equal(back[:, :, 0], gray)
        assert np.array_equal(back[:, :, 1], gray)
    rgb = (rng.randint(0, 6, (23, 17, 3)) * 40).astype(np.uint8)
    assert np.array_equal(C.decode_gif(C.encode_gif(rgb)), rgb)


def test_gif_dictionary_growth_and_reset():
    # enough repeated structure to grow the LZW table past one code-size
    # bump; a wide gradient forces many distinct entries
    img = np.tile(np.arange(256, dtype=np.uint8), (8, 4))
    back = C.decode_gif(C.encode_gif(img))
    assert np.array_equal(back[:, :, 0], img)


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        C.decode_gif(b"NOTAGIF" + b"\x00" * 32)
    with pytest.raises(ValueError):
        C.decode_gif(b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b")


def test_gif_decode_large_is_linear():
    """The LZW bit reader must be byte-wise (a whole-stream bignum shift
    is O(n^2): 512x512 took ~2 s before the fix)."""
    import time

    img = (np.indices((512, 512)).sum(axis=0) % 5 * 50).astype(np.uint8)
    blob = C.encode_gif(img)
    t0 = time.time()
    back = C.decode_gif(blob)
    assert time.time() - t0 < 1.0
    assert np.array_equal(back[:, :, 0], img)


def test_ima_adpcm_without_fact_chunk():
    """Real-world IMA writers omit fact; a partial last block must derive
    its sample count from the block length, not crash."""
    x = (3000 * np.sin(np.linspace(0, 20, 628))).astype(np.int16)
    wav = C.encode_wav_compressed(x, 8000, "ima_adpcm")
    # strip the fact chunk (8-byte header + 4-byte count)
    i = wav.find(b"fact")
    stripped = wav[:i] + wav[i + 12:]
    stripped = stripped[:4] + struct.pack("<I", len(stripped) - 8) + stripped[8:]
    out, rate = C.decode_wav_any(stripped)
    assert rate == 8000
    # without fact the ragged tail keeps its nibble padding (<=1 extra)
    assert 628 <= out.shape[0] <= 629
    assert np.allclose(out[:628, 0], x / 32768.0, atol=0.15)


def test_g711_decode_encode_identity_all_256_codes():
    # The gold-standard companding law: every 8-bit code decodes to a level
    # whose re-encode is the SAME code (quantizer idempotence), for both laws.
    codes = np.arange(256, dtype=np.uint8)
    u = C.ulaw_encode(C._ULAW_LUT[codes])
    # mu-law's single degeneracy: 0x7F (+0) and 0xFF (-0) both decode to 0;
    # the canonical encoder emits 0xFF for silence.
    assert u[0x7F] == 0xFF and C._ULAW_LUT[0x7F] == 0
    mask = codes != 0x7F
    assert np.array_equal(u[mask], codes[mask])
    assert np.array_equal(C.alaw_encode(C._ALAW_LUT[codes]), codes)


def test_g711_encode_monotone_per_sign():
    # Within each sign half, decoded levels are strictly monotone in the
    # magnitude bits — the LUTs define a valid (invertible-on-levels) quantizer.
    for lut in (C._ULAW_LUT, C._ALAW_LUT):
        levels = np.sort(np.unique(lut))
        assert levels.size == 256 or levels.size == 255  # ulaw has two zeros
        assert np.all(np.diff(levels) > 0)
