"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shapes, UDF
signatures) is real and tested. Byte decoding is REAL across all three
modalities via the pure-numpy codecs in `codecs.py`/`jpeg.py` (no external
libraries): BMP / PGM / PPM / PNG (stdlib zlib) / baseline JPEG (T.81
Huffman + IDCT from the spec) images, RIFF-PCM WAV audio, and AVI video
(uncompressed-DIB or MJPEG frame streams). Formats beyond those (MP3/AAC,
MP4/H.264) require ffmpeg, which is not in this container: for those each
decode hook either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the bytes (test mode), clearly marked
below.

Pattern at 100 TB: media bytes live in their own column family / parquet
files; `mapInPandas` streams Arrow batches so a 100 MB video row never
materializes more than one batch per task, and metadata-only queries prune
the binary column entirely (columnar projection).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def media_refs_table(docs_features: DataFrame) -> DataFrame:
    """Explode the media spans of decoded documents into a media-ref table
    (the join key side for a binary blob store)."""
    return docs_features.select(
        "doc_id", F.explode(F.col("media_refs")).alias("media_ref")
    ).withColumn("media_id", F.regexp_replace("media_ref", "^img://", ""))


def _fake_decode_image(content: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode for formats that need libs this container
    lacks (JPEG/video): derives a stable 8×8 grayscale "image" from the byte
    hash. Real formats (BMP/PGM/PPM) never reach this — see decode_images."""
    h = hashlib.sha256(content or b"").digest()
    arr = np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8)
    return arr


def _decode_image(content: bytes, strict: bool) -> np.ndarray | None:
    """Dispatch on magic bytes: REAL pure-numpy decode for
    BMP/PGM/PPM/PNG/JPEG (baseline JPEG via jpeg.py — T.81 Huffman + IDCT,
    no libjpeg); anything else raises (strict) or falls back to the fake."""
    fmt = codecs.sniff(content)
    if fmt == "bmp":
        return codecs.decode_bmp(content)
    if fmt in ("pgm", "ppm"):
        return codecs.decode_netpbm(content)
    if fmt == "png":
        return codecs.decode_png(content)
    if fmt == "gif":
        return codecs.decode_gif(content)
    if fmt == "jpeg":
        from . import jpeg

        return jpeg.decode_jpeg(content)
    if strict:
        raise NotImplementedError(
            f"image decode for format {fmt!r} is not supported"
            " (BMP/PGM/PPM/PNG/GIF/baseline-JPEG decode natively)"
        )
    return _fake_decode_image(content)


def decode_images(media: DataFrame, strict: bool = False, embed_dim: int = 8) -> DataFrame:
    """image bytes → (width, height, channels, embedding) via mapInPandas.

    BMP / PGM / PPM bytes are decoded for real (codecs.py, pure numpy).
    For compressed formats, strict=True raises NotImplementedError where a
    real JPEG decoder would run — the honest mode for this container —
    and strict=False uses the deterministic fake so the distributed
    plumbing can be exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                img = _decode_image(r.content, strict)
                nch = 1 if img.ndim == 2 else img.shape[2]
                emb = codecs.image_embedding(img, dim=embed_dim)
                rows.append(
                    (r.media_id, r.doc_id, img.shape[1], img.shape[0], nch, emb.tolist())
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def phash_from_embedding(emb_col) -> "F.Column":
    """Perceptual hash from a block-mean embedding: bit j set iff
    embedding[j] > mean(embedding) — the aHash recipe over the engine's
    deterministic image embedding. Pure Column expressions (left-fold
    mean, then a bit pack), so dedup over decoded media stays JVM-side
    after the one Arrow decode pass. Elements are widened f32→f64
    before arithmetic, which an independent engine can replay exactly."""
    d = F.transform(emb_col, lambda v: v.cast("double"))
    mu = F.aggregate(d, F.lit(0.0), lambda a, v: a + v) / F.size(d).cast(
        "double"
    )
    bits = F.transform(
        F.sequence(F.lit(0), F.size(d) - 1),
        lambda j: F.when(
            F.element_at(d, j + 1) > mu,
            F.pow(F.lit(2.0), j).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, v: a + v)


def image_phash_groups(images: DataFrame) -> DataFrame:
    """Perceptual-duplicate groups over decoded images: (phash, n,
    min_doc, max_doc) — one groupBy on the 64-bit hash."""
    ph = images.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        phash_from_embedding(F.col("embedding")).alias("phash"),
    )
    return ph.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def decode_audio(media: DataFrame, strict: bool = False) -> DataFrame:
    """audio bytes → (sample_rate, channels, n_samples, duration, rms, zcr)
    via mapInPandas. RIFF WAV decodes for real across PCM 8/16-bit,
    G.711 mu-law/A-law and mono IMA ADPCM (codecs.decode_wav_any);
    MP3/AAC raise in strict mode, else yield a deterministic fake row
    derived from the byte hash (marked)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                if codecs.sniff(r.content) == "wav":
                    # decode_wav_any covers PCM 8/16-bit plus the real
                    # compressed-WAV codecs (G.711 mu-law/A-law, IMA ADPCM)
                    x, rate = codecs.decode_wav_any(r.content)
                    mono = x.mean(axis=1)
                    rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
                    zcr = (
                        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        if len(mono) > 1
                        else 0.0
                    )
                    rows.append(
                        (r.media_id, r.doc_id, rate, x.shape[1], x.shape[0],
                         x.shape[0] / rate, rms, zcr)
                    )
                elif strict:
                    raise NotImplementedError(
                        "compressed-audio decode requires ffmpeg — not in"
                        " this container (RIFF-PCM WAV decodes natively)"
                    )
                else:  # DETERMINISTIC FAKE for non-WAV bytes (test mode)
                    h = hashlib.sha256(r.content or b"").digest()
                    rows.append(
                        (r.media_id, r.doc_id, 16000, 1, h[0] * 256,
                         h[0] * 256 / 16000.0, h[1] / 255.0, h[2] / 255.0)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


THUMBNAIL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),  # re-encoded BMP
    ]
)


def resize_images(
    media: DataFrame, out_w: int, out_h: int, strict: bool = False
) -> DataFrame:
    """image bytes → nearest-neighbour-resized BMP thumbnails (decode →
    resize → re-encode, all pure numpy). The output is itself decodable,
    so downstream stages can chain without a format break."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                img = _decode_image(r.content, strict)
                thumb = codecs.resize_nearest(img, out_h, out_w)
                rows.append(
                    (r.media_id, r.doc_id, out_w, out_h, codecs.encode_bmp(thumb))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in THUMBNAIL_SCHEMA.fields])

    return media.mapInPandas(run, THUMBNAIL_SCHEMA)


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ts", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0, strict: bool = False,
    embed_dim: int = 8,
) -> DataFrame:
    """video bytes → one row per sampled frame (ts, dims, embedding) via
    mapInPandas. AVI containers (uncompressed-DIB or MJPEG streams) decode
    for REAL (codecs.decode_avi + the baseline JPEG codec); other video
    formats raise in strict mode, else yield a deterministic fake frame row
    per sampled timestamp derived from the byte hash (marked)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                if codecs.sniff(r.content) == "avi":
                    frames, fps = codecs.decode_avi(r.content)
                    step = max(1, round(every_n_seconds * fps))
                    for i in range(0, len(frames), step):
                        emb = codecs.image_embedding(frames[i], dim=embed_dim)
                        rows.append(
                            (r.media_id, r.doc_id, i, i / fps,
                             frames.shape[2], frames.shape[1], emb.tolist())
                        )
                elif strict:
                    raise NotImplementedError(
                        "video decode beyond AVI (DIB/MJPEG) requires"
                        " ffmpeg — not in this container"
                    )
                else:  # DETERMINISTIC FAKE for non-AVI bytes (test mode)
                    h = hashlib.sha256(r.content or b"").digest()
                    n = 1 + h[0] % 4
                    for i in range(n):
                        img = _fake_decode_image((r.content or b"") + bytes([i]))
                        emb = codecs.image_embedding(img, dim=embed_dim)
                        rows.append(
                            (r.media_id, r.doc_id, i, float(i), 8, 8, emb.tolist())
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(run, FRAME_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: rows (media_id, frame_ts) computed from
    the duration metadata — pure JVM, no byte decode; pairs with
    sample_video_frames (the real decode path) when the blob column is
    stored separately and only the schedule is needed."""
    duration = F.coalesce(F.element_at(F.col("meta"), "duration_s").cast("double"), F.lit(0.0))
    n = F.floor(duration / F.lit(every_n_seconds)).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "doc_id", F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias("i"))
        .select(
            "media_id", "doc_id",
            (F.col("i").cast("double") * every_n_seconds).alias("frame_ts"),
        )
    )


FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("max_frame", T.IntegerType()),
        T.StructField("max_energy", T.LongType()),
        T.StructField("total_energy", T.LongType()),
    ]
)


def audio_frame_energy(media: DataFrame, frame_len: int = 256,
                       strict: bool = False) -> DataFrame:
    """Frame-wise audio energy profile — the feature-extraction shape of a
    speech/audio training pipeline (VAD gating, loudness normalization,
    segment selection): decode each WAV, split channel 0 into
    ``frame_len``-sample frames (tail frame partial), and report per clip
    the frame count, the argmax-energy frame (lowest index on ties), its
    energy, and the total energy. Energies are integer sums of squared
    int16 samples — exact, so a cross-engine comparison has no float
    tolerance anywhere. Arrow-batched mapInPandas; one pass per clip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                if codecs.sniff(r.content) == "wav":
                    x, _rate = codecs.decode_wav_any(r.content)
                    # decode_wav_any normalizes by 1/32768 (a power of two,
                    # exact in float32) — scale back to integer PCM units so
                    # energies are exact int64 sums
                    s = np.rint(x[:, 0].astype(np.float64) * 32768.0).astype(np.int64)
                    n = len(s)
                    nf = max((n + frame_len - 1) // frame_len, 0)
                    if nf == 0:
                        rows.append((r.media_id, r.doc_id, 0, -1, 0, 0))
                        continue
                    pad = np.zeros(nf * frame_len, dtype=np.int64)
                    pad[:n] = s
                    e = (pad * pad).reshape(nf, frame_len).sum(axis=1)
                    mi = int(np.argmax(e))  # first max — lowest index tie
                    rows.append(
                        (r.media_id, r.doc_id, int(nf), mi, int(e[mi]),
                         int(e.sum()))
                    )
                elif strict:
                    raise NotImplementedError(
                        "compressed-audio decode requires ffmpeg — not in"
                        " this container (RIFF WAV decodes natively)"
                    )
                else:  # DETERMINISTIC FAKE for non-WAV bytes (test mode) —
                    # mirrors decode_audio's contract: every audio row
                    # produces exactly one output row, never a silent drop
                    h = hashlib.sha256(r.content or b"").digest()
                    nf = max(h[0], 1)
                    rows.append(
                        (r.media_id, r.doc_id, nf, h[1] % nf,
                         h[2] * 1000, h[2] * 1000 * nf)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_ENERGY_SCHEMA.fields]
            )

    return media.mapInPandas(run, FRAME_ENERGY_SCHEMA)


def detect_shot_boundaries(
    frames: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """Shot-boundary detection over decoded video frames — the standard
    pre-segmentation step before captioning/sampling video training data.

    Input is sample_video_frames output (one row per frame with the
    block-mean embedding); pass every_n_seconds=0.0 there to take every
    frame. A frame starts a new shot when the mean-intensity distance to
    the previous frame exceeds `threshold` (intensities are in [0, 1]).

    Everything after the one Arrow decode pass is pure Catalyst: a scalar
    per frame (the embedding mean quantized to 8-bit intensity — the
    native resolution of the pixels it came from, and exactly replayable
    by an independent engine), one lag window partitioned by media_id
    (frames of one video are already co-located by the decode task — the
    window shuffle is narrow), then a per-video aggregate. Returns
    (media_id, doc_id, n_frames, n_shots, first_cut_frame, mean_mppm)
    where mean_mppm is the mean 8-bit frame intensity rescaled to ppm of
    full white.
    """
    from pyspark.sql import Window

    inten = (
        F.aggregate(
            F.transform(F.col("embedding"), lambda v: v.cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        / F.size("embedding").cast("double")
    )
    w = Window.partitionBy("media_id").orderBy("frame_index")
    per = frames.select(
        "media_id", "doc_id", "frame_index",
        F.round(inten * F.lit(255.0)).cast("long").alias("_i"),
    ).withColumn(
        "_cut",
        (
            F.abs(F.col("_i") - F.lag("_i").over(w)).cast("double")
            > F.lit(threshold * 255.0)
        ).cast("int"),
    )
    return (
        per.groupBy("media_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_frames"),
            (F.coalesce(F.sum("_cut"), F.lit(0)).cast("int") + F.lit(1))
            .alias("n_shots"),
            F.min(F.when(F.col("_cut") == 1, F.col("frame_index")))
            .alias("first_cut_frame"),
            F.round(
                F.avg("_i") / F.lit(255.0) * F.lit(1000000.0)
            ).cast("long").alias("mean_mppm"),
        )
    )


AUDIO_FRAME_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_frame_table(media: DataFrame, frame_len: int = 256,
                      strict: bool = False) -> DataFrame:
    """One row per audio frame: (media_id, doc_id, frame_idx, energy) —
    the decomposition that keeps the Arrow pass minimal (decode + one
    integer reduction per frame) and hands ALL analytics (VAD, loudness
    windows, segment mining) to Catalyst. Energies are exact int64 sums
    of squared int16 samples (same contract as audio_frame_energy)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                if codecs.sniff(r.content) == "wav":
                    x, _rate = codecs.decode_wav_any(r.content)
                    s = np.rint(x[:, 0].astype(np.float64) * 32768.0).astype(np.int64)
                    n = len(s)
                    nf = max((n + frame_len - 1) // frame_len, 0)
                    pad = np.zeros(nf * frame_len, dtype=np.int64)
                    pad[:n] = s
                    e = (pad * pad).reshape(nf, frame_len).sum(axis=1)
                    for i in range(nf):
                        rows.append((r.media_id, r.doc_id, i, int(e[i])))
                elif strict:
                    raise NotImplementedError(
                        "compressed-audio decode requires ffmpeg — not in"
                        " this container (RIFF WAV decodes natively)"
                    )
                else:  # DETERMINISTIC FAKE (test mode): one marked frame
                    h = hashlib.sha256(r.content or b"").digest()
                    rows.append((r.media_id, r.doc_id, 0, h[0] * 1000))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FRAME_TABLE_SCHEMA.fields]
            )

    return media.mapInPandas(run, AUDIO_FRAME_TABLE_SCHEMA)


def vad_segments(frames: DataFrame, threshold_energy: int) -> DataFrame:
    """Energy-threshold voice-activity detection over the frame table —
    the silence-trim / speech-segment-mining step of an audio curation
    pipeline. A frame is SPEECH when energy > threshold; consecutive
    speech frames form segments (gaps-and-islands with one running-sum
    window). Pure Catalyst after the decode pass: two windows sharing one
    (media_id, frame_idx) partitioning, then a per-clip aggregate.

    Returns (media_id, doc_id, n_frames, n_speech, n_segments,
    first_speech_frame, longest_segment)."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    sp = frames.withColumn("_s", (F.col("energy") > F.lit(threshold_energy)))
    sp = sp.withColumn(
        "_new",
        (F.col("_s")
         & ~F.coalesce(F.lag("_s").over(w), F.lit(False))).cast("int"),
    ).withColumn("_seg", F.sum("_new").over(w))
    seg_sizes = (
        sp.filter(F.col("_s"))
        .groupBy("media_id", "doc_id", "_seg")
        .agg(F.count(F.lit(1)).alias("_len"),
             F.min("frame_idx").alias("_start"))
    )
    per_seg = seg_sizes.groupBy("media_id", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_segments"),
        F.sum("_len").cast("int").alias("n_speech"),
        F.min("_start").alias("first_speech_frame"),
        F.max("_len").cast("int").alias("longest_segment"),
    )
    totals = frames.groupBy("media_id", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames")
    )
    return (
        totals.join(per_seg, ["media_id", "doc_id"], "left")
        .select(
            "media_id", "doc_id", "n_frames",
            F.coalesce("n_speech", F.lit(0)).alias("n_speech"),
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            "first_speech_frame",
            F.coalesce("longest_segment", F.lit(0)).alias("longest_segment"),
        )
    )


def dhash_from_embedding(emb_col) -> "F.Column":
    """Difference hash (dHash) from the block-mean embedding: bit j set
    iff embedding[j+1] > embedding[j] — gradient-based perceptual hash,
    robust where aHash (mean-threshold, phash_from_embedding) washes out
    on low-contrast images. Pure Column expressions; pairs with it for
    two-vote perceptual dedup."""
    d = F.transform(emb_col, lambda v: v.cast("double"))
    # guard: size < 2 would make F.sequence(0, size-2) DESCEND (Spark
    # defaults step to -1 when start > stop) and index element_at(d, 0)
    # cap at bit 62 (2^63 would overflow signed long via the non-ANSI
    # double->long cast and corrupt the hash silently): embeddings with
    # >64 elements contribute only their first 63 gradient pairs
    bits = F.when(
        F.size(d) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.least(F.size(d) - 2, F.lit(62))),
            lambda j: F.when(
                F.element_at(d, j + 2) > F.element_at(d, j + 1),
                F.pow(F.lit(2.0), j).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, v: a + v)
