"""Unit tests for the training-data operators (dedup/similarity/textstats/
multimodal plumbing) on tiny in-line data."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE  quick   brown fox jumps over the lazy dog"),  # exact dup after norm
        (3, "the quick brown fox jumps over the lazy cat"),     # near dup
        (4, "completely different text about el la de que y en un los"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    from planetiler_openmaptiles_spark.textops.dedup import exact_dedup, exact_duplicates

    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1 and groups[0]["doc_ids"] == [1, 2]
    kept = {r["doc_id"] for r in exact_dedup(docs).collect()}
    assert kept == {1, 3, 4, 5}


def test_shingles_and_jaccard(spark, docs):
    from planetiler_openmaptiles_spark.textops.dedup import minhash_lsh_pairs, ngram_jaccard

    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=16, shingle_n=3)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical after normalization → all bands agree
    j = ngram_jaccard(docs, pairs, shingle_n=3).collect()
    jm = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in j}
    assert jm[(1, 2)] == 1.0


def test_simhash_identical(spark, docs):
    from planetiler_openmaptiles_spark.textops.dedup import simhash_near_dups

    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_dups(docs).collect()}
    assert got.get((1, 2)) == 0


def test_langid_and_quality(spark, docs):
    from planetiler_openmaptiles_spark.textops.textstats import (
        detect_language, quality_score, regex_token_count, whitespace_token_count)

    out = docs.select(
        "doc_id",
        detect_language(F.col("text")).alias("lang"),
        whitespace_token_count(F.col("text")).alias("ws"),
        regex_token_count(F.col("text")).alias("re"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["lang"] == "en"
    assert by_id[4]["lang"] == "es"
    assert by_id[5]["lang"] == "und"
    assert by_id[1]["ws"] == 9
    assert by_id[1]["q"] > by_id[5]["q"]


def test_ann_bruteforce(spark):
    from planetiler_openmaptiles_spark.textops.similarity import brute_force_topk, lsh_topk

    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    probes = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    top = brute_force_topk(emb, probes, k=3).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-9
    lsh = lsh_topk(emb, probes, dim=8, k=3).collect()
    assert lsh[0]["vec_id"] == 0  # own bucket always contains self


def test_multimodal_plumbing(spark):
    from planetiler_openmaptiles_spark.textops.multimodal import (
        decode_images, frame_sample_plan)

    media = spark.createDataFrame(
        [
            ("m1", "d1", "image", bytearray(b"\x01\x02"), {}),
            ("m2", "d1", "video", bytearray(b""), {"duration_s": "3.0"}),
        ],
        "media_id string, doc_id string, kind string, content binary, meta map<string,string>",
    )
    feats = decode_images(media).collect()
    assert len(feats) == 1 and len(feats[0]["embedding"]) == 8
    # deterministic fake: same bytes → same embedding
    feats2 = decode_images(media).collect()
    assert feats[0]["embedding"] == feats2[0]["embedding"]
    # strict mode raises (decode genuinely not implemented in this container)
    with pytest.raises(Exception):
        decode_images(media, strict=True).collect()
    plan = frame_sample_plan(media, every_n_seconds=1.0).collect()
    assert [r["frame_ts"] for r in plan] == [0.0, 1.0, 2.0]


def test_lsh_caps_bound_boilerplate_blowup(spark):
    """A corpus of near-identical boilerplate docs must not produce a
    quadratic pair explosion: every LSH path caps its buckets (minhash /
    simhash max_bucket=200; ngram query df<=100 drops shared shingles)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from planetiler_openmaptiles_spark.textops import dedup

    n = 1000
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [f"d{i:04d}" for i in range(n)],
            "text": ["lorem ipsum dolor sit amet consectetur adipiscing elit "
                     "sed do eiusmod tempor incididunt ut labore" for _ in range(n)],
        })
    )
    mh = dedup.minhash_lsh_pairs(docs).count()
    # 200-cap => at most C(200,2) pairs per (band,bucket); all docs identical
    # => one bucket per band, 16 bands, same 199*200/2 pair set
    assert mh <= 200 * 199 // 2
    sh = dedup.simhash_near_dups(docs).count()
    assert sh <= 200 * 199 // 2


def test_simhash_block_rotation_recall(spark):
    """Pairs within hamming<=3 are found even when they differ in the top
    prefix bits (the round-1 single-prefix-table form missed these)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from planetiler_openmaptiles_spark.textops.dedup import simhash_pairs_from_sigs

    # craft signatures: differ only in bit 63 (top block) -> hamming 1;
    # a single top-16-bit prefix table would bucket them apart
    def s64(v):  # two's-complement into signed int64
        return v - (1 << 64) if v >= (1 << 63) else v

    sigs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b", "c"],
                      "sim": [s64(0x0123456789ABCDEF),
                              s64(0x0123456789ABCDEF ^ (1 << 63)),
                              s64(0x7FFFFFFFFFFFFFFF)]})
    ).select("doc_id", F.col("sim").cast("long").alias("sim"))
    got = {(r.doc_a, r.doc_b): r.hamming for r in simhash_pairs_from_sigs(sigs).collect()}
    assert got.get(("a", "b")) == 1
    assert ("a", "c") not in got  # far pair stays out


def test_multimodal_real_decode(spark):
    """BMP/PGM images and PCM WAV audio decode for REAL (pure-numpy codecs)
    through the distributed operators — exact shapes/values, strict mode OK."""
    import numpy as np

    from planetiler_openmaptiles_spark.textops import codecs
    from planetiler_openmaptiles_spark.textops.multimodal import (
        decode_audio, decode_images, resize_images)

    rng = np.random.default_rng(7)
    img_rgb = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    img_gray = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    wav = codecs.encode_wav(
        (np.sin(np.linspace(0, 60, 1600)) * 20000).astype(np.int16), 16000
    )
    media = spark.createDataFrame(
        [
            ("i1", "d1", "image", bytearray(codecs.encode_bmp(img_rgb)), {}),
            ("i2", "d1", "image", bytearray(codecs.encode_netpbm(img_gray)), {}),
            ("a1", "d2", "audio", bytearray(wav), {}),
        ],
        "media_id string, doc_id string, kind string, content binary, meta map<string,string>",
    )
    # strict=True proves no fake path is hit for these formats
    feats = {r["media_id"]: r for r in decode_images(media, strict=True).collect()}
    assert (feats["i1"]["width"], feats["i1"]["height"], feats["i1"]["channels"]) == (9, 6, 3)
    assert (feats["i2"]["width"], feats["i2"]["height"], feats["i2"]["channels"]) == (4, 4, 1)
    expect = codecs.image_embedding(img_rgb, dim=8)
    np.testing.assert_allclose(feats["i1"]["embedding"], expect, rtol=1e-6)

    audio = decode_audio(media, strict=True).collect()
    assert len(audio) == 1
    a = audio[0]
    assert a["sample_rate"] == 16000 and a["channels"] == 1 and a["n_samples"] == 1600
    assert abs(a["duration_s"] - 0.1) < 1e-9
    # sine RMS ~ amplitude/sqrt(2) in [-1,1] units
    assert abs(a["rms"] - (20000 / 32768.0) / np.sqrt(2)) < 0.01

    thumbs = {r["media_id"]: r for r in resize_images(media, 3, 2, strict=True).collect()}
    t = codecs.decode_bmp(bytes(thumbs["i1"]["content"]))
    np.testing.assert_array_equal(t, codecs.resize_nearest(img_rgb, 2, 3))


def test_repetition_features(spark):
    from collections import Counter

    from planetiler_openmaptiles_spark.textops.textstats import (
        repetition_features,
        repetition_filter,
    )

    docs = [
        ("d1", "the cat sat on the mat the cat sat again"),
        ("d2", "spam spam spam spam spam spam"),
        ("d3", "all words here are completely distinct tokens"),
        ("d4", "tiny doc"),  # fewer than 5 words -> zero 5-gram metrics
    ]

    def ref(text):
        w = text.lower().split()
        g = lambda n: [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        c1, c2, c5 = Counter(w), Counter(g(2)), Counter(g(5))
        frac = lambda num, den: round(num / max(den, 1), 6)
        return {
            "n_words": len(w),
            "dup_word_frac": frac(len(w) - len(c1), len(w)),
            "top_2gram_frac": frac(max(c2.values(), default=0), sum(c2.values())),
            "dup_5gram_frac": frac(
                sum(v for v in c5.values() if v > 1), sum(c5.values())
            ),
        }

    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_features(df).collect()}
    for doc_id, text in docs:
        expected = ref(text)
        for k, v in expected.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-9), (doc_id, k)

    kept = sorted(r["doc_id"] for r in repetition_filter(df).collect())
    # d2 is pure repetition (top 2-gram 'spam spam' dominates) -> dropped
    assert "d2" not in kept and "d3" in kept


def test_tfidf_top_terms(spark):
    import math

    from planetiler_openmaptiles_spark.textops.textstats import tfidf_top_terms

    docs = [
        ("d1", "apple banana apple cherry"),
        ("d2", "banana banana durian"),
        ("d3", "cherry durian elderberry elderberry elderberry"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
           for r in tfidf_top_terms(df, k=2).collect()}

    def score(tf, dfreq, n=3):
        return round(tf * (math.log((n + 1) / (dfreq + 1)) + 1.0), 6)

    # d1: apple tf=2 df=1, banana tf=1 df=2, cherry tf=1 df=2
    assert got[("d1", 1)] == ("apple", score(2, 1))
    # d3: elderberry tf=3 df=1 dominates
    assert got[("d3", 1)] == ("elderberry", score(3, 1))
    # deterministic tiebreak: banana vs cherry in d1 tie on score -> banana first
    assert got[("d1", 2)] == ("banana", score(1, 2))


def test_multimodal_compressed_decode(spark):
    """JPEG images and AVI video decode for REAL (baseline T.81 + RIFF
    codecs) through the distributed operators in strict mode — no fake."""
    import numpy as np

    from planetiler_openmaptiles_spark.textops import codecs, jpeg
    from planetiler_openmaptiles_spark.textops.multimodal import (
        decode_images, sample_video_frames)

    x, y = np.linspace(0, 255, 24), np.linspace(0, 255, 16)
    img = np.stack(
        np.broadcast_arrays(x[None, :], y[:, None], (x[None, :] + y[:, None]) / 2),
        axis=-1,
    ).astype(np.uint8)
    frames = np.stack([np.roll(img, 3 * i, axis=1) for i in range(6)])
    media = spark.createDataFrame(
        [
            ("j1", "d1", "image", bytearray(jpeg.encode_jpeg(img, quality=95)), {}),
            ("v1", "d2", "video", bytearray(codecs.encode_avi(frames, fps=2)), {}),
            ("v2", "d2", "video",
             bytearray(codecs.encode_avi(frames[:2], fps=1, mjpeg=True, quality=95)), {}),
        ],
        "media_id string, doc_id string, kind string, content binary, meta map<string,string>",
    )
    feats = {r["media_id"]: r for r in decode_images(media, strict=True).collect()}
    assert (feats["j1"]["width"], feats["j1"]["height"], feats["j1"]["channels"]) == (24, 16, 3)
    # embedding of the decoded JPEG is close to the source image's
    want = codecs.image_embedding(img, dim=8)
    got = np.array(feats["j1"]["embedding"])
    assert np.abs(got - want).max() < 0.05

    rows = sample_video_frames(media, every_n_seconds=1.0, strict=True).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # fps=2, 6 frames, 1s sampling -> frames 0, 2, 4 at ts 0.0/1.0/2.0
    v1 = sorted(by_media["v1"], key=lambda r: r["frame_index"])
    assert [r["frame_index"] for r in v1] == [0, 2, 4]
    assert [r["frame_ts"] for r in v1] == [0.0, 1.0, 2.0]
    assert all((r["width"], r["height"]) == (24, 16) for r in v1)
    np.testing.assert_allclose(
        v1[0]["embedding"], codecs.image_embedding(frames[0], dim=8), rtol=1e-5
    )
    assert [r["frame_index"] for r in sorted(
        by_media["v2"], key=lambda r: r["frame_index"])] == [0, 1]


def test_paragraph_dedup_keep_first(spark):
    from planetiler_openmaptiles_spark.textops.dedup import paragraph_dedup

    w10 = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"          # one full 10-word chunk
    uniq = "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9"
    docs = [
        ("a", f"{w10} {uniq}"),        # chunk0=w10 (first occurrence), chunk1=uniq
        ("b", f"{w10} {w10}"),         # both chunks duplicate a's chunk0
        ("c", "short tail"),           # single partial chunk, unique
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df, chunk_words=10).collect()}
    assert got["a"] == {"doc_id": "a", "n_chunks": 2, "n_kept": 2,
                        "dedup_text": f"{w10} {uniq}"}
    # doc b keeps neither copy: first global occurrence is (a, 0)
    assert (got["b"]["n_chunks"], got["b"]["n_kept"], got["b"]["dedup_text"]) == (2, 0, "")
    assert (got["c"]["n_chunks"], got["c"]["n_kept"], got["c"]["dedup_text"]) == (1, 1, "short tail")


def test_semantic_dedup_keep_lowest(spark):
    from planetiler_openmaptiles_spark.textops.similarity import semantic_dedup

    # two orthogonal clusters; within cluster 0, v2 is a near-copy of v1
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0]),   # cosine(v1,v2) ≈ 0.9992 → dup of 1
        (3, [0.0, 1.0, 0.0]),      # other cluster, untouched
        (4, [0.0, 0.995, 0.1]),    # cosine(v3,v4) ≈ 0.995 → dup of 3
        (5, [0.0, 0.70, -0.714]),  # same cluster as 3 but below threshold
    ]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    got = {r["vec_id"]: r.asDict()
           for r in semantic_dedup(df, cents, threshold=0.99).collect()}
    assert [got[i]["keep"] for i in (1, 2, 3, 4, 5)] == [True, False, True, False, True]
    assert got[2]["dup_of"] == 1 and got[4]["dup_of"] == 3
    assert got[1]["cluster"] == got[2]["cluster"] == 0
    assert got[3]["cluster"] == got[4]["cluster"] == got[5]["cluster"] == 1


def test_exact_substring_dedup(spark):
    """ExactSubstr span excision vs an independent per-row reference:
    keep-first by (doc_id, offset), within-doc repeats removed, overlapping
    windows merged before cutting, short docs untouched."""
    from planetiler_openmaptiles_spark.textops.dedup import exact_substring_dedup

    W, S = 10, 5
    shared = "ABCDEFGHIJKLMNOPQRST"               # 20-char run shared by d1/d2
    rows = [
        ("d1", "xx1" + shared + "tail-one-unique"),
        ("d2", "yy2" + shared + "tail-two-unique"),
        ("d3", ("repeatME!!" * 4) + "ending"),     # within-doc repetition
        ("d4", "short"),                            # < window, untouched
    ]

    def ref(rows):
        occ: dict = {}
        for did, t in rows:
            if len(t) < W:
                continue
            for s in range(1, len(t) - W + 2, S):
                occ.setdefault(t[s - 1:s - 1 + W], []).append((did, s))
        rem: dict = {}
        for lst in occ.values():
            lst.sort()
            for did, s in lst[1:]:
                rem.setdefault(did, []).append((s, s + W))
        out = {}
        for did, t in rows:
            merged: list = []
            for s, e in sorted(rem.get(did, [])):
                if merged and s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            pos, kept = 1, ""
            for s, e in merged:
                kept += t[pos - 1:s - 1]
                pos = e
            kept += t[pos - 1:]
            out[did] = (len(merged), sum(e - s for s, e in merged), kept)
        return out

    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_dup_spans"], r["removed_chars"], r["dedup_text"])
           for r in exact_substring_dedup(df, window=W, stride=S).collect()}
    exp = ref(rows)
    assert got == exp
    assert exp["d2"][1] > 0 and exp["d3"][1] > 0      # removals actually occur
    assert got["d4"] == (0, 0, "short")


def test_pii_redact(spark):
    from planetiler_openmaptiles_spark.textops.scrub import pii_redact

    rows = [
        ("a", "mail me at jo.doe+spam@sub.example.org or admin@x.co thanks"),
        ("b", "server 10.0.0.1 and 192.168.100.200 are up"),
        ("c", "call +1 (555) 123-4567 now"),
        ("d", "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert got["a"]["n_email"] == 2 and "<EMAIL>" in got["a"]["redacted"]
    assert "@" not in got["a"]["redacted"].replace("<EMAIL>", "")
    assert got["b"]["n_ip"] == 2
    assert got["b"]["redacted"] == "server <IP> and <IP> are up"
    assert got["c"]["n_phone"] == 1
    assert got["c"]["redacted"] == "call <PHONE> now"
    assert got["d"]["redacted"] == rows[3][1]
    assert (got["d"]["n_email"], got["d"]["n_ip"], got["d"]["n_phone"]) == (0, 0, 0)


def test_decontaminate(spark):
    from planetiler_openmaptiles_spark.textops.scrub import decontaminate

    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows_eval = [("e1", bench), ("e2", "tiny doc")]   # e2 < 8 words: no grams
    rows_train = [
        ("t1", "prefix words then " + bench + " suffix words"),  # contaminated
        ("t2", "alpha beta gamma delta epsilon zeta eta MISS iota kappa"),  # broken run
        ("t3", "tiny doc"),                                       # < 8 words
        ("t4", bench),                                            # exact eval copy
    ]
    ev = spark.createDataFrame(rows_eval, "doc_id string, text string")
    tr = spark.createDataFrame(rows_train, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in decontaminate(tr, ev, n=8).collect()}
    assert len(got) == 4                                # every train doc reported
    # bench has 10 words -> 3 distinct 8-grams, all present inside t1 and t4
    assert (got["t1"]["n_contaminated_ngrams"], got["t1"]["contaminated"]) == (3, True)
    assert (got["t4"]["n_contaminated_ngrams"], got["t4"]["contaminated"]) == (3, True)
    assert got["t2"]["contaminated"] is False           # no intact 8-gram run
    assert got["t3"]["contaminated"] is False           # sub-n doc can't match


def test_pack_sequences(spark):
    from planetiler_openmaptiles_spark.textops.textstats import pack_sequences

    # 40 docs with varying word counts; force several range partitions so
    # the distributed prefix-sum path (per-partition base offsets) is
    # actually exercised, not just a single-partition window.
    rows = [(f"d{i:03d}", " ".join(["w"] * ((i * 7) % 11 + 1))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id string, text string").repartition(8)
    got = {r["doc_id"]: r.asDict()
           for r in pack_sequences(docs, seq_len=16, partitions=5).collect()}
    assert len(got) == 40
    # pure-python reference: cumulative offsets in doc_id order, +1 EOS each
    off = 0
    for i in range(40):
        n = (i * 7) % 11 + 2  # words + EOS
        d = got[f"d{i:03d}"]
        assert d["n_tokens"] == n
        assert d["tok_start"] == off
        assert d["first_chunk"] == off // 16
        assert d["last_chunk"] == (off + n - 1) // 16
        assert d["n_chunks"] == d["last_chunk"] - d["first_chunk"] + 1
        off += n


def test_hash_split_deterministic(spark):
    from planetiler_openmaptiles_spark.textops.mixing import hash_split

    docs = spark.createDataFrame(
        [(i, "x") for i in range(1000)], "doc_id long, text string")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    # stable under reshuffling and under appending more data
    b = {r["doc_id"]: r["split"]
         for r in hash_split(docs.repartition(7)).collect()}
    assert a == b
    frac = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.95 < frac <= 1.0  # ~0.98 by construction
    assert set(a.values()) <= {"train", "val", "test"}


def test_domain_mix_weights(spark):
    import math

    from planetiler_openmaptiles_spark.textops.mixing import domain_mix_weights

    docs = spark.createDataFrame(
        [(i, "a" if i < 900 else "b") for i in range(1000)],
        "doc_id long, source string")
    got = {r["domain"]: r.asDict() for r in domain_mix_weights(docs).collect()}
    pa, pb = 0.9 ** 0.3, 0.1 ** 0.3
    assert got["a"]["n_docs"] == 900
    assert abs(got["a"]["weight"] - pa / (pa + pb)) < 1e-6
    assert abs(got["b"]["weight"] - pb / (pa + pb)) < 1e-6
    # temperature flattens: minority domain is up-weighted vs its raw share
    assert got["b"]["weight"] > got["b"]["p"]
    assert math.isclose(got["a"]["weight"] + got["b"]["weight"], 1.0,
                        abs_tol=2e-6)


def test_dsir_weights_prefers_target_like_docs(spark):
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.selection import dsir_weights

    # target domain speaks "alpha beta", raw background speaks "gamma delta";
    # a held-out raw doc written in target language must score higher than
    # one written in background language.
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta alpha beta alpha beta", "tgt"))
    for i in range(40, 200):
        rows.append((i, "gamma delta gamma delta gamma delta", "web"))
    rows.append((900, "alpha beta alpha beta alpha beta", "web"))
    rows.append((901, "gamma delta gamma delta gamma delta", "web2"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in
           dsir_weights(docs, F.col("source") == "tgt").collect()}
    assert got[900]["log_weight"] > got[901]["log_weight"]
    # 6 words -> 5 bigram occurrences per doc
    assert got[900]["n_features"] == 5
    # single-word and empty docs produce no features
    one = spark.createDataFrame(
        [(0, "solo", "a"), (1, "", "a"), (2, "x y", "a")],
        "doc_id long, text string, source string")
    ids = [r["doc_id"] for r in
           dsir_weights(one, F.col("source") == "a").collect()]
    assert ids == [2]


def test_bm25_search_ranking(spark):
    from planetiler_openmaptiles_spark.textops.selection import bm25_search

    docs = spark.createDataFrame(
        [(0, "spark spark spark filler filler"),
         (1, "spark filler filler filler filler"),
         (2, "filler filler filler filler filler"),
         (3, "rare filler filler filler filler")],
        "doc_id long, text string")
    top = bm25_search(docs, ["spark", "rare"], limit=10).collect()
    ids = [r["doc_id"] for r in top]
    assert 2 not in ids            # no query term -> score 0 -> filtered
    assert ids[0] == 3             # "rare" df=1 beats "spark" df=2 tf=3
    assert ids.index(0) < ids.index(1)   # higher tf wins within a term
    assert all(top[i]["score"] >= top[i + 1]["score"]
               for i in range(len(top) - 1))


def test_mix_sample_epoch_fractioning(spark):
    from planetiler_openmaptiles_spark.textops.mixing import domain_mix_weights
    from planetiler_openmaptiles_spark.textops.selection import mix_sample

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string")
    weights = domain_mix_weights(docs, alpha=0.3)
    out = mix_sample(docs, weights).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    w = {r["domain"]: r["weight"] for r in weights.collect()}
    for dom, n_src in (("big", 900), ("small", 100)):
        expect = w[dom] * 1000
        got = len(by_dom[dom])
        # within the bernoulli fractioning band: +/- n_src of target
        assert abs(got - expect) <= n_src * 0.55, (dom, got, expect)
    # minority domain is up-sampled: more copies than source docs
    assert len(by_dom["small"]) > 100
    # deterministic under repartitioning
    again = mix_sample(docs.repartition(7), weights).collect()
    assert sorted((r["doc_id"], r["copy_idx"]) for r in out) == \
        sorted((r["doc_id"], r["copy_idx"]) for r in again)


def test_inverted_index_cap_and_order(spark):
    from planetiler_openmaptiles_spark.textops.index import (
        build_inverted_index,
    )

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b b"), (2, "a"), (3, "c")],
        "doc_id long, text string")
    got = {r["term"]: r for r in build_inverted_index(docs).collect()}
    assert got["a"]["df"] == 3 and got["a"]["total_tf"] == 5
    assert got["a"]["postings"] == "0:3,1:1,2:1"
    assert got["b"]["postings"] == "0:1,1:2"
    assert got["c"]["n_postings"] == 1
    # cap keeps the highest-tf postings, output stays doc_id-ordered
    capped = {r["term"]: r for r in
              build_inverted_index(docs, max_postings=2).collect()}
    assert capped["a"]["n_postings"] == 2
    assert capped["a"]["df"] == 3          # df counts the UNCAPPED set
    assert capped["a"]["postings"] == "0:3,1:1"  # tf3 and tf1(doc1) kept


def test_corpus_stats_exact_percentiles(spark):
    from planetiler_openmaptiles_spark.textops.index import corpus_stats

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", "s", (i + 1) * 10) for i in range(100)],
        "doc_id long, lang string, source string, n_chars long")
    r = corpus_stats(docs).collect()[0]
    assert r["n_docs"] == 100 and r["n_langs"] == 2
    # linear-interpolated exact percentiles over 10..1000 step 10
    assert r["p50_chars"] == 505.0
    assert r["p90_chars"] == 901.0
    assert r["p99_chars"] == 990.1


def test_stratified_sample_deterministic(spark):
    from planetiler_openmaptiles_spark.textops.mixing import (
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)],
        "doc_id long, source string")
    got = stratified_sample(docs, n_per_domain=10).collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r)
    assert {d: len(v) for d, v in by_dom.items()} == {"a": 10, "b": 10}
    for rows in by_dom.values():
        us = [r["u"] for r in sorted(rows, key=lambda r: r["rank_in_domain"])]
        assert us == sorted(us)
    # stable under repartitioning
    again = stratified_sample(docs.repartition(13), n_per_domain=10).collect()
    assert sorted((r["domain"], r["rank_in_domain"], r["doc_id"])
                  for r in got) == \
        sorted((r["domain"], r["rank_in_domain"], r["doc_id"])
               for r in again)
    # small domains return all their docs
    tiny = spark.createDataFrame(
        [(1, "x"), (2, "x")], "doc_id long, source string")
    assert len(stratified_sample(tiny, n_per_domain=10).collect()) == 2


def _ref_bpe(vocab: dict, n_merges: int):
    """Python reference BPE (Sennrich alg. 1) with the engine's rules:
    ties break on pair string, stop when best count < 2."""
    import re as _re

    words = {" ".join(w): n for w, n in vocab.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, n in words.items():
            parts = syms.split(" ")
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append(f"{a} {b}")
        pat = _re.compile(
            r"(?<![^ ])" + _re.escape(a) + " " + _re.escape(b) + r"(?![^ ])")
        words = {pat.sub(a + b, s): n for s, n in words.items()}
    return merges


def test_learn_bpe_matches_reference(spark):
    from planetiler_openmaptiles_spark.textops.bpe import learn_bpe

    corpus = ["low low low lower lowest", "new newer newest low",
              "wide wider widest new new"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    vocab = {}
    for t in corpus:
        for w in t.split():
            vocab[w] = vocab.get(w, 0) + 1
    got = learn_bpe(docs, n_merges=8)
    assert got == _ref_bpe(vocab, 8)
    assert len(got) >= 4  # the toy corpus supports several merges


def test_pq_encode_and_adc_topk(spark):
    import numpy as np

    from planetiler_openmaptiles_spark.textops.similarity import (
        pq_encode, pq_topk, train_pq_codebooks)
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    vecs = rng.randn(80, 16).astype(float)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<double>")
    books = train_pq_codebooks(emb, dim=16, m=4, k=8, sample=80)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    # codes are deterministic and in range
    codes = {r["vec_id"]: r["c"] for r in emb.select(
        "vec_id", pq_encode(F.col("embedding"), books, 16).alias("c")
    ).collect()}
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c)
               for c in codes.values())
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"))
    top = pq_topk(emb, probes, books, dim=16, k=5).collect()
    by_probe = {}
    for r in top:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for pid, rows in by_probe.items():
        rows.sort(key=lambda r: r["rank"])
        assert len(rows) == 5
        dists = [r["approx_dist"] for r in rows]
        assert dists == sorted(dists)
        # ADC distance of the probe against its own code is the
        # quantization error -- the probe itself ranks at/near the top;
        # with 8 codes x 4 subspaces over 80 points it must make top-5
        assert pid in {r["vec_id"] for r in rows}


def test_train_logreg_matches_numpy_reference(spark):
    import numpy as np

    from planetiler_openmaptiles_spark.textops.classifier import (
        train_logreg,
    )

    rows = []
    for i in range(200):
        lang = "en" if i % 2 else "fr"
        # english docs get longer text + more stopwords
        words = (["the", "a"] * 4 + ["word"] * 10) if lang == "en" else (
            ["mot"] * 6)
        rows.append((i, " ".join(words), lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    # numpy reference of the identical recipe
    feats, ys = [], []
    for _, text, lang in rows:
        w = text.split()
        nw = len(w)
        tc = sum(len(x) for x in w)
        sw = sum(1 for x in w if x in ("the", "a"))
        feats.append([1.0, nw / 100.0, (tc / nw) / 10.0, sw / nw])
        ys.append(1.0 if lang == "en" else 0.0)
    X, y = np.array(feats), np.array(ys)
    wv = np.zeros(4)
    for _ in range(3):
        p = 1.0 / (1.0 + np.exp(-(X @ wv)))
        wv -= (X * (p - y)[:, None]).mean(axis=0)

    got = train_logreg(docs, iters=3, lr=1.0)
    assert np.allclose(got, wv, atol=1e-9)
    # the separating features must point the right way
    assert got[3] > 0  # stopword ratio predicts english here
    assert got[1] > 0  # longer docs predict english here


def test_perplexity_buckets_matches_python_reference(spark):
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.lm import perplexity_buckets

    rows = []
    for i in range(90):
        if i % 3 == 0:
            text = "the cat sat on the mat " * 3  # fluent: in-model
            lang = "en"
        elif i % 3 == 1:
            text = f"the mat sat on oddword{i} the cat"  # one OOV token
            lang = "en"
        else:
            text = f"zz{i} qq{i} xx{i} vv{i}"  # all OOV: high ppl
            lang = "xx"
        rows.append((i, text.strip(), lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    # --- python reference of the identical recipe -------------------
    vocab_size, alpha = 8, 1.0
    ref_toks = [t for i, text, lg in rows if lg == "en" for t in text.split()]
    counts = Counter(ref_toks)
    vocab = [
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:vocab_size]
    vs = set(vocab)

    def mapped(text):
        return [t if t in vs else "<unk>" for t in text.split()]

    c2, c1 = Counter(), Counter()
    for i, text, lg in rows:
        if lg != "en":
            continue
        tk = mapped(text)
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    v1 = len(vocab) + 1

    expect = {}
    for i, text, _ in rows:
        tk = mapped(text)
        if len(tk) < 2:
            continue
        lps = [
            math.log((c2[(a, b)] + alpha) / (c1[a] + alpha * v1))
            for a, b in zip(tk, tk[1:])
        ]
        expect[i] = round(math.exp(-sum(lps) / len(lps)), 6)

    got = {
        r["doc_id"]: (r["ppl"], r["bucket"])
        for r in perplexity_buckets(
            docs, F.col("lang") == "en", vocab_size=vocab_size, alpha=alpha
        ).collect()
    }
    assert set(got) == set(expect)
    for i, ppl in expect.items():
        assert abs(got[i][0] - ppl) < 1e-6, (i, got[i][0], ppl)

    # fluent docs land in head, OOV-gibberish docs in tail
    assert all(got[i][1] == "head" for i in range(0, 90, 3))
    assert all(got[i][1] == "tail" for i in range(2, 90, 3))
    assert all(got[i][1] == "middle" for i in range(1, 90, 3))


def test_bpe_encode_matches_python_reference(spark):
    from planetiler_openmaptiles_spark.textops.bpe import (
        bpe_encode,
        learn_bpe,
    )

    def py_encode(word, merges):
        toks = list(word)
        for m in merges:
            a, b = m.split(" ")
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    rows = [
        (0, "the theme thethe aaaa"),
        (1, "aaa aa a baab"),
        (2, "the the the theme"),
        (3, "x aaaaaa themethe"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # fixed merges incl. an adjacency run (greedy left-to-right pinned)
    for merges in (["a a", "aa aa", "t h", "th e"], learn_bpe(docs, 6)):
        got = {
            r["doc_id"]: (r["n_tokens"], list(r["tokens"]))
            for r in bpe_encode(docs, merges).collect()
        }
        for i, text in rows:
            want = [t for w in text.split() for t in py_encode(w, merges)]
            assert got[i] == (len(want), want), (merges, i, got[i], want)


def test_dedup_against_incremental_shard(spark):
    from planetiler_openmaptiles_spark.textops.dedup import dedup_against

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from every hunter "
    ) * 3
    existing = spark.createDataFrame(
        [(0, base), (1, "completely unrelated existing text about maps")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base),                      # exact dup of existing -> drop
            (101, "  " + base.upper() + " "), # normalizes to same -> drop
            (102, base.replace("fox", "cat")),  # near-dup -> fuzzy drop
            (103, "fresh new document with totally different words here"),
            (104, "fresh new document with totally different words here"),
            (105, "another genuinely novel shard document full of news"),
        ],
        "doc_id long, text string",
    )
    exact_only = {r["doc_id"] for r in dedup_against(new, existing).collect()}
    assert exact_only == {102, 103, 105}  # 104 dropped within-shard

    fuzzy = {
        r["doc_id"]
        for r in dedup_against(new, existing, fuzzy=True).collect()
    }
    assert fuzzy == {103, 105}


def test_dedup_by_clusters_best_keeps_highest_quality(spark):
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.cluster import (
        dedup_by_clusters_best,
    )

    docs = spark.createDataFrame(
        [(0, 1.0), (1, 3.0), (2, 3.0), (3, 9.9), (9, 0.1)],
        "doc_id long, s double",
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2)],  # cluster {0,1,2}; 3 and 9 unclustered
        "doc_a long, doc_b long",
    )
    kept = {
        r["doc_id"]
        for r in dedup_by_clusters_best(docs, edges, F.col("s")).collect()
    }
    # 1 and 2 tie on score -> lowest id (1) wins; 0 loses; others pass
    assert kept == {1, 3, 9}


def test_dedup_by_clusters_best_string_ids(spark):
    """String doc_ids must dedup too — a negated-id argmax trick casts
    strings to NULL under non-ANSI and silently keeps every member."""
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.cluster import (
        dedup_by_clusters_best,
    )

    docs = spark.createDataFrame(
        [("a", 1.0), ("b", 3.0), ("c", 3.0), ("z", 9.9)],
        "doc_id string, s double",
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "doc_a string, doc_b string"
    )
    kept = {
        r["doc_id"]
        for r in dedup_by_clusters_best(docs, edges, F.col("s")).collect()
    }
    # b/c tie -> lexicographically-lowest id b wins; a loses; z passes
    assert kept == {"b", "z"}


def test_hash_embed_unit_norm_and_similarity(spark):
    import math

    from planetiler_openmaptiles_spark.textops.selection import (
        hash_embed_docs,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha"),
            (1, "alpha beta gamma alpha"),   # identical -> same vector
            (2, "zz yy xx ww vv uu tt ss"),  # disjoint vocab
        ],
        "doc_id long, text string",
    )
    vecs = {
        r["doc_id"]: r["vec"]
        for r in hash_embed_docs(docs, dim=32).collect()
    }
    for v in vecs.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    assert vecs[0] == vecs[1]
    cos = sum(a * b for a, b in zip(vecs[0], vecs[2]))
    assert cos < 0.9  # disjoint vocab -> far from identical direction


def test_winnow_fingerprints_python_reference(spark):
    """Winnowing selection matches a literal python implementation of
    Schleimer et al. 2003 (window min, rightmost tie-break, overlap
    dedup), including the shorter-than-one-window degenerate case."""
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.textstats import (
        winnow_fingerprints, winnow_gram_hashes)

    rows = [
        (1, "a b c d e f g h i j k l"),
        (2, "x y a b c d e f g z"),      # shares the a..g run with doc 1
        (3, "p q r s t u"),               # 6 words -> 2 grams < one window
        (4, "one two three four five"),   # exactly one gram
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 5, 4

    # python reference over the engine's own gram hashes (xxhash64 is
    # JVM-side; selection logic is what's under test)
    grams = {
        r["doc_id"]: r["hs"]
        for r in docs.select(
            "doc_id", winnow_gram_hashes(F.col("text"), k).alias("hs")
        ).collect()
    }
    expect = set()
    for did, hs in grams.items():
        if not hs:
            continue
        nw = max(len(hs) - w + 1, 1)
        for j in range(nw):
            window = hs[j:j + w]
            m = min(window)
            pos = j + max(i for i, h in enumerate(window) if h == m)
            expect.add((did, pos, m))

    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(docs, k=k, w=w).collect()
    }
    assert got == expect
    # winnowing guarantee: docs 1 and 2 share a >= k+w-1 word run, so at
    # least one selected fingerprint must be common
    f1 = {fp for d, p, fp in got if d == 1}
    f2 = {fp for d, p, fp in got if d == 2}
    assert f1 & f2


def test_winnow_matches_pairs_and_cap(spark):
    from planetiler_openmaptiles_spark.textops.textstats import winnow_matches

    base = "the quick brown fox jumps over the lazy dog today again"
    rows = [
        (1, base),
        (2, base + " extra trailing words here"),
        (3, "totally disjoint vocabulary sentence nothing shared at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_matches(docs, k=5, w=4, min_shared=2).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(3 not in pair for pair in got)
    # df cap: a fingerprint present in every doc is dropped before the join
    many = [(i, base) for i in range(1, 8)]
    docs2 = spark.createDataFrame(many, "doc_id long, text string")
    assert winnow_matches(docs2, k=5, w=4, min_shared=1, max_df=3).count() == 0


def test_pagerank_numpy_reference(spark):
    """Distributed PageRank matches a dense numpy power-iteration on a
    hand-built weighted graph, iteration for iteration."""
    import numpy as np

    from planetiler_openmaptiles_spark.textops.graph import pagerank

    # 0-1-2 triangle plus a 3-4 dumbbell edge (symmetric, weighted)
    raw = [(0, 1, 2), (0, 2, 1), (1, 2, 1), (3, 4, 1)]
    sym = raw + [(b, a, w) for a, b, w in raw]
    edges = spark.createDataFrame(sym, "src long, dst long, weight int")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=5, d=0.85).collect()}

    nodes = sorted({x for a, b, _ in sym for x in (a, b)})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    share = np.zeros((n, n))
    wout = {}
    for a, b, w in sym:
        wout[a] = wout.get(a, 0) + w
    for a, b, w in sym:
        share[idx[b], idx[a]] = w / wout[a]
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        r = (1 - 0.85) / n + 0.85 * share @ r
    for node, i in idx.items():
        assert abs(got[node] - round(r[i], 6)) < 2e-6
    # symmetric graph conserves mass
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_shared_gram_edges_symmetric_and_capped(spark):
    from planetiler_openmaptiles_spark.textops.graph import shared_gram_edges

    run = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    rows = [
        (1, run + " one"),
        (2, run + " two"),       # shares the rare 8-gram with 1
        (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["src"], r["dst"]): r["weight"]
           for r in shared_gram_edges(docs, n=8, max_df=4).collect()}
    assert (1, 2) in got and (2, 1) in got        # both directions
    assert got[(1, 2)] == got[(2, 1)] == 1
    assert all(3 not in k for k in got)
    # df cap: the same gram in 5 docs (> max_df) produces no edges
    many = [(i, run) for i in range(10, 15)]
    docs2 = spark.createDataFrame(many, "doc_id long, text string")
    assert shared_gram_edges(docs2, n=8, max_df=4).count() == 0


def test_minhash_recall_harness(spark):
    """Identical docs have Jaccard 1.0 and collide in every LSH band, so
    recall at every threshold must count them; disjoint docs never enter
    the truth set."""
    rows = [
        (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
        (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),   # exact dup of 1
        (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),   # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from planetiler_openmaptiles_spark.textops.dedup import minhash_recall

    got = {r["threshold"]: r for r in minhash_recall(docs).collect()}
    for t in (0.5, 0.7, 0.9):
        assert got[t]["n_true"] == 1 and got[t]["n_hit"] == 1
        assert got[t]["recall"] == 1.0
    # deterministic md5 sampling: same frac -> same rows, 0 frac -> empty
    a = minhash_recall(docs, sample_frac=0.6).collect()
    b = minhash_recall(docs, sample_frac=0.6).collect()
    assert a == b


def test_bitext_margin_mutual_best(spark):
    """Mutual-best ratio-margin mining: each en doc pairs with the es doc
    sharing its vocabulary; a hub es doc overlapping everything cannot
    steal matches because the margin denominator cancels its popularity."""
    rows = [
        (1, "en", "alpha beta gamma delta"),
        (2, "en", "epsilon zeta eta theta"),
        (10, "es", "alpha beta gamma otra"),      # best for 1
        (11, "es", "epsilon zeta eta otra"),      # best for 2
        (12, "es", "alpha epsilon beta zeta"),    # hub: overlaps both
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    from planetiler_openmaptiles_spark.textops.bitext import mine_bitext

    got = {(r["x_id"], r["y_id"]): r["margin"]
           for r in mine_bitext(docs, "en", "es", k=2, threshold=0.0).collect()}
    assert (1, 10) in got and (2, 11) in got
    # mutual-best is one-to-one: no doc appears twice
    xs = [a for a, _ in got]
    ys = [b for _, b in got]
    assert len(xs) == len(set(xs)) and len(ys) == len(set(ys))
    assert all(m > 0 for m in got.values())


def test_hll_accuracy_and_determinism(spark):
    """HLL estimate lands within the ~1.04/sqrt(m) relative-error band
    (m=256 -> 6.5%; allow 3 sigma) on a 5000-distinct-value column, and
    duplicates never change the registers."""
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.sketches import hll_distinct

    vals = spark.range(5000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    est = hll_distinct(vals, "v", ["grp"]).collect()[0]["hll_estimate"]
    assert abs(est - 5000) / 5000 < 0.20
    dup = vals.union(vals)  # same distinct set
    est2 = hll_distinct(dup, "v", ["grp"]).collect()[0]["hll_estimate"]
    assert est2 == est
    # small-range linear counting: 3 distinct values estimate ~exactly
    small = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", 3), ("g", 3)], "grp string, v long"
    )
    est3 = hll_distinct(small, "v", ["grp"]).collect()[0]["hll_estimate"]
    assert abs(est3 - 3) < 0.1


def test_cms_one_sided_and_heavy_hitters(spark):
    """Count-Min point estimates are never below the true count, and the
    planted heavy hitter ranks first."""
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.sketches import (
        cms_counts, cms_heavy_hitters)

    rows = [("hot",)] * 50 + [(f"w{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "word string")
    top = cms_heavy_hitters(df, "word", df.select("word"), k=5).collect()
    assert top[0]["value"] == "hot" and top[0]["est"] >= 50
    true = {r["word"]: r["cnt"] for r in
            df.groupBy("word").agg(F.count("*").alias("cnt")).collect()}
    est = {r["value"]: r["est"]
           for r in cms_heavy_hitters(df, "word", df.select("word"), k=300).collect()}
    assert all(est[wd] >= c for wd, c in true.items())
    # sketch size is d*w regardless of input
    assert cms_counts(df, "word", d=4, w=64).count() <= 4 * 64


def test_bloom_no_false_negatives_and_packing(spark):
    """Every inserted value probes maybe_member=true (Bloom guarantee),
    the packed-word filter is at most m/64 rows, and a tiny filter
    forced into saturation still never yields a false negative."""
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.sketches import (
        bloom_build, bloom_probe)

    vals = spark.createDataFrame(
        [(f"v{i}",) for i in range(100)], "t string"
    )
    bloom = bloom_build(vals, "t", m=8192, k=4)
    assert bloom.count() <= 8192 // 64
    probed = bloom_probe(
        vals.withColumn("doc_id", F.monotonically_increasing_id()),
        "t", bloom, m=8192, k=4, keep_cols=["doc_id"],
    )
    assert probed.filter(~F.col("maybe_member")).count() == 0
    # values never inserted: mostly rejected at this load factor
    other = spark.createDataFrame(
        [(f"x{i}", i) for i in range(100)], "t string, doc_id long"
    )
    rej = bloom_probe(other, "t", bloom, m=8192, k=4, keep_cols=["doc_id"])
    assert rej.filter(~F.col("maybe_member")).count() > 80


def test_audio_frame_energy(spark):
    """Framewise energy over a real PCM WAV: integer-exact energies, the
    loud frame wins the argmax, the partial tail frame is zero-padded."""
    import numpy as np
    import pandas as pd

    from planetiler_openmaptiles_spark.textops import codecs
    from planetiler_openmaptiles_spark.textops.multimodal import (
        MEDIA_SCHEMA, audio_frame_energy)

    quiet = np.full(256, 10, dtype=np.int16)
    loud = np.full(256, 1000, dtype=np.int16)
    tail = np.full(100, 10, dtype=np.int16)
    sig = np.concatenate([quiet, loud, tail])
    wav = codecs.encode_wav(sig, 8000)
    rows = [("m1", "1", "audio", bytearray(wav), None)]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        MEDIA_SCHEMA,
    )
    got = audio_frame_energy(media, frame_len=256, strict=True).collect()[0]
    assert got["n_frames"] == 3
    assert got["max_frame"] == 1
    assert got["max_energy"] == 256 * 1000 * 1000
    assert got["total_energy"] == 256 * 100 + 256 * 1000 * 1000 + 100 * 100


def test_lsh_multiprobe_superset(spark):
    """Multiprobe candidates include every single-probe candidate (flip 0
    keeps the home bucket), so multiprobe recall can only improve."""
    import random

    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.textops.similarity import (
        lsh_multiprobe_topk, lsh_topk)

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    single = {(r["probe_id"], r["vec_id"])
              for r in lsh_topk(emb, probes, dim=16, k=500, num_planes=6).collect()}
    multi = {(r["probe_id"], r["vec_id"])
             for r in lsh_multiprobe_topk(emb, probes, dim=16, k=500,
                                          num_planes=6).collect()}
    # k exceeds the corpus so nothing is cut: the multiprobe CANDIDATE set
    # (home bucket = flip 0, plus one-bit flips) must be a superset
    assert single <= multi
    assert len(multi) > len(single)


def test_audio_frame_energy_nonstrict_fake_row(spark):
    """Non-strict mode must emit a marked deterministic fake row for
    non-WAV audio (decode_audio's contract) — clips never vanish silently
    (ADVICE r3)."""
    from planetiler_openmaptiles_spark.textops.multimodal import (
        MEDIA_SCHEMA, audio_frame_energy)

    media = spark.createDataFrame(
        [("m1", "d1", "audio", b"\xffnot-a-wav", {})],
        MEDIA_SCHEMA,
    )
    out = audio_frame_energy(media, strict=False).collect()
    assert len(out) == 1  # one output row per audio row, not a drop
    r = out[0]
    assert r["media_id"] == "m1" and r["n_frames"] >= 1
    # deterministic: same bytes, same fake
    again = audio_frame_energy(media, strict=False).collect()[0]
    assert again == r
