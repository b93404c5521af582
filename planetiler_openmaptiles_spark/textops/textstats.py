"""Text analysis: language-ID, quality scoring, token counting, fingerprints.

All pure Column expressions (JVM/codegen) — these run over every document of
a 100 TB corpus, so no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------- tokenization

# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def whitespace_token_count(text: Column) -> Column:
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def regex_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (regexp_extract_all, JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


# ---------------------------------------------------------------- language ID

# tiny per-language stopword lists — the classic cheap n-gram/stopword
# heuristic; deterministic and SQL-expressible for the oracle
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "del", "las"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ich", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "des", "est", "et", "une", "dans", "que", "pour"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.greatest(F.size(words), F.lit(1))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.array_intersect(F.array_distinct(words), marker_arr))
        freq = F.size(F.filter(words, lambda w: F.array_contains(marker_arr, w)))
        out[lang] = (freq.cast("double") / n.cast("double")) + hits.cast("double") * 0.001
    return out


def detect_language(text: Column) -> Column:
    """argmax over the marker scores; 'und' when nothing matches."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(F.lit(lang).alias("lang"), s.alias("score"))
            for lang, s in scores.items()
        ]
    )
    best = F.array_max(
        F.transform(pairs, lambda p: F.struct(p["score"].alias("score"), p["lang"].alias("lang")))
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


# ------------------------------------------------------------ quality score


def quality_features(text: Column) -> dict[str, Column]:
    length = F.length(text)
    words = F.split(F.trim(text), r"\s+")
    n_words = F.greatest(F.size(words), F.lit(1))
    mean_word_len = length.cast("double") / n_words.cast("double")
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!?]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    stop_arr = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_ratio = (
        F.size(F.filter(F.split(F.lower(text), r"\s+"), lambda w: F.array_contains(stop_arr, w))).cast("double")
        / n_words.cast("double")
    )
    return {
        "n_chars": length,
        "n_words": F.size(words),
        "mean_word_len": mean_word_len,
        "punct_ratio": punct.cast("double") / F.greatest(length, F.lit(1)).cast("double"),
        "digit_ratio": digits.cast("double") / F.greatest(length, F.lit(1)).cast("double"),
        "upper_ratio": upper.cast("double") / F.greatest(length, F.lit(1)).cast("double"),
        "stopword_ratio": stop_ratio,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic (length/punct/stopword mix —
    a Gopher-rules-style filter, deterministic)."""
    f = quality_features(text)
    length_ok = F.when((f["n_words"] >= 5) & (f["n_words"] <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when((f["mean_word_len"] >= 2.0) & (f["mean_word_len"] <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(f["punct_ratio"] <= 0.2, 1.0).otherwise(0.0)
    digit_ok = F.when(f["digit_ratio"] <= 0.3, 1.0).otherwise(0.0)
    stop_ok = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    return (length_ok + word_len_ok + punct_ok + digit_ok + stop_ok) / F.lit(5.0)


# ------------------------------------------------------------- fingerprints


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Document fingerprint: xxhash of the minimum rolling word-window hash
    (winnowing-style, deterministic, JVM-side)."""
    words = F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " ")
    k = F.greatest(F.size(words) - (window - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - 1)
    win_hashes = F.transform(idx, lambda i: F.xxhash64(F.array_join(F.slice(words, i + 1, window), " ")))
    return F.array_min(win_hashes)


# --------------------------------------------------- repetition (Gopher A1)


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (lowercased, whitespace-split).
    Empty array when the document has fewer than n words (sequence() with
    start > stop counts DOWN in Spark — must be guarded, not clamped)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    if n == 1:
        return words
    k = F.size(words) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(docs, text_col: str = "text"):
    """Per-document word-repetition metrics — the repetition half of the
    Gopher quality rules (Rae et al. 2021, table A1), adapted to word
    n-grams (this corpus has no line structure):

      n_words          whitespace word count
      dup_word_frac    1 - distinct_words / words
      top_2gram_frac   occurrences of the most frequent word 2-gram / 2-grams
      dup_5gram_frac   occurrences inside repeated (count>1) 5-grams / 5-grams

    Shape: explode → two-level aggregate per metric, then one join on
    doc_id — each n-gram table is one shuffle on (doc_id, gram) and one on
    doc_id; nothing is quadratic and no per-row Python anywhere, so the
    same plan runs at corpus scale (the reference Gopher pipeline computes
    exactly these counts per document)."""
    base = docs.select(
        F.col("doc_id"),
        word_ngrams(F.col(text_col), 1).alias("w1"),
        word_ngrams(F.col(text_col), 2).alias("w2"),
        word_ngrams(F.col(text_col), 5).alias("w5"),
    )

    def _per_doc(col, aggs):
        # explode_outer keeps docs whose n-gram array is empty (fewer than
        # n words) as one g=NULL row; c counts only real grams, so the
        # doc survives the joins with zero-valued metrics
        return (
            base.select("doc_id", F.explode_outer(col).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.when(F.col("g").isNotNull(), 1)).alias("c"))
            .groupBy("doc_id")
            .agg(*aggs)
        )

    w = _per_doc(
        "w1",
        [F.sum("c").alias("n_words"), F.count("g").alias("n_distinct")],
    )
    g2 = _per_doc(
        "w2", [F.sum("c").alias("n_g2"), F.max("c").alias("top_g2")]
    )
    g5 = _per_doc(
        "w5",
        [
            F.sum("c").alias("n_g5"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_g5"),
        ],
    )
    out = w.join(g2, "doc_id").join(g5, "doc_id")
    frac = lambda num, den: F.round(
        num.cast("double") / F.greatest(den, F.lit(1)).cast("double"), 6
    )
    return out.select(
        "doc_id",
        F.col("n_words"),
        frac(F.col("n_words") - F.col("n_distinct"), F.col("n_words")).alias("dup_word_frac"),
        frac(F.col("top_g2"), F.col("n_g2")).alias("top_2gram_frac"),
        frac(F.col("dup_g5"), F.col("n_g5")).alias("dup_5gram_frac"),
    )


def repetition_filter(docs, text_col: str = "text",
                      max_dup_word_frac: float = 0.9,
                      max_top_2gram_frac: float = 0.2,
                      max_dup_5gram_frac: float = 0.3):
    """Drop documents failing the repetition thresholds (Gopher-style
    pre-training filter); one semi-join against the metrics table."""
    keep = repetition_features(docs, text_col).filter(
        (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_2gram_frac") <= max_top_2gram_frac)
        & (F.col("dup_5gram_frac") <= max_dup_5gram_frac)
    ).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")


# ----------------------------------------------------------------- tf-idf


def tfidf_top_terms(docs, text_col: str = "text", k: int = 5,
                    n_docs: int | None = None):
    """Top-k TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1))+1).

    Shape at scale: term frequencies are one shuffle on (doc_id, term)
    with map-side combine; document frequencies derive from the tf table
    (already unique per doc/term) with one shuffle on term; the tf ⋈ df
    join is on the vocabulary — small relative to the corpus, broadcast
    under AQE. Ordering uses the ROUNDED score (6 dp) with the term as
    tiebreak so the top-k cut is deterministic and engine-independent.

    `n_docs` avoids the corpus count action when the caller already
    knows it (at 10^12 docs it is table metadata)."""
    if n_docs is None:
        n_docs = docs.count()
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tf = (
        docs.select("doc_id", F.explode(words).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    scored = tf.join(df, "term").select(
        "doc_id", "term",
        F.round(F.col("tf").cast("double") * idf, 6).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", "rank")
    )


# ------------------------------------------------ winnowing (Schleimer 2003)


def winnow_gram_hashes(text: Column, k: int = 5) -> Column:
    """Array of word ``k``-gram hashes in position order (xxhash64 of the
    space-joined gram, JVM-side). Empty array for docs shorter than ``k``
    words.

    Built as a zip_with chain over shifted word arrays (the
    ``dedup.shingles`` construction, kept non-distinct and in position
    order): the ``transform(sequence, i -> slice(words, i, k))`` form
    re-evaluates the captured normalize+split per element — measured
    5-10x slower on long documents. zip_with pads the tail with nulls
    (concat of null is null); the final slice drops them, and the hash
    transform runs over the materialized gram array once."""
    words = F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " ")
    acc = words
    for j in range(1, k):
        shifted = F.slice(words, j + 1, F.size(words))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    nh = F.size(words) - (k - 1)
    grams = F.when(nh >= 1, F.slice(acc, 1, nh)).otherwise(
        F.array().cast("array<string>")
    )
    return F.transform(grams, lambda g: F.xxhash64(g))


def winnow_fingerprints(docs, k: int = 5, w: int = 4,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Robust winnowing (Schleimer/Wilkerson/Aiken 2003, the MOSS
    fingerprint selection): slide a window of ``w`` consecutive k-gram
    hashes over each document and keep the minimum hash per window,
    rightmost occurrence on ties; overlapping windows re-selecting the
    same position collapse to one fingerprint. Guarantees every shared
    substring of length >= k + w - 1 words contributes at least one
    common selected fingerprint between two documents — the property
    that makes the *selected subset* (~1/w of all grams) sufficient for
    plagiarism/overlap detection.

    Returns exploded ``(doc_id, pos, fp)`` rows, one per selected
    fingerprint (``pos`` = 0-based gram position).

    Scale shape: selection is pure per-row array math (whole-stage
    codegen, no shuffle, no Python); the explode multiplies rows by
    ~n_grams/w, a w-fold REDUCTION over indexing every gram. Documents
    shorter than one window degrade to the global-min fingerprint.
    """
    hashes = winnow_gram_hashes(F.col(text_col), k)
    d = docs.select(F.col(id_col).alias("doc_id"), hashes.alias("hs"))
    nh = F.size(F.col("hs"))
    nw = F.greatest(nh - (w - 1), F.lit(1))
    # per window j (0-based): min over struct(hash, -pos) = min hash,
    # rightmost position on ties; guard the tail for the degenerate
    # shorter-than-w case via least(j+w, nh)
    sel = F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda j: F.array_min(
            F.transform(
                F.sequence(j, F.least(j + F.lit(w), nh) - 1),
                lambda p: F.struct(
                    F.element_at(F.col("hs"), p + 1).alias("h"),
                    (-p).alias("negp"),
                ),
            )
        ),
    )
    fps = F.array_distinct(
        F.transform(sel, lambda s: F.struct((-s["negp"]).cast("int").alias("pos"),
                                            s["h"].alias("fp")))
    )
    return (
        d.filter(nh >= 1)
        .select("doc_id", F.explode(fps).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    )


def winnow_matches(docs, k: int = 5, w: int = 4, min_shared: int = 2,
                   max_df: int = 10, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Document-overlap candidates from shared winnowing fingerprints:
    pairs (a < b) sharing >= ``min_shared`` distinct selected
    fingerprints. Fingerprints selected in more than ``max_df``
    documents (boilerplate) are dropped BEFORE the self-join, bounding
    the join at df^2 per fingerprint instead of corpus-quadratic — same
    inverted-index cap discipline as ``ngram_jaccard``."""
    fps = winnow_fingerprints(docs, k=k, w=w, text_col=text_col,
                              id_col=id_col).select("doc_id", "fp").distinct()
    df_ok = (
        fps.groupBy("fp").agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    rare = fps.join(df_ok, "fp")
    a = rare.alias("a")
    b = rare.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count_distinct(F.col("a.fp")).cast("int").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ------------------------------------------------------- sequence packing


def pack_sequences(docs, seq_len: int = 2048, text_col: str = "text",
                   id_col: str = "doc_id", partitions: int | None = None):
    """GPT-style sequence packing: concatenate every document (plus one
    EOS token each) in deterministic ``id_col`` order into one global
    token stream, then chunk that stream into fixed ``seq_len`` training
    sequences. Returns one row per document: its global token offset and
    which chunks it lands in —
    ``(doc_id, n_tokens, tok_start, first_chunk, last_chunk, n_chunks)``.

    Scale shape: the global running offset is NOT a single-partition
    ``ORDER BY`` window (which would serialize 10^12 rows through one
    task). It is the classic two-pass distributed prefix sum:

      1. range-partition + sort by ``id_col`` (one shuffle, the only
         full-data movement),
      2. per-partition token totals — one tiny row per partition — are
         collected and turned into per-partition base offsets,
      3. the within-partition running sum (a window PARTITIONED by the
         physical partition id, so it never crosses executors) is added
         to the broadcast base offset.

    The partitioned frame is persisted between pass 1 and pass 2 so the
    physical partition ids are identical in both (range-boundary
    sampling is not re-run). Callers streaming the result at full scale
    should unpersist via the returned DataFrame's lineage once consumed.
    """
    spark = docs.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        (whitespace_token_count(F.col(text_col)) + F.lit(1)).alias("n_tokens"),
    )
    parted = (
        toks.repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    per_part = sorted(
        parted.groupBy("pid").agg(F.sum("n_tokens").alias("t")).collect(),
        key=lambda r: r.pid,
    )
    base, run = {}, 0
    for r in per_part:
        base[r.pid] = run
        run += r.t
    if base:
        base_off = F.element_at(
            F.create_map(*[F.lit(v) for kv in base.items() for v in kv]),
            F.col("pid"),
        )
    else:
        base_off = F.lit(0)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + base_off).cast("long")
    out = parted.select("doc_id", "n_tokens", start.alias("tok_start"))
    first = F.floor(F.col("tok_start") / seq_len).cast("int")
    last = F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / seq_len).cast("int")
    return out.select(
        "doc_id", "n_tokens", "tok_start",
        first.alias("first_chunk"), last.alias("last_chunk"),
        (last - first + 1).cast("int").alias("n_chunks"),
    )
