"""Deduplication operators for large-scale text corpora.

All operators are pure DataFrame transformations over a `documents` table
with columns (doc_id, text). Everything except the hash math is Catalyst
built-ins; hashing uses Spark's own xxhash64/crc32 so the hot path stays in
whole-stage codegen — no Python in any of these.

Scale notes (100 TB): exact dedup is one shuffle on the content hash;
MinHash-LSH shuffles once on (band, bucket) — the classic near-dup pipeline
(shingle → minhash → band → bucket-join) with the candidate verification
joined back on doc pairs. Skewed buckets (boilerplate) are capped by
`max_bucket` before the pair join, the standard guard against quadratic
bucket blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------- exact dedup


def normalize_text(col):
    """Whitespace-collapse + lowercase (canonical form for hashing)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: returns
    (content_hash, n_docs, doc_ids) for groups with n_docs > 1.

    Groups on (hash, normalized text): the 64-bit hash drives the shuffle
    key; the text column disambiguates hash collisions at negligible cost
    (a collision would otherwise silently merge distinct documents)."""
    norm = normalize_text(F.col(text_col))
    return (
        docs.withColumn("content_hash", F.xxhash64(norm))
        .withColumn("_norm", norm)
        .groupBy("content_hash", "_norm")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
        .drop("_norm")
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one representative (lowest doc_id) per normalized content
    (hash partitions the shuffle; text breaks hash-collision ties)."""
    norm = normalize_text(F.col(text_col))
    w = Window.partitionBy("content_hash", "_norm").orderBy(F.col("doc_id").asc())
    return (
        docs.withColumn("content_hash", F.xxhash64(norm))
        .withColumn("_norm", norm)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_norm")
    )


def dedup_against(
    new_docs: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    fuzzy: bool = False,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Incremental shard dedup: drop from ``new_docs`` everything already
    present in ``existing`` — the daily-crawl append shape, where the
    existing corpus is only SCANNED for its keys, never re-grouped.

    Exact stage: left_anti join on (xxhash64(norm), norm) — at 100 TB
    the existing side is a column-pruned scan of two columns and the
    anti-join shuffles each side once (or uses a pre-bucketed layout
    for free co-location). With ``fuzzy=True`` a second left_anti on
    MinHash LSH (band, bucket) keys also removes near-duplicates of
    existing documents (recall bounded by the LSH band curve, same
    signature parameters as ``minhash_lsh_pairs``). Survivors of BOTH
    stages are then exact-deduped WITHIN the shard (keep-first), so the
    output appends cleanly."""
    norm = normalize_text(F.col(text_col))
    ex_keys = existing.select(
        F.xxhash64(norm).alias("content_hash"), norm.alias("_norm")
    ).distinct()
    survivors = (
        new_docs.withColumn("content_hash", F.xxhash64(norm))
        .withColumn("_norm", norm)
        .join(ex_keys, ["content_hash", "_norm"], "left_anti")
        .drop("content_hash", "_norm")
    )
    if fuzzy:
        ex_bk = (
            minhash_bands(
                existing, text_col, num_hashes=num_hashes, bands=bands
            )
            .select("band", "bucket")
            .distinct()
        )
        colliding = (
            minhash_bands(
                survivors, text_col, num_hashes=num_hashes, bands=bands
            )
            .join(ex_bk, ["band", "bucket"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        survivors = survivors.join(colliding, "doc_id", "left_anti")
    return exact_dedup(survivors, text_col)


# ------------------------------------------------------------------ shingles


def shingles(text_col, n: int = 5):
    """Array of word n-gram shingle strings, JVM-side.

    Built as a zip_with chain over shifted copies of the words array rather
    than ``transform(sequence(...), i -> slice(words, i+1, n))``: lambda
    bodies re-evaluate captured expressions PER ELEMENT, so the transform
    form re-ran the normalize+split once per shingle (quadratic in document
    length — measured 5-10x slower). zip_with evaluates its collection
    arguments once. Output is byte-identical (first-occurrence-distinct,
    index order)."""
    words = F.split(normalize_text(text_col), " ")
    # acc[i] = words[i] .. words[i+j] joined by " "; entries past L-j null
    acc = words
    for j in range(1, n):
        shifted = F.slice(words, j + 1, F.size(words))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    k = F.size(words) - (n - 1)
    return F.when(
        F.size(words) < n, F.array(F.array_join(words, " "))
    ).otherwise(F.array_distinct(F.slice(acc, 1, k)))


# --------------------------------------------------------------- minhash LSH

# deterministic odd multipliers for the k hash functions
def _mh_seeds(k: int) -> list[int]:
    out, x = [], 0x9E3779B97F4A7C15
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(x | 1)
    return out


def minhash_signature(text_col, num_hashes: int = 64, shingle_n: int = 5):
    """Array<long> MinHash signature — JVM-side: per hash i,
    min over shingles of xxhash64(shingle, seed_i).

    Single pass over the shingle array: one transform computes all k hashes
    per shingle, one aggregate folds the element-wise min. (The per-seed
    ``array_min(transform(sh, ...))`` form evaluated the whole shingle
    construction k times per row.)"""
    sh = shingles(text_col, shingle_n)
    seeds = [s % (1 << 31) for s in _mh_seeds(num_hashes)]
    per_shingle = F.transform(
        sh, lambda s: F.array(*[F.xxhash64(s, F.lit(seed).cast("int")) for seed in seeds])
    )
    max_long = F.lit((1 << 63) - 1).cast("long")
    return F.aggregate(
        per_shingle,
        F.array_repeat(max_long, num_hashes),
        lambda acc, hs: F.zip_with(acc, hs, lambda a, b: F.least(a, b)),
    )


def minhash_bands(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
) -> DataFrame:
    """(doc_id, band, bucket) rows — the banded-signature half of MinHash
    LSH, exposed separately so the bucket-join half can be oracle-replayed
    over a checkpointed copy of this table."""
    rows_per_band = num_hashes // bands
    sig = docs.select("doc_id", minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"))
    band_cols = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ).alias("bucket"),
            ),
        )
    )
    return sig.select("doc_id", band_cols.alias("bb")).select(
        "doc_id", "bb.band", "bb.bucket"
    )


def minhash_pairs_from_bands(banded: DataFrame, max_bucket: int = 200) -> DataFrame:
    """Bucket-join half of MinHash LSH over a (doc_id, band, bucket) table."""
    # cap pathological buckets (boilerplate skew guard)
    wb = Window.partitionBy("band", "bucket").orderBy("doc_id")
    banded = banded.withColumn("_rn", F.row_number().over(wb)).filter(
        F.col("_rn") <= max_bucket
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    max_bucket: int = 200,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH:
    (doc_a, doc_b, n_bands) with doc_a < doc_b."""
    return minhash_pairs_from_bands(
        minhash_bands(docs, text_col, num_hashes, bands, shingle_n), max_bucket
    )


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, text_col: str = "text", shingle_n: int = 5
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs (the refine
    step after LSH): returns (doc_a, doc_b, jaccard)."""
    sh = docs.select(
        F.col("doc_id"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return j.select(
        "doc_a", "doc_b",
        (inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")).alias("jaccard"),
    )


# ------------------------------------------------------------------ simhash


def simhash(text_col, bits: int = 64, shingle_n: int = 2):
    """64-bit SimHash fingerprint — JVM-side, single pass: one aggregate
    whose accumulator is the array of 64 bit-vote counters (the original
    one-aggregate-per-bit form scanned the shingle array 64×)."""
    sh = shingles(text_col, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    idx = F.sequence(F.lit(0), F.lit(bits - 1))
    powers = F.array(*[F.lit(1 << i if i < 63 else -(1 << 63)).cast("long") for i in range(bits)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(idx, lambda i: F.when(F.bit_get(h, i) == 1, 1).otherwise(-1)),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    block_bits: int = 16,
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-dup pairs: hamming(simhash_a, simhash_b) <= max_hamming.

    Candidate generation is the Manku/Jain/Sarma multi-table rotation: the
    64-bit fingerprint splits into 64/block_bits blocks; by pigeonhole any
    pair within hamming <= (blocks-1) shares at least one block exactly, so
    a self-join per (block index, block value) finds every qualifying pair
    (no recall loss, unlike a single prefix table). Buckets are capped at
    `max_bucket` docs (boilerplate skew guard, same policy as MinHash LSH);
    pairs found in several tables dedupe before the hamming refine."""
    return simhash_pairs_from_sigs(
        docs.select("doc_id", simhash(F.col(text_col)).alias("sim")),
        block_bits, max_hamming, max_bucket,
    )


def simhash_pairs_from_sigs(
    sh: DataFrame,
    block_bits: int = 16,
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Block-join + hamming refine over a (doc_id, sim) signature table
    (split out so the join logic can be oracle-replayed in DuckDB)."""
    nblocks = 64 // block_bits
    mask = (1 << block_bits) - 1
    blocks = F.array(
        *[
            F.shiftright(F.col("sim"), t * block_bits).bitwiseAND(F.lit(mask))
            for t in range(nblocks)
        ]
    )
    banded = sh.select(
        "doc_id", "sim", F.posexplode(blocks).alias("tbl", "block")
    )
    wb = Window.partitionBy("tbl", "block").orderBy("doc_id")
    banded = banded.withColumn("_rn", F.row_number().over(wb)).filter(
        F.col("_rn") <= max_bucket
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["tbl", "block"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------- paragraph dedup


def paragraph_chunks(docs: DataFrame, text_col: str = "text",
                     chunk_words: int = 10) -> DataFrame:
    """Explode documents into their dedup units: real paragraphs when the
    text has blank-line structure, else tumbling `chunk_words`-word chunks
    (the corpus here is flat word streams). One row per
    (doc_id, chunk_idx, chunk, chunk_hash) — all JVM built-ins."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .withColumn("chunk_hash", F.xxhash64("chunk"))
    )


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    chunk_words: int = 10) -> DataFrame:
    """CCNet-style paragraph-level dedup: remove every corpus-wide duplicate
    paragraph except its first occurrence (ordered by doc_id, then position
    within the doc), then reassemble documents.

    Returns (doc_id, n_chunks, n_kept, dedup_text). Cost at 100 TB: ONE
    shuffle on the 64-bit chunk hash (window ranks occurrences; the chunk
    text rides along to break hash-collision ties), then one groupBy
    doc_id to reassemble — no joins, no driver state. The first-occurrence
    rule (rather than drop-all) keeps exactly one copy of boilerplate, the
    variant CCNet's shard-hash dedup approximates.
    """
    ex = paragraph_chunks(docs, text_col, chunk_words)
    w = Window.partitionBy("chunk_hash", "chunk").orderBy("doc_id", "chunk_idx")
    kept = ex.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_keep", F.col("_rn") == 1
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum(F.col("_keep").cast("int")).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"),
                                   F.struct("chunk_idx", "chunk"))
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


def line_frequency_filter(docs: DataFrame, text_col: str = "text",
                          chunk_words: int = 10,
                          max_dup: int = 2) -> DataFrame:
    """RefinedWeb-style line-frequency dedup: drop EVERY occurrence of a
    line whose corpus-wide frequency exceeds `max_dup` (navigation bars,
    cookie banners, boilerplate headers), then reassemble documents.

    Differs from paragraph_dedup (CCNet keep-first): boilerplate above
    the threshold is removed everywhere — the RefinedWeb/Dolma recipe for
    lines that carry no training signal in ANY copy. "Lines" here are
    the corpus's dedup units from paragraph_chunks (real paragraphs when
    the text has structure, tumbling word windows otherwise).

    Returns (doc_id, n_chunks, n_removed, filtered_text). Cost at
    100 TB: one shuffle on the 64-bit chunk hash (a count window over
    (hash, chunk) — text rides along to break hash collisions), then one
    groupBy doc_id to reassemble. No joins, no driver state; identical
    shuffle shape to paragraph_dedup so the two can share a stage."""
    ex = paragraph_chunks(docs, text_col, chunk_words)
    w = Window.partitionBy("chunk_hash", "chunk")
    kept = ex.withColumn("_n", F.count(F.lit(1)).over(w)).withColumn(
        "_keep", F.col("_n") <= max_dup
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum((~F.col("_keep")).cast("int")).cast("int").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"),
                                   F.struct("chunk_idx", "chunk"))
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("filtered_text"),
        )
    )


# ------------------------------------------------- exact-substring dedup


def substring_windows(docs: DataFrame, text_col: str = "text",
                      window: int = 40, stride: int = 20) -> DataFrame:
    """Fixed-stride character windows over each document: one row per
    (doc_id, s, sub, h) where `s` is the 1-based window start, `sub` the
    `window`-char substring and `h` its md5. Docs shorter than `window`
    emit nothing. All JVM built-ins (sequence/explode/substr/md5)."""
    text = F.col(text_col)
    offs = F.sequence(
        F.lit(1), (F.length(text) - window + 1).cast("int"), F.lit(stride)
    )
    sub = F.col("_t").substr(F.col("s"), F.lit(window))
    return (
        docs.filter(F.length(text) >= window)
        .select("doc_id", text.alias("_t"), F.explode(offs).alias("s"))
        .select("doc_id", F.col("s").cast("int").alias("s"),
                sub.alias("sub"), F.md5(sub).alias("h"))
    )


def exact_substring_spans(docs: DataFrame, text_col: str = "text",
                          window: int = 40, stride: int = 20) -> DataFrame:
    """Merged removal intervals for ExactSubstr-style dedup (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better"):
    every corpus-wide duplicated `window`-char run keeps its first
    occurrence (ordered by doc_id, then offset) and marks all later
    occurrences for excision. Returns (doc_id, ms, me): merged, 1-based,
    end-exclusive character intervals to remove.

    Scale: one shuffle on the window hash (row_number ranks occurrences;
    partitioning includes the 40-char substring so an md5 collision cannot
    merge distinct runs), then one shuffle on doc_id for the interval
    merge (classic gaps-and-islands: running max-end marks island breaks).
    Nothing is quadratic: a window duplicated d times costs d rows, and
    the keep-first rule needs no self-join — rank > 1 IS the removal set.
    """
    wins = substring_windows(docs, text_col, window, stride)
    occ = Window.partitionBy("h", "sub").orderBy("doc_id", "s")
    removed = (
        wins.withColumn("_rn", F.row_number().over(occ))
        .filter(F.col("_rn") > 1)
        .select("doc_id", "s", (F.col("s") + window).alias("e"))
    )
    by_doc = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(by_doc.rowsBetween(Window.unboundedPreceding, -1))
    isl = F.sum(
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    ).over(by_doc)
    return (
        removed.withColumn("_isl", isl)
        .groupBy("doc_id", "_isl")
        .agg(F.min("s").cast("int").alias("ms"), F.max("e").cast("int").alias("me"))
        .drop("_isl")
    )


def exact_substring_dedup(docs: DataFrame, text_col: str = "text",
                          window: int = 40, stride: int = 20) -> DataFrame:
    """Apply ExactSubstr span excision: cut every merged removal interval
    out of the text. Returns (doc_id, n_dup_spans, removed_chars,
    kept_len, dedup_text); untouched docs pass through with 0 spans.

    The rebuild is a single `F.aggregate` over the per-doc sorted interval
    array — the accumulator walks (cursor, kept-so-far), appending the gap
    before each interval and the tail after the last. Pure Catalyst: the
    interval array is small (spans per doc), so the fold stays cheap even
    on 100 TB inputs."""
    text = F.col(text_col)
    spans = exact_substring_spans(docs, text_col, window, stride)
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_dup_spans"),
        F.sum(F.col("me") - F.col("ms")).cast("int").alias("removed_chars"),
        F.array_sort(F.collect_list(F.struct("ms", "me"))).alias("_ivs"),
    )
    joined = docs.join(per_doc, "doc_id", "left")
    ivs = F.coalesce(
        F.col("_ivs"), F.expr("CAST(array() AS array<struct<ms:int,me:int>>)")
    )
    rebuilt = F.aggregate(
        ivs,
        F.struct(F.lit(1).cast("int").alias("pos"), F.lit("").alias("out")),
        lambda acc, iv: F.struct(
            iv["me"].alias("pos"),
            F.concat(
                acc["out"], text.substr(acc["pos"], iv["ms"] - acc["pos"])
            ).alias("out"),
        ),
        lambda acc: F.concat(
            acc["out"], text.substr(acc["pos"], F.length(text) - acc["pos"] + 1)
        ),
    )
    return joined.select(
        "doc_id",
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("int").alias("n_dup_spans"),
        F.coalesce(F.col("removed_chars"), F.lit(0)).cast("int").alias("removed_chars"),
        rebuilt.alias("dedup_text"),
    ).withColumn("kept_len", F.length("dedup_text").cast("int"))


def minhash_recall(
    docs: DataFrame,
    thresholds: tuple = (0.5, 0.7, 0.9),
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    max_bucket: int = 200,
    sample_frac: float = 1.0,
) -> DataFrame:
    """Dedup-index tuning harness: recall and precision of the banded
    MinHash-LSH candidate pairs against EXACT shingle-set Jaccard, per
    Jaccard threshold — the measurement loop a team runs to pick
    (num_hashes, bands) before committing a 100 TB dedup pass.

    Ground truth is all pairs sharing at least one shingle (pairs sharing
    none have Jaccard 0 and can never reach a positive threshold), built
    from the same inverted-index self-join shape as ``ngram_jaccard`` but
    deliberately UNCAPPED — a df cap would bias the truth set. That makes
    this stage quadratic in the worst case, which is why ``sample_frac``
    exists: evaluation runs on a deterministic md5-uniform document sample
    (exactly how you'd run it at production scale), never the full corpus.

    Returns one row per threshold:
    ``(threshold, n_true, n_hit, n_lsh, recall, precision)``.
    """
    if sample_frac < 1.0:
        u = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") / F.lit(4294967296.0)
        )
        docs = docs.filter(u < sample_frac)
    docs = docs.select("doc_id", text_col)

    sh = docs.select(
        "doc_id",
        F.explode(shingles(F.col(text_col), shingle_n)).alias("s"),
    ).select("doc_id", F.xxhash64("s").alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_int"))
    )
    truth = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b",
            (F.col("n_int") / (F.col("na") + F.col("nb") - F.col("n_int"))).alias("jac"),
        )
    )
    lsh = minhash_lsh_pairs(
        docs, text_col, num_hashes, bands, shingle_n, max_bucket
    ).select("doc_a", "doc_b", F.lit(1).alias("hit"))

    joined = truth.join(lsh, ["doc_a", "doc_b"], "left")
    aggs = []
    for i, t in enumerate(thresholds):
        aggs.append(F.count_if(F.col("jac") >= t).alias(f"t{i}"))
        aggs.append(
            F.count_if((F.col("jac") >= t) & F.col("hit").isNotNull()).alias(f"h{i}")
        )
    row = joined.agg(*aggs).crossJoin(
        lsh.agg(F.count("*").alias("n_lsh"))
    )
    per_t = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(t)).alias("threshold"),
                    F.col(f"t{i}").alias("n_true"),
                    F.col(f"h{i}").alias("n_hit"),
                )
                for i, t in enumerate(thresholds)
            ]
        )
    )
    out = row.select(per_t.alias("r"), "n_lsh").select(
        "r.threshold", "r.n_true", "r.n_hit", "n_lsh"
    )
    recall = F.when(
        F.col("n_true") > 0, F.round(F.col("n_hit") / F.col("n_true"), 6)
    ).otherwise(F.lit(1.0))
    precision = F.when(
        F.col("n_lsh") > 0, F.round(F.col("n_hit") / F.col("n_lsh"), 6)
    ).otherwise(F.lit(1.0))
    return out.select(
        "threshold", "n_true", "n_hit", "n_lsh",
        recall.alias("recall"), precision.alias("precision"),
    )
