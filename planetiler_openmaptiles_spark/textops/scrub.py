"""Corpus-hygiene operators: PII redaction and benchmark decontamination.

Both are standard steps in large-scale training-data pipelines (CCNet /
FineWeb-style scrubbing; GPT-3 appendix-C style eval decontamination) and
both stay entirely in Catalyst: regexp_replace / regexp_count for the
scrub, a broadcast semi-join on word n-gram hashes for decontamination.

Scale (100 TB): redaction is a pure map — no shuffle at all. Decontam
joins the train-side exploded n-grams against the EVAL set's grams; eval
benchmarks are tiny (MBs), so the gram dimension broadcasts and the whole
pass is one scan + one groupBy doc_id for the hit count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text

# Patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB oracle): no lookbehind, no backrefs. Order matters — emails are
# redacted before IPs/phones so a later pattern never eats half of one.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ()]{7,}\d", "<PHONE>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone-number runs, in that order. Returns
    the input plus (n_email, n_ip, n_phone, redacted) — counts are taken
    BEFORE each replacement so they report what was actually removed."""
    out = docs
    col = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        cname = f"n_{name if name != 'ipv4' else 'ip'}"
        out = out.withColumn(cname, F.regexp_count(col, F.lit(pat)).cast("int"))
        col = F.regexp_replace(col, pat, token)
        counts.append(cname)
    return out.withColumn("redacted", col)


def eval_ngrams(eval_docs: DataFrame, text_col: str = "text",
                n: int = 8) -> DataFrame:
    """Distinct word n-grams of the eval/benchmark set (one column `gram`).
    Docs shorter than n words contribute nothing — a sub-n-gram match is
    not contamination under the GPT-3 rule."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    from .dedup import shingles

    return (
        eval_docs.filter(F.size(words) >= n)
        .select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def decontaminate(train: DataFrame, eval_docs: DataFrame,
                  text_col: str = "text", n: int = 8) -> DataFrame:
    """Flag training documents sharing any word n-gram with the eval set
    (GPT-3 appendix-C / PaLM-style decontamination). Returns
    (doc_id, n_contaminated_ngrams, contaminated) for EVERY train doc —
    the count is over the doc's DISTINCT grams that hit the eval set.

    The eval gram dimension is explicitly broadcast: benchmark suites are
    MB-scale, so at 100 TB this is one scan of the train side with a
    map-side hash probe — no shuffle on the gram key."""
    from .dedup import shingles

    words = F.split(normalize_text(F.col(text_col)), " ")
    grams = (
        train.filter(F.size(words) >= n)
        .select("doc_id", F.explode(shingles(F.col(text_col), n)).alias("gram"))
    )
    hits = (
        grams.join(F.broadcast(eval_ngrams(eval_docs, text_col, n)), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_contaminated_ngrams"))
    )
    return train.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_contaminated_ngrams", F.lit(0)).cast("int")
        .alias("n_contaminated_ngrams"),
        (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )
