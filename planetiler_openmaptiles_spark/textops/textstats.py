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
