"""Distributed BPE tokenizer learning (Sennrich et al. 2016).

Byte-pair-encoding merges are learned from the corpus word-frequency
table, which is tiny next to the corpus itself (distinct words, not
tokens): the heavy step — counting words across 100 TB of text — is one
map-side-combined shuffle, and each merge iteration then runs over the
word table only.

* ``word_freqs`` — distinct words with counts (the BPE training input).
* ``pair_counts`` — adjacent-symbol pair frequencies weighted by word
  count, for the current symbolization. Pure Column expressions.
* ``learn_bpe`` — the iterative driver loop: k times (count pairs →
  take the argmax pair → apply the merge to every word's symbol
  string). Each iteration is two small Spark jobs over the cached word
  table; the merge itself is a JVM ``regexp_replace`` (left-to-right
  non-overlapping — exactly BPE's greedy application order).

The per-merge argmax is deterministic: ties break on the pair string.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.textops.selection import _words


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) across the corpus — one explode + one shuffle."""
    return (
        docs.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _symbolize(word_col) -> "F.Column":
    """Space-joined character symbols: 'the' -> 't h e'."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(word_col)),
            lambda i: F.substring(word_col, i, 1),
        ),
        " ",
    )


def pair_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Adjacent-pair frequencies over the current symbolization,
    weighted by word count: (pair, n)."""
    s = F.split(F.col(syms_col), " ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(s) - 2),
        lambda i: F.concat_ws(" ", F.element_at(s, i + 1), F.element_at(s, i + 2)),
    )
    return (
        words.select(
            F.explode(F.when(F.size(s) >= 2, pairs).otherwise(F.array())).alias(
                "pair"
            ),
            "n",
        )
        .groupBy("pair")
        .agg(F.sum("n").alias("n"))
    )


def encode_words(
    words: DataFrame, merges: list[str], word_col: str = "word"
) -> DataFrame:
    """(word, toks) mapping: the learned merges applied in rank order to
    each distinct word. Sequential full application in rank order is
    equivalent to the reference's priority-queue encode: a merge's
    operands are tokens from strictly earlier merges, and fusing a pair
    never creates a NEW adjacency of two older tokens, so by the time
    merge k runs everything it can consume is fully formed. Each merge
    is one JVM regexp_replace (zero-width boundary guards, so adjacent
    merge sites in a run like 'a a a a' all fuse in one pass,
    left-to-right greedy — BPE's application order)."""
    cur = words.select(
        F.col(word_col).alias("word"),
        _symbolize(F.col(word_col)).alias("syms"),
    )
    for j, pair in enumerate(merges):
        a, b = pair.split(" ")
        pat = r"(?<![^ ])" + re.escape(a) + " " + re.escape(b) + r"(?![^ ])"
        cur = cur.select(
            "word", F.regexp_replace("syms", pat, a + b).alias("syms")
        )
        if (j + 1) % 16 == 0:
            cur = cur.localCheckpoint(eager=True)
    return cur.select("word", F.split("syms", " ").alias("toks"))


def bpe_encode(
    docs: DataFrame,
    merges: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a learned merge list: (doc_id,
    n_tokens, tokens). The merge chain runs over the DISTINCT-words
    table only (tiny next to the corpus); the corpus-sized work is one
    posexplode + one equi-join on word (AQE broadcasts when the vocab
    is small) + one hash aggregate on doc_id that re-assembles the
    token stream in word order via array_sort on (pos, toks) structs."""
    vocab_map = encode_words(
        docs.select(
            F.explode(_words(text_col)).alias("word")
        ).distinct(),
        merges,
    )
    doc_words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_words(text_col)).alias("pos", "word"),
    )
    return (
        doc_words.join(vocab_map, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "toks"))
                    ),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
        .select(
            "doc_id", F.size("tokens").alias("n_tokens"), "tokens"
        )
    )


def learn_bpe(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> list[str]:
    """Learn ``n_merges`` BPE merges; returns them in order ('a b' means
    symbols a and b fuse into ab). The word table is cached once; each
    iteration appends one regexp_replace to the plan, and every 16
    merges the symbolization is localCheckpoint'ed so the plan (and the
    re-executed replace chain) stays bounded for large vocabularies."""
    words = (
        word_freqs(docs, text_col)
        .select(_symbolize(F.col("word")).alias("syms"), "n")
        .persist()
    )
    merges: list[str] = []
    try:
        cur = words
        for _ in range(n_merges):
            top = (
                pair_counts(cur)
                .orderBy(F.desc("n"), "pair")
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < 2:
                break
            pair = top[0]["pair"]
            merges.append(pair)
            a, b = pair.split(" ")
            # word-boundary-safe, left-to-right, non-overlapping — BPE's
            # greedy application order
            pat = (
                r"(?<![^ ])" + re.escape(a) + " " + re.escape(b) + r"(?![^ ])"
            )
            cur = cur.select(
                F.regexp_replace("syms", pat, a + b).alias("syms"), "n"
            )
            if len(merges) % 16 == 0:
                cur = cur.localCheckpoint(eager=True)
    finally:
        words.unpersist()
    return merges
