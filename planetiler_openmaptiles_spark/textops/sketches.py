"""Distributed cardinality / frequency sketches, built from scratch in
pure Catalyst so every register is deterministic and oracle-replayable.

At 100 TB you cannot afford exact ``count_distinct`` per group in an
exploratory profile, and Spark's built-in ``approx_count_distinct``
(HLL++) is a black box no other engine can replay. These operators
implement the published algorithms directly over an engine-portable hash
(first 32 bits of md5, the same portability trick ``selection.py`` uses):

* ``hll_distinct`` — Flajolet et al. 2007 HyperLogLog: p-bit bucket from
  the hash top bits, rank-of-first-one from the low bits (computed with
  INTEGER bit-length, never floating log2, so both engines agree
  bit-for-bit), one groupBy max per register, harmonic-mean estimate with
  the small-range linear-counting correction. The register sum is a sum
  of dyadic rationals (2^-k, k <= 25) — exactly representable in double,
  so the estimate is reproducible across engines and partitionings.
* ``cms_counts`` / ``cms_heavy_hitters`` — Cormode & Muthukrishnan 2005
  Count-Min: d independent md5-salted rows of w counters, point estimate
  = min over rows. Counters are integers — exact replay.

Sketch size is O(m) / O(d*w) per group regardless of input size: the
shuffle carries registers, not values — the whole point at 10^12 rows.

Reference analog: none (planetiler needs no sketches) — north-rule
training-data-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash32(col) -> F.Column:
    """Engine-portable 32-bit hash: first 8 hex digits of md5."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


def hll_registers(df: DataFrame, value_col: str, group_cols: list[str],
                  p: int = 8) -> DataFrame:
    """(group_cols..., bucket, reg) — the max first-one rank per bucket.
    bucket = top ``p`` bits of the 32-bit hash; rank computed over the low
    ``32 - p`` bits via integer bit length (conv to base-2 string), so
    there is no floating-point log anywhere."""
    w_bits = 32 - p
    h = _hash32(F.col(value_col))
    bucket = F.shiftright(h, w_bits)  # top p bits
    low = h.bitwiseAND(F.lit((1 << w_bits) - 1))
    # rank = (position of first 1-bit in the w-bit word) = w - bitlen + 1;
    # all-zero word -> w + 1
    bitlen = F.length(F.conv(low.cast("string"), 10, 2))
    rank = F.when(low == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - bitlen + 1
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("reg"))
    )


def hll_distinct(df: DataFrame, value_col: str, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """HyperLogLog distinct estimate per group:
    ``(group_cols..., hll_estimate)``, estimate rounded to 4 decimals.

    Shape: one shuffle to the (group, bucket) registers (map-side
    combined max), one tiny groupBy over <= 2^p register rows per group.
    The alpha constant and the <= 2.5m linear-counting correction follow
    the paper; 32-bit-range correction is omitted (hash space 2^32,
    corpus cardinalities here are far below 2^27 where it activates).
    """
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


def hll_estimate_from_registers(regs: DataFrame, group_cols: list[str],
                                p: int = 8) -> DataFrame:
    """Finish a register table ``(group_cols..., bucket, reg)`` into the
    HLL estimate — split out so a STREAMING pre-aggregation (registers
    maintained incrementally under a watermark; max is an algebraic
    streaming aggregate) can be finished batch-side on the sink table
    (Structured Streaming allows one aggregation per query)."""
    m = 1 << p
    # Flajolet et al. Fig. 3: exact alpha for small m; the closed form is
    # the m >= 128 asymptote
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s"),
        F.count("*").alias("nz"),
    )
    # buckets never hit contribute 2^0 = 1 each; V = number of zero registers
    s_full = F.col("s") + (F.lit(m) - F.col("nz"))
    v = F.lit(m) - F.col("nz")
    raw = F.lit(alpha * m * m) / s_full
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_estimate"))


def cms_counts(df: DataFrame, value_col: str, group_cols: list[str] | None = None,
               d: int = 4, w: int = 1024) -> DataFrame:
    """Count-Min sketch table: ``(group_cols..., row, cell, c)`` — d
    md5-salted hash rows of w counters each. One explode by d (cheap: d
    small) + one map-side-combined groupBy; the sketch is d*w rows per
    group no matter how many values went in."""
    group_cols = group_cols or []
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    base = df.select(*group_cols, F.col(value_col).alias("v"), rows)
    cell = F.pmod(
        _hash32(F.concat(F.col("row").cast("string"), F.lit("|"), F.col("v"))),
        F.lit(w),
    )
    return (
        base.select(*group_cols, "row", cell.alias("cell"))
        .groupBy(*group_cols, "row", "cell")
        .agg(F.count("*").alias("c"))
    )


def cms_heavy_hitters(df: DataFrame, value_col: str, candidates: DataFrame,
                      d: int = 4, w: int = 1024, k: int = 20) -> DataFrame:
    """Point-query the sketch for each candidate value and return the top
    ``k`` by estimated count: ``(value, est, rank)``. ``candidates`` is a
    one-column DataFrame of values to probe (at scale: a sampled or
    domain-known candidate set — CMS answers point queries, it does not
    enumerate). est >= true count always (one-sided error)."""
    sk = cms_counts(df, value_col, None, d, w)
    probes = candidates.select(F.col(candidates.columns[0]).alias("value")).distinct()
    pr = probes.select(
        "value", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    )
    cell = F.pmod(
        _hash32(F.concat(F.col("row").cast("string"), F.lit("|"), F.col("value"))),
        F.lit(w),
    )
    est = (
        pr.select("value", "row", cell.alias("cell"))
        .join(sk, ["row", "cell"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: parallel partial
    # top-k per partition), NOT an unpartitioned rank window — that would
    # serialize the whole candidate table through one task. The rank
    # window below runs over only the k surviving rows.
    from pyspark.sql import Window

    top = est.orderBy(F.desc("est"), F.asc("value")).limit(k)
    wnd = Window.orderBy(F.desc("est"), F.asc("value"))
    return top.withColumn("rank", F.row_number().over(wnd)).select(
        "value", "est", "rank"
    )


def _bloom_positions(m: int, k: int):
    """k salted bit positions for the value column ``v``: the explode
    column (i) and the position expression over (i, v)."""
    i = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    pos = F.pmod(
        _hash32(F.concat(F.col("i").cast("string"), F.lit("|"), F.col("v"))),
        F.lit(m),
    )
    return i, pos


def bloom_build(values: DataFrame, value_col: str, m: int = 8192,
                k: int = 4) -> DataFrame:
    """Build a Bloom filter as packed 64-bit words: ``(word, bits)``,
    m/64 rows max — the broadcastable membership structure for pruning a
    10^12-row anti-join before it shuffles (ship the filter to the big
    side's mappers; only maybe-members enter the exchange). One explode
    by k + one map-side-combined bit_or aggregate."""
    i, pos = _bloom_positions(m, k)
    p = values.select(F.col(value_col).alias("v"), i).select(pos.alias("p"))
    word = F.floor(F.col("p") / 64).cast("long")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
    return (
        p.select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(probes: DataFrame, value_col: str, bloom: DataFrame,
                m: int = 8192, k: int = 4,
                keep_cols: list[str] | None = None) -> DataFrame:
    """Probe the packed filter: adds ``maybe_member`` — true iff ALL k
    salted bits are set (Bloom guarantee: no false negatives; false
    positives at the designed rate). The filter is broadcast; the probe
    side never shuffles."""
    keep_cols = keep_cols or [c for c in probes.columns if c != value_col]
    i, pos = _bloom_positions(m, k)
    pp = probes.select(*keep_cols, F.col(value_col).alias("v"), i).select(
        *keep_cols, "v", "i", pos.alias("p")
    )
    word = F.floor(F.col("p") / 64).cast("long")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
    hit = (
        pp.select(*keep_cols, "v", "i", word.alias("word"), mask.alias("mask"))
        .join(F.broadcast(bloom), "word", "left")
        .select(
            *keep_cols, "v",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
             != 0).cast("int").alias("bit_set"),
        )
    )
    # all-k-bits-set via min, not sum == k: duplicate probe rows (same
    # value appearing N times) put N*k bit rows in the group, and a sum
    # test would declare a TRUE member absent — a false negative, the one
    # error class a Bloom filter must never make
    return (
        hit.groupBy(*keep_cols, "v")
        .agg((F.min("bit_set") == 1).alias("maybe_member"))
    )
