"""URL canonicalization + dedup — the crawl-corpus identity key.

Web-scale training corpora (C4, RefinedWeb, Dolma) dedup first on a
*canonical URL* before any content hashing: the same page arrives under
http/https, with/without `www.`, with default ports, fragments, tracking
parameters, and shuffled query order. Canonicalizing is a pure string
map (zero shuffles); the dedup itself is one shuffle on the canonical
key — at 100 TB this is the cheapest 30-50% row cut in the pipeline and
runs entirely in whole-stage codegen (regexp + array built-ins, no
Python).

Canonical form produced here (the C4/common-crawl recipe):
  - scheme dropped (http/https treated as the same resource)
  - host lower-cased, leading `www.` stripped, default :80/:443 stripped
  - fragment (`#...`) dropped
  - tracking params (`utm_*`, `fbclid`, `gclid`, `ref`) dropped
  - remaining query params sorted (order-insensitive identity)
  - trailing `/` on the path stripped (but a bare host keeps its root)

Reference parity: none (the reference ingests OSM, not a crawl); this is
a training-data-pipeline addition per the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ONE regex splits the URL into (scheme, host[:port], path, query) — run
# once per row via regexp_replace into a \x01-delimited form (three
# separate regexp_extract calls would re-run the full pattern 3x per row,
# which matters in the op this module positions as the cheapest corpus cut)
_URL_RE = r"^(?:([A-Za-z][A-Za-z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def canonical_url(url: Column) -> Column:
    """Canonical identity string for a URL — pure Column expressions.

    Port stripping is SCHEME-AWARE: :80 drops only for http (or a bare
    scheme-less URL), :443 only for https — http://host:443 is a
    different server than https://host and must NOT merge with it."""
    parts = F.split(
        F.regexp_replace(F.trim(url), _URL_RE, "$1\x01$2\x01$3\x01$4"),
        "\x01",
    )
    scheme = F.lower(F.element_at(parts, 1))
    host = F.lower(F.element_at(parts, 2))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (
        F.when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .when((scheme == "http") | (scheme == ""),
              F.regexp_replace(host, r":80$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.element_at(parts, 3), r"/+$", "")
    params = F.filter(
        F.split(F.element_at(parts, 4), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", order_col: str = "doc_id"
) -> DataFrame:
    """Keep the first row (by `order_col`) per canonical URL.

    One shuffle on the canonical key; the window never sees more rows
    per partition than the duplicate multiplicity of one URL, so no
    skew beyond genuinely viral URLs (which AQE splits)."""
    canon = df.withColumn("canon_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canon_url").orderBy(order_col)
    return (
        canon.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def url_dup_groups(
    df: DataFrame, url_col: str = "url", order_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-group report: (canon_url, n, keep_id) for every canonical
    URL that appears more than once — one aggregate, no window."""
    canon = df.select(
        canonical_url(F.col(url_col)).alias("canon_url"), F.col(order_col)
    )
    return (
        canon.groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n"),
            F.min(order_col).alias("keep_id"),
        )
        .filter(F.col("n") > 1)
    )
