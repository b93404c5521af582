"""Link-graph construction + PageRank over the document corpus.

Web-scale training pipelines weight crawled documents by graph centrality
(Common Crawl publishes harmonic/PageRank centrality per host and quality
pipelines consume it).  The sandbox corpus has no hyperlinks, so the graph
is derived from content: documents sharing a *rare* word n-gram (document
frequency <= max_df) are linked — the content-syndication graph that near-
duplicate text induces between pages.  Both stages are pure Catalyst:

* edge derivation — one explode + df-capped inverted-index self-join
  (same boilerplate-cap discipline as ``ngram_jaccard``: a gram seen in
  more than ``max_df`` documents is boilerplate and never joins, so the
  join is bounded at df^2 per gram, never corpus-quadratic);
* PageRank — ``iters`` rounds of (join rank→edges, groupBy dst, sum),
  each a single co-partitioned shuffle on the node key; the iterate is
  ``localCheckpoint``-ed so the plan does not grow with iteration count.

Reference analog: none (planetiler has no graph op) — this is a north-rule
training-data-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import word_ngrams


def shared_gram_edges(docs: DataFrame, n: int = 8, max_df: int = 4,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Undirected content-link edges: ``(src, dst, weight)`` with one row
    per direction; ``weight`` = number of distinct rare n-grams the two
    documents share.  Grams are compared by xxhash64 (shuffle keys stay
    8 bytes at 100 TB); the oracle replays the join on gram text."""
    grams = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g"),
        )
        .select("doc_id", F.xxhash64("g").alias("gh"))
        .distinct()
    )
    # df gate FIRST, as a count (map-side-combined — skew-safe even for a
    # boilerplate gram in 10^9 docs), THEN collect the per-gram doc list:
    # after the semi-join every list is bounded by max_df. Collecting
    # before filtering would accumulate an unbounded list on the hottest
    # gram key — the classic OOM-at-scale shape.
    df_ok = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("gh")
    )
    rare = (
        grams.join(df_ok, "gh")
        .groupBy("gh")
        .agg(F.collect_list("doc_id").alias("ds"))
    )
    # expand the capped per-gram doc list to ordered pairs without a second
    # shuffle: df <= max_df rows per gram, so the cross product is array math
    pairs = rare.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ds"),
                    lambda a: F.transform(
                        F.filter(F.col("ds"), lambda b: b != a),
                        lambda b: F.struct(a.alias("src"), b.alias("dst")),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count("*").cast("int").alias("weight"))
    )


def pagerank(edges: DataFrame, iters: int = 5, d: float = 0.85,
             materialize: bool = True) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, weight)``.  Nodes are the
    union of endpoints; symmetric edge lists have no dangling nodes, so no
    mass-redistribution term is needed (an assert would cost a pass; the
    derivation above is symmetric by construction).  Returns
    ``(node, rank)`` with rank rounded to 6 decimals for deterministic
    cross-engine comparison (float sums re-associate across partitions).

    Each iteration is one broadcast-or-shuffle hash join rank⋈edges plus
    one groupBy(dst) — the canonical Pregel-as-DataFrame shape.  The
    iterate is localCheckpoint-ed (eager) to keep the logical plan flat;
    at 10^12 docs per-iteration lineage otherwise compounds into
    analysis-time blowup.
    """
    # materialize the (possibly corpus-scale) edge derivation ONCE: every
    # iteration's localCheckpoint re-executes its inputs, so an
    # unmaterialized edge plan would re-run the derivation iters+1 times
    if materialize:
        edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("wout"))
    e = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("wout")).alias("share")
    )
    e = e.persist()
    pr = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = (
            e.join(pr, e.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("mass"))
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n_nodes)
                    + F.lit(d) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return pr.select("node", F.round("rank", 6).alias("rank"))


def document_pagerank(docs: DataFrame, n: int = 8, max_df: int = 4,
                      iters: int = 5, d: float = 0.85) -> DataFrame:
    """End-to-end: derive the content-link graph, run PageRank, return
    ``(doc_id, rank, degree)`` for every document that has at least one
    link (isolated documents carry no graph signal)."""
    # one materialization of the edge derivation feeds degree AND all
    # PageRank iterations (pagerank skips its own with materialize=False)
    edges = shared_gram_edges(docs, n=n, max_df=max_df).localCheckpoint(
        eager=True
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("int").alias("degree")
    )
    pr = pagerank(edges, iters=iters, d=d, materialize=False)
    return (
        pr.join(deg, "node")
        .select(F.col("node").alias("doc_id"), "rank", "degree")
    )
