"""OsmChange (.osc) diff connector: apply minutely/daily OSM replication
diffs to a base extract and hand the incremental pipeline exactly the
(removed_doc_ids, new_docs) pair it needs.

planetiler itself is full-batch only — updates mean a full rebuild
(README "Generate custom vector tiles": re-run). The osmosis replication
ecosystem publishes OsmChange XML (`<osmChange><create|modify|delete>`
with nested `<node|way|relation>`); this module is the missing half that
makes the engine's incremental re-tiling (`pipeline.incremental_retile`)
consumable from the real-world diff format.

Scale notes:
* Diff files are small by construction (minutely diffs are ~1 MB, daily
  ~100 MB gzip) — the XML fragmenting runs on the driver, but every
  fragment is PARSED on executors (Arrow-batched ``mapInPandas``), and
  everything after parse — merge, affected-set propagation, document
  re-assembly — is joins over the distributed base entity table.
* Affected-set propagation is the load-bearing logic: a moved NODE
  changes the geometry of every way referencing it, and a modified
  RELATION changes the rel-span payload of every member way; both are
  ref-explode equi-joins, never driver loops.

Reference parity anchor: `OpenMapTilesProfile.java` consumes a fixed
snapshot; `sources/osm_pbf.py` documents the base connector. Test
strategy: cross-path parity — diff applied to base must equal a fresh
build of a pbf written with the post-change entities
(`tests/test_osm_osc.py`).
"""

from __future__ import annotations

import os
import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from .osm_pbf import _ENTITY_SCHEMA, entities_to_documents, read_osm_entities

_CHANGE_SCHEMA = _ENTITY_SCHEMA + ", action string, seq long"

_TOKEN_RE = re.compile(rb"<(create|modify|delete|node|way|relation)\b")
_ACTIONS = (b"create", b"modify", b"delete")
_OSC_CHUNK = 8 << 20  # streaming scan granularity
_SPILL_BATCH = 50_000  # fragments per parquet row group


def _iter_osc_fragments(path: str):
    """Stream (action, fragment_xml) pairs out of a .osc / .osc.gz file
    without holding the document in memory: a chunked byte scan keeps only
    the currently-open element fragment (plus a 32-byte token tail) in the
    buffer. Gzip is sniffed from the magic bytes, so both the raw XML and
    the gzipped form osmosis replication actually ships (~1 MB minutely /
    ~100 MB daily .osc.gz, ~1 GB uncompressed) stream equally."""
    import gzip

    with open(path, "rb") as probe:
        magic = probe.read(2)
    opener = gzip.open if magic == b"\x1f\x8b" else open
    action = None
    buf = b""
    elem_start = None  # offset in buf of the open element fragment
    with opener(path, "rb") as f:
        while True:
            chunk = f.read(_OSC_CHUNK)
            at_eof = not chunk
            buf += chunk
            scan_from = 0
            for m in _TOKEN_RE.finditer(buf):
                if not at_eof and m.end() + 16 > len(buf):
                    break  # token may continue past the chunk boundary
                if elem_start is not None and m.start() == elem_start:
                    # after compaction the open element's own tag sits at
                    # the buffer head — it is not a fragment terminator
                    scan_from = m.end()
                    continue
                tok = m.group(1)
                if elem_start is not None:
                    frag = buf[elem_start:m.start()]
                    cut = frag.rfind(b"</" + action)
                    if cut != -1:
                        frag = frag[:cut]
                    yield action.decode(), frag.decode("utf-8", "replace")
                    elem_start = None
                if tok in _ACTIONS:
                    action = tok
                else:
                    elem_start = m.start()
                scan_from = m.end()
            if at_eof:
                if elem_start is not None:
                    frag = buf[elem_start:]
                    cut = frag.rfind(b"</" + action)
                    if cut != -1:
                        frag = frag[:cut]
                    yield action.decode(), frag.decode("utf-8", "replace")
                return
            # keep the open fragment (or a short tail for a split token)
            keep = elem_start if elem_start is not None else max(
                scan_from, len(buf) - 32
            )
            buf = buf[keep:]
            if elem_start is not None:
                elem_start = 0


def read_osmchange(spark, path: str, partitions: int | None = None) -> DataFrame:
    """.osc / .osc.gz XML → entity rows tagged with their action
    (``_ENTITY_SCHEMA`` + ``action``). The driver streams the file into
    per-element fragments (a chunked linear byte scan, no XML parse,
    bounded memory) and spills them to a temp parquet in row groups, so a
    planet-scale daily diff never materializes on the driver; executors
    parse fragments with ``xml.etree`` in Arrow batches."""
    import atexit
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    spill_dir = tempfile.mkdtemp(prefix="osc_frags_")
    atexit.register(shutil.rmtree, spill_dir, ignore_errors=True)
    arrow_schema = pa.schema(
        [("action", pa.string()), ("xml", pa.string()), ("seq", pa.int64())]
    )
    n_frags = 0
    writer = pq.ParquetWriter(
        os.path.join(spill_dir, "frags.parquet"), arrow_schema
    )
    batch: list[tuple[str, str, int]] = []
    try:
        for action, frag in _iter_osc_fragments(path):
            batch.append((action, frag, n_frags))
            n_frags += 1
            if len(batch) >= _SPILL_BATCH:
                writer.write_table(
                    pa.Table.from_pylist(
                        [dict(zip(("action", "xml", "seq"), r)) for r in batch],
                        schema=arrow_schema,
                    )
                )
                batch = []
        if batch:
            writer.write_table(
                pa.Table.from_pylist(
                    [dict(zip(("action", "xml", "seq"), r)) for r in batch],
                    schema=arrow_schema,
                )
            )
    finally:
        writer.close()
    if not n_frags:
        return spark.createDataFrame([], _CHANGE_SCHEMA)
    n_parts = partitions or min(
        n_frags, spark.sparkContext.defaultParallelism
    )
    fdf = spark.read.parquet(spill_dir).repartition(n_parts)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        cols = ["etype", "id", "lat", "lon", "tags", "refs", "members",
                "action", "seq"]
        for pdf in batches:
            rows = []
            for action, frag, seq in zip(pdf["action"], pdf["xml"], pdf["seq"]):
                # a fragment may have been cut before its close tag by the
                # next sibling match — self-heal by closing the root
                for candidate in (frag, frag + "</node>", frag + "</way>",
                                  frag + "</relation>"):
                    try:
                        el = ET.fromstring(candidate)
                        break
                    except ET.ParseError:
                        el = None
                if el is None:
                    raise ValueError(f"unparseable OsmChange fragment: {frag[:120]!r}")
                etype = {"node": 0, "way": 1, "relation": 2}[el.tag]
                tags = [
                    {"key": t.get("k"), "value": t.get("v")}
                    for t in el.findall("tag")
                ]
                refs = [int(nd.get("ref")) for nd in el.findall("nd")]
                members = [
                    {
                        "memid": int(mm.get("ref")),
                        "role": mm.get("role") or "",
                        "mtype": {"node": 0, "way": 1, "relation": 2}[mm.get("type")],
                    }
                    for mm in el.findall("member")
                ]
                rows.append(
                    (
                        etype,
                        int(el.get("id")),
                        float(el.get("lat")) if el.get("lat") else None,
                        float(el.get("lon")) if el.get("lon") else None,
                        tags,
                        refs,
                        members,
                        action,
                        int(seq),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return fdf.mapInPandas(parse, _CHANGE_SCHEMA)


def merge_entities(base: DataFrame, change: DataFrame) -> DataFrame:
    """Post-diff entity view: base rows superseded by ANY change action
    drop (delete removes, create/modify replace with the new version).
    Replication diffs may carry several operations for one element in
    file order — the LAST action wins (osmosis semantics), enforced via
    the fragment sequence number."""
    from pyspark.sql import Window

    w = Window.partitionBy("etype", "id").orderBy(F.desc("seq"))
    last = (
        change.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    keys = change.select("etype", "id").distinct()
    return base.join(keys, ["etype", "id"], "left_anti").unionByName(
        last.filter(F.col("action") != "delete").drop("action", "seq")
    )


def affected_elements(base: DataFrame, merged: DataFrame,
                      change: DataFrame) -> DataFrame:
    """(etype, id) of every element whose DOCUMENT may differ after the
    diff: the changed elements themselves, ways referencing a changed
    node (geometry moved — in the base or the merged view, covering ref
    additions AND removals), relations touching those ways or changed
    nodes, and finally the member ways of every affected relation (rel
    spans ride on way documents)."""
    ch = change.select("etype", "id").distinct()
    chn = ch.filter("etype = 0").select(F.col("id").alias("ref"))
    both_ways = base.filter("etype = 1").unionByName(merged.filter("etype = 1"))
    ways_hit = (
        both_ways.select("id", F.explode("refs").alias("ref"))
        .join(F.broadcast(chn), "ref")
        .select("id")
        .distinct()
    )
    aff_ways = (
        ch.filter("etype = 1").select("id").unionByName(ways_hit).distinct()
    )
    both_rels = base.filter("etype = 2").unionByName(merged.filter("etype = 2"))
    rel_members = both_rels.select(
        "id", F.explode("members").alias("m")
    ).select("id", F.col("m.memid").alias("memid"), F.col("m.mtype").alias("mtype"))
    rels_hit = (
        rel_members.filter("mtype = 1")
        .join(
            F.broadcast(aff_ways.select(F.col("id").alias("memid"))), "memid"
        )
        .select("id")
        .unionByName(
            rel_members.filter("mtype = 0")
            .join(F.broadcast(chn.select(F.col("ref").alias("memid"))), "memid")
            .select("id")
        )
        .distinct()
    )
    aff_rels = (
        ch.filter("etype = 2").select("id").unionByName(rels_hit).distinct()
    )
    # relation changes propagate back onto member-way documents
    aff_ways2 = (
        aff_ways.unionByName(
            rel_members.filter("mtype = 1")
            .join(F.broadcast(aff_rels.select(F.col("id").alias("rid"))),
                  rel_members.id == F.col("rid"))
            .select(F.col("memid").alias("id"))
        )
        .distinct()
    )
    return (
        chn.select(F.lit(0).alias("etype"), F.col("ref").alias("id"))
        .unionByName(aff_ways2.select(F.lit(1).alias("etype"), "id"))
        .unionByName(aff_rels.select(F.lit(2).alias("etype"), "id"))
        .distinct()
    )


def apply_osmchange(spark, base_path: str, osc_path: str):
    """Full diff application: returns ``(merged_docs, new_docs,
    removed_doc_ids)`` where ``merged_docs`` is the complete post-diff
    document table (identical to rebuilding from a post-change extract)
    and ``(new_docs, removed_doc_ids)`` is the minimal delta for
    ``pipeline.incremental_retile`` — removed = every affected document
    id (delete+reinsert semantics), new = the affected subset of the
    merged build.

    ``removed_doc_ids`` is a one-column ``doc_id`` DataFrame, NOT a
    collected list: a planet daily diff's affected-set fan-out (changed
    node → ways → relations → member ways) can reach millions of ids, so
    downstream consumers semi/anti-join on it distributively
    (``incremental_retile`` accepts the DataFrame directly). Call
    ``.collect()`` on it yourself if you want the small-diff list form."""
    base = read_osm_entities(spark, base_path)
    change = read_osmchange(spark, osc_path)
    merged = merge_entities(base, change)
    merged_docs = entities_to_documents(spark, merged)
    aff = affected_elements(base, merged, change)
    kind = F.element_at(
        F.array(F.lit("node"), F.lit("way"), F.lit("relation")),
        F.col("etype") + 1,
    )
    aff_doc_ids = aff.select(
        F.concat(F.lit("osm/"), kind, F.lit("/"), F.col("id")).alias("doc_id")
    )
    new_docs = merged_docs.join(F.broadcast(aff_doc_ids), "doc_id", "left_semi")
    return merged_docs, new_docs, aff_doc_ids
