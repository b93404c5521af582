"""OsmChange (.osc) diff connector: cross-path parity — a diff applied to
the base extract must equal a fresh build from a post-change extract —
plus delta-splice equivalence and affected-set propagation semantics."""

import os

from planetiler_openmaptiles_spark.sources.osm_pbf import (
    pbf_to_documents, write_osm_pbf)
from planetiler_openmaptiles_spark.sources.osm_osc import (
    apply_osmchange, read_osmchange)


def _base_entities():
    nodes = []
    for i in range(1, 61):
        lat = ((i * 7919) % 160_000) / 1000.0 - 80.0
        lon = ((i * 104_729) % 340_000) / 1000.0 - 170.0
        tags = [("name", f"n{i}"), ("natural", "peak")] if i % 7 == 0 else []
        nodes.append((i, lat, lon, tags))
    ways = [
        (100_000 + w,
         [("highway", "primary"), ("ref", f"W{w}")],
         [w * 5 + k + 1 for k in range(6)])
        for w in range(6)
    ]
    rels = [
        (900_000,
         [("type", "route"), ("route", "road"), ("network", "US:I")],
         [(100_000, "member", 1), (100_001, "", 1)]),
        (900_001,
         [("type", "route"), ("route", "road"), ("network", "US:X")],
         [(100_004, "", 1)]),
    ]
    return nodes, ways, rels


_OSC = """<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="test">
  <create>
    <node id="5000" lat="10.5" lon="20.25">
      <tag k="name" v="newpeak"/><tag k="natural" v="peak"/>
    </node>
    <node id="6000" lat="1.0" lon="1.0"/>
    <node id="7000" lat="2.0" lon="2.0"/>
    <way id="100500">
      <nd ref="31"/><nd ref="32"/><nd ref="33"/>
      <tag k="highway" v="secondary"/>
    </way>
  </create>
  <modify>
    <node id="2" lat="33.125" lon="44.5"/>
    <node id="7" lat="55.75" lon="66.5">
      <tag k="name" v="renamed"/><tag k="natural" v="peak"/>
    </node>
    <node id="7000" lat="3.0" lon="3.0">
      <tag k="name" v="survivor"/><tag k="natural" v="peak"/>
    </node>
    <relation id="900000">
      <member type="way" ref="100000" role="member"/>
      <member type="way" ref="100001" role=""/>
      <tag k="type" v="route"/><tag k="route" v="road"/>
      <tag k="network" v="US:CHANGED"/>
    </relation>
  </modify>
  <delete>
    <node id="14"/>
    <way id="100002"/>
    <node id="6000"/>
  </delete>
</osmChange>
"""


def _post_entities():
    """The base entities with the diff applied by hand — the independent
    ground truth for cross-path parity."""
    nodes, ways, rels = _base_entities()
    nd = {i: (i, la, lo, t) for i, la, lo, t in nodes}
    nd[5000] = (5000, 10.5, 20.25, [("name", "newpeak"), ("natural", "peak")])
    nd[2] = (2, 33.125, 44.5, [])
    nd[7] = (7, 55.75, 66.5, [("name", "renamed"), ("natural", "peak")])
    nd[7000] = (7000, 3.0, 3.0, [("name", "survivor"), ("natural", "peak")])
    del nd[14]
    wy = {i: (i, t, r) for i, t, r in ways}
    wy[100500] = (100500, [("highway", "secondary")], [31, 32, 33])
    del wy[100002]
    rl = {i: (i, t, m) for i, t, m in rels}
    rl[900000] = (
        900000,
        [("type", "route"), ("route", "road"), ("network", "US:CHANGED")],
        [(100000, "member", 1), (100001, "", 1)],
    )
    return (
        sorted(nd.values()), sorted(wy.values()), sorted(rl.values())
    )


def _doc_set(docs):
    out = {}
    for r in docs.collect():
        out[r["doc_id"]] = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        )
    return out


def test_osc_apply_matches_fresh_build(spark, tmp_path):
    base_path = str(tmp_path / "base.osm.pbf")
    n, w, r = _base_entities()
    write_osm_pbf(base_path, n, w, r, block_size=32)
    osc_path = str(tmp_path / "diff.osc")
    with open(osc_path, "w") as f:
        f.write(_OSC)

    merged_docs, new_docs, removed = apply_osmchange(spark, base_path, osc_path)

    post_path = str(tmp_path / "post.osm.pbf")
    pn, pw, pr = _post_entities()
    write_osm_pbf(post_path, pn, pw, pr, block_size=32)
    want = _doc_set(pbf_to_documents(spark, post_path))
    got = _doc_set(merged_docs)
    assert got == want

    # removed is a doc_id DataFrame (planet diffs fan out to millions of
    # ids — the list form would be a driver wall); collect is test-only
    rs = {r["doc_id"] for r in removed.collect()}

    # delta-splice parity: base docs − removed + new == merged docs
    base_docs = _doc_set(pbf_to_documents(spark, base_path))
    spliced = {k: v for k, v in base_docs.items() if k not in rs}
    spliced.update(_doc_set(new_docs))
    assert spliced == got
    assert "osm/way/100000" in rs          # member of the modified relation
    assert "osm/way/100001" in rs          # same
    assert "osm/way/100002" in rs          # deleted way
    assert "osm/node/7" in rs              # modified tagged node
    assert "osm/way/100003" not in rs      # untouched way (nodes 16..21)
    assert "osm/node/5000" in got and got["osm/node/5000"]
    assert "osm/node/6000" not in got      # created then deleted
    # created-then-modified keeps the last version
    assert any(s[0] == "tag" and "survivor" in s[1] for s in got["osm/node/7000"])


def test_read_osmchange_actions(spark, tmp_path):
    osc_path = str(tmp_path / "d.osc")
    with open(osc_path, "w") as f:
        f.write(_OSC)
    ch = read_osmchange(spark, osc_path).collect()
    by = {(r["etype"], r["id"], r["action"]) for r in ch}
    assert (0, 5000, "create") in by
    assert (0, 2, "modify") in by
    assert (2, 900000, "modify") in by
    assert (1, 100002, "delete") in by
    mods = [r for r in ch if r["id"] == 900000]
    assert len(mods[0]["members"]) == 2 and mods[0]["members"][0]["mtype"] == 1
    w500 = [r for r in ch if r["id"] == 100500][0]
    assert list(w500["refs"]) == [31, 32, 33]


def test_osc_incremental_tiles_parity(spark, tmp_path):
    """The full replication loop: base extract → tiles, then an OsmChange
    diff applied INCREMENTALLY (affected tiles recomputed, rest spliced)
    must be row-identical to a full rebuild over the post-change corpus."""
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import (
        build_tiles, incremental_retile, write_tiles)

    base_path = str(tmp_path / "base.osm.pbf")
    n, w, r = _base_entities()
    write_osm_pbf(base_path, n, w, r, block_size=32)
    osc_path = str(tmp_path / "diff.osc")
    with open(osc_path, "w") as f:
        f.write(_OSC)

    merged_docs, new_docs, removed = apply_osmchange(spark, base_path, osc_path)
    merged_dir = str(tmp_path / "merged_corpus")
    shard_dir = str(tmp_path / "shard_corpus")
    for d, df in ((merged_dir, merged_docs), (shard_dir, new_docs)):
        os.makedirs(d, exist_ok=True)
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    cfg = Config(only_layers=("transportation", "mountain_peak"), max_zoom=8)
    full = build_tiles(spark, merged_dir, cfg,
                       checkpoint_dir=str(tmp_path / "ckpt_full"))

    base_corpus = "pbf:" + base_path
    ckpt_base = str(tmp_path / "ckpt_base")
    base = build_tiles(spark, base_corpus, cfg, checkpoint_dir=ckpt_base)
    base_out = str(tmp_path / "base_out")
    write_tiles(base, base_out)

    # every shard doc IS new content (modified docs keep their doc_id, so
    # the default existing-id anti-join would wrongly drop them)
    inc = incremental_retile(
        spark, base_corpus, shard_dir, ckpt_base, base_out, cfg,
        new_doc_pred=F.lit(True), removed_doc_ids=removed,
    )

    def rows(df):
        return sorted(
            (r["z"], r["x"], r["y"], r["layer"], r["seq"],
             bytes(r["geom_px"]), tuple(sorted(r["attrs"].items())))
            for r in df.collect())

    inc_rows = rows(inc)
    assert inc_rows == rows(full)
    assert len(inc_rows) > 0


def test_read_osmchange_gzip_and_chunked_stream(spark, tmp_path, monkeypatch):
    """The reader must accept the gzipped .osc.gz form osmosis replication
    actually ships (sniffed from the magic bytes, any extension) and must
    produce identical rows when the streaming scan is forced through tiny
    chunks (every fragment straddles a chunk boundary)."""
    import gzip

    from planetiler_openmaptiles_spark.sources import osm_osc

    plain = str(tmp_path / "d.osc")
    with open(plain, "w") as f:
        f.write(_OSC)
    gz = str(tmp_path / "d.osc.gz")
    with gzip.open(gz, "wt") as f:
        f.write(_OSC)

    def canon(df):
        return sorted(
            (r["etype"], r["id"], r["action"], r["seq"],
             tuple((t["key"], t["value"]) for t in (r["tags"] or [])),
             tuple(r["refs"] or []))
            for r in df.collect()
        )

    want = canon(read_osmchange(spark, plain))
    assert want  # fixture sanity
    assert canon(read_osmchange(spark, gz)) == want

    monkeypatch.setattr(osm_osc, "_OSC_CHUNK", 64)
    assert canon(read_osmchange(spark, plain)) == want
    assert canon(read_osmchange(spark, gz)) == want
