"""cProfile the fused render kernel in-process on real rendered features.

Usage: python -m tools.profile_render_kernel [sf_dir] [frac]
Collects the rendered-features table for the sf corpus, runs the fused
mapInPandas body single-threaded under cProfile, prints the top hotspots.
"""
import cProfile
import pstats
import sys
import time

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    import __spark_entry__ as entry
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import make_context, rendered_features
    from planetiler_openmaptiles_spark.session import get_spark
    from planetiler_openmaptiles_spark.tiling import explode

    spark = get_spark("profile-kernel", master="local[16]")
    corpus = entry._corpus_dir(sf_dir)
    ctx = make_context(spark, corpus)
    rendered = rendered_features(ctx)
    if frac < 1.0:
        rendered = rendered.sample(frac, seed=7)
    cols = [
        "doc_id", "elem_id", "layer", "form", "geom_wkt", "attrs", "zattrs",
        "minzoom", "maxzoom", "buffer_px", "buffer_overrides",
        "min_pixel_size", "mps_overrides", "sort_key", "grid",
    ]
    pdf = rendered.select(*cols).toPandas()
    print(f"rendered rows: {len(pdf)}", file=sys.stderr)
    spark.stop()

    # reproduce the mapInPandas body driver-side
    fused = explode.render_tiles_fused
    # grab the inner run() by re-building it: call the closure factory via
    # a stub DataFrame is awkward — instead import the module-level pieces
    import types
    src = fused.__wrapped__ if hasattr(fused, "__wrapped__") else None

    # simplest: re-enter through the generator the same way Spark does
    from planetiler_openmaptiles_spark.tiling.explode import (
        TILE_FEATURE_SCHEMA,
    )

    class FakeDF:
        def __init__(self, pdf):
            self.pdf = pdf
        def select(self, *c):
            return self
        def mapInPandas(self, run, schema):
            return run

    run = explode.render_tiles_fused(FakeDF(pdf))
    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    n = 0
    for out in run(iter([pdf])):
        n += len(out)
    prof.disable()
    print(f"kernel wall: {time.time()-t0:.2f}s, out rows: {n}", file=sys.stderr)
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(30)

if __name__ == "__main__":
    main()
