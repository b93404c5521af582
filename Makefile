# Convenience targets for the PySpark OpenMapTiles engine.

SF_DIR ?= /root/testdata/sf0.1
CPUS ?= 32
OUT ?= /tmp/omt_build

.PHONY: test bench oracles board monaco

test:
	python -m pytest tests/ -x -q

bench:
	SPARK_GRAFT_SF_DIR=$(SF_DIR) SPARK_GRAFT_CPUS=$(CPUS) python bench.py

oracles:
	python tools/check_oracles.py /root/testdata/sf0.01

# The committed full-board gate (round-4 verdict ask): ONE continuous
# type-tagged oracle run over ALL queries() entries — not just the
# driver's 50-entry window — logged to BOARD_LOG.txt so entries past
# position 50 can't silently rot between their driver-rotation windows.
# Run once per round; commit the log next to CORRECTNESS_r{N}.json.
board:
	python tools/check_oracles.py /root/testdata/sf0.01 2>/dev/null \
	  | tee BOARD_LOG.txt

# Real-extract end-to-end + VerifyMonaco-equivalent checks (reference:
# util/VerifyMonaco.java:24-43). The reference CI downloads monaco.osm.pbf;
# no extract ships in this sandbox, so the target SKIPS cleanly (exit 0)
# unless MONACO_PBF points at a real .osm.pbf:
#
#   make monaco MONACO_PBF=/path/to/monaco.osm.pbf
#
# Pipeline: .osm.pbf -> full 16-layer z0-14 build -> compact mbtiles ->
# per-layer min-feature-count verification inside the Monaco envelope.
MONACO_PBF ?=
MONACO_BOUNDS ?= 7.40,43.72,7.44,43.75

monaco:
	@if [ -z "$(MONACO_PBF)" ] || [ ! -f "$(MONACO_PBF)" ]; then \
	  echo "monaco: SKIPPED (set MONACO_PBF=/path/to/monaco.osm.pbf to run)"; \
	else \
	  python -m planetiler_openmaptiles_spark.pipeline \
	    --osm-pbf $(MONACO_PBF) \
	    --out $(OUT)/monaco --checkpoints $(OUT)/monaco_ckpt \
	    --mbtiles $(OUT)/monaco.mbtiles --master 'local[$(CPUS)]' && \
	  python -m planetiler_openmaptiles_spark.tiling.verify \
	    $(OUT)/monaco.mbtiles --bounds=$(MONACO_BOUNDS); \
	fi
