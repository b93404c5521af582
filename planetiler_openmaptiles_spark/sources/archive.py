"""Zip-packaged source materialization.

The reference's source artifacts ship zipped (OpenMapTilesMain.java:40-53:
``lake_centerline.shp.zip``, ``water-polygons-split-3857.zip``,
``natural_earth_vector.sqlite.zip``). Zip members don't support the random
byte-range access the block-parallel readers need (DEFLATE streams must be
decompressed from the start), so — like planetiler, which materializes
downloads to disk before reading — a zipped source is extracted ONCE into
a content-keyed cache directory in the temp dir; the connectors then read
the extracted files directly. Extraction is driver-side and O(archive);
at planet scale these are dimension sources (a few GB), not the corpus.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile


def materialize(path: str, suffix: str | None = None) -> str:
    """If `path` is a .zip, extract it (once, cached by path+size+mtime)
    and return the extracted member matching `suffix` (default: inferred
    from the archive name, e.g. lake_centerline.shp.zip → .shp); otherwise
    return `path` unchanged.

    Cache placement: a sibling directory of the archive when its parent is
    writable — on a cluster the archive lives on shared storage, so the
    extracted files are visible to every executor exactly like the archive
    itself; the local temp dir is the fallback (read-only media,
    single-node runs). Concurrency: extraction goes into a pid-unique tmp
    dir containing the .extracted marker, then one atomic rename publishes
    it; losers of the rename race discard their tmp. A published cache dir
    is never deleted."""
    if not path.lower().endswith(".zip"):
        return path
    import shutil

    st = os.stat(path)
    key = hashlib.sha256(
        f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    parent = os.path.dirname(os.path.abspath(path))
    base = parent if os.access(parent, os.W_OK) else tempfile.gettempdir()
    out_dir = os.path.join(base, f".omt_src_{key}")
    done = os.path.join(out_dir, ".extracted")
    if not os.path.exists(done):
        tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        with zipfile.ZipFile(path) as zf:
            # refuse path traversal; flatten nothing else
            for info in zf.infolist():
                name = info.filename
                if name.startswith("/") or ".." in name.split("/"):
                    raise ValueError(f"unsafe zip member path: {name!r}")
            zf.extractall(tmp_dir)
        # marker INSIDE tmp before publish: out_dir is complete whenever
        # it is visible at all
        with open(os.path.join(tmp_dir, ".extracted"), "w") as f:
            f.write(path)
        try:
            os.replace(tmp_dir, out_dir)
        except OSError:
            # another process published first (or a stale partial dir
            # without a marker blocks the rename) — use theirs if
            # complete, else adopt ours under the unique tmp name
            if not os.path.exists(done):
                out_dir = tmp_dir
                done = os.path.join(out_dir, ".extracted")
            else:
                shutil.rmtree(tmp_dir, ignore_errors=True)
    if suffix is None:
        stem = os.path.basename(path)[: -len(".zip")]
        suffix = os.path.splitext(stem)[1] or None
    members = []
    for root, _, files in os.walk(out_dir):
        for fn in files:
            if fn == ".extracted":
                continue
            members.append(os.path.join(root, fn))
    if suffix:
        match = [m for m in members if m.lower().endswith(suffix.lower())]
        if match:
            return sorted(match)[0]
    # fall back to the largest member (water-polygons zips contain one
    # dominant .shp plus sidecars the reader resolves by extension swap)
    if not members:
        raise FileNotFoundError(f"empty archive: {path}")
    return max(members, key=os.path.getsize)
