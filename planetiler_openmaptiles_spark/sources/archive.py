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
    return `path` unchanged."""
    if not path.lower().endswith(".zip"):
        return path
    st = os.stat(path)
    key = hashlib.sha256(
        f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join(tempfile.gettempdir(), f"omt_src_{key}")
    done = os.path.join(out_dir, ".extracted")
    if not os.path.exists(done):
        import shutil

        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        with zipfile.ZipFile(path) as zf:
            # refuse path traversal; flatten nothing else
            for info in zf.infolist():
                name = info.filename
                if name.startswith("/") or ".." in name.split("/"):
                    raise ValueError(f"unsafe zip member path: {name!r}")
            zf.extractall(tmp_dir)
        shutil.rmtree(out_dir, ignore_errors=True)  # stale partial extract
        os.replace(tmp_dir, out_dir)
        with open(done, "w") as f:
            f.write(path)
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
