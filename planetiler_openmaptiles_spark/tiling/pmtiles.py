"""PMTiles v3 archive codec (pure python, from the public spec).

Planetiler writes either an mbtiles sqlite archive or a single-file PMTiles
v3 archive (``--output=tiles.pmtiles``); this module gives the engine the
same second sink. Spec: https://github.com/protomaps/PMTiles/blob/main/spec
(v3) — 127-byte header, varint-encoded directories with delta tile-ids and
run-length entries, Hilbert-curve tile ordering, gzip internal/tile
compression, leaf-directory spillover when the root exceeds 16 KiB.

Scale notes: tile ids are computed executor-side (numpy-vectorized Hilbert,
no per-row Python), Spark range-sorts on them, and the driver streams the
already-ordered blobs straight into the archive — the same
single-threaded-at-the-archive shape as the mbtiles sink and planetiler's
own WriteablePmtiles. Identical consecutive blobs are run-length coalesced
and identical blob content is deduplicated by hash, matching the spec's
``clustered`` + de-dup behaviour.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import struct
from dataclasses import dataclass

import numpy as np

HEADER_BYTES = 127
MAGIC = b"PMTiles"
ROOT_BUDGET = 16384 - HEADER_BYTES  # spec: header+root should fit 16 KiB
COMPRESSION_NONE = 1
COMPRESSION_GZIP = 2
TILETYPE_MVT = 1
_LEAF_FANOUT = 4096  # entries per leaf when the root spills


# --------------------------------------------------------------------------
# Hilbert tile ids
# --------------------------------------------------------------------------

def zxy_to_tile_id(z: int, x: int, y: int) -> int:
    """Scalar PMTiles tile id: zoom-prefix sum + Hilbert d at that zoom."""
    acc = ((1 << (2 * z)) - 1) // 3
    rx = ry = 0
    d = 0
    s = 1 << (z - 1) if z > 0 else 0
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return acc + d


def tile_id_to_zxy(tile_id: int) -> tuple[int, int, int]:
    """Inverse of :func:`zxy_to_tile_id` (used by the reader + tests)."""
    z = 0
    while ((1 << (2 * (z + 1))) - 1) // 3 <= tile_id:
        z += 1
    d = tile_id - ((1 << (2 * z)) - 1) // 3
    x = y = 0
    s = 1
    while s < (1 << z):
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s <<= 1
    return z, x, y


def tile_ids_np(z: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized zxy→tile-id over int arrays (per-row zoom allowed)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    acc = ((np.int64(1) << (2 * z)) - 1) // 3
    d = np.zeros(len(x), dtype=np.int64)
    for level in range(25, -1, -1):
        s = np.int64(1) << level
        active = z > level
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += np.where(active, s * s * ((3 * rx) ^ ry), 0)
        swap = active & (ry == 0)
        flip = swap & (rx == 1)
        fx = np.where(flip, s - 1 - x, x)
        fy = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, fy, fx), np.where(swap, fx, fy)
    return acc + d


# --------------------------------------------------------------------------
# Varint directories
# --------------------------------------------------------------------------

@dataclass
class Entry:
    tile_id: int
    offset: int
    length: int
    run_length: int  # 0 ⇒ leaf-directory pointer


def _write_varint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def serialize_directory(entries: list[Entry]) -> bytes:
    out = bytearray()
    _write_varint(out, len(entries))
    last = 0
    for e in entries:
        _write_varint(out, e.tile_id - last)
        last = e.tile_id
    for e in entries:
        _write_varint(out, e.run_length)
    for e in entries:
        _write_varint(out, e.length)
    prev: Entry | None = None
    for e in entries:
        if prev is not None and e.offset == prev.offset + prev.length:
            _write_varint(out, 0)
        else:
            _write_varint(out, e.offset + 1)
        prev = e
    return bytes(out)


def deserialize_directory(buf: bytes) -> list[Entry]:
    n, pos = _read_varint(buf, 0)
    ids = []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        ids.append(last)
    runs = []
    for _ in range(n):
        r, pos = _read_varint(buf, pos)
        runs.append(r)
    lens = []
    for _ in range(n):
        l, pos = _read_varint(buf, pos)
        lens.append(l)
    entries: list[Entry] = []
    for i in range(n):
        o, pos = _read_varint(buf, pos)
        if o == 0:
            prev = entries[i - 1]
            off = prev.offset + prev.length
        else:
            off = o - 1
        entries.append(Entry(ids[i], off, lens[i], runs[i]))
    return entries


def _find_entry(entries: list[Entry], tile_id: int) -> Entry | None:
    """Spec search: greatest entry with tile_id ≤ target; run-length aware."""
    lo, hi = 0, len(entries) - 1
    best = -1
    while lo <= hi:
        mid = (lo + hi) // 2
        if entries[mid].tile_id <= tile_id:
            best = mid
            lo = mid + 1
        else:
            hi = mid - 1
    if best < 0:
        return None
    e = entries[best]
    if e.run_length == 0:  # leaf pointer covers [tile_id, next)
        return e
    if tile_id < e.tile_id + e.run_length:
        return e
    return None


# --------------------------------------------------------------------------
# Header
# --------------------------------------------------------------------------

@dataclass
class Header:
    root_offset: int = HEADER_BYTES
    root_length: int = 0
    metadata_offset: int = 0
    metadata_length: int = 0
    leaf_offset: int = 0
    leaf_length: int = 0
    data_offset: int = 0
    data_length: int = 0
    n_addressed: int = 0
    n_entries: int = 0
    n_contents: int = 0
    clustered: bool = True
    internal_compression: int = COMPRESSION_GZIP
    tile_compression: int = COMPRESSION_GZIP
    tile_type: int = TILETYPE_MVT
    min_zoom: int = 0
    max_zoom: int = 14
    bounds: tuple = (-180.0, -85.05113, 180.0, 85.05113)  # w, s, e, n
    center_zoom: int = 0
    center: tuple = (0.0, 0.0)  # lon, lat

    def pack(self) -> bytes:
        w, s, e, n = self.bounds
        return (
            MAGIC
            + struct.pack("<B", 3)
            + struct.pack(
                "<QQQQQQQQQQQ",
                self.root_offset, self.root_length,
                self.metadata_offset, self.metadata_length,
                self.leaf_offset, self.leaf_length,
                self.data_offset, self.data_length,
                self.n_addressed, self.n_entries, self.n_contents,
            )
            + struct.pack(
                "<BBBBBB", int(self.clustered), self.internal_compression,
                self.tile_compression, self.tile_type,
                self.min_zoom, self.max_zoom,
            )
            + struct.pack(
                "<iiii", int(w * 1e7), int(s * 1e7), int(e * 1e7), int(n * 1e7)
            )
            + struct.pack(
                "<Bii", self.center_zoom,
                int(self.center[0] * 1e7), int(self.center[1] * 1e7),
            )
        )

    @classmethod
    def unpack(cls, buf: bytes) -> "Header":
        if buf[:7] != MAGIC or buf[7] != 3:
            raise ValueError("not a PMTiles v3 archive")
        q = struct.unpack("<QQQQQQQQQQQ", buf[8:96])
        b = struct.unpack("<BBBBBB", buf[96:102])
        bb = struct.unpack("<iiii", buf[102:118])
        cz, clon, clat = struct.unpack("<Bii", buf[118:127])
        return cls(
            root_offset=q[0], root_length=q[1], metadata_offset=q[2],
            metadata_length=q[3], leaf_offset=q[4], leaf_length=q[5],
            data_offset=q[6], data_length=q[7], n_addressed=q[8],
            n_entries=q[9], n_contents=q[10], clustered=bool(b[0]),
            internal_compression=b[1], tile_compression=b[2], tile_type=b[3],
            min_zoom=b[4], max_zoom=b[5],
            bounds=tuple(v / 1e7 for v in bb),
            center_zoom=cz, center=(clon / 1e7, clat / 1e7),
        )


def _maybe_gzip(data: bytes, compression: int) -> bytes:
    if compression == COMPRESSION_GZIP:
        return gzip.compress(data, mtime=0)
    return data


def _maybe_gunzip(data: bytes, compression: int) -> bytes:
    if compression == COMPRESSION_GZIP:
        return gzip.decompress(data)
    return data


# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------

_ENTRY_RECORD = struct.Struct("<QQQQ")  # tile_id, offset, length, run_length


class EntrySpool:
    """Disk-backed, append-only directory-entry store with the one
    mutation the writers need (bumping the LAST entry's run length):
    the tail entry stays buffered in memory and flushes to the spool file
    as fixed 32-byte records when the next entry arrives. Bounds driver
    RAM at O(1) in tile count — a planet archive's ~270 M entries would
    be ~11 GB as Python objects, but are ~8.6 GB of sequential spool file
    the directory builder streams in chunks."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "w+b")
        self._n = 0  # flushed records
        self.last: Entry | None = None  # unflushed tail

    def __len__(self) -> int:
        return self._n + (1 if self.last is not None else 0)

    def append(self, e: Entry) -> None:
        if self.last is not None:
            t = self.last
            self._f.write(
                _ENTRY_RECORD.pack(t.tile_id, t.offset, t.length,
                                   t.run_length)
            )
            self._n += 1
        self.last = e

    def _iter(self, chunk_records: int = 1 << 16):
        """Stream entries in append order (including the buffered tail)."""
        self._f.flush()
        with open(self.path, "rb") as f:
            while True:
                buf = f.read(_ENTRY_RECORD.size * chunk_records)
                if not buf:
                    break
                for off in range(0, len(buf), _ENTRY_RECORD.size):
                    t, o, ln, r = _ENTRY_RECORD.unpack_from(buf, off)
                    yield Entry(t, o, ln, r)
        if self.last is not None:
            yield self.last

    def iter_chunks(self, fanout: int):
        chunk: list[Entry] = []
        for e in self._iter():
            chunk.append(e)
            if len(chunk) == fanout:
                yield chunk
                chunk = []
        if chunk:
            yield chunk

    def load_all(self) -> list[Entry]:
        return list(self._iter())

    def close(self) -> None:
        self._f.close()
        import os as _os

        _os.remove(self.path)


def _serialized_dir_chunks(spool: EntrySpool):
    """Yield byte chunks that concatenate to EXACTLY
    ``serialize_directory(spool.load_all())`` — the four varint streams
    (delta ids, run lengths, lengths, offsets) are emitted by four
    sequential passes over the on-disk spool instead of one pass over an
    in-memory list, so peak memory is one 64 KiB buffer."""
    buf = bytearray()
    _write_varint(buf, len(spool))
    last = 0
    for e in spool._iter():
        _write_varint(buf, e.tile_id - last)
        last = e.tile_id
        if len(buf) >= 1 << 16:
            yield bytes(buf)
            buf = bytearray()
    for e in spool._iter():
        _write_varint(buf, e.run_length)
        if len(buf) >= 1 << 16:
            yield bytes(buf)
            buf = bytearray()
    for e in spool._iter():
        _write_varint(buf, e.length)
        if len(buf) >= 1 << 16:
            yield bytes(buf)
            buf = bytearray()
    prev: Entry | None = None
    for e in spool._iter():
        if prev is not None and e.offset == prev.offset + prev.length:
            _write_varint(buf, 0)
        else:
            _write_varint(buf, e.offset + 1)
        prev = e
        if len(buf) >= 1 << 16:
            yield bytes(buf)
            buf = bytearray()
    if buf:
        yield bytes(buf)


def build_directories_spooled(
    spool: EntrySpool, leaves_path: str
) -> tuple[bytes, int]:
    """(root_bytes, leaf_byte_count): spool-streaming twin of
    :func:`build_directories`, byte-identical output. The root-fits-budget
    decision streams the serialized directory through a chunked zlib
    gzip-wrapper compressor (``gzip.compress(data, 9, mtime=0)`` ==
    ``zlib.compressobj(9, DEFLATED, wbits=31)`` fed in chunks — verified
    by test), aborting as soon as the running compressed size exceeds the
    budget, so the full root bytes are only ever MATERIALIZED when they
    are known to fit 16 KiB. Leaf mode writes each 4096-entry leaf blob
    straight to ``leaves_path``; driver RAM is O(root + one leaf)."""
    import zlib

    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    size = 0
    over = False
    for chunk in _serialized_dir_chunks(spool):
        size += len(co.compress(chunk))
        if size > ROOT_BUDGET:
            over = True
            break
    if not over:
        size += len(co.flush())
        over = size > ROOT_BUDGET
    if not over:
        # fits: entry count is bounded by the 16 KiB budget — load and
        # reuse the in-memory builder for bit-exact legacy bytes
        root, leaves = build_directories(spool.load_all())
        with open(leaves_path, "wb") as lf:
            lf.write(leaves)
        return root, len(leaves)
    root_entries: list[Entry] = []
    off = 0
    with open(leaves_path, "wb") as lf:
        for chunk_entries in spool.iter_chunks(_LEAF_FANOUT):
            blob = _maybe_gzip(
                serialize_directory(chunk_entries), COMPRESSION_GZIP
            )
            root_entries.append(
                Entry(chunk_entries[0].tile_id, off, len(blob), 0)
            )
            lf.write(blob)
            off += len(blob)
    return (
        _maybe_gzip(serialize_directory(root_entries), COMPRESSION_GZIP),
        off,
    )


def build_directories(entries: list[Entry]) -> tuple[bytes, bytes]:
    """(root_bytes, leaf_bytes), both gzip-compressed; spills to leaves when
    the compressed root exceeds the 16 KiB header+root budget."""
    root = _maybe_gzip(serialize_directory(entries), COMPRESSION_GZIP)
    if len(root) <= ROOT_BUDGET:
        return root, b""
    leaves = bytearray()
    root_entries: list[Entry] = []
    for i in range(0, len(entries), _LEAF_FANOUT):
        chunk = entries[i : i + _LEAF_FANOUT]
        blob = _maybe_gzip(serialize_directory(chunk), COMPRESSION_GZIP)
        root_entries.append(Entry(chunk[0].tile_id, len(leaves), len(blob), 0))
        leaves.extend(blob)
    return (
        _maybe_gzip(serialize_directory(root_entries), COMPRESSION_GZIP),
        bytes(leaves),
    )


class PmtilesWriter:
    """Streaming writer: feed (tile_id, raw_mvt_blob) in ASCENDING tile_id
    order; finish() assembles header/dirs/metadata around the spooled data.

    Tile data is spooled to ``path`` + ``.data`` while streaming (the data
    section's final offset isn't known until the directory size is), then
    spliced after the directories — constant driver memory in the number of
    tiles beyond the entry list itself.
    """

    def __init__(self, path: str, metadata: dict, header: Header | None = None):
        self.path = path
        self.metadata = metadata
        self.header = header or Header()
        self._entries: list[Entry] = []
        self._dedup: dict[bytes, tuple[int, int]] = {}
        self._data_len = 0
        self._n_addressed = 0
        self._data_path = path + ".data"
        self._data_f = open(self._data_path, "wb")

    def add_tile(self, tile_id: int, blob: bytes, compressed: bool = False) -> None:
        """Append one tile. ``compressed=True`` means ``blob`` is already in
        the archive's tile compression (the MVT encoder gzips on the
        executors — no driver recompression)."""
        if self._entries and tile_id <= self._entries[-1].tile_id + max(
            self._entries[-1].run_length - 1, 0
        ):
            raise ValueError("tiles must be added in ascending tile_id order")
        self._n_addressed += 1
        gz = blob if compressed else _maybe_gzip(blob, self.header.tile_compression)
        digest = hashlib.sha1(gz).digest()
        last = self._entries[-1] if self._entries else None
        if digest in self._dedup:
            off, length = self._dedup[digest]
            if (
                last is not None
                and last.offset == off
                and last.tile_id + last.run_length == tile_id
            ):
                last.run_length += 1  # contiguous run of identical tiles
            else:
                self._entries.append(Entry(tile_id, off, length, 1))
            return
        off = self._data_len
        self._data_f.write(gz)
        self._data_len += len(gz)
        self._dedup[digest] = (off, len(gz))
        self._entries.append(Entry(tile_id, off, len(gz), 1))

    def finish(self) -> dict:
        self._data_f.close()
        return assemble_archive(
            self.path, self.metadata, self.header, self._entries,
            self._data_path, self._data_len, self._n_addressed,
            len(self._dedup),
        )


def assemble_archive(
    path: str,
    metadata: dict,
    header: Header,
    entries: list[Entry],
    data_path: str,
    data_len: int,
    n_addressed: int,
    n_contents: int,
) -> dict:
    """Write the final archive around an already-spooled data section:
    header + root dir + metadata + leaf dirs, then splice ``data_path``
    (which is removed). Shared by the streaming writer and the sharded
    (executor-built) sink — both produce their data section first.

    ``entries`` may be an in-memory list or an :class:`EntrySpool`; the
    spool path streams leaf directories to disk (byte-identical output)
    so driver RAM stays O(root + one leaf) instead of O(tiles)."""
    import os

    h = header
    n_entries = len(entries)
    leaves_file = None
    if isinstance(entries, EntrySpool):
        leaves_file = path + ".leaves"
        root, leaf_len = build_directories_spooled(entries, leaves_file)
        entries.close()
    else:
        root, leaves = build_directories(entries)
        leaf_len = len(leaves)
    meta = _maybe_gzip(
        json.dumps(metadata, sort_keys=True).encode(),
        h.internal_compression,
    )
    h.root_length = len(root)
    h.metadata_offset = h.root_offset + h.root_length
    h.metadata_length = len(meta)
    h.leaf_offset = h.metadata_offset + h.metadata_length
    h.leaf_length = leaf_len
    h.data_offset = h.leaf_offset + h.leaf_length
    h.data_length = data_len
    h.n_addressed = n_addressed
    h.n_entries = n_entries
    h.n_contents = n_contents
    with open(path, "wb") as f:
        f.write(h.pack())
        f.write(root)
        f.write(meta)
        if leaves_file is not None:
            with open(leaves_file, "rb") as lf:
                while True:
                    chunk = lf.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.remove(leaves_file)
        else:
            f.write(leaves)
        with open(data_path, "rb") as df:
            while True:
                chunk = df.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    os.remove(data_path)
    return {
        "path": path,
        "tiles": n_addressed,
        "entries": n_entries,
        "contents": n_contents,
        "bytes": HEADER_BYTES + len(root) + len(meta) + leaf_len
        + data_len,
    }


# --------------------------------------------------------------------------
# Reader (round-trip verification)
# --------------------------------------------------------------------------

class PmtilesReader:
    def __init__(self, path: str):
        self._f = open(path, "rb")
        self.header = Header.unpack(self._f.read(HEADER_BYTES))
        self._root = deserialize_directory(
            _maybe_gunzip(
                self._read(self.header.root_offset, self.header.root_length),
                self.header.internal_compression,
            )
        )

    def _read(self, off: int, length: int) -> bytes:
        self._f.seek(off)
        return self._f.read(length)

    def metadata(self) -> dict:
        return json.loads(
            _maybe_gunzip(
                self._read(self.header.metadata_offset, self.header.metadata_length),
                self.header.internal_compression,
            )
        )

    def get_tile(self, z: int, x: int, y: int) -> bytes | None:
        tid = zxy_to_tile_id(z, x, y)
        e = _find_entry(self._root, tid)
        if e is not None and e.run_length == 0:  # descend one leaf level
            leaf = deserialize_directory(
                _maybe_gunzip(
                    self._read(self.header.leaf_offset + e.offset, e.length),
                    self.header.internal_compression,
                )
            )
            e = _find_entry(leaf, tid)
        if e is None or e.run_length == 0:
            return None
        raw = self._read(self.header.data_offset + e.offset, e.length)
        return _maybe_gunzip(raw, self.header.tile_compression)

    def tile_ids(self) -> list[int]:
        """All addressed tile ids (expands run-lengths; test helper)."""
        out: list[int] = []
        stack = list(self._root)
        while stack:
            e = stack.pop(0)
            if e.run_length == 0:
                stack[:0] = deserialize_directory(
                    _maybe_gunzip(
                        self._read(self.header.leaf_offset + e.offset, e.length),
                        self.header.internal_compression,
                    )
                )
            else:
                out.extend(range(e.tile_id, e.tile_id + e.run_length))
        return out

    def close(self):
        self._f.close()
