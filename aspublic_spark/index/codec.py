"""Delta + varint (LEB128) codec for posting blocks.

This is the explicit, Spark-visible analog of what FTS5 keeps inside
its B-tree pages (delta+varint docid lists with positions; enabled by
reference common/db_sqlite.py:27) and what BASELINE.json's north_rule
names directly: "delta+varint-style compression of docID gaps and
precomputed per-block max term weights for block-max WAND pruning".

All encode/decode paths are vectorized numpy (no per-element Python
loops over postings — only over the <=10 varint byte positions), so a
pandas-UDF pack/unpack stage stays Arrow-fast.

Doc ids are int64 and sorted in NATURAL SIGNED order (so Spark-side
``min_doc``/``max_doc`` block pruning uses plain int64 comparisons).
The first doc id is zigzag-encoded (it may be negative when ids come
from xxhash64); the gaps between consecutive sorted int64 values are
computed wraparound-safe in the uint64 domain and are always
non-negative.

Layout of one packed block (all fields little-endian varint streams):

- ``doc_gaps``:  varint(zigzag(first_doc)) then varint(gaps);
- ``tfs``:       varint term frequency per doc;
- ``dls``:       varint document length (token count) per doc —
  stored inline so BM25 scoring needs no join back to the docs table;
- ``positions``: per doc: varint(n_pos) then varint-encoded position
  deltas (first absolute). Empty bytes when positions are not kept.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_I64 = np.int64
_MAX_VARINT_LEN = 10

# Thresholds 2**7, 2**14, ... for byte-length computation.
_THRESH = np.array([1 << (7 * i) for i in range(1, _MAX_VARINT_LEN)], dtype=np.uint64)


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (uint64 domain)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    n = v.shape[0]
    if n == 0:
        return b""
    nbytes = np.ones(n, dtype=np.int64)
    for t in _THRESH:
        nbytes += v >= t
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for b in range(int(nbytes.max())):
        mask = nbytes > b
        chunk = ((v[mask] >> _U64(7 * b)) & _U64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > b + 1).astype(np.uint8) << 7
        out[offsets[mask] + b] = chunk | cont
    return out.tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode a LEB128 stream back to uint64 values."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=_U64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        out[mask] |= (b[starts[mask] + j].astype(_U64) & _U64(0x7F)) << _U64(7 * j)
    return out


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(_I64)
    return ((x << _I64(1)) ^ (x >> _I64(63))).view(_U64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(_U64)
    return ((u >> _U64(1)).view(_I64)) ^ -((u & _U64(1)).view(_I64))


def delta_encode_docs(sorted_ids: np.ndarray) -> bytes:
    """zigzag(first) + u64 gaps, varint-packed. Input sorted ascending int64."""
    v = np.ascontiguousarray(sorted_ids, dtype=_I64)
    if v.size == 0:
        return b""
    u = v.view(_U64)
    enc = np.empty(v.size, dtype=_U64)
    enc[0] = _zigzag(v[:1])[0]
    enc[1:] = u[1:] - u[:-1]  # wraparound-safe, non-negative for sorted input
    return encode_varints(enc)


def delta_decode_docs(buf: bytes) -> np.ndarray:
    """Inverse of delta_encode_docs; returns sorted int64 doc ids."""
    enc = decode_varints(buf)
    if enc.size == 0:
        return np.empty(0, dtype=_I64)
    u = np.empty(enc.size, dtype=_U64)
    u[0] = _unzigzag(enc[:1]).view(_U64)[0]
    if enc.size > 1:
        u[1:] = u[0] + np.cumsum(enc[1:], dtype=_U64)
    return u.view(_I64)


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Concatenated per-doc [n_pos, pos deltas...] varint stream."""
    parts: list[np.ndarray] = []
    for pos in positions_per_doc:
        p = np.ascontiguousarray(pos, dtype=_U64)
        rec = np.empty(p.size + 1, dtype=_U64)
        rec[0] = p.size
        if p.size:
            rec[1] = p[0]
            rec[2:] = p[1:] - p[:-1]
        parts.append(rec)
    if not parts:
        return b""
    return encode_varints(np.concatenate(parts))


def decode_positions(buf: bytes, n_docs: int) -> list[np.ndarray]:
    """Inverse of encode_positions; returns n_docs arrays of positions."""
    flat = decode_varints(buf)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        n = int(flat[i])
        i += 1
        out.append(np.cumsum(flat[i : i + n], dtype=_U64))
        i += n
    return out


def pack_block(
    sorted_doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions_per_doc: list[np.ndarray] | None,
) -> dict:
    """Pack one block (doc ids sorted ascending, int64)."""
    ids = np.ascontiguousarray(sorted_doc_ids, dtype=_I64)
    return {
        "n": int(ids.size),
        "min_doc": int(ids[0]) if ids.size else 0,
        "max_doc": int(ids[-1]) if ids.size else 0,
        "doc_gaps": delta_encode_docs(ids),
        "tfs": encode_varints(tfs),
        "dls": encode_varints(dls),
        "positions": encode_positions(positions_per_doc) if positions_per_doc is not None else b"",
    }


def unpack_block(row, with_positions: bool = False):
    """Unpack a block row (mapping with the pack_block fields).

    Returns (doc_ids int64, tfs u64, dls u64[, positions list of u64 arrays]).
    """
    doc_ids = delta_decode_docs(row["doc_gaps"])
    tfs = decode_varints(row["tfs"])
    dls = decode_varints(row["dls"])
    if with_positions:
        pos = decode_positions(row["positions"], doc_ids.size)
        return doc_ids, tfs, dls, pos
    return doc_ids, tfs, dls
