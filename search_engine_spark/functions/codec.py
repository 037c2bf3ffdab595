"""Delta + variable-byte posting-list codec (numpy-vectorized).

The reference stores postings as fixed 4-byte big-endian ints with
doc-id gap encoding (reference ``diskindex.py:262-279`` writer,
``:101-127`` reader). The north_rule upgrades this to variable-byte
compression; this module implements it with numpy so the encode/decode
pandas UDFs stay Arrow-batched with no per-row Python hot loop.

Wire format (per term-block):

``postings_bin`` = varbyte stream of::

    [n_docs, doc_id_0, gap_1, ..., gap_{n-1}, tf_0, ..., tf_{n-1}]

``positions_bin`` = varbyte stream of per-doc delta-encoded positions,
concatenated in doc order (first position of each doc absolute, the
rest gaps). Doc boundaries are recovered from the tfs in
``postings_bin`` — mirroring the reference layout where positions
follow each doc's tf, but split into a *separate column* so Catalyst
column pruning skips position bytes for non-phrase queries (the
reference's lazy ``seek`` past positions, ``diskindex.py:124-125``).

Varbyte: 7 payload bits per byte, most-significant group first; the
high bit is set on every byte except the last of a value.
"""

from __future__ import annotations

import numpy as np

_U64_7 = np.uint64(7)
_U64_127 = np.uint64(0x7F)


def vb_encode(values: np.ndarray) -> bytes:
    """Variable-byte encode a 1-D array of non-negative ints."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes per value: 1 + floor(log128(v)) computed by shifting
    nbytes = np.ones(v.size, dtype=np.int64)
    rest = v >> _U64_7
    while rest.any():
        nbytes += (rest > 0).astype(np.int64)
        rest >>= _U64_7
    ends = np.cumsum(nbytes) - 1  # index of each value's terminal byte
    out = np.zeros(int(ends[-1]) + 1, dtype=np.uint8)
    k = 0
    while True:
        sel = nbytes > k
        if not sel.any():
            break
        chunk = ((v[sel] >> np.uint64(7 * k)) & _U64_127).astype(np.uint8)
        if k > 0:
            chunk |= 0x80
        out[ends[sel] - k] = chunk
        k += 1
    return out.tobytes()


def vb_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a varbyte stream back to an int64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    terminal = b < 128
    ends = np.nonzero(terminal)[0]
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # significance of each byte = distance to its value's terminal byte
    value_idx = np.zeros(b.size, dtype=np.int64)
    value_idx[1:] = np.cumsum(terminal[:-1])
    k = (ends[value_idx] - np.arange(b.size)).astype(np.uint64)
    contrib = (b & 0x7F).astype(np.uint64) << (k * _U64_7)
    vals = np.add.reduceat(contrib, starts)
    return vals.astype(np.int64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode (sorted doc_ids, aligned tfs) into ``postings_bin``."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    stream = np.empty(1 + 2 * n, dtype=np.uint64)
    stream[0] = n
    if n:
        stream[1] = doc_ids[0]
        stream[2 : n + 1] = np.diff(doc_ids)
        stream[n + 1 :] = tfs
    return vb_encode(stream)


def decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode ``postings_bin`` -> (doc_ids, tfs)."""
    stream = vb_decode(buf)
    n = int(stream[0]) if stream.size else 0
    doc_ids = np.cumsum(stream[1 : n + 1])
    tfs = stream[n + 1 : 2 * n + 1]
    return doc_ids, tfs


def encode_positions(tfs: np.ndarray, flat_positions: np.ndarray) -> bytes:
    """Encode concatenated per-doc ascending positions into ``positions_bin``.

    ``flat_positions`` is the concatenation of each doc's sorted position
    list; ``tfs`` gives the per-doc lengths. Per-doc delta encoding: the
    first position of each doc stays absolute, the rest become gaps.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    pos = np.asarray(flat_positions, dtype=np.int64)
    if pos.size == 0:
        return b""
    deltas = np.empty_like(pos)
    deltas[0] = pos[0]
    deltas[1:] = pos[1:] - pos[:-1]
    doc_starts = np.zeros(tfs.size, dtype=np.int64)
    np.cumsum(tfs[:-1], out=doc_starts[1:])
    deltas[doc_starts] = pos[doc_starts]  # reset delta chain at doc boundaries
    return vb_encode(deltas)


def decode_positions_flat(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode ``positions_bin`` -> flat absolute positions (concatenated
    per-doc, doc boundaries given by ``tfs``)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    deltas = vb_decode(buf)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    doc_starts = np.zeros(tfs.size, dtype=np.int64)
    np.cumsum(tfs[:-1], out=doc_starts[1:])
    # absolute positions: cumulative sum restarted at every doc boundary
    absolute = np.cumsum(deltas)
    # subtract the carried-over prefix at each doc start
    carried = np.zeros(deltas.size, dtype=np.int64)
    prefix_before_doc = absolute[doc_starts] - deltas[doc_starts]
    carried[doc_starts] = np.diff(np.concatenate(([0], prefix_before_doc)))
    return absolute - np.cumsum(carried)


def decode_positions(buf: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Decode ``positions_bin`` -> list of per-doc absolute position arrays."""
    tfs = np.asarray(tfs, dtype=np.int64)
    if tfs.size == 0 or len(buf) == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(tfs.size)]
    absolute = decode_positions_flat(buf, tfs)
    bounds = np.cumsum(tfs)[:-1]
    return np.split(absolute, bounds)
