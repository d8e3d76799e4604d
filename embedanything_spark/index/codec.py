"""Delta + varint (LEB128) posting-block codec, numpy-vectorized.

FOR-style compression for posting blocks (SURVEY.md §4 item 2): doc_ids
are stored as deltas from the block's min_doc (first delta = 0), tf and
doclen as raw varints. Encode and decode are O(bytes) numpy passes —
no per-value Python loops — so the codec is fast inside Arrow batches.

This is the analogue of the reference's storage-precision knob
(quantized model weights, ``rust/src/lib.rs:142-161``): compute stays
exact (tf/doclen are integers), only the byte layout is compressed.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 9)]


def varint_encode_offsets(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array (values < 2**63). Returns
    (byte array, per-value END byte offsets) so callers can slice the
    stream per group without re-encoding."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    vmax = v.max()
    if vmax < np.uint64(128):
        # single-byte fast path: the bytes ARE the values (tf/doclen
        # columns are almost always in this regime)
        return (v.astype(np.uint8),
                np.arange(1, v.size + 1, dtype=np.int64))
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        if t > vmax:
            break
        nbytes += (v >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - nbytes
    for i in range(9):
        mask = nbytes > i
        if not mask.any():
            break
        byte = (v[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)
        cont = (nbytes[mask] > i + 1).astype(np.uint8) << 7
        out[starts[mask] + i] = byte.astype(np.uint8) | cont
    return out, ends


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (values < 2**63)."""
    out, _ = varint_encode_offsets(vals)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    if is_end.all():  # every value < 128: the bytes ARE the values
        return b.astype(np.uint64)
    ends = np.nonzero(is_end)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its value
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(
        starts, ends - starts + 1)
    payload = (b & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    return np.add.reduceat(payload, starts)


def delta_encode(sorted_vals: np.ndarray) -> bytes:
    """Delta-from-previous varint encoding of an ascending int array.
    First delta is from 0 at the caller's chosen base (pass values
    already rebased to the block's min_doc)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    deltas = varint_decode(buf)
    return np.cumsum(deltas, dtype=np.uint64)
