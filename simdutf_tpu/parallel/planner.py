"""Shard planner: split a byte corpus into per-device blocks.

Boundaries are pulled back (<= 3 bytes for UTF-8, 1 unit for UTF-16) so no
codepoint straddles a shard — the trim_partial contract
(implementation.h:2690-2716, scalar/utf8.h:257-288) applied at shard
joints. Offsets are kept so shard-local error positions / counts recombine
into exactly the single-buffer result.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ShardPlan(NamedTuple):
    #: (n_shards, shard_cap) zero-padded payloads (uint8, or uint16/uint32
    #: for unit=2/4 plans)
    shards: np.ndarray
    #: (n_shards,) logical length of each shard, in CODE UNITS of the plan
    #: (bytes for unit=1, u16 units for unit=2, words for unit=4)
    lengths: np.ndarray
    #: (n_shards,) global offset of each shard's first code unit
    offsets: np.ndarray
    #: total logical code units (== lengths.sum())
    total: int


def plan_shards(
    data,
    n_shards: int,
    unit: int = 1,
    align: int = 512,
    big_endian: bool = False,
) -> ShardPlan:
    """Split ``data`` (uint8 array / bytes) into ``n_shards`` blocks.

    ``unit``: 1 for UTF-8/Latin1 (trim at codepoint boundary), 2 for UTF-16
    (trim at surrogate-pair boundary, honoring ``big_endian``), 4 for
    UTF-32 (no trimming needed). ``align``: shard capacity is padded to
    this multiple.

    For ``unit == 2`` the shard payloads, lengths and offsets are in
    UTF-16 code units (uint16 shards) so shard-local error positions add
    directly to offsets.
    """
    if not isinstance(data, np.ndarray):
        data = np.frombuffer(bytes(data), dtype=np.uint8)
    if data.dtype in (np.dtype(np.uint16), np.dtype(np.uint32)):
        if unit != data.dtype.itemsize:
            raise ValueError(
                f"unit={unit} disagrees with dtype {data.dtype} "
                f"({data.dtype.itemsize}-byte code units)")
        data = data.view(np.uint8) if data.flags["C_CONTIGUOUS"] else (
            np.ascontiguousarray(data).view(np.uint8)
        )
    n = int(data.shape[0])
    if unit in (2, 4) and n % unit:
        # match the one-shot API, which rejects byte buffers that are not
        # a whole number of code units (np.frombuffer raises) — silently
        # flooring would declare a dangling fragment "valid"
        raise ValueError(
            f"byte length {n} is not a multiple of the {unit}-byte "
            f"code unit")
    base = n // n_shards
    cuts = [0]
    for s in range(1, n_shards):
        tgt = s * base
        # snap to a unit boundary first
        tgt -= tgt % unit
        if unit == 1:
            tgt = _cut_utf8(data, tgt)
        elif unit == 2:
            tgt = _cut_utf16(data, tgt, big_endian)
        cuts.append(max(tgt, cuts[-1]))
    cuts.append(n)
    lengths = np.array([cuts[i + 1] - cuts[i] for i in range(n_shards)], np.int64)
    offsets = np.array(cuts[:-1], dtype=np.int64)
    if int(lengths.max(initial=0)) >= 2**31 - 512:
        # shard-local positions are int32 on device (BIG sentinel); a
        # wrapped length would silently validate nothing
        raise ValueError(
            f"largest shard is {int(lengths.max())} bytes; use more than "
            f"{n_shards} shards so each stays under 2**31-512")
    cap = int(lengths.max(initial=1))
    cap = (cap + align - 1) // align * align
    shards = np.zeros((n_shards, cap), dtype=np.uint8)
    for i in range(n_shards):
        shards[i, : lengths[i]] = data[cuts[i] : cuts[i + 1]]
    if unit in (2, 4):
        dt = np.uint16 if unit == 2 else np.uint32
        return ShardPlan(
            shards.view(dt).reshape(n_shards, cap // unit),
            (lengths // unit).astype(np.int32),
            offsets // unit,
            n // unit,
        )
    return ShardPlan(shards, lengths.astype(np.int32), offsets, n)


def plan_shards_base64(
    data, n_shards: int, options: int = 0, align: int = 512
) -> ShardPlan:
    """Shard a base64 character stream so every non-final shard contains a
    multiple-of-4 count of base64 characters (whitespace ignored) and all
    trailing padding stays in the final shard. Decoding shards
    independently then concatenating equals the single-buffer decode —
    the sharding contract of benchmarks/threaded.cpp lifted to base64.
    """
    from ..golden import base64_impl as gb64

    if not isinstance(data, np.ndarray):
        data = np.frombuffer(bytes(data), dtype=np.uint8)
    n = int(data.shape[0])
    tab = gb64.value_table(options)
    is_char = tab[data] <= 63
    prefix = np.cumsum(is_char.astype(np.int64))
    # keep the trailing '='/whitespace epilogue in the last shard
    nz = np.flatnonzero(is_char)
    last_char_end = int(nz[-1]) + 1 if len(nz) else 0
    base = n // n_shards
    cuts = [0]
    for s in range(1, n_shards):
        tgt = min(s * base, last_char_end)
        # pull back so the prefix holds a whole number of quads: the cut
        # lands right after the (4j)-th base64 char
        chars = int(prefix[tgt - 1]) if tgt > 0 else 0
        j = chars // 4 * 4
        cut = int(nz[j - 1]) + 1 if j > 0 else 0
        cuts.append(max(cut, cuts[-1]))
    cuts.append(n)
    lengths = np.array([cuts[i + 1] - cuts[i] for i in range(n_shards)], np.int64)
    offsets = np.array(cuts[:-1], dtype=np.int64)
    if int(lengths.max(initial=0)) >= 2**31 - 512:
        # shard-local positions are int32 on device (BIG sentinel); a
        # wrapped length would silently validate nothing
        raise ValueError(
            f"largest shard is {int(lengths.max())} bytes; use more than "
            f"{n_shards} shards so each stays under 2**31-512")
    cap = max(int(lengths.max(initial=1)), 4)
    cap = (cap + align - 1) // align * align
    shards = np.zeros((n_shards, cap), dtype=np.uint8)
    for i in range(n_shards):
        shards[i, : lengths[i]] = data[cuts[i] : cuts[i + 1]]
    return ShardPlan(shards, lengths.astype(np.int32), offsets, n)


def _cut_utf8(data: np.ndarray, tgt: int) -> int:
    """Move ``tgt`` back so data[:tgt] ends on a codepoint boundary."""
    n = data.shape[0]
    if tgt <= 0 or tgt >= n:
        return max(0, min(tgt, n))
    t = tgt
    # skip back over continuations to the lead of the sequence containing
    # byte tgt-? — at most 3 steps in valid UTF-8
    back = 0
    while t > 0 and back < 4 and (int(data[t]) & 0xC0) == 0x80:
        t -= 1
        back += 1
    # t now points at a lead (or we give up and keep tgt for invalid data)
    if (int(data[t]) & 0xC0) == 0x80:
        return tgt
    b = int(data[t])
    seq = 1 if b < 0x80 else (2 if b < 0xE0 else (3 if b < 0xF0 else 4))
    if b < 0xC0 and t != tgt:
        return tgt  # stray continuation run: invalid anyway, keep cut
    return t if t + seq > tgt else tgt


def _cut_utf16(data: np.ndarray, tgt: int, big_endian: bool = False) -> int:
    """UTF-16: don't cut between a high and low surrogate
    (scalar/utf16.h:114-124), reading the boundary unit in the corpus's
    own endianness."""
    if tgt < 2 or tgt >= data.shape[0]:
        return tgt
    if big_endian:
        last = (int(data[tgt - 2]) << 8) | int(data[tgt - 1])
    else:
        last = int(data[tgt - 2]) | (int(data[tgt - 1]) << 8)
    if (last & 0xFC00) == 0xD800:
        return tgt - 2
    return tgt


def plan_shards_binary3(data, n_shards: int, align: int = 1536) -> ShardPlan:
    """Shard a BINARY payload for base64 ENCODING: every non-final shard
    holds a multiple of 3 bytes, so each shard's 3->4 encoding is a
    self-contained run of whole quads and the outputs concatenate into
    exactly the single-buffer encoding (benchmarks/threaded.cpp's
    embarrassingly-parallel split applied to the encode direction —
    encode needs no content scan, only the 3-alignment). ``align`` 1536
    keeps every shard on the word-plane encode path
    (ops/base64_ops.encode_bulk)."""
    if not isinstance(data, np.ndarray):
        data = np.frombuffer(bytes(data), dtype=np.uint8)
    n = int(data.shape[0])
    base = n // max(n_shards, 1)
    cuts = [0]
    for s in range(1, n_shards):
        tgt = s * base
        tgt -= tgt % 3
        cuts.append(max(tgt, cuts[-1]))
    cuts.append(n)
    lengths = np.array(
        [cuts[i + 1] - cuts[i] for i in range(n_shards)], np.int64)
    offsets = np.array(cuts[:-1], dtype=np.int64)
    cap = int(lengths.max(initial=1))
    cap = (cap + align - 1) // align * align
    shards = np.zeros((n_shards, cap), dtype=np.uint8)
    for i in range(n_shards):
        shards[i, : lengths[i]] = data[cuts[i] : cuts[i + 1]]
    return ShardPlan(shards, lengths.astype(np.int32), offsets, n)
