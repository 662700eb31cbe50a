"""Whitespace-compaction butterfly for forgiving base64
(kernels/butterfly64 + ops/base64_ops.decode_bulk_routed), run in Pallas
interpret mode on CPU: bit-identical to the scatter path across
whitespace densities, garbage placement (exact fallback), url/both
alphabets, partial tails, and the pathological all-whitespace case that
must trip the composition candidate bound (cand_ok fallback).

Reference behavior mirrored: compress_block + staging of
generic/base64.h:114-141 and the decoder options matrix."""

import base64 as pyb64

import numpy as np
import jax.numpy as jnp
import pytest

import simdutf_tpu.kernels.butterfly64 as kb64
import simdutf_tpu.ops.base64_ops as ob
from simdutf_tpu.ops import engine_probe as ep


def _pad_tile(data: bytes):
    n = max(
        kb64.TILE, ((len(data) + kb64.TILE - 1) // kb64.TILE) * kb64.TILE
    )
    p = np.zeros(n, np.uint8)
    p[: len(data)] = np.frombuffer(data, np.uint8)
    return jnp.asarray(p), jnp.int32(len(data))


def _mime(nbytes: int, every: int = 76, ws: bytes = b"\r\n") -> bytes:
    raw = pyb64.b64encode(bytes(range(256)) * 64)
    line = raw[:every]
    return (line + ws) * (nbytes // (every + len(ws)) + 1)


CORPORA = {
    "clean": pyb64.b64encode(b"hello world" * 4000),
    "mime_crlf": _mime(70000),
    "mime_lf": _mime(70000, ws=b"\n"),
    "space_every_4": b" ".join(b"TWFu" for _ in range(12000)),
    "tabs_formfeed": b"TWFu\t\x0c" * 9000,
    "partial_tail": _mime(70000)[: 70000 - (70000 % 4) + 2],
}


@pytest.mark.parametrize("name", sorted(CORPORA))
@pytest.mark.parametrize("url,both", [(False, False), (True, False),
                                      (False, True)])
def test_compact_matches_scatter(name, url, both):
    chars, length = _pad_tile(bytes(CORPORA[name]))
    want = [np.asarray(x) for x in
            ob.decode_bulk(chars, length, url, both)]
    # route through the public wrapper with the butterfly pinned
    import unittest.mock as mock

    with mock.patch.object(ep, "_CHOICE64", "butterfly"):
        got = [np.asarray(x) for x in
               ob.decode_bulk_routed(chars, length, url, both)]
    # clean inputs take the fast branch: first_bad is BIG in both (no bad
    # char), every payload output must be identical
    for i, (w, g) in enumerate(zip(want, got)):
        assert np.array_equal(w, g), (name, url, both, i)


def test_garbage_falls_back_exactly():
    data = bytearray(_mime(40000))
    data[12345] = ord("*")
    chars, length = _pad_tile(bytes(data))
    import unittest.mock as mock

    want = [np.asarray(x) for x in
            ob.decode_bulk(chars, length, False, False)]
    with mock.patch.object(ep, "_CHOICE64", "butterfly"):
        got = [np.asarray(x) for x in
               ob.decode_bulk_routed(chars, length, False, False)]
    for w, g in zip(want, got):
        assert np.array_equal(w, g)
    assert int(want[0]) == 12345  # exact first_bad preserved


def test_all_whitespace_trips_cand_bound():
    data = b" " * (3 * kb64.TILE) + b"TWFu"
    chars, length = _pad_tile(data)
    dense, nvalid, first_bad, nvalid_at_bad, cand_ok, off = (
        kb64.compact_codes(chars, length, False, False))
    assert int(first_bad) == kb64.BIG
    assert int(nvalid) == 4
    # whether or not the bound trips, the routed path must stay exact
    import unittest.mock as mock

    want = [np.asarray(x) for x in
            ob.decode_bulk(chars, length, False, False)]
    with mock.patch.object(ep, "_CHOICE64", "butterfly"):
        got = [np.asarray(x) for x in
               ob.decode_bulk_routed(chars, length, False, False)]
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def test_padded_tail_does_not_trip_cand_bound():
    """The padded region beyond ``length`` is a run of EMPTY segments
    (off == nvalid); they intersect no output window and must not count
    against CAND — the unclamped bound flagged every bench-scale MIME
    corpus as pathological and silently shipped the scatter fallback
    (0.09 GB/s vs the fast path's 0.91, 2026-08-20)."""
    data = _mime(3 * kb64.TILE)  # ~3 tiles of content
    arr = np.frombuffer(data, np.uint8)
    n = 8 * kb64.TILE  # 5 empty trailing tiles
    p = np.zeros(n, np.uint8)
    p[: len(arr)] = arr
    import jax.numpy as jnp

    dense, nvalid, first_bad, nvalid_at_bad, cand_ok, off = (
        kb64.compact_codes(jnp.asarray(p), jnp.int32(len(arr)),
                           False, False))
    assert bool(cand_ok)
    assert int(first_bad) == kb64.BIG


def test_in_kernel_first_bad_events_exact():
    """first_bad/nvalid_at_bad come from in-kernel events now (no
    fallback engine for invalid chars): exact parity with the scatter
    engine at every injection site, including tile boundaries."""
    base = _mime(5 * kb64.TILE)
    for pos in (0, 1, kb64.TILE - 1, kb64.TILE, kb64.TILE + 7,
                2 * kb64.TILE - 1, len(base) - 1):
        data = bytearray(base)
        data[pos] = ord("*")
        chars, length = _pad_tile(bytes(data))
        want = ob.decode_bulk(chars, length, False, False)
        got = kb64.compact_codes(chars, length, False, False)
        assert int(got[2]) == int(want[0]), pos      # first_bad
        assert int(got[3]) == int(want[2]), pos      # nvalid_at_bad
        assert int(got[1]) == int(want[1]), pos      # nvalid


def test_dense_stream_decodes_end_to_end():
    payload = bytes(range(256)) * 300
    data = _b64_wrap(payload)
    chars, length = _pad_tile(data)
    dense, nvalid, first_bad, nvalid_at_bad, cand_ok, off = (
        kb64.compact_codes(chars, length, False, False))
    assert int(first_bad) == kb64.BIG and bool(cand_ok)
    clean = pyb64.b64encode(payload)
    assert int(nvalid) == len(clean)
    # dense stream ships in word form (code q at byte q%4 of word q//4)
    codes = np.asarray(dense).reshape(-1, 1).view(np.uint8).reshape(-1)[
        : int(nvalid)]
    tab = np.full(256, 255, np.uint8)
    alpha = b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    for i, ch in enumerate(alpha):
        tab[ch] = i
    assert np.array_equal(codes, tab[np.frombuffer(clean, np.uint8)])


def _b64_wrap(payload: bytes) -> bytes:
    raw = pyb64.b64encode(payload)
    return b"\r\n".join(raw[i : i + 76] for i in range(0, len(raw), 76))


def test_public_api_forgiving_decode_butterfly(monkeypatch):
    """End-to-end through the host API with the butterfly pinned."""
    monkeypatch.setattr(ep, "_CHOICE64", "butterfly")
    import simdutf_tpu as su

    payload = b"The quick brown fox! " * 3000
    wrapped = _b64_wrap(payload)
    res, out = su.base64_to_binary(wrapped)
    assert res.is_ok
    assert out == payload
