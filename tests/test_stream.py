"""Streaming API: chunked results must equal one-shot results exactly.

The invariant is the reference's streaming contract (trim_partial +
benchmarks/stream.cpp; base64 resume via base64_to_binary_safe): for any
split of the input into chunks, the concatenated streamed output, the
error code, and the *global* first-error offset must match the one-shot
call on the whole input.
"""

import random

import numpy as np
import pytest

import simdutf_tpu as su
from simdutf_tpu import stream as st
from simdutf_tpu.errors import error_code

import helpers


def _chunkings(data: bytes, rng: random.Random, n: int = 3):
    """A few adversarial splits: singles, tiny prefixes, random cuts."""
    yield [data]
    yield [data[i:i + 1] for i in range(len(data))] or [b""]
    for _ in range(n):
        cuts = sorted(rng.randrange(0, len(data) + 1)
                      for _ in range(rng.randrange(1, 6)))
        parts, pos = [], 0
        for c in cuts + [len(data)]:
            parts.append(data[pos:c])
            pos = c
        yield parts


def _stream_transcode(src, dst, parts):
    t = st.StreamTranscoder(src, dst)
    out = b""
    try:
        for p in parts:
            out += t.push(p)
        out += t.finish()
        return None, out
    except st.StreamingError as e:
        return e, out + e.partial


DIRECTIONS = [
    ("utf8", "utf16le"), ("utf8", "utf16be"), ("utf8", "utf32"),
    ("utf8", "latin1"), ("utf16le", "utf8"), ("utf16be", "utf8"),
    ("utf16le", "utf32"), ("utf32", "utf8"), ("utf32", "utf16le"),
    ("latin1", "utf8"), ("latin1", "utf16le"),
    ("utf16le", "utf16be"), ("utf8", "utf8"),
]


def _one_shot(src, dst, data):
    """One-shot (Result|None, bytes) via the same public API the stream
    uses, for ground truth."""
    if src == dst:
        r = su.validate_utf8_with_errors(data)
        return (r if r.is_err else None), (data if r.is_ok else None)
    fns = st._converters()
    res, out = (None, None)
    fn = fns[(src, dst)]
    got = fn(data)
    res, out = got
    return (res if res is not None and res.is_err else None), out


def _gen_input(src, rng, valid: bool) -> bytes:
    seed = rng.randrange(1 << 30)
    n = rng.randrange(0, 600)
    if src == "utf8":
        data = helpers.random_utf8(seed, n, 2, 1, 1, 1)
        if not valid:
            data = helpers.mutate(data, seed ^ 1, rng.randrange(1, 4))
        return data
    if src in ("utf16le", "utf16be"):
        units = helpers.random_utf16(seed, n // 2, 2, 1)
        if src == "utf16be":
            units = np.frombuffer(units, dtype=np.uint16).byteswap().tobytes()
        if not valid:
            units = helpers.mutate(units, seed ^ 2, rng.randrange(1, 4))
            units = units[: len(units) // 2 * 2]
        return units
    if src == "utf32":
        cps = [rng.choice([0x41, 0x3B1, 0x4E2D, 0x1F600])
               for _ in range(n // 4)]
        raw = b"".join(cp.to_bytes(4, "little") for cp in cps)
        if not valid:
            raw = helpers.mutate(raw, seed ^ 3, rng.randrange(1, 4))
            raw = raw[: len(raw) // 4 * 4]
        return raw
    # latin1: any bytes are valid
    return helpers.random_bytes(seed, n)


@pytest.mark.parametrize("src,dst", DIRECTIONS)
def test_stream_transcode_matches_one_shot(src, dst):
    rng = random.Random(hash((src, dst)) & 0xFFFF)
    for case in range(14):
        valid = case % 2 == 0
        data = _gen_input(src, rng, valid)
        want_err, want_out = _one_shot(src, dst, data)
        for parts in _chunkings(data, rng):
            got_err, got_out = _stream_transcode(src, dst, parts)
            if want_err is None:
                assert got_err is None, (
                    f"stream errored {got_err} on valid input {data!r}")
                assert got_out == want_out
            else:
                assert got_err is not None, (
                    f"stream missed error {want_err} on {data!r}")
                assert got_err.error == want_err.error
                assert got_err.count == want_err.count
                if src == dst:
                    # passthrough mode emits the validated prefix; the
                    # one-shot validator has no partial-output contract
                    assert got_out == data[:len(got_out)]
                    assert len(got_out) <= want_err.count
                else:
                    assert got_out == want_out


def test_stream_validator_matches_one_shot():
    rng = random.Random(7)
    vals = {
        "utf8": su.validate_utf8_with_errors,
        "utf16le": su.validate_utf16le_with_errors,
        "utf32": su.validate_utf32_with_errors,
        "ascii": su.validate_ascii_with_errors,
    }
    for enc, fn in vals.items():
        for case in range(10):
            data = _gen_input("utf8" if enc == "ascii" else enc, rng,
                              case % 2 == 0)
            if enc == "utf16le":
                data = data[: len(data) // 2 * 2]
            if enc == "utf32":
                data = data[: len(data) // 4 * 4]
            want = fn(data)
            for parts in _chunkings(data, rng, n=2):
                v = st.StreamValidator(enc)
                for p in parts:
                    v.push(p)
                got = v.finish()
                assert got == want, (enc, data)


def test_stream_validator_partial_tail_unit():
    v = st.StreamValidator("utf16le")
    v.push(b"a\x00b\x00")
    v.push(b"c")  # dangling half unit
    r = v.finish()
    assert r.is_err and r.error == error_code.TOO_SHORT and r.count == 2


def _b64_inputs(rng):
    import base64 as pyb64
    for case in range(16):
        n = rng.randrange(0, 200)
        payload = helpers.random_bytes(rng.randrange(1 << 30), n)
        enc = pyb64.b64encode(payload)
        style = case % 4
        if style == 1:  # whitespace-laced
            out = bytearray()
            for c in enc:
                out.append(c)
                if rng.randrange(5) == 0:
                    out += rng.choice([b" ", b"\n", b"\t", b"\r"])
            enc = bytes(out)
        elif style == 2:  # mutated (usually invalid)
            enc = helpers.mutate(enc, rng.randrange(1 << 30), 2)
        elif style == 3:  # unpadded tail
            enc = enc.rstrip(b"=")
        yield enc


@pytest.mark.parametrize("options", [0, 1, 4, 8])
@pytest.mark.parametrize("last", [0, 1, 2])
def test_stream_base64_decode_matches_one_shot(options, last):
    rng = random.Random(options * 31 + last)
    for data in _b64_inputs(rng):
        want_full, want_out = su.base64_to_binary_details(data, options, last)
        for parts in _chunkings(data, rng, n=2):
            d = st.Base64StreamDecoder(options, last)
            got_out, got_err = b"", None
            try:
                for p in parts:
                    got_out += d.push(p)
                got_out += d.finish()
            except st.StreamingError as e:
                got_err = e
                got_out += e.partial
            if want_full.is_ok:
                assert got_err is None, (
                    f"stream errored {got_err} on {data!r}")
                assert got_out == want_out, data
                assert d.result.input_count == want_full.input_count, data
                assert d.result.output_count == want_full.output_count, data
            else:
                assert got_err is not None, (
                    f"stream missed {want_full} on {data!r}")
                assert got_err.error == want_full.error, data
                assert d.result.input_count == want_full.input_count, data
                assert got_out == want_out, data


def test_stream_base64_encode_matches_one_shot():
    rng = random.Random(11)
    for options in (0, 1, 2):
        for _ in range(8):
            payload = helpers.random_bytes(rng.randrange(1 << 30),
                                           rng.randrange(0, 300))
            want = su.binary_to_base64(payload, options)
            for parts in _chunkings(payload, rng, n=2):
                e = st.Base64StreamEncoder(options)
                got = b"".join(e.push(p) for p in parts) + e.finish()
                assert got == want


def test_stream_rejects_bad_names():
    with pytest.raises(ValueError):
        st.StreamTranscoder("utf9", "utf8")
    with pytest.raises(ValueError):
        st.StreamTranscoder("utf8", "ascii")


def test_stream_finish_is_terminal():
    t = st.StreamTranscoder("utf8", "utf16le")
    t.finish()
    with pytest.raises(RuntimeError):
        t.push(b"x")


def test_validator_aligned_prefix_checked_before_fragment():
    """An earlier real error must win over the dangling-fragment
    TOO_SHORT (code-review finding: the fragment check used to run
    first and mask it)."""
    v = st.StreamValidator("utf16le")
    v.push(b"A\x00\x00\xd8\xff")  # valid unit, lone high surrogate, frag
    r = v.finish()
    assert (r.error, r.count) == (error_code.SURROGATE, 1), r

    t = st.StreamTranscoder("utf16le", "utf8")
    try:
        t.push(b"A\x00\x00\xd8\xff")
        t.finish()
        assert False, "expected StreamingError"
    except st.StreamingError as e:
        assert (e.error, e.count) == (error_code.SURROGATE, 1)


def test_validator_finish_is_terminal_even_after_error():
    v = st.StreamValidator("utf8")
    v.push(b"\xff")
    first = v.finish()
    assert first.is_err
    with pytest.raises(RuntimeError):
        v.push(b"more")


def test_b64_decoder_incremental_positions():
    """Whitespace-heavy pushes must decode incrementally (positions are
    tracked per chunk, not rescanned) and still match one-shot."""
    import base64 as pyb64

    payload = bytes(range(256))
    enc = pyb64.b64encode(payload)
    laced = b"".join(bytes([c]) + b" \n" for c in enc)
    d = st.Base64StreamDecoder()
    got = b""
    for i in range(0, len(laced), 7):
        got += d.push(laced[i:i + 7])
    got += d.finish()
    want_full, want = su.base64_to_binary_details(laced, 0, 0)
    assert got == want and d.result.input_count == want_full.input_count


def test_cli_stream_multifile_matches_one_shot(tmp_path):
    """--stream-mb spans all files with one stream, like the one-shot
    mode's input concatenation (quad/codepoint splits at file joints)."""
    import base64 as pyb64

    from simdutf_tpu.cli import main

    payload = b"0123456789abcdef" * 40 + b"x"
    enc = pyb64.b64encode(payload)
    f1 = tmp_path / "a.b64"; f1.write_bytes(enc[:13])   # mid-quad split
    f2 = tmp_path / "b.b64"; f2.write_bytes(enc[13:])
    out = tmp_path / "dec.bin"
    rc = main(["--base64-decode", "--stream-mb", "1",
               "-o", str(out), str(f1), str(f2)])
    assert rc == 0 and out.read_bytes() == payload

    s = "héllo wörld 日本語 " * 30
    u8 = s.encode()
    g1 = tmp_path / "a.txt"; g1.write_bytes(u8[:31])    # mid-codepoint split
    g2 = tmp_path / "b.txt"; g2.write_bytes(u8[31:])
    out2 = tmp_path / "o.bin"
    rc = main(["-f", "UTF-8", "-t", "UTF-16LE", "--stream-mb", "1",
               "-o", str(out2), str(g1), str(g2)])
    assert rc == 0 and out2.read_bytes() == s.encode("utf-16-le")


def test_stream_error_is_terminal():
    t = st.StreamTranscoder("utf8", "utf16le")
    with pytest.raises(st.StreamingError):
        t.push(b"ok\xffmore")
        t.finish()
    with pytest.raises(RuntimeError):
        t.push(b"x")
    d = st.Base64StreamDecoder()
    with pytest.raises(st.StreamingError):
        d.push(b"ab!c" * 2)
        d.finish()
    with pytest.raises(RuntimeError):
        d.push(b"aGVs")
