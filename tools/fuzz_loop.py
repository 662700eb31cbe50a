#!/usr/bin/env python
"""Continuous differential fuzz loop across implementation tiers.

The reference's fuzz/ subsystem (fuzz/conversion.cpp, fuzz/roundtrip.cpp,
fuzz/base64.cpp; fuzz/README.md: "deviations are not tolerated") as a
long-running harness: random byte soups are pushed through every
registered implementation and all results — outputs, error codes, exact
error positions, counts — must agree bit-for-bit; a sample is additionally
cross-checked against the independent oracle (tests/oracle.py). The
reference's `use_canary_in_output` knob (fuzz/conversion.cpp:29-31) maps
to the `_into` canary check: capacity buffers are pre-filled with 0xAA and
bytes beyond the reported written length must be untouched.

On any deviation a standalone repro file is dumped into fuzz_repros/
(op name, options, input hex, per-tier results) and the loop continues.

Usage:
    python tools/fuzz_loop.py --seconds 3600 [--seed 0] [--max-bytes 4096]
    python tools/fuzz_loop.py --iterations 500
Exit code 0 when no deviations were found.
"""

from __future__ import annotations

import argparse
import base64 as pybase64
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/../tests")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # The axon sitecustomize snapshots JAX_PLATFORMS at its own import, so
    # the env var alone is not enough to force CPU (tests/conftest.py does
    # the same dance).
    import jax

    jax.config.update("jax_platforms", "cpu")

import helpers  # noqa: E402  (tests/helpers.py generators)
import oracle  # noqa: E402
import simdutf_tpu as su  # noqa: E402

REPRO_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "fuzz_repros")


def gen_case(rng: random.Random, max_bytes: int) -> bytes:
    """One fuzz input: valid text, mutated text, raw bytes, pathological
    splices, whitespace-laced base64 — the reference fuzzers' input mix."""
    n = rng.randrange(0, max_bytes)
    kind = rng.randrange(7)
    seed = rng.randrange(1 << 30)
    if kind == 6:  # astral-pure (exercises the uniform-4 wordmap kernels)
        r2 = random.Random(seed)
        s = "".join(chr(r2.randrange(0x10000, 0x110000))
                    for _ in range(n // 4))
        enc = r2.choice(["utf-8", "utf-16-le", "utf-32-le"])
        data = s.encode(enc)
        if r2.randrange(3) == 0:
            data = helpers.mutate(data, seed ^ 0xA57, r2.randrange(1, 4))
        return data
    if kind == 0:  # valid UTF-8, random byte-class mix
        w = [rng.randrange(0, 4) for _ in range(4)]
        if sum(w) == 0:
            w = [1, 1, 1, 1]
        return helpers.random_utf8(seed, n, *w)
    if kind == 1:  # valid text with random mutations
        data = helpers.random_utf8(seed, n, 2, 1, 1, 1)
        return helpers.mutate(data, seed ^ 0x9E37, rng.randrange(1, 6))
    if kind == 2:  # raw byte soup
        return helpers.random_bytes(seed, n)
    if kind == 3:  # pathological splice around known-hard lead bytes
        bad = rng.choice([b"\x80", b"\xc0\xaf", b"\xe0\x80", b"\xf4\x90",
                          b"\xed\xa0\x80", b"\xf0\x80\x80", b"\xc2", b"\xf4"])
        return (helpers.random_utf8(seed, n // 2, 1, 1, 0, 0) + bad
                + helpers.random_utf8(seed + 1, n // 2, 1, 0, 1, 1))
    if kind == 4:  # base64-ish: valid, whitespace-laced, or mutated
        payload = helpers.random_bytes(seed, n)
        enc = pybase64.b64encode(payload)
        style = rng.randrange(3)
        if style == 0:
            return enc
        if style == 1:  # legal whitespace injection
            out = bytearray()
            for i, c in enumerate(enc):
                out.append(c)
                if rng.randrange(7) == 0:
                    out += rng.choice([b" ", b"\n", b"\t", b"\r", b"\x0c"])
            return bytes(out)
        return helpers.mutate(enc, seed, rng.randrange(1, 4))
    # kind == 5: UTF-16-shaped bytes (valid or soup), as raw LE bytes
    if rng.randrange(2):
        units = helpers.random_utf16(seed, n // 2, 2, 1)
        return units
    return helpers.random_bytes(seed, (n // 2) * 2)


def _norm(v):
    """Hashable, comparison-stable view of an API result."""
    if isinstance(v, np.ndarray):
        return v.tobytes()
    if isinstance(v, tuple):
        return tuple(_norm(x) for x in v)
    return v


CANARY = 0xAA


def _into_canary(data: bytes, rng: random.Random):
    """Capacity-buffer discipline for one _into variant: bytes beyond the
    reported written length must keep their canary value."""
    choices = (
        ("convert_utf8_to_utf16le_into", np.uint16,
         su.utf16_length_from_utf8, su.convert_utf8_to_utf16le_into),
        ("convert_utf8_to_utf32_into", np.uint32,
         su.utf32_length_from_utf8, su.convert_utf8_to_utf32_into),
        ("convert_latin1_to_utf8_into", np.uint8,
         su.utf8_length_from_latin1, su.convert_latin1_to_utf8_into),
    )
    name, dt, lenfn, fn = choices[rng.randrange(len(choices))]
    cap = int(lenfn(data)) + rng.randrange(0, 8)
    buf = np.full(cap, CANARY, dtype=dt)
    written = fn(data, buf)
    tail = buf[written:]
    if tail.size and not bool(np.all(tail == np.array(CANARY, dtype=dt))):
        return name, written, buf.tobytes()
    return None


OPS = []


def op(name):
    def reg(fn):
        OPS.append((name, fn))
        return fn
    return reg


@op("utf8_family")
def _utf8(impl_data):
    data = impl_data
    r = su.validate_utf8_with_errors(data)
    return (
        r,
        su.convert_utf8_to_utf16le_with_errors(data),
        su.convert_utf8_to_utf16be_with_errors(data),
        su.convert_utf8_to_utf32_with_errors(data),
        su.convert_utf8_to_latin1_with_errors(data),
        su.count_utf8(data),
        su.utf16_length_from_utf8(data),
        su.utf32_length_from_utf8(data),
        su.trim_partial_utf8(data),
        su.autodetect_encoding(data),
    )


@op("utf16_family")
def _utf16(data):
    data = data[: len(data) // 2 * 2]  # code-unit aligned
    return (
        su.validate_utf16le_with_errors(data),
        su.validate_utf16be_with_errors(data),
        su.convert_utf16le_to_utf8_with_errors(data),
        su.convert_utf16be_to_utf8_with_errors(data),
        su.convert_utf16le_to_utf32_with_errors(data),
        su.convert_utf16le_to_latin1_with_errors(data),
        su.count_utf16le(data),
        su.utf8_length_from_utf16le(data),
        su.to_well_formed_utf16le(data),
        su.change_endianness_utf16(data),
        su.trim_partial_utf16le(data),
    )


@op("utf32_latin1_family")
def _utf32(data):
    data = data[: len(data) // 4 * 4]  # code-unit aligned
    return (
        su.validate_utf32_with_errors(data),
        su.convert_utf32_to_utf8_with_errors(data),
        su.convert_utf32_to_utf16le_with_errors(data),
        su.convert_utf32_to_latin1_with_errors(data),
        su.convert_latin1_to_utf8(data),
        su.convert_latin1_to_utf16le(data),
        su.convert_latin1_to_utf32(data),
        su.utf8_length_from_latin1(data),
    )


@op("batch_vs_single")
def _batch(data):
    """Batch API must agree item-for-item with the single-buffer API."""
    import simdutf_tpu.batch as sb

    items = [data[i::3] for i in range(3)] + [b"", data]
    got = list(sb.validate_utf8_batch(items))
    want = [su.validate_utf8_with_errors(it) for it in items]
    assert got == want, f"batch validate diverges: {got} vs {want}"
    gb64 = sb.base64_to_binary_batch(items)
    wb64 = [su.base64_to_binary_details(it) for it in items]
    assert [(f, o) for f, o in gb64] == [(f, _norm(o)) for f, o in wb64], \
        "batch base64 decode diverges"
    ge = sb.binary_to_base64_batch(items)
    we = [_norm(su.binary_to_base64(it)) for it in items]
    assert ge == we, "batch base64 encode diverges"
    cnt = [int(c) for c in sb.count_utf8_batch(items)]
    wcnt = [su.count_utf8(it) for it in items]
    assert cnt == wcnt, f"batch count diverges: {cnt} vs {wcnt}"
    return (tuple(want), tuple(wcnt))


@op("properties")
def _props(data):
    """Cross-function invariants (fuzz/roundtrip.cpp spirit); violations
    raise (asserted per tier, not just compared across tiers)."""
    w = data[: len(data) // 2 * 2]
    wf = su.to_well_formed_utf16le(w)
    assert su.validate_utf16le(wf), "to_well_formed output must validate"
    assert _norm(su.to_well_formed_utf16le(wf)) == _norm(wf), \
        "to_well_formed must be idempotent"
    assert _norm(su.change_endianness_utf16(
        su.change_endianness_utf16(w))) == w, \
        "change_endianness must be an involution"
    t = su.trim_partial_utf8(data)
    assert len(data) - 3 <= t <= len(data), "trim backs off at most 3 bytes"
    if su.validate_utf8(data):
        assert t == len(data), "trim_partial must keep whole valid buffers"
        assert su.trim_partial_utf8(data[:t]) == t, \
            "trim must be idempotent on valid data"
    # (on garbage, the reference itself re-trims: 0xFF then 0xFE both
    # trigger scalar/utf8.h:279-288's >=0xC0 test — no idempotence there)
    return (_norm(wf), t, su.detect_encodings(data),
            su.autodetect_encoding(data))


@op("stream_family")
def _stream(data):
    """Chunked streaming vs one-shot (stream.py): same output bytes, same
    error code, same global first-error offset — for a pseudo-random but
    input-determined chunking."""
    from simdutf_tpu import stream as st

    rng = random.Random(len(data) * 2654435761 % (1 << 31))
    parts, pos = [], 0
    while pos < len(data):
        step = rng.randrange(1, max(2, len(data) // 3))
        parts.append(data[pos:pos + step])
        pos += step
    def split(buf):
        r, pos2, ps = random.Random(len(buf) ^ 0x5F3759DF), 0, []
        while pos2 < len(buf):
            step = r.randrange(1, max(2, len(buf) // 3))
            ps.append(buf[pos2:pos2 + step])
            pos2 += step
        return ps

    out = []
    for src, dst in (("utf8", "utf16le"), ("utf8", "utf32"),
                     ("utf16le", "utf8")):
        feed = data if src == "utf8" else data[: len(data) // 2 * 2]
        t = st.StreamTranscoder(src, dst)
        try:
            got = b"".join([t.push(p) for p in split(feed)]) + t.finish()
            err = None
        except st.StreamingError as e:
            got, err = e.partial, (int(e.error), e.count)
        if src == "utf8":
            res, want = su.convert_utf8_to_utf16le_with_errors(data) \
                if dst == "utf16le" else \
                su.convert_utf8_to_utf32_with_errors(data)
        else:
            res, want = su.convert_utf16le_to_utf8_with_errors(feed)
        if res.is_ok:
            assert err is None and got == want, \
                f"stream {src}->{dst} diverges on valid input"
        else:
            assert err == (int(res.error), res.count), \
                f"stream {src}->{dst} error mismatch: {err} vs {res}"
        out.append((err, got if err is None else got[:64]))
    d = st.Base64StreamDecoder(0, 0)
    try:
        bout = b"".join([d.push(p) for p in parts]) + d.finish()
        berr = None
    except st.StreamingError as e:
        bout, berr = e.partial, int(e.error)
    full, bwant = su.base64_to_binary_details(data, 0, 0)
    if full.is_ok:
        assert berr is None and bout == bwant, "stream base64 diverges"
    else:
        assert berr == int(full.error) and \
            d.result.input_count == full.input_count, \
            f"stream base64 error mismatch {berr} vs {full}"
    out.append((berr, bout[:64]))
    return tuple(out)


@op("base64_family")
def _b64(data):
    out = []
    for options in (0, 1, 8, 9, 16):
        for chunk in (0, 1, 2):
            out.append(su.base64_to_binary_details(data, options, chunk))
    out.append(su.binary_to_base64(data, 0))
    out.append(su.binary_to_base64(data, 1))
    out.append(su.binary_to_base64(data, 2))
    return tuple(out)


def oracle_check(data: bytes) -> list[str]:
    """Cross-check the active tier against the independent oracle AND
    CPython's codecs (a second, fully independent implementation:
    UnicodeDecodeError.start is the first-error offset and must equal our
    result.count; valid-input transcodes must match codecs byte-for-byte)."""
    bad = []
    if su.validate_utf8_with_errors(data) != oracle.validate_utf8_with_errors(data):
        bad.append("validate_utf8_with_errors")
    got = su.base64_to_binary_details(data, 0, 0)
    want = oracle.base64_to_binary(data, 0, 0)
    if (got[0], _norm(got[1])) != (want[0], bytes(want[1])):
        bad.append("base64_to_binary_details")
    # CPython second oracle: utf-8
    r = su.validate_utf8_with_errors(data)
    try:
        text = data.decode("utf-8")
        if not r.is_ok or r.count != len(data):
            bad.append("cpython_utf8_valid_disagrees")
        elif _norm(su.convert_utf8_to_utf16le(data)) != text.encode("utf-16-le"):
            bad.append("cpython_utf8_to_utf16le_bytes")
        elif _norm(su.convert_utf8_to_utf32(data)) != text.encode("utf-32-le"):
            bad.append("cpython_utf8_to_utf32_bytes")
    except UnicodeDecodeError as e:
        if r.is_ok or r.count != e.start:
            bad.append(f"cpython_utf8_first_error({e.start}!={r.count})")
    # CPython second oracle: utf-16-le (unit-aligned slice)
    w = data[: len(data) // 2 * 2]
    r16 = su.validate_utf16le_with_errors(w)
    try:
        w.decode("utf-16-le")
        if not r16.is_ok:
            bad.append("cpython_utf16_valid_disagrees")
    except UnicodeDecodeError as e:
        if r16.is_ok or r16.count != e.start // 2:
            bad.append(f"cpython_utf16_first_error({e.start//2}!={r16.count})")
    return bad


def dump_repro(op_name, data, per_tier, note=""):
    os.makedirs(REPRO_DIR, exist_ok=True)
    stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    path = os.path.join(REPRO_DIR, f"{stamp}_{op_name}_{len(data)}.json")
    rec = {
        "op": op_name,
        "input_hex": data.hex() if isinstance(data, (bytes, bytearray)) else repr(data),
        "note": note,
        "tiers": {k: repr(v)[:2000] for k, v in per_tier.items()},
    }
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=0)
    ap.add_argument("--iterations", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-bytes", type=int, default=2048)
    ap.add_argument("--oracle-every", type=int, default=8,
                    help="oracle cross-check every N cases (0=off)")
    args = ap.parse_args()
    if not args.seconds and not args.iterations:
        args.iterations = 100

    rng = random.Random(args.seed)
    impls = sorted(su.get_available_implementations())
    print(f"fuzzing tiers: {impls}", file=sys.stderr)
    t0 = time.time()
    i = deviations = 0
    while True:
        if args.seconds and time.time() - t0 > args.seconds:
            break
        if args.iterations and i >= args.iterations:
            break
        i += 1
        data = gen_case(rng, args.max_bytes)
        op_name, fn = OPS[rng.randrange(len(OPS))]
        per_tier = {}
        for name in impls:
            su.set_active_implementation(name)
            try:
                per_tier[name] = _norm(fn(data))
            except Exception as e:  # a crash in any tier is a finding
                per_tier[name] = f"EXCEPTION: {type(e).__name__}: {e}"
        su.set_active_implementation(impls[0])
        vals = set(map(repr, per_tier.values()))
        # identical exceptions across tiers are still findings (a masked
        # invariant violation), not agreement
        if len(vals) != 1 or any(
            isinstance(v, str) and v.startswith("EXCEPTION")
            for v in per_tier.values()
        ):
            deviations += 1
            p = dump_repro(op_name, data, per_tier)
            print(f"DEVIATION #{deviations} at case {i}: {op_name} -> {p}",
                  file=sys.stderr)
        if args.oracle_every and i % args.oracle_every == 0:
            bad = oracle_check(data)
            if bad:
                deviations += 1
                p = dump_repro("oracle:" + ",".join(bad), data,
                               {"active": "see op"}, note="oracle mismatch")
                print(f"ORACLE MISMATCH #{deviations} at case {i} -> {p}",
                      file=sys.stderr)
        if rng.randrange(4) == 0:
            c = _into_canary(helpers.random_utf8(rng.randrange(1 << 30),
                                                 rng.randrange(0, 512),
                                                 2, 1, 1, 1), rng)
            if c is not None:
                deviations += 1
                p = dump_repro("canary:" + c[0], b"", {"written": c[1]},
                               note="bytes beyond written length modified")
                print(f"CANARY OVERWRITE #{deviations} -> {p}", file=sys.stderr)
        if i % 50 == 0:
            rate = i / max(time.time() - t0, 1e-9)
            print(f"  {i} cases, {deviations} deviations, {rate:.1f}/s",
                  file=sys.stderr)
    print(json.dumps({"cases": i, "deviations": deviations,
                      "seconds": round(time.time() - t0, 1)}))
    return 1 if deviations else 0


if __name__ == "__main__":
    sys.exit(main())
