#!/usr/bin/env python
"""Extract the reference's adversarial test vectors as *data*.

The reference encodes years of found bugs in curated byte strings
(tests/validate_utf8_puzzler_tests.cpp, tests/special_tests.cpp). This
script mechanically parses those C++ string literals and writes them to
tests/data/ref_vectors.json so the conformance suite can replay them on
every implementation tier. Vectors are test data, not code.

Run: python tools/extract_ref_vectors.py   (re-generates the JSON)
"""

from __future__ import annotations

import base64
import json
import os
import re
import sys

REF = "/root/reference/tests"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "ref_vectors.json")

_HEX = "0123456789abcdefABCDEF"
_SIMPLE = {"n": "\n", "t": "\t", "r": "\r", "0": "\0", "\\": "\\",
           '"': '"', "'": "'", "a": "\a", "b": "\b", "f": "\f", "v": "\v"}


def decode_c_literal(body: str) -> bytes:
    """Decode the inside of one C string literal to bytes.

    C's \\x escape greedily consumes hex digits; every literal we parse
    uses exactly two (asserted), where Python's codec semantics agree."""
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c != "\\":
            out.append(ord(c))
            i += 1
            continue
        e = body[i + 1]
        if e == "x":
            j = i + 2
            while j < len(body) and body[j] in _HEX:
                j += 1
            run = body[i + 2 : j]
            assert len(run) == 2, f"ambiguous C hex escape \\x{run}"
            out.append(int(run, 16))
            i = j
        elif e in _SIMPLE:
            out.append(ord(_SIMPLE[e]))
            i += 2
        else:
            raise ValueError(f"unhandled escape \\{e}")
    return bytes(out)


def split_top_level(src: str):
    """Split an initializer body at top-level commas, respecting string
    literals and nested braces."""
    parts, depth, in_str, esc, cur = [], 0, False, False, []
    for ch in src:
        if in_str:
            cur.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
            cur.append(ch)
        elif ch in "{([":
            depth += 1
            cur.append(ch)
        elif ch in "})]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def literals_to_bytes(chunk: str) -> bytes:
    """Concatenate all adjacent C string literals in ``chunk``."""
    bodies = re.findall(r'"((?:[^"\\]|\\.)*)"', chunk)
    return b"".join(decode_c_literal(b) for b in bodies)


def block_of(src: str, test_name: str) -> str:
    m = re.search(rf"TEST\({test_name}\)\s*\{{", src)
    assert m, test_name
    i, depth = m.end(), 1
    j = i
    while depth:
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
        j += 1
    return src[i : j - 1]


def string_array(block: str, decl_re: str):
    """Return list[bytes] from `std::string cases[] = { ... };`-style."""
    m = re.search(decl_re, block)
    assert m, decl_re
    i = block.index("{", m.end() - 1) + 1
    depth, j = 1, i
    while depth:
        if block[j] == "{":
            depth += 1
        elif block[j] == "}":
            depth -= 1
        j += 1
    entries = split_top_level(block[i : j - 1])
    return [literals_to_bytes(e) for e in entries if '"' in e]


def int_array(block: str) -> list[int]:
    m = re.search(r"=\s*\{", block)
    i = block.index("{", m.start()) + 1
    depth, j = 1, i
    while depth:
        if block[j] == "{":
            depth += 1
        elif block[j] == "}":
            depth -= 1
        j += 1
    inner = block[i : j - 1].strip()
    if inner.startswith("{"):  # vector-of-vector: take first row set
        inner = inner[1:-1]
    return [int(tok) for tok in re.findall(r"\d+", inner)]


def b64(data: bytes) -> str:
    return base64.b64encode(data).decode()


def main():
    with open(f"{REF}/validate_utf8_puzzler_tests.cpp") as f:
        puz = f.read()
    with open(f"{REF}/special_tests.cpp") as f:
        spec = f.read()

    bad64 = literals_to_bytes(block_of(puz, "puzzler"))
    bad102 = literals_to_bytes(block_of(puz, "puzzler2"))
    assert len(bad64) == 64 and len(bad102) == 102

    vectors = {
        "_source": "mechanically extracted from /root/reference/tests/"
                   "{validate_utf8_puzzler_tests,special_tests}.cpp by "
                   "tools/extract_ref_vectors.py",
        # invalid utf8 with the reference's asserted first error
        "utf8_invalid_with_error": [
            {"data": b64(bad102), "error": "TOO_SHORT", "pos": 62,
             "note": "puzzler2: error in first 64B detected in next block"},
        ],
        # invalid utf8 (any-error assertion only)
        "utf8_invalid": [b64(bad64)] + [
            b64(v) for v in string_array(
                block_of(spec, "special_cases_utf8_utf16_invalid"),
                r"std::string\s+cases\[\]\s*=\s*\{")
        ] + [
            b64(v) for v in string_array(
                block_of(spec, "special_cases_utf8_utf32_invalid"),
                r"std::string\s+cases\[\]\s*=\s*\{")
        ],
        # valid utf8 that must roundtrip byte-for-byte through utf16/32
        "utf8_valid_roundtrip": sorted(set(
            b64(v) for name in (
                "special_cases_utf8_utf32_roundtrip",
                "special_cases_utf8_utf16le_roundtrip",
                "special_cases_utf8_utf16be_roundtrip",
                "special_cases_utf8_utf16_roundtrip",
            ) for v in string_array(
                block_of(spec, name), r"std::string\s+cases\[\]\s*=\s*\{")
        )),
        # valid utf16 (code unit lists) for length-parity + roundtrip
        "utf16_valid_units": [
            int_array(block_of(spec, "visualstudio2019icelakeissue")),
            int_array(block_of(spec, "special_cases_utf16_utf8_roundtrip")),
        ],
    }

    # dedupe invalid list, keep order
    seen, dedup = set(), []
    for v in vectors["utf8_invalid"]:
        if v not in seen:
            seen.add(v)
            dedup.append(v)
    vectors["utf8_invalid"] = dedup

    vectors["base64_inputs"] = base64_inputs()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(vectors, f, indent=1)
    print(
        f"wrote {OUT}: {len(vectors['utf8_invalid'])} invalid, "
        f"{len(vectors['utf8_valid_roundtrip'])} valid-roundtrip, "
        f"{len(vectors['utf16_valid_units'])} utf16, "
        f"{len(vectors['utf8_invalid_with_error'])} exact-error, "
        f"{len(vectors['base64_inputs'])} base64",
        file=sys.stderr,
    )


def iter_test_blocks(src: str):
    """Yield (test_name, body) for every TEST(...) in a reference file."""
    for m in re.finditer(r"TEST\((\w+)\)\s*\{", src):
        i, depth, j = m.end(), 1, m.end()
        while depth:
            if src[j] == "{":
                depth += 1
            elif src[j] == "}":
                depth -= 1
            j += 1
        yield m.group(1), src[i : j - 1]


def base64_inputs():
    """Every C string literal in the reference's base64 suite, as decoder
    input data (/root/reference/tests/base64_tests.cpp — 78 TESTs of
    curated padding x whitespace x last_chunk x url edge cases). The
    literals are replayed differentially across tiers with the full
    options matrix (tests/test_ref_base64_vectors.py); the reference's
    asserted outcomes are not parsed — our golden scalar model is the
    semantics oracle, and the value extracted here is the adversarial
    INPUT corpus (years of found-bug reproducers).

    A few procedurally-built reference inputs (e.g. 5463 spaces + '8',
    stop_before_partial_one_char) are reconstructed explicitly.
    """
    out, seen = [], set()

    def add(name: str, data: bytes):
        if not data or len(data) > 1 << 16:
            return
        key = data
        if key in seen:
            return
        seen.add(key)
        out.append({"test": name, "data": b64(data)})

    # runs of ADJACENT literals are one C string (line-wrapped tables)
    run_re = re.compile(r'(?:u?8?"(?:[^"\\\n]|\\.)*"\s*)+')
    lit_re = re.compile(r'"((?:[^"\\\n]|\\.)*)"')
    for fname in ("base64_tests.cpp", "atomic_base64_tests.cpp"):
        with open(f"{REF}/{fname}") as f:
            src = f.read()
        for name, body in iter_test_blocks(src):
            for run in run_re.finditer(body):
                try:
                    data = b"".join(
                        decode_c_literal(m.group(1))
                        for m in lit_re.finditer(run.group(0))
                    )
                    add(name, data)
                except (ValueError, AssertionError):
                    continue  # not a data literal (ambiguous hex escape)
    # procedural reference inputs worth keeping as data
    add("stop_before_partial_one_char", b" " * 5463 + b"8")
    add("spaces_only", b" " * 64)
    add("ws_every_4", b" ".join(b"TWFu" for _ in range(32)))

    # systematic padding x whitespace x alphabet lattice — the dimensions
    # the reference's base64 suite probes one found-bug at a time
    # (base64_tests.cpp: strict/loose/stop_before_partial x '=' placement
    # x interior whitespace x url chars), enumerated as data
    bodies = [b"", b"A", b"AB", b"ABC", b"TWFu", b"TWFuTQ", b"TWFuTWFu",
              b"ab+/cd+/", b"ab-_cd-_", b"A" * 65, b"TWFu" * 17 + b"QQ"]
    pads = [b"", b"=", b"==", b"===", b"= =", b"=\n=", b"==="]
    wss = [(b"", b""), (b" ", b""), (b"", b" "), (b"\n", b"\t"),
           (b"", b"\x0c"), (b" " * 9, b"")]
    for body in bodies:
        for pad in pads:
            for pre, post in wss:
                add("matrix_pad_ws", pre + body + pad + post)
            if len(body) >= 4:
                mid = len(body) // 2
                add("matrix_mid_ws", body[:mid] + b" " + body[mid:] + pad)
                add("matrix_mid_nl", body[:mid] + b"\r\n" + body[mid:] + pad)
    # garbage-char placement (accept_garbage interactions)
    for g in (b"*", b"\x00", b"~", b"%"):
        add("matrix_garbage", b"TWFu" + g)
        add("matrix_garbage", g + b"TWFu")
        add("matrix_garbage", b"TW" + g + b"Fu")
        add("matrix_garbage", b"TWFuTQ=" + g)
        add("matrix_garbage", b"TWFuTQ" + g + b"=")
    return out


if __name__ == "__main__":
    main()
