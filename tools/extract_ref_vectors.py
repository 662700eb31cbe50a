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

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(vectors, f, indent=1)
    print(
        f"wrote {OUT}: {len(vectors['utf8_invalid'])} invalid, "
        f"{len(vectors['utf8_valid_roundtrip'])} valid-roundtrip, "
        f"{len(vectors['utf16_valid_units'])} utf16, "
        f"{len(vectors['utf8_invalid_with_error'])} exact-error",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
