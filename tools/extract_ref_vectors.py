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
    vectors["utf8_mutation"] = utf8_mutation_vectors()
    vectors["utf16_mutation"] = utf16_mutation_vectors()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(vectors, f, indent=1)
    print(
        f"wrote {OUT}: {len(vectors['utf8_invalid'])} invalid, "
        f"{len(vectors['utf8_valid_roundtrip'])} valid-roundtrip, "
        f"{len(vectors['utf16_valid_units'])} utf16, "
        f"{len(vectors['utf8_invalid_with_error'])} exact-error, "
        f"{len(vectors['base64_inputs'])} base64, "
        f"{len(vectors['utf8_mutation'])} utf8-mutation, "
        f"{len(vectors['utf16_mutation'])} utf16-mutation",
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


# --- brute-force mutation corpora (validate_utf8_brute_force_tests.cpp) ---

# byte-length class weight combos exercised by the reference's corrupt_*
# tests (tests/validate_utf8_brute_force_tests.cpp:35-59 plus the full
# 1/2/3/4 mix of TEST(brute_force))
_WEIGHT_COMBOS = [
    (1, 0, 0, 0), (0, 1, 0, 0), (1, 1, 0, 0), (0, 0, 1, 0),
    (0, 1, 1, 0), (1, 0, 1, 0), (1, 1, 1, 0), (0, 0, 0, 1),
    (1, 0, 0, 1), (1, 1, 1, 1),
]


def _gen_valid_utf8(rng, weights, nbytes: int) -> bytes:
    """Mirror tests/helpers/random_utf8.h: emit random codepoints whose
    UTF-8 byte length is drawn from ``weights`` until ~nbytes."""
    import numpy as np

    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    out = bytearray()
    while len(out) < nbytes:
        k = int(rng.choice(4, p=w)) + 1
        if k == 1:
            cp = int(rng.integers(0x01, 0x80))
        elif k == 2:
            cp = int(rng.integers(0x80, 0x800))
        elif k == 3:
            cp = int(rng.integers(0x800, 0x10000))
            while 0xD800 <= cp <= 0xDFFF:
                cp = int(rng.integers(0x800, 0x10000))
        else:
            cp = int(rng.integers(0x10000, 0x110000))
        out += chr(cp).encode("utf-8")
    return bytes(out)


def _expected_utf8(data: bytes):
    """Dual-oracle expectation: the golden scalar machine's (valid, pos,
    code), cross-checked against CPython's independent decoder (validity
    always; first-error byte offset via UnicodeDecodeError.start — the
    same offset convention as simdutf's with-errors results)."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from simdutf_tpu.golden import utf8 as g8

    arr = np.frombuffer(data, np.uint8)
    res = g8.validate_with_errors(arr)
    try:
        data.decode("utf-8")
        py_ok, py_start = True, None
    except UnicodeDecodeError as e:
        py_ok, py_start = False, e.start
    assert res.is_ok == py_ok, (data, res, py_ok)
    if res.is_ok:
        return {"valid": True}
    assert res.count == py_start, (data, res.count, py_start)
    return {"valid": False, "pos": int(res.count), "code": res.error.name}


def utf8_mutation_vectors():
    """The reference's corrupt/brute-force methodology frozen as data:
    per weight class, generate valid strings and corrupt one position
    with (a) a random byte and (b) a one-hot bit value
    (validate_utf8_brute_force_tests.cpp:19-28,74-77), keeping a spread
    of now-invalid and still-valid mutants. Each vector carries its
    dual-oracle expectation (golden machine == CPython, asserted at
    extraction time)."""
    import numpy as np

    rng = np.random.default_rng(20260820)
    vectors = []
    for weights in _WEIGHT_COMBOS:
        for rep in range(3):
            base = _gen_valid_utf8(rng, weights, 200 + 60 * rep)
            vectors.append({"data": b64(base), **_expected_utf8(base)})
            invalid_kept = valid_kept = 0
            trials = 0
            while (invalid_kept < 12 or valid_kept < 3) and trials < 4000:
                trials += 1
                mut = bytearray(base)
                pos = int(rng.integers(0, len(mut)))
                if trials % 2:
                    mut[pos] = int(rng.integers(0, 256))
                else:
                    mut[pos] = 1 << int(rng.integers(0, 8))
                mb = bytes(mut)
                if mb == base:
                    continue
                exp = _expected_utf8(mb)
                if exp["valid"]:
                    if valid_kept >= 3:
                        continue
                    valid_kept += 1
                else:
                    if invalid_kept >= 12:
                        continue
                    invalid_kept += 1
                vectors.append({"data": b64(mb), **exp})
    # truncation sweep on a 4-class mix (the reference's partial-sequence
    # edge: every cut position near the end of a multi-byte sequence)
    base = _gen_valid_utf8(rng, (1, 1, 1, 1), 96)
    for cut in range(max(0, len(base) - 12), len(base)):
        vectors.append({"data": b64(base[:cut]), **_expected_utf8(base[:cut])})
    return vectors


def _expected_utf16le(data: bytes):
    """Golden utf16 expectation (unit-indexed pos), validity cross-checked
    against CPython's utf-16-le decoder."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from simdutf_tpu.golden import utf16 as g16

    w = np.frombuffer(data, np.uint16)
    res = g16.validate_with_errors(w, False)
    try:
        data.decode("utf-16-le")
        py_ok = True
    except UnicodeDecodeError:
        py_ok = False
    assert res.is_ok == py_ok, (data, res, py_ok)
    if res.is_ok:
        return {"valid": True}
    return {"valid": False, "pos": int(res.count), "code": res.error.name}


def utf16_mutation_vectors():
    """UTF-16LE mutation corpus: random BMP+astral unit streams with one
    unit overwritten (lone-surrogate injections dominate), mirroring the
    reference's random_utf16-driven validate/convert sweeps
    (tests/validate_utf16_tests.cpp methodology)."""
    import numpy as np

    rng = np.random.default_rng(16_20260820)
    vectors = []
    for astral_w in (0.0, 0.15, 0.6):
        for rep in range(4):
            units = []
            while len(units) < 120 + 30 * rep:
                if rng.random() < astral_w:
                    cp = int(rng.integers(0x10000, 0x110000))
                    cpx = cp - 0x10000
                    units += [0xD800 + (cpx >> 10), 0xDC00 + (cpx & 0x3FF)]
                else:
                    u = int(rng.integers(1, 0x10000))
                    while 0xD800 <= u <= 0xDFFF:
                        u = int(rng.integers(1, 0x10000))
                    units.append(u)
            base = np.asarray(units, np.uint16).tobytes()
            vectors.append({"data": b64(base), **_expected_utf16le(base)})
            invalid_kept = 0
            trials = 0
            while invalid_kept < 10 and trials < 2000:
                trials += 1
                mut = bytearray(base)
                upos = int(rng.integers(0, len(mut) // 2))
                val = (int(rng.integers(0xD800, 0xE000)) if trials % 2
                       else int(rng.integers(0, 0x10000)))
                mut[2 * upos : 2 * upos + 2] = val.to_bytes(2, "little")
                mb = bytes(mut)
                if mb == base:
                    continue
                exp = _expected_utf16le(mb)
                if exp["valid"]:
                    continue
                invalid_kept += 1
                vectors.append({"data": b64(mb), **exp})
    return vectors


if __name__ == "__main__":
    main()
