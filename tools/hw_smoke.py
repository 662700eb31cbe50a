#!/usr/bin/env python
"""Hardware-correctness smoke for the Pallas kernel tier.

The test suite runs the kernels in interpret mode on CPU; Mosaic-on-TPU is
a different lowering, so a healthy-window battery should also verify the
kernels' RESULTS on the real chip, not just their speed. This drives every
structured-class kernel family through the public pallas tier on-device
and checks byte-exact outputs vs CPython — small inputs, one JSON verdict
line.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/hw_smoke.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    import jax

    backend = jax.default_backend()
    import simdutf_tpu as su

    su.set_active_implementation("pallas")
    checks = {}

    def check(name, got, want):
        checks[name] = bool(got == want)
        if not checks[name]:
            print(f"  FAIL {name}", file=sys.stderr)

    ascii_s = "The quick brown fox! " * 500
    cyr = "Привет, мир! Это тест. ".replace(" ", "").replace("!", "") * 400
    cyr = "".join(c for c in cyr if ord(c) >= 0x80)
    cjk = "東京日本語首都圈" * 600
    emoji = "🙂🚀🌍💡🎉😀🥳🤖" * 500
    mixed = "héllo wörld 日本語 🙂 " * 300

    for tag, s in (("ascii", ascii_s), ("2byte", cyr), ("3byte", cjk),
                   ("astral", emoji), ("mixed", mixed)):
        u8, u16, u32 = (s.encode(), s.encode("utf-16-le"),
                        s.encode("utf-32-le"))
        check(f"{tag}:validate8", su.validate_utf8(u8), True)
        check(f"{tag}:u8->u16", su.convert_utf8_to_utf16le(u8), u16)
        check(f"{tag}:u8->u32", su.convert_utf8_to_utf32(u8), u32)
        check(f"{tag}:u16->u8", su.convert_utf16le_to_utf8(u16), u8)
        check(f"{tag}:u16->u32", su.convert_utf16le_to_utf32(u16), u32)
        check(f"{tag}:u32->u16", su.convert_utf32_to_utf16le(u32), u16)
        check(f"{tag}:count8", su.count_utf8(u8), len(s))
        check(f"{tag}:detect8",
              bool(su.detect_encodings(u8) & 1), True)

    # exact first-error positions through the SWAR + rescan path: the
    # on-device result must equal the NumPy fallback tier bit-for-bit
    bad = bytearray(mixed.encode())
    bad[1234] = 0xFF  # breaks the 3-byte char starting at 1232
    r = su.validate_utf8_with_errors(bytes(bad))
    su.set_active_implementation("fallback")
    want = su.validate_utf8_with_errors(bytes(bad))
    su.set_active_implementation("pallas")
    check("error:exact_pos", r, want)

    import base64 as pyb64

    payload = bytes(range(256)) * 30
    enc = pyb64.b64encode(payload)
    res, out = su.base64_to_binary(enc)
    check("b64:clean_decode", (res.is_ok, out), (True, payload))
    check("b64:encode", su.binary_to_base64(payload), enc)

    # to_well_formed repair
    lone = np.frombuffer(mixed.encode("utf-16-le"), np.uint16).copy()
    lone[77] = 0xD800
    wf = su.to_well_formed_utf16le(lone.tobytes())
    check("utf16:repair_validates", su.validate_utf16le(wf), True)

    # url-safe base64 + whitespace fallback path
    res, out = su.base64_to_binary(pyb64.urlsafe_b64encode(payload),
                                   options=su.base64_url)
    check("b64:url_decode", (res.is_ok, out), (True, payload))
    spaced = b" ".join(enc[i:i + 60] for i in range(0, len(enc), 60))
    res, out = su.base64_to_binary(spaced)
    check("b64:spaced_decode", (res.is_ok, out), (True, payload))

    # latin1 widens + utf32 directions (XLA-driver-routed classes)
    l1 = bytes(range(256)) * 40
    s1 = l1.decode("latin-1")
    check("latin1:to_utf8", su.convert_latin1_to_utf8(l1), s1.encode())
    check("latin1:to_utf16", su.convert_latin1_to_utf16le(l1),
          s1.encode("utf-16-le"))
    check("latin1:to_utf32", su.convert_latin1_to_utf32(l1),
          s1.encode("utf-32-le"))
    for tag, s in (("2byte", cyr), ("3byte", cjk), ("astral", emoji),
                   ("mixed", mixed)):
        u8, u32 = s.encode(), s.encode("utf-32-le")
        check(f"{tag}:u32->u8", su.convert_utf32_to_utf8(u32), u8)
        check(f"{tag}:u8->u32b", su.convert_utf8_to_utf32(u8), u32)
        check(f"{tag}:validate32", su.validate_utf32(u32), True)
    # BE direction through the uniform kernels
    check("3byte:u8->u16be", su.convert_utf8_to_utf16be(cjk.encode()),
          cjk.encode("utf-16-be"))
    check("2byte:u16be->u8",
          su.convert_utf16be_to_utf8(cyr.encode("utf-16-be")), cyr.encode())

    # whole-repertoire sweep: every Unicode scalar (1,112,064 codepoints)
    # in one buffer, transcoded on-device in a single call per direction
    # and compared byte-for-byte with CPython — the exhaustive CPU-tier
    # test (tests/test_exhaustive.py) executed against real Mosaic/XLA
    # lowering instead of interpret mode.
    scalars = list(range(0, 0xD800)) + list(range(0xE000, 0x110000))
    rep = "".join(map(chr, scalars))
    r8, r16, r32 = (rep.encode(), rep.encode("utf-16-le"),
                    rep.encode("utf-32-le"))
    check("repertoire:validate8", su.validate_utf8(r8), True)
    check("repertoire:validate16", su.validate_utf16le(r16), True)
    check("repertoire:validate32", su.validate_utf32(r32), True)
    check("repertoire:u8->u16", su.convert_utf8_to_utf16le(r8), r16)
    check("repertoire:u8->u32", su.convert_utf8_to_utf32(r8), r32)
    check("repertoire:u16->u8", su.convert_utf16le_to_utf8(r16), r8)
    check("repertoire:u16->u32", su.convert_utf16le_to_utf32(r16), r32)
    check("repertoire:u32->u8", su.convert_utf32_to_utf8(r32), r8)
    check("repertoire:u32->u16", su.convert_utf32_to_utf16le(r32), r16)
    check("repertoire:count8", su.count_utf8(r8), len(rep))
    check("repertoire:u16len", su.utf16_length_from_utf8(r8),
          len(r16) // 2)

    # census kernels (kernels/census.py) vs the jnp census formulas on
    # real Mosaic: facts must agree bit-for-bit across structured and
    # adversarial corpora (incl. garbage beyond the valid length)
    import jax.numpy as jnp
    import simdutf_tpu.ops.utf8 as o8
    import simdutf_tpu.ops.utf16 as o16
    import simdutf_tpu.kernels.census as kcen

    cen_cases = [
        ("ascii", ascii_s.encode()), ("u2", cyr.encode()),
        ("u3", cjk.encode()), ("u4", emoji.encode()),
        ("mixed", mixed.encode()), ("bad", b"\xed\xa0\x80ab" * 4000),
    ]
    # non-vacuous: on this backend the kernels must actually compile —
    # a failed probe would make every parity check below compare the
    # jnp path against itself
    check("census8:kernel_active", kcen.census_supported(kcen.BLOCK_B),
          True)
    check("census16:kernel_active",
          kcen.census16_supported(kcen.BLOCK_U16), True)
    for tag, data in cen_cases:
        n = (len(data) // kcen.BLOCK_B + 2) * kcen.BLOCK_B
        buf = np.zeros(n, np.uint8)
        buf[: len(data)] = np.frombuffer(data, np.uint8)
        buf[len(data):] = 0xE5  # garbage past length must not leak in
        bj, L = jnp.asarray(buf), jnp.int32(len(data))
        got = tuple(bool(v) for v in o8._census_kernel_facts(bj, L))
        bits = int(kcen.census_bits(bj, L))
        got += ((bits & kcen.BIT_HASLO) != 0,)
        # jnp reference computed with the kernel path disabled
        saved8 = list(kcen._KERNEL_OK)
        kcen._KERNEL_OK[:] = [False]
        try:
            want = tuple(bool(v)
                         for v in (*o8.census(bj, L), *o8.presence(bj, L)))
            idx = jnp.arange(n) < L
            want += (bool(jnp.any((bj < 0x80) & idx)),)  # BIT_HASLO ref
        finally:
            kcen._KERNEL_OK[:] = saved8
        check(f"census8:{tag}", got, want)
        u16b = np.zeros(((len(data) // 2) // kcen.BLOCK_U16 + 2)
                        * kcen.BLOCK_U16, np.uint16)
        src = np.frombuffer(data[: len(data) // 2 * 2], np.uint16)
        u16b[: src.size] = src
        u16b[src.size:] = 0xD800
        wj, Lu = jnp.asarray(u16b), jnp.int32(src.size)
        gotu = tuple(bool(v) for v in o16.census(wj, Lu))
        saved16 = list(kcen._KERNEL16_OK)
        kcen._KERNEL16_OK[:] = [False]
        try:
            wantu = tuple(bool(v) for v in o16.census(wj, Lu))
        finally:
            kcen._KERNEL16_OK[:] = saved16
        check(f"census16:{tag}", gotu, wantu)

    ok = all(checks.values())
    print(json.dumps({
        "hw_smoke": "pass" if ok else "FAIL",
        "backend": backend,
        "checks": len(checks),
        "failed": sorted(k for k, v in checks.items() if not v),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
