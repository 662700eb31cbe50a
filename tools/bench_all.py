#!/usr/bin/env python
"""Per-op benchmark sweep -> JSON (analog of scripts/benchmark-all.py).

Runs every hot op through the active implementation on a mixed corpus and
emits a JSON object of GB/s figures. Host-API timings (includes staging);
for device-resident kernel numbers use bench.py.

    python tools/bench_all.py [--mb 8] [--impl xla] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument("--impl")
    ap.add_argument("--json")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import bench as bench_mod
    import simdutf_tpu as su
    from simdutf_tpu.runtime import tune_host_allocator

    tune_host_allocator()
    if args.impl:
        su.set_active_implementation(args.impl)
    name = su.get_active_implementation().name

    data = bench_mod.mixed_corpus(args.mb * 1024 * 1024)
    data = data[: su.trim_partial_utf8(data)]
    u16 = su.convert_valid_utf8_to_utf16le(data)
    b64 = su.binary_to_base64(data[: len(data) // 2])

    ops = {
        "validate_utf8": (su.validate_utf8, data),
        "validate_utf8_with_errors": (su.validate_utf8_with_errors, data),
        "count_utf8": (su.count_utf8, data),
        "utf16_length_from_utf8": (su.utf16_length_from_utf8, data),
        "convert_utf8_to_utf16le": (su.convert_utf8_to_utf16le, data),
        "convert_valid_utf8_to_utf16le": (su.convert_valid_utf8_to_utf16le, data),
        "convert_utf8_to_utf32": (su.convert_utf8_to_utf32, data),
        "validate_utf16le": (su.validate_utf16le, u16),
        "count_utf16le": (su.count_utf16le, u16),
        "convert_utf16le_to_utf8": (su.convert_utf16le_to_utf8, u16),
        "to_well_formed_utf16le": (su.to_well_formed_utf16le, u16),
        "base64_decode": (lambda d: su.base64_to_binary(d), b64),
        "base64_encode": (su.binary_to_base64, data[: len(data) // 2]),
    }
    results = {"implementation": name, "input_mb": args.mb, "ops_gbps": {}}
    for op, (fn, inp) in ops.items():
        fn(inp)  # warm (compile/page-fault)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fn(inp)
        dt = (time.perf_counter() - t0) / args.iters
        nbytes = inp.nbytes if hasattr(inp, "nbytes") else len(inp)
        gbps = nbytes / dt / 1e9
        results["ops_gbps"][op] = round(gbps, 3)
        print(f"{op:34s} {gbps:8.2f} GB/s", file=sys.stderr, flush=True)

    out = json.dumps(results, indent=2)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
