#!/usr/bin/env python
"""Pick the transcode-engine default from committed healthy-window probes.

Scans perf_records/*/probe_transcode.log (written by watch_healthy.sh in
healthy windows; format: ``<variant>  <GB/s>-in  <ms>/iter`` per line),
aggregates by variant across records, and prints the winner plus the
one-line change that promotes it (the default lives in
simdutf_tpu/ops/common.py's SIMDUTF_TPU_TRANSCODE_ENGINE getenv default).
Promotion stays a human-reviewed commit: every variant is bit-identical
(differentially fuzzed), so the only question is which is fastest on real
hardware — this tool just keeps the evidence and the knob adjacent.

Usage: python tools/promote_engine.py
"""

from __future__ import annotations

import glob
import os
import re
import sys


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows: dict[str, list[tuple[float, str]]] = {}
    logs = sorted(glob.glob(
        os.path.join(here, "perf_records", "*", "probe_transcode.log")))
    for path in logs:
        stamp = os.path.basename(os.path.dirname(path))
        for line in open(path):
            m = re.match(r"\s*(\S+)\s+([\d.]+)\s+GB/s-in", line)
            if m:
                rows.setdefault(m.group(1), []).append(
                    (float(m.group(2)), stamp))
    if not rows:
        print("no probe_transcode records yet (watch_healthy.sh writes "
              "them in healthy windows)", file=sys.stderr)
        return 1
    print(f"{'variant':14s} {'best':>8s} {'median':>8s}  records")
    best_name, best_gbps = None, -1.0
    for name, vals in sorted(rows.items()):
        gb = sorted(v for v, _ in vals)
        med = gb[len(gb) // 2]
        print(f"{name:14s} {gb[-1]:8.1f} {med:8.1f}  {len(gb)}")
        if med > best_gbps:
            best_name, best_gbps = name, med
    print()
    print(f"winner by median: {best_name} ({best_gbps:.1f} GB/s-in)")
    print("to promote: edit simdutf_tpu/ops/common.py ->")
    print(f'  _os.environ.get("SIMDUTF_TPU_TRANSCODE_ENGINE", "{best_name}")')
    print("then re-run tests (variants are bit-identical) and commit with "
          "the perf_records/<stamp> evidence cited.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
