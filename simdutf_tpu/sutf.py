"""`python -m simdutf_tpu.sutf` — the iconv-style transcoder entry point
named by SURVEY §2.1 (reference: tools/sutf.cpp:11-80). Alias of
:mod:`simdutf_tpu.cli` (same flags: -f/-t/-o, --from-code=, --stream-mb)."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
