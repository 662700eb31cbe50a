"""`python -m simdutf_tpu.fastbase64` — base64 encoder/decoder CLI
(reference: tools/fastbase64.cpp:8-15). Thin front-end over
:mod:`simdutf_tpu.cli`: with no mode flag it encodes (the reference
default); pass --base64-decode (or -d) to decode; --url for base64url."""

import sys

from .cli import main


def run(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "-d" in argv:
        argv[argv.index("-d")] = "--base64-decode"
    if "--base64-decode" not in argv and "--base64-encode" not in argv:
        argv.insert(0, "--base64-encode")
    return main(argv)


if __name__ == "__main__":
    raise SystemExit(run())
