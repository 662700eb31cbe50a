"""sutf — iconv-compatible file transcoder (reference: tools/sutf.cpp).

Usage:
    python -m simdutf_tpu.cli -f UTF-8 -t UTF-16LE -o out.bin in.txt
    sutf --from-code=UTF-8 --to-code=UTF-16 file1 file2 -o out

Accepted charset names (case-insensitive, iconv spellings): UTF-8, UTF-16,
UTF-16LE, UTF-16BE, UTF-32, UTF-32LE (LE assumed for bare UTF-16/32, like
the reference on little-endian hosts), LATIN1 / ISO-8859-1, ASCII.
Unicode pairs transcode through this library; anything else falls back to
Python's codec machinery (the reference falls back to iconv, tools/sutf.h:36).
"""

from __future__ import annotations

import argparse
import sys

from . import api
from .errors import error_code


from .stream import canonical_encoding as _canon  # iconv spellings


def _convert(data: bytes, src: str, dst: str) -> bytes:
    if src == "ascii":
        res = api.validate_ascii_with_errors(data)
        if res.is_err:
            raise ValueError(
                f"invalid ASCII input at byte {res.count}"
            )
        src = "utf8"
    if dst == "ascii":
        # encode as UTF-8 then require ASCII
        out = _convert(data, src, "utf8")
        res = api.validate_ascii_with_errors(out)
        if res.is_err:
            raise ValueError("input not representable in ASCII")
        return out
    if src == dst:
        # validate input, pass through
        _validate(data, src)
        return data

    key = (src, dst)
    fn = {
        ("utf8", "utf16le"): api.convert_utf8_to_utf16le_with_errors,
        ("utf8", "utf16be"): api.convert_utf8_to_utf16be_with_errors,
        ("utf8", "utf32"): api.convert_utf8_to_utf32_with_errors,
        ("utf8", "latin1"): api.convert_utf8_to_latin1_with_errors,
        ("utf16le", "utf8"): api.convert_utf16le_to_utf8_with_errors,
        ("utf16be", "utf8"): api.convert_utf16be_to_utf8_with_errors,
        ("utf16le", "utf32"): api.convert_utf16le_to_utf32_with_errors,
        ("utf16be", "utf32"): api.convert_utf16be_to_utf32_with_errors,
        ("utf16le", "latin1"): api.convert_utf16le_to_latin1_with_errors,
        ("utf16be", "latin1"): api.convert_utf16be_to_latin1_with_errors,
        ("utf32", "utf8"): api.convert_utf32_to_utf8_with_errors,
        ("utf32", "utf16le"): api.convert_utf32_to_utf16le_with_errors,
        ("utf32", "utf16be"): api.convert_utf32_to_utf16be_with_errors,
        ("utf32", "latin1"): api.convert_utf32_to_latin1_with_errors,
        ("utf16le", "utf16be"): lambda d: (
            api.validate_utf16le_with_errors(d),
            api.change_endianness_utf16(d)),
        ("utf16be", "utf16le"): lambda d: (
            api.validate_utf16be_with_errors(d),
            api.change_endianness_utf16(d)),
    }.get(key)
    if fn is None and src == "latin1":
        plain = {
            "utf8": api.convert_latin1_to_utf8,
            "utf16le": api.convert_latin1_to_utf16le,
            "utf16be": api.convert_latin1_to_utf16be,
            "utf32": api.convert_latin1_to_utf32,
        }[dst]
        return plain(data)
    if fn is None:
        raise ValueError(f"unsupported conversion {src} -> {dst}")
    res, out = fn(data)
    if res is not None and res.is_err:
        raise ValueError(
            f"invalid {src} input: {error_code(res.error).name} at "
            f"position {res.count}"
        )
    return out


def _validate(data: bytes, enc: str) -> None:
    res = {
        "utf8": api.validate_utf8_with_errors,
        "utf16le": api.validate_utf16le_with_errors,
        "utf16be": api.validate_utf16be_with_errors,
        "utf32": api.validate_utf32_with_errors,
        "latin1": lambda d: api.Result(error_code.SUCCESS, len(d)),
        "ascii": api.validate_ascii_with_errors,
    }[enc](data)
    if res.is_err:
        raise ValueError(
            f"invalid {enc} input: {error_code(res.error).name} at "
            f"position {res.count}"
        )


def _codec_fallback(data: bytes, src: str, dst: str) -> bytes:
    """Non-Unicode charsets via Python codecs (reference: iconv fallback,
    tools/sutf.h:30-38)."""
    return data.decode(src).encode(dst)


def _stream_convert(paths, src: str, dst: str, out_f, chunk_bytes: int):
    """Transcode files in bounded memory via the streaming API (stream.py:
    mmap chunks pushed through a StreamTranscoder, which owns the
    trim_partial carry discipline — the reference's streaming pattern,
    benchmarks/stream.cpp + implementation.h:2690-2716). One stream spans
    ALL files, matching the one-shot mode's input concatenation; error
    positions are exact global input-unit offsets into that stream."""
    import mmap

    from . import stream as st

    check_ascii_out = dst == "ascii"
    t = st.StreamTranscoder(src, "utf8" if check_ascii_out else dst)

    def emit(out: bytes) -> None:
        if check_ascii_out and out:
            r = api.validate_ascii_with_errors(out)
            if r.is_err:
                raise ValueError("input not representable in ASCII")
        out_f.write(out)

    try:
        for path in paths:
            with open(path, "rb") as f:
                size = f.seek(0, 2)
                if size == 0:
                    continue
                with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as mm:
                    pos = 0
                    while pos < size:
                        end = min(pos + chunk_bytes, size)
                        emit(t.push(mm[pos:end]))
                        pos = end
        emit(t.finish())
    except st.StreamingError as e:
        raise ValueError(
            f"invalid {src} input: {e.error.name} at input unit {e.count}"
        )


def _stream_base64(paths, encode: bool, url: bool, out_f,
                   chunk_bytes: int):
    """Base64 encode/decode files in bounded memory via the streaming API
    (fastbase64 parity at any file size). One stream spans ALL files —
    matching the one-shot mode, which concatenates its inputs — so a
    base64 quad split across a file boundary decodes identically."""
    import mmap

    from . import stream as st

    options = 1 if url else 0
    s = (st.Base64StreamEncoder(options) if encode
         else st.Base64StreamDecoder(options))
    try:
        for path in paths:
            with open(path, "rb") as f:
                size = f.seek(0, 2)
                if size == 0:
                    continue
                with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as mm:
                    pos = 0
                    while pos < size:
                        end = min(pos + chunk_bytes, size)
                        out_f.write(s.push(mm[pos:end]))
                        pos = end
        out_f.write(s.finish())
    except st.StreamingError as e:
        raise ValueError(f"{e.error.name} at input char {e.count}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="sutf", description="Unicode transcoder (simdutf_tpu)"
    )
    ap.add_argument("-f", "--from-code", dest="src", default="UTF-8")
    ap.add_argument("-t", "--to-code", dest="dst", default="UTF-8")
    ap.add_argument("-o", "--output", dest="output")
    ap.add_argument(
        "--base64-encode", action="store_true",
        help="base64-encode input (fastbase64 parity, tools/fastbase64.cpp)",
    )
    ap.add_argument(
        "--base64-decode", action="store_true",
        help="forgiving-base64-decode input",
    )
    ap.add_argument(
        "--url", action="store_true", help="use the base64url alphabet"
    )
    ap.add_argument(
        "--stream-mb", type=int, metavar="MB",
        help="transcode files in bounded memory (mmap, MB-sized chunks cut "
             "on codepoint boundaries); charset conversions only",
    )
    ap.add_argument("files", nargs="*")
    args = ap.parse_args(argv)

    if args.stream_mb is not None and args.stream_mb <= 0:
        print("sutf: --stream-mb must be a positive chunk size",
              file=sys.stderr)
        return 2
    if args.stream_mb:
        if args.base64_encode or args.base64_decode:
            if not args.files:
                print("sutf: --stream-mb needs file inputs", file=sys.stderr)
                return 2
            try:
                out_f = (open(args.output, "wb") if args.output
                         else sys.stdout.buffer)
                try:
                    _stream_base64(
                        args.files, args.base64_encode, args.url, out_f,
                        args.stream_mb * 1024 * 1024,
                    )
                finally:
                    if args.output:
                        out_f.close()
            except (ValueError, OSError) as e:
                print(f"sutf: {e}", file=sys.stderr)
                return 1
            return 0
        src, dst = _canon(args.src), _canon(args.dst)
        if src is None or dst is None or not args.files:
            print("sutf: --stream-mb needs Unicode charsets and file inputs",
                  file=sys.stderr)
            return 2
        try:
            out_f = (open(args.output, "wb") if args.output
                     else sys.stdout.buffer)
            try:
                _stream_convert(
                    args.files, src, dst, out_f, args.stream_mb * 1024 * 1024
                )
            finally:
                if args.output:
                    out_f.close()
        except (ValueError, OSError) as e:
            print(f"sutf: {e}", file=sys.stderr)
            return 1
        return 0

    try:
        chunks = []
        if args.files:
            for path in args.files:
                with open(path, "rb") as f:
                    chunks.append(f.read())
        else:
            chunks.append(sys.stdin.buffer.read())
        data = b"".join(chunks)

        if args.base64_encode:
            out = api.binary_to_base64(
                data, api.base64_url if args.url else api.base64_default
            )
        elif args.base64_decode:
            res, out = api.base64_to_binary(
                data, api.base64_url if args.url else api.base64_default
            )
            if res.is_err:
                raise ValueError(
                    f"invalid base64: {error_code(res.error).name} at "
                    f"position {res.count}"
                )
        else:
            src, dst = _canon(args.src), _canon(args.dst)
            if src is None or dst is None:
                out = _codec_fallback(data, args.src, args.dst)
            else:
                out = _convert(data, src, dst)
    except (ValueError, LookupError, UnicodeError, OSError) as e:
        print(f"sutf: {e}", file=sys.stderr)
        return 1

    try:
        if args.output:
            with open(args.output, "wb") as f:
                f.write(out)
        else:
            sys.stdout.buffer.write(out)
    except OSError as e:
        print(f"sutf: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
