"""sutf CLI tests (reference: tools/sutf.cpp behavior)."""

import subprocess
import sys

import pytest


def run_cli(args, input_bytes=b"", cwd="/root/repo"):
    return subprocess.run(
        [sys.executable, "-m", "simdutf_tpu.cli", *args],
        input=input_bytes,
        capture_output=True,
        cwd=cwd,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )


def test_utf8_to_utf16le(tmp_path):
    src = tmp_path / "in.txt"
    src.write_bytes("héllo 🙂".encode())
    out = tmp_path / "out.bin"
    r = run_cli(["-f", "UTF-8", "-t", "UTF-16LE", "-o", str(out), str(src)])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == "héllo 🙂".encode("utf-16-le")


def test_stdin_stdout():
    r = run_cli(["-f", "UTF-8", "-t", "UTF-32"], "abc€".encode())
    assert r.returncode == 0, r.stderr
    assert r.stdout == "abc€".encode("utf-32-le")


def test_iconv_style_long_flags(tmp_path):
    src = tmp_path / "in.txt"
    src.write_bytes("grüß".encode("latin-1"))
    r = run_cli(["--from-code=LATIN1", "--to-code=UTF-8", str(src)])
    assert r.returncode == 0, r.stderr
    assert r.stdout == "grüß".encode()


def test_invalid_input_error():
    r = run_cli(["-f", "UTF-8", "-t", "UTF-16LE"], b"ab\xff")
    assert r.returncode == 1
    assert b"HEADER_BITS" in r.stderr and b"position 2" in r.stderr


def test_same_encoding_validates():
    r = run_cli(["-f", "UTF-8", "-t", "UTF-8"], b"ok")
    assert r.returncode == 0 and r.stdout == b"ok"
    r = run_cli(["-f", "UTF-8", "-t", "UTF-8"], b"\x80bad")
    assert r.returncode == 1


def test_endianness_swap():
    data = "hi🙂".encode("utf-16-le")
    r = run_cli(["-f", "UTF-16LE", "-t", "UTF-16BE"], data)
    assert r.returncode == 0
    assert r.stdout == "hi🙂".encode("utf-16-be")


def test_codec_fallback():
    # non-Unicode charset handled by the codec fallback (reference: iconv)
    r = run_cli(["-f", "cp1251", "-t", "UTF-8"], "привет".encode("cp1251"))
    assert r.returncode == 0
    assert r.stdout == "привет".encode()


def test_base64_encode_decode_modes(tmp_path):
    r = run_cli(["--base64-encode"], b"hello world")
    assert r.returncode == 0 and r.stdout == b"aGVsbG8gd29ybGQ="
    r = run_cli(["--base64-decode"], b"aGVsbG8gd29ybGQ=")
    assert r.returncode == 0 and r.stdout == b"hello world"
    r = run_cli(["--base64-encode", "--url"], b"\xfb\xff")
    assert r.returncode == 0 and r.stdout == b"-_8"
    r = run_cli(["--base64-decode"], b"abc$")
    assert r.returncode == 1 and b"INVALID_BASE64_CHARACTER" in r.stderr


def test_cli_stream_mode(tmp_path):
    from simdutf_tpu.cli import main

    s = ("héllo wörld 日本語 🙂 " * 40000)
    src = tmp_path / "in.txt"
    src.write_bytes(s.encode())
    out = tmp_path / "out.bin"
    rc = main(["-f", "UTF-8", "-t", "UTF-16LE", "--stream-mb", "1",
               "-o", str(out), str(src)])
    assert rc == 0
    assert out.read_bytes() == s.encode("utf-16-le")


def test_cli_stream_error_offset(tmp_path, capsys):
    from simdutf_tpu.cli import main

    data = bytearray(("x" * 3_000_000).encode())
    data[2_500_000] = 0xFF
    src = tmp_path / "bad.txt"
    src.write_bytes(bytes(data))
    rc = main(["-f", "UTF-8", "-t", "UTF-16LE", "--stream-mb", "1",
               "-o", str(src) + ".out", str(src)])
    assert rc == 1
    err = capsys.readouterr().err
    # exact global offset of the injected bad byte
    assert "at input unit 2500000" in err


def test_cli_stream_base64_roundtrip(tmp_path):
    import base64 as pyb64

    from simdutf_tpu.cli import main

    payload = bytes(range(256)) * 5000 + b"tail"
    src = tmp_path / "payload.bin"
    src.write_bytes(payload)
    enc = tmp_path / "enc.b64"
    rc = main(["--base64-encode", "--stream-mb", "1",
               "-o", str(enc), str(src)])
    assert rc == 0
    assert enc.read_bytes() == pyb64.b64encode(payload)
    dec = tmp_path / "dec.bin"
    rc = main(["--base64-decode", "--stream-mb", "1",
               "-o", str(dec), str(enc)])
    assert rc == 0
    assert dec.read_bytes() == payload


def test_cli_stream_base64_error(tmp_path, capsys):
    from simdutf_tpu.cli import main

    src = tmp_path / "bad.b64"
    src.write_bytes(b"aGVs" * 1000 + b"!" + b"aGVs" * 10)
    rc = main(["--base64-decode", "--stream-mb", "1",
               "-o", str(src) + ".out", str(src)])
    assert rc == 1
    assert "INVALID_BASE64_CHARACTER at input char 4000" in \
        capsys.readouterr().err


def _run_module(mod, args, input_bytes=b""):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": repo})
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        input=input_bytes, capture_output=True, cwd=repo, env=env,
    )


def test_sutf_module_alias():
    # SURVEY §2.1 names `python -m simdutf_tpu.sutf` (tools/sutf.cpp parity)
    r = _run_module("simdutf_tpu.sutf",
                    ["-f", "UTF-8", "-t", "UTF-16LE"], "hé🙂".encode())
    assert r.returncode == 0, r.stderr
    assert r.stdout == "hé🙂".encode("utf-16-le")


def test_fastbase64_module_default_encodes_and_decodes_back():
    # tools/fastbase64.cpp parity: default mode encodes, -d decodes
    payload = b"\x00\xffbinary payload\x01"
    enc = _run_module("simdutf_tpu.fastbase64", [], payload)
    assert enc.returncode == 0, enc.stderr
    dec = _run_module("simdutf_tpu.fastbase64", ["-d"], enc.stdout)
    assert dec.returncode == 0, dec.stderr
    assert dec.stdout == payload


def test_cli_error_paths(tmp_path):
    """Regression coverage for CLI robustness fixes: invalid --stream-mb,
    missing files with clean diagnostics, endianness swap validation."""
    import subprocess
    import sys

    def run(*argv, data=b""):
        return run_cli(list(argv), input_bytes=data)

    inp = tmp_path / "in.txt"
    inp.write_bytes(b"hello")
    # non-positive stream chunk must be rejected, not loop forever
    r = run("--stream-mb", "-1", "-f", "UTF-8", "-t", "UTF-16LE", str(inp))
    assert r.returncode == 2 and b"positive" in r.stderr
    # missing input file: clean sutf diagnostic, not a traceback
    r = run("-f", "UTF-8", "-t", "UTF-16LE", str(tmp_path / "nope.txt"))
    assert r.returncode == 1
    assert r.stderr.startswith(b"sutf:") and b"Traceback" not in r.stderr
    # unwritable output path: same
    r = run("-f", "UTF-8", "-t", "UTF-16LE",
            "-o", str(tmp_path / "no" / "dir" / "o.bin"), str(inp))
    assert r.returncode == 1 and r.stderr.startswith(b"sutf:")
    # endianness swap validates like every other pair (lone surrogate)
    bad = tmp_path / "bad16.bin"
    bad.write_bytes(b"\x00\xd8A\x00")
    r = run("-f", "UTF-16LE", "-t", "UTF-16BE", str(bad))
    assert r.returncode == 1 and b"SURROGATE" in r.stderr
