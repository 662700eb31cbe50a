"""CNativeImplementation: the compiled C scalar tier.

Registered as "cnative" when simdutf_tpu._cnative has been built
(``python setup.py build_ext --inplace``). Role: fast host-CPU path — the
equivalent of the reference's fallback backend running at C speed — and a
high-throughput oracle for large differential fuzz runs.
"""

from __future__ import annotations

import numpy as np

from .. import _cnative as C
from ..errors import FullResult, Result, error_code as ec
from ..implementation import Implementation
from ..golden import base64_impl as gb


def _res(code: int, count: int) -> Result:
    return Result(ec(code), count)


def _u16out(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.uint16)


def _u32out(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.uint32)


def _u8out(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.uint8)


class CNativeImplementation(Implementation):
    name = "cnative"
    description = "Compiled C scalar kernels (host CPU)"

    # -- validation ----------------------------------------------------------
    def validate_ascii(self, b):
        return C.validate_ascii(b)[0] == 0

    def validate_ascii_with_errors(self, b):
        return _res(*C.validate_ascii(b))

    def validate_utf8(self, b):
        return C.validate_utf8(b)[0] == 0

    def validate_utf8_with_errors(self, b):
        return _res(*C.validate_utf8(b))

    def validate_utf16le(self, w):
        return C.validate_utf16(w, False)[0] == 0

    def validate_utf16be(self, w):
        return C.validate_utf16(w, True)[0] == 0

    def validate_utf16le_with_errors(self, w):
        return _res(*C.validate_utf16(w, False))

    def validate_utf16be_with_errors(self, w):
        return _res(*C.validate_utf16(w, True))

    def validate_utf32(self, w):
        return C.validate_utf32(w)[0] == 0

    def validate_utf32_with_errors(self, w):
        code, pos = C.validate_utf32(w)
        return _res(code, pos)

    # -- repair / detection ---------------------------------------------------
    def to_well_formed_utf16le(self, w):
        return _u16out(C.to_well_formed_utf16(w, False))

    def to_well_formed_utf16be(self, w):
        return _u16out(C.to_well_formed_utf16(w, True))

    # -- counts / lengths ----------------------------------------------------
    def count_utf8(self, b):
        return C.count_utf8(b)

    def count_utf16le(self, w):
        return C.count_utf16(w, False)

    def count_utf16be(self, w):
        return C.count_utf16(w, True)

    def utf16_length_from_utf8(self, b):
        return C.utf16_length_from_utf8(b)

    def utf8_length_from_utf16le(self, w):
        return C.utf8_length_from_utf16(w, False)

    def utf8_length_from_utf16be(self, w):
        return C.utf8_length_from_utf16(w, True)

    # -- conversions ---------------------------------------------------------
    def convert_utf8_to_utf16le_with_errors(self, b):
        code, count, out = C.utf8_to_utf16(b, False)
        return _res(code, count), _u16out(out)

    def convert_utf8_to_utf16be_with_errors(self, b):
        code, count, out = C.utf8_to_utf16(b, True)
        return _res(code, count), _u16out(out)

    def convert_utf8_to_utf32_with_errors(self, b):
        code, count, out = C.utf8_to_utf32(b)
        return _res(code, count), _u32out(out)

    def convert_utf8_to_latin1_with_errors(self, b):
        code, count, out = C.utf8_to_latin1(b)
        return _res(code, count), _u8out(out)

    def convert_utf16le_to_utf8_with_errors(self, w):
        code, count, out = C.utf16_to_utf8(w, False)
        return _res(code, count), _u8out(out)

    def convert_utf16be_to_utf8_with_errors(self, w):
        code, count, out = C.utf16_to_utf8(w, True)
        return _res(code, count), _u8out(out)

    def convert_utf16le_to_utf32_with_errors(self, w):
        code, count, out = C.utf16_to_utf32(w, False)
        return _res(code, count), _u32out(out)

    def convert_utf16be_to_utf32_with_errors(self, w):
        code, count, out = C.utf16_to_utf32(w, True)
        return _res(code, count), _u32out(out)

    def convert_utf16le_to_latin1_with_errors(self, w):
        code, count, out = C.utf16_to_latin1(w, False)
        return _res(code, count), _u8out(out)

    def convert_utf16be_to_latin1_with_errors(self, w):
        code, count, out = C.utf16_to_latin1(w, True)
        return _res(code, count), _u8out(out)

    def convert_utf32_to_utf8_with_errors(self, w):
        code, count, out = C.utf32_to_utf8(w)
        return _res(code, count), _u8out(out)

    def convert_utf32_to_utf16le_with_errors(self, w):
        code, count, out = C.utf32_to_utf16(w, False)
        return _res(code, count), _u16out(out)

    def convert_utf32_to_utf16be_with_errors(self, w):
        code, count, out = C.utf32_to_utf16(w, True)
        return _res(code, count), _u16out(out)

    def convert_utf32_to_latin1_with_errors(self, w):
        code, count, out = C.utf32_to_latin1(w)
        return _res(code, count), _u8out(out)

    def convert_latin1_to_utf8(self, b):
        return _u8out(C.latin1_to_utf8(b))

    def convert_latin1_to_utf16le(self, b):
        return _u16out(C.latin1_to_utf16(b, False))

    def convert_latin1_to_utf16be(self, b):
        return _u16out(C.latin1_to_utf16(b, True))

    def convert_latin1_to_utf32(self, b):
        return _u32out(C.latin1_to_utf32(b))

    # -- base64 --------------------------------------------------------------
    def base64_to_binary_details(self, src, options=0, last_chunk=gb.LOOSE):
        is16 = isinstance(src, np.ndarray) and src.dtype == np.uint16
        if is16 and not src.flags["C_CONTIGUOUS"]:
            src = np.ascontiguousarray(src)
        code, in_count, out_count, out = C.b64_decode(
            src, options, last_chunk, 1 if is16 else 0
        )
        return FullResult(ec(code), in_count, out_count), _u8out(out)

    def binary_to_base64(self, src, options=0):
        return _u8out(C.b64_encode(src, options))
