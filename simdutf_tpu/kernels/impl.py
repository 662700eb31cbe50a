"""PallasImplementation: TPU-kernel tier.

Subclasses the XLA tier and overrides the hot entry points with Pallas
kernels; everything else inherits — the same structure as reference
backends overriding ~70 virtuals while sharing generic algorithms
(src/haswell/implementation.cpp).

Registered only when the runtime can execute the kernels (TPU backend, or
any backend via the Pallas interpreter for CI).
"""

from __future__ import annotations

import jax
import numpy as np

from ..errors import Result, error_code as ec
from ..ops.impl import XLAImplementation, _MIN_BUCKET
from ..runtime import staging_buffer
from . import validate as kv
from . import utf16_kernels as k16
from . import swar as ksw
from . import transcode as ktr
from . import base64_kernel as kb64
from . import detect_kernel as kdet


def _tile_layout(n: int, width: int, lead_tiles: int, trail_tiles: int,
                 dtype, tag: str):
    """Shared bucket/layout computation for all kernel paddings: data
    padded to a power-of-two multiple of one tile, with ``lead_tiles`` /
    ``trail_tiles`` zero tiles around it. Returns (buffer, start_elems)."""
    tile = width * kv.BR
    minimum = _MIN_BUCKET if dtype == np.uint8 else _MIN_BUCKET // 2
    need = max(n + 8, minimum)
    cap = 1 << (need - 1).bit_length()
    if cap % tile:
        cap += tile - cap % tile
    rows = cap // width
    start = lead_tiles * tile
    buf = staging_buffer(
        (rows + (lead_tiles + trail_tiles) * kv.BR, width),
        dtype,
        fill_len=start + n,
        tag=tag,
    )
    return buf, start


def _pad2d(arr: np.ndarray):
    """uint8 -> ((R+BR, W) zero-padded buffer, length). R is a multiple of
    BR; BR extra zero rows feed the one-tile lookahead input."""
    n = int(arr.shape[0])
    out, start = _tile_layout(n, kv.W, 0, 1, np.uint8, "pad2d")
    out.reshape(-1)[:n] = arr
    return out, np.int32(n)


class PallasImplementation(XLAImplementation):
    name = "pallas"
    description = "Hand-tuned Pallas TPU kernels (+XLA for the rest)"

    def supported_by_runtime_system(self) -> bool:
        # Always runnable: real Mosaic kernels on TPU, the Pallas
        # interpreter elsewhere (differential CI, like the reference
        # fuzzing every backend on one host).
        return True

    def preferred_by_runtime(self) -> bool:
        # Only the best-pick default on real TPU hardware; interpreted
        # kernels should never win the auto-selection on CPU/GPU.
        try:
            return jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            return False

    def internal_tests(self):
        """Kernel-invariant checks run through the registry (the
        reference's internal_tests mechanism, implementation.h:5019-5037):
        private formulations validated against tiny oracles."""

        def swar_formula():
            from ..golden import utf8 as g8

            for bad in (b"\x80abc", b"\xc2", b"\xe0\x80\x80", b"\xf5\x80\x80\x80",
                        b"\xed\xa0\x80", b"\xc0\xaf"):
                data = b"ok " + bad + b" tail"
                arr = np.frombuffer(data, np.uint8)
                x32, _ = _pad_swar(arr)
                flagged = int(ksw.utf8_swar_first_bad_word(x32)) != ksw.BIG
                assert flagged == g8.validate_with_errors(arr).is_err, bad

        def phase_planes():
            import base64 as pyb64

            raw = bytes(range(256)) * 24
            chars = pyb64.b64encode(raw)
            x32, _ = _pad_b64c(np.frombuffer(chars, np.uint8))
            out, flag = kb64.clean_decode(x32, len(chars) // 4)
            assert int(flag) == 0
            got = np.asarray(out).view(np.uint8).reshape(-1)[: len(raw)]
            assert got.tobytes() == raw

        def widen_image():
            data = bytes(range(128)) * 8
            x16, n = _pad_widen(np.frombuffer(data, np.uint8))
            out, flag = ktr.ascii_widen_utf16(x16)
            assert int(flag) == 0
            got = np.asarray(out).view(np.uint16).reshape(-1)[: int(n)]
            assert got.tobytes() == data.decode().encode("utf-16-le")

        def lane_compaction():
            # the gather-binary-search compaction primitive
            # (kernels/compaction.py) — kept measurement-ready for future
            # hardware with cheaper dynamic gathers (DESIGN-compaction.md)
            import jax.numpy as jnp

            from . import compaction as kc

            rng = np.random.default_rng(5)
            val = rng.integers(1, 1000, (8, 128)).astype(np.int32)
            keep = rng.random((8, 128)) < 0.4
            out, cnt = kc.row_compact_pallas(jnp.asarray(val),
                                             jnp.asarray(keep))
            out, cnt = np.asarray(out), np.asarray(cnt)
            for r in range(8):
                want = val[r][keep[r]]
                assert int(cnt[r]) == want.shape[0]
                assert np.array_equal(out[r, : want.shape[0]], want), r

        return [("swar_formula", swar_formula),
                ("b64_phase_planes", phase_planes),
                ("ascii_widen_image", widen_image),
                ("lane_compaction", lane_compaction)]

    # -- validation ----------------------------------------------------------
    def validate_utf8(self, b):
        """Hot path: measured pick between the SWAR any-error check
        (4 bytes/lane) and the per-byte event kernel — a one-time timing
        probe per process (ops/engine_probe.validate_kernel; BENCH_r02
        measured event 2.1x faster than the then-hardcoded SWAR), the
        reference's best-pick dispatch applied to kernel variants
        (src/implementation.cpp:1274-1309). Exact error localization only
        runs when the check fires — the vector-pass/rescan split of
        generic/utf8_validation/utf8_validator.h."""
        from ..ops.engine_probe import validate_kernel

        if validate_kernel() == "event":
            x2d, _ = _pad2d(b)
            pos, _ = kv.utf8_first_event(x2d)
            return int(pos) == kv.BIG
        x32, n = _pad_swar(b)
        return int(ksw.utf8_swar_first_bad_word(x32)) == ksw.BIG

    def validate_utf8_with_errors(self, b):
        """SWAR flag -> exact (code, pos) from a tiny host window around the
        flagged word — the reference's rewind-and-revalidate trick
        (scalar/utf8.h:207-228) at word scale. The first scalar-machine
        error lies within 4 bytes of the first SWAR-flagged word (every
        SWAR predicate reads <= 4 bytes of context), so a [flag-8, flag+16)
        window whose start is snapped back to a lead byte reproduces the
        global first error exactly; spurious truncation events at the
        window's end lie beyond it and lose the min."""
        from ..ops.engine_probe import validate_kernel

        if validate_kernel() == "event":
            x2d, n2 = _pad2d(b)
            pos, code = kv.utf8_first_event(x2d)
            if int(pos) == kv.BIG:
                return Result(ec.SUCCESS, int(n2))
            return Result(ec(int(code)), int(pos))
        x32, n = _pad_swar(b)
        word = int(ksw.utf8_swar_first_bad_word(x32))
        n = int(n)
        if word == ksw.BIG:
            return Result(ec.SUCCESS, n)
        fb = word * 4
        start = max(fb - 8, 0)
        back = 0
        while start > 0 and back < 3 and (int(b[start]) & 0xC0) == 0x80:
            start -= 1
            back += 1
        window = b[start : min(fb + 16, n)]
        from ..golden import utf8 as g8

        res = g8.validate_with_errors(window)
        if res.is_err:
            return Result(res.error, start + res.count)
        # safety net (should be unreachable): full exact kernel
        x2d, n2 = _pad2d(b)
        pos, code = kv.utf8_first_event(x2d)
        if int(pos) == kv.BIG:
            return Result(ec.SUCCESS, n)
        return Result(ec(int(code)), int(pos))

    def validate_ascii_with_errors(self, b):
        x32, n = _pad_swar(b)
        word = int(ksw.ascii_swar_first_bad_word(x32))
        if word == ksw.BIG:
            return Result(ec.SUCCESS, int(n))
        # exact byte within the flagged word, from the host copy
        base = word * 4
        for k in range(4):
            if base + k < int(n) and int(b[base + k]) >= 0x80:
                return Result(ec.TOO_LARGE, base + k)
        return Result(ec.SUCCESS, int(n))  # unreachable (zero padding)

    def validate_ascii(self, b):
        return self.validate_ascii_with_errors(b).is_ok

    # -- counting ------------------------------------------------------------
    def count_utf8(self, b):
        x2d, n = _pad2d(b)
        return int(kv.utf8_count(x2d, n))

    def utf16_length_from_utf8(self, b):
        x2d, n = _pad2d(b)
        return int(kv.utf8_utf16_length(x2d, n))

    def utf32_length_from_utf8(self, b):
        # code-point count (golden/utf8.py utf32_length == count)
        x2d, n = _pad2d(b)
        return int(kv.utf8_count(x2d, n))

    def latin1_length_from_utf8(self, b):
        x2d, n = _pad2d(b)
        return int(kv.utf8_count(x2d, n))

    def utf8_length_from_latin1(self, b):
        x2d, n = _pad2d(b)
        return int(kv.latin1_utf8_length(x2d, n))

    def utf8_length_from_utf32(self, w):
        x32, n = _pad_u32k(w)
        return int(kv.utf32_reduce(x32, n, "utf8len"))

    def utf16_length_from_utf32(self, w):
        x32, n = _pad_u32k(w)
        return int(kv.utf32_reduce(x32, n, "utf16len"))

    def validate_utf32_with_errors(self, w):
        """Pallas range scan; the error code (TOO_LARGE vs SURROGATE) is
        read off the flagged word from the host copy."""
        x32, n = _pad_u32k(w)
        pos = int(kv.utf32_first_bad(x32, n))
        n = int(n)
        if pos >= n:
            return Result(ec.SUCCESS, n)
        word = int(w[pos])
        code = ec.SURROGATE if 0xD800 <= word <= 0xDFFF else ec.TOO_LARGE
        return Result(code, pos)

    def validate_utf32(self, w):
        x32, n = _pad_u32k(w)
        return int(kv.utf32_first_bad(x32, n)) >= int(n)

    def utf32_length_from_utf16le(self, w):
        # == code-point count (golden/utf16.py utf32_length)
        x2d, n = _pad2d16(w)
        return int(k16.utf16_reduce(x2d, n, False, "count"))

    def utf32_length_from_utf16be(self, w):
        x2d, n = _pad2d16(w)
        return int(k16.utf16_reduce(x2d, n, True, "count"))

    # -- UTF-16 (pallas kernels) ---------------------------------------------
    def _v16(self, w, be):
        """SWAR check (2 units/word) + exact position from a tiny host
        window around the flagged word (surrogate context is 1 unit, so
        the scalar machine's first error is inside [flag*2-4, flag*2+8);
        the start snaps back one unit when it would split a pair)."""
        x32, n = _pad_swar16(w)
        word = int(ksw.utf16_swar_first_bad_word(x32, be=be))
        n = int(n)
        if word == ksw.BIG:
            return Result(ec.SUCCESS, n)
        fb = word * 2
        start = max(fb - 4, 0)
        # avoid splitting a surrogate pair at the window start
        if start > 0:
            u = int(w[start]) if not be else int(
                ((int(w[start]) << 8) | (int(w[start]) >> 8)) & 0xFFFF
            )
            pu = int(w[start - 1]) if not be else int(
                ((int(w[start - 1]) << 8) | (int(w[start - 1]) >> 8)) & 0xFFFF
            )
            if (u & 0xFC00) == 0xDC00 and (pu & 0xFC00) == 0xD800:
                start -= 1
        window = w[start : min(fb + 8, n)]
        from ..golden import utf16 as g16w

        res = g16w.validate_with_errors(window, big_endian=be)
        if res.is_err:
            return Result(res.error, start + res.count)
        # safety net: exact kernel over the full buffer
        x2d, _ = _pad2d16(w)
        pos = int(k16.utf16_first_bad(x2d, be))
        if pos >= n:
            return Result(ec.SUCCESS, n)
        return Result(ec.SURROGATE, pos)

    def validate_utf16le_with_errors(self, w):
        return self._v16(w, False)

    def validate_utf16be_with_errors(self, w):
        return self._v16(w, True)

    def validate_utf16le(self, w):
        return self._v16(w, False).is_ok

    def validate_utf16be(self, w):
        return self._v16(w, True).is_ok

    def count_utf16le(self, w):
        x2d, n = _pad2d16(w)
        return int(k16.utf16_reduce(x2d, n, False, "count"))

    def count_utf16be(self, w):
        x2d, n = _pad2d16(w)
        return int(k16.utf16_reduce(x2d, n, True, "count"))

    def utf8_length_from_utf16le(self, w):
        x2d, n = _pad2d16(w)
        return int(k16.utf16_reduce(x2d, n, False, "utf8len"))

    def utf8_length_from_utf16be(self, w):
        x2d, n = _pad2d16(w)
        return int(k16.utf16_reduce(x2d, n, True, "utf8len"))

    def to_well_formed_utf16le(self, w):
        x2d, n = _pad2d16(w)
        out = np.asarray(k16.utf16_to_well_formed(x2d, False))
        return out.reshape(-1)[: int(n)]

    def to_well_formed_utf16be(self, w):
        x2d, n = _pad2d16(w)
        out = np.asarray(k16.utf16_to_well_formed(x2d, True))
        return out.reshape(-1)[: int(n)]

    # -- detection (fused one-pass kernel) ------------------------------------
    def detect_encodings(self, b):
        """One corpus read for all three validators — the reference's
        one-pass detect (haswell/implementation.cpp:152-260) as a Pallas
        kernel; BOM stays on the host like the XLA tier."""
        from ..encodings import check_bom, encoding_type

        bom = check_bom(b[:4].tobytes())
        if bom != encoding_type.unspecified:
            return int(bom)
        n = int(b.shape[0])
        x2d, nn = _pad2d(b)
        ok8, ok16, ok32 = (int(x) for x in kdet.detect_fused(x2d, nn))
        out = 0
        if ok8:
            out |= int(encoding_type.UTF8)
        if n % 2 == 0 and ok16:
            out |= int(encoding_type.UTF16_LE)
        if n % 4 == 0 and ok32:
            out |= int(encoding_type.UTF32_LE)
        return out

    # -- transcode (ASCII fused fast path; general path inherits XLA) --------
    # The reference's per-block is_ascii short-circuit
    # (generic/utf8_to_utf16/utf8_to_utf16.h:237-240) lifted to corpus
    # scale: one fused widen kernel whose ASCII flag doubles as the
    # validity proof. A strided host peek avoids a wasted device pass on
    # clearly non-ASCII corpora.

    @staticmethod
    def _peek_ascii8(b) -> bool:
        n = b.shape[0]
        if n == 0:
            return True
        return int(b[:: max(1, n // 4096)].max()) < 0x80

    def _widen_ascii(self, b, be):
        """Try the fused ASCII widen; returns uint16 array or None."""
        if not self._peek_ascii8(b):
            return None
        x16, n = _pad_widen(b)
        out, flag = ktr.ascii_widen_utf16(x16, big_endian=be)
        if int(flag):
            return None
        return np.asarray(out).view(np.uint16).reshape(-1)[: int(n)]

    def _uniform_utf16(self, b, be):
        """Try the uniform-width kernels (pure 2-byte / pure 3-byte
        corpora — the reference's wikipedia_mars dataset class). The
        kernels validate their shape class exactly; a clean flag implies
        valid UTF-8. Returns uint16 array or None."""
        n = int(b.shape[0])
        if n == 0:
            return None
        sample = np.asarray(b[:: max(1, n // 2048)])
        hi = sample & 0xF0
        conts = (sample & 0xC0) == 0x80
        lead2 = (hi == 0xC0) | (hi == 0xD0)
        lead3 = hi == 0xE0
        lead4 = hi == 0xF0
        if n % 2 == 0 and bool(np.all(conts | lead2)) and bool(np.any(lead2)):
            x32, nn = _pad_u2(b)
            out, flag = ktr.uniform2_utf8_to_utf16(x32, nn, big_endian=be)
            if not int(flag):
                return np.asarray(out).view(np.uint16).reshape(-1)[: n // 2]
        elif (
            n % 3 == 0 and bool(np.all(conts | lead3)) and bool(np.any(lead3))
        ):
            x32, nn = _pad_u3(b)
            out, flag = ktr.uniform3_utf8_to_utf16(x32, nn, big_endian=be)
            if not int(flag):
                return np.asarray(out).view(np.uint16).reshape(-1)[: n // 3]
        elif (
            n % 4 == 0 and bool(np.all(conts | lead4)) and bool(np.any(lead4))
        ):
            # astral-only class (emoji streams): 4 bytes -> 1 surrogate
            # pair, an elementwise word map
            x32, nn = _pad_u2(b)
            out, flag = ktr.astral_wordmap(x32, nn, "u8_to_u16",
                                           big_endian=be)
            if not int(flag):
                return np.asarray(out).view(np.uint16).reshape(-1)[: n // 2]
        return None

    def _u8_to_u16_fast(self, b, be):
        out = self._widen_ascii(b, be)
        if out is None:
            out = self._uniform_utf16(b, be)
        return out

    def convert_valid_utf8_to_utf16le(self, b):
        out = self._u8_to_u16_fast(b, False)
        return out if out is not None else super().convert_valid_utf8_to_utf16le(b)

    def convert_valid_utf8_to_utf16be(self, b):
        out = self._u8_to_u16_fast(b, True)
        return out if out is not None else super().convert_valid_utf8_to_utf16be(b)

    def convert_utf8_to_utf16le_with_errors(self, b):
        out = self._u8_to_u16_fast(b, False)
        if out is not None:  # fast-path flag-clean implies valid UTF-8
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf8_to_utf16le_with_errors(b)

    def convert_utf8_to_utf16be_with_errors(self, b):
        out = self._u8_to_u16_fast(b, True)
        if out is not None:
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf8_to_utf16be_with_errors(b)

    @staticmethod
    def _peek_ascii16(w, be) -> bool:
        n = w.shape[0]
        if n == 0:
            return True
        sample = w[:: max(1, n // 2048)]
        return int(sample.max()) < (0x8000 if be else 0x80)

    def _narrow_ascii(self, w, be):
        if not self._peek_ascii16(w, be):
            return None
        x32, n = _pad_narrow(w)
        out, flag = ktr.ascii_narrow_utf8(x32, big_endian=be)
        if int(flag):
            return None
        return np.asarray(out).view(np.uint8).reshape(-1)[: int(n)]

    def _uniform_utf8(self, w, be):
        """Uniform-width utf16->utf8 classes (all units 2-byte-range or all
        3-byte-range). Flag-clean implies valid UTF-16."""
        n = int(w.shape[0])
        if n == 0:
            return None
        sample = np.asarray(w[:: max(1, n // 2048)])
        if be:
            sample = ((sample >> 8) | (sample << 8)).astype(np.uint16)
        lo, hi = int(sample.min()), int(sample.max())
        if 0x80 <= lo and hi <= 0x7FF:
            x32, nn = _pad_narrow(w)
            out, flag = ktr.uniform2_utf16_to_utf8(x32, nn, big_endian=be)
            if not int(flag):
                return np.asarray(out).view(np.uint8).reshape(-1)[: 2 * n]
        elif 0x800 <= lo:
            x32, nn = _pad_narrow(w)
            out, flag = ktr.uniform3_utf16_to_utf8(x32, nn, big_endian=be)
            if not int(flag):
                return np.asarray(out).view(np.uint8).reshape(-1)[: 3 * n]
        return None

    def _u16_to_u8_fast(self, w, be):
        out = self._narrow_ascii(w, be)
        if out is None:
            out = self._uniform_utf8(w, be)
        return out

    def convert_valid_utf16le_to_utf8(self, w):
        out = self._u16_to_u8_fast(w, False)
        return out if out is not None else super().convert_valid_utf16le_to_utf8(w)

    def convert_valid_utf16be_to_utf8(self, w):
        out = self._u16_to_u8_fast(w, True)
        return out if out is not None else super().convert_valid_utf16be_to_utf8(w)

    def convert_utf16le_to_utf8_with_errors(self, w):
        out = self._u16_to_u8_fast(w, False)
        if out is not None:  # all-ASCII units are trivially valid UTF-16
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf16le_to_utf8_with_errors(w)

    def convert_utf16be_to_utf8_with_errors(self, w):
        out = self._u16_to_u8_fast(w, True)
        if out is not None:
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf16be_to_utf8_with_errors(w)

    def _is_ascii_fast(self, b) -> bool:
        """Host peek + SWAR kernel ASCII check (one device pass)."""
        if not self._peek_ascii8(b):
            return False
        x32, _ = _pad_swar(b)
        return int(ksw.ascii_swar_first_bad_word(x32)) == ksw.BIG

    def convert_valid_utf8_to_latin1(self, b):
        # ASCII ⊂ Latin1 with identical bytes: the transcode is a copy
        # (the reference's latin1 fast path degenerates the same way)
        if self._is_ascii_fast(b):
            return np.array(b, copy=True)
        return super().convert_valid_utf8_to_latin1(b)

    def convert_utf8_to_latin1_with_errors(self, b):
        if self._is_ascii_fast(b):
            return Result(ec.SUCCESS, int(b.shape[0])), np.array(b, copy=True)
        return super().convert_utf8_to_latin1_with_errors(b)

    def convert_latin1_to_utf8(self, b):
        if self._is_ascii_fast(b):
            return np.array(b, copy=True)
        return super().convert_latin1_to_utf8(b)

    # -- utf8 <-> utf32 structured classes ------------------------------------
    def _u8_to_u32_fast(self, b):
        n = int(b.shape[0])
        if n == 0:
            return None
        if self._is_ascii_fast(b):
            x16, _ = _pad_widen(b)
            out = ktr.latin1_widen_utf32(x16)
            return np.asarray(out).view(np.uint32).reshape(-1)[:n]
        sample = np.asarray(b[:: max(1, n // 2048)])
        hi = sample & 0xF0
        conts = (sample & 0xC0) == 0x80
        lead2 = (hi == 0xC0) | (hi == 0xD0)
        lead3 = hi == 0xE0
        if n % 2 == 0 and bool(np.all(conts | lead2)) and bool(np.any(lead2)):
            x32, nn = _pad_u2(b)
            out, flag = ktr.uniform2_utf8_to_utf32(x32, nn)
            if not int(flag):
                return np.asarray(out).view(np.uint32).reshape(-1)[: n // 2]
        elif (
            n % 3 == 0 and bool(np.all(conts | lead3)) and bool(np.any(lead3))
        ):
            x32, nn = _pad_u3(b)
            out, flag = ktr.uniform3_utf8_to_utf32(x32, nn)
            if not int(flag):
                return np.asarray(out).view(np.uint32).reshape(-1)[: n // 3]
        elif (
            n % 4 == 0
            and bool(np.all(conts | (hi == 0xF0)))
            and bool(np.any(hi == 0xF0))
        ):
            x32, nn = _pad_u2(b)
            out, flag = ktr.astral_wordmap(x32, nn, "u8_to_u32")
            if not int(flag):
                return np.asarray(out).view(np.uint32).reshape(-1)[: n // 4]
        return None

    def convert_valid_utf8_to_utf32(self, b):
        out = self._u8_to_u32_fast(b)
        return out if out is not None else super().convert_valid_utf8_to_utf32(b)

    def convert_utf8_to_utf32_with_errors(self, b):
        out = self._u8_to_u32_fast(b)
        if out is not None:
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf8_to_utf32_with_errors(b)

    def _u32_to_u8_fast(self, w):
        n = int(w.shape[0])
        if n == 0:
            return None
        sample = np.asarray(w[:: max(1, n // 2048)])
        lo, hi = int(sample.min()), int(sample.max())
        if 0x80 <= lo and hi <= 0x7FF:
            x32, nn = _pad_u32k(w)
            out, flag = ktr.uniform2_utf32_to_utf8(x32, nn)
            if not int(flag):
                return np.asarray(out).view(np.uint8).reshape(-1)[: 2 * n]
        elif 0x800 <= lo and hi <= 0xFFFF:
            x32, nn = _pad_u32k(w)
            out, flag = ktr.uniform3_utf32_to_utf8(x32, nn)
            if not int(flag):
                return np.asarray(out).view(np.uint8).reshape(-1)[: 3 * n]
        elif 0x10000 <= lo and hi <= 0x10FFFF:
            # astral-only: 1 codepoint -> 4 UTF-8 bytes, elementwise
            x32, nn = _pad_word32(w)
            out, flag = ktr.astral_wordmap(x32, nn, "u32_to_u8")
            if not int(flag):
                return np.asarray(out).view(np.uint8).reshape(-1)[: 4 * n]
        return None

    def convert_valid_utf32_to_utf8(self, w):
        out = self._u32_to_u8_fast(w)
        return out if out is not None else super().convert_valid_utf32_to_utf8(w)

    def convert_utf32_to_utf8_with_errors(self, w):
        out = self._u32_to_u8_fast(w)
        if out is not None:  # uniform-class flag-clean implies valid UTF-32
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf32_to_utf8_with_errors(w)

    # -- latin1 widens (unconditional) + BMP utf16<->utf32 -------------------
    def convert_latin1_to_utf16le(self, b):
        x16, n = _pad_widen(b)
        out, _ = ktr.ascii_widen_utf16(x16, big_endian=False)
        return np.asarray(out).view(np.uint16).reshape(-1)[: int(n)]

    def convert_latin1_to_utf16be(self, b):
        x16, n = _pad_widen(b)
        out, _ = ktr.ascii_widen_utf16(x16, big_endian=True)
        return np.asarray(out).view(np.uint16).reshape(-1)[: int(n)]

    def convert_latin1_to_utf32(self, b):
        x16, n = _pad_widen(b)
        out = ktr.latin1_widen_utf32(x16)
        return np.asarray(out).view(np.uint32).reshape(-1)[: int(n)]

    def _bmp_widen(self, w, be):
        n = int(w.shape[0])
        if n == 0:
            return None
        sample = np.asarray(w[:: max(1, n // 2048)])
        if be:
            sample = ((sample >> 8) | (sample << 8)).astype(np.uint16)
        if n % 2 == 0 and bool(np.all((sample & 0xF800) == 0xD800)):
            # astral-only: every word is one surrogate pair -> one
            # codepoint, elementwise (kernel validates hi/lo order)
            x32, nn = _pad_narrow(w)
            out, flag = ktr.astral_wordmap(x32, nn, "u16pair_to_u32",
                                           big_endian=be)
            if not int(flag):
                return np.asarray(out).view(np.uint32).reshape(-1)[: n // 2]
            return None
        x32, _ = _pad_narrow(w)
        out, flag = ktr.bmp_widen_utf32(x32, big_endian=be)
        if int(flag):
            return None
        return np.asarray(out).view(np.uint32).reshape(-1)[:n]

    def convert_valid_utf16le_to_utf32(self, w):
        out = self._bmp_widen(w, False)
        return out if out is not None else super().convert_valid_utf16le_to_utf32(w)

    def convert_valid_utf16be_to_utf32(self, w):
        out = self._bmp_widen(w, True)
        return out if out is not None else super().convert_valid_utf16be_to_utf32(w)

    def convert_utf16le_to_utf32_with_errors(self, w):
        out = self._bmp_widen(w, False)
        if out is not None:  # surrogate-free implies valid UTF-16
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf16le_to_utf32_with_errors(w)

    def convert_utf16be_to_utf32_with_errors(self, w):
        out = self._bmp_widen(w, True)
        if out is not None:
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf16be_to_utf32_with_errors(w)

    def _bmp_narrow(self, w, be):
        n = int(w.shape[0])
        if n == 0:
            return None
        sample = np.asarray(w[:: max(1, n // 2048)])
        lo, hi = int(sample.min()), int(sample.max())
        if 0x10000 <= lo and hi <= 0x10FFFF:
            # astral-only: one codepoint -> one surrogate pair, elementwise
            x32, nn = _pad_word32(w)
            out, flag = ktr.astral_wordmap(x32, nn, "u32_to_u16pair",
                                           big_endian=be)
            if not int(flag):
                return np.asarray(out).view(np.uint16).reshape(-1)[: 2 * n]
            return None
        x32, _ = _pad_u32k(w)
        out, flag = ktr.bmp_narrow_utf16(x32, big_endian=be)
        if int(flag):
            return None
        return np.asarray(out).view(np.uint16).reshape(-1)[:n]

    def convert_valid_utf32_to_utf16le(self, w):
        out = self._bmp_narrow(w, False)
        return out if out is not None else super().convert_valid_utf32_to_utf16le(w)

    def convert_valid_utf32_to_utf16be(self, w):
        out = self._bmp_narrow(w, True)
        return out if out is not None else super().convert_valid_utf32_to_utf16be(w)

    def convert_utf32_to_utf16le_with_errors(self, w):
        out = self._bmp_narrow(w, False)
        if out is not None:  # BMP non-surrogate implies valid UTF-32
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf32_to_utf16le_with_errors(w)

    def convert_utf32_to_utf16be_with_errors(self, w):
        out = self._bmp_narrow(w, True)
        if out is not None:
            return Result(ec.SUCCESS, out.shape[0]), out
        return super().convert_utf32_to_utf16be_with_errors(w)

    # -- base64 (clean-input block kernels; forgiving path inherits XLA) -----
    # The reference's per-arch block64 kernels with the whitespace escape
    # hatch (generic/base64.h:103-141) at corpus scale: whitespace-free
    # input is a fixed-rate 4->3 repack (kernels/base64_kernel.py); a
    # fallback flag routes everything else to the XLA forgiving decoder.

    def base64_to_binary_details(self, src, options=0, last_chunk=None):
        from ..errors import FullResult
        from ..golden import base64_impl as gb
        from ..ops.impl import b64_strip, b64_tail_epilogue

        if last_chunk is None:
            last_chunk = gb.LOOSE
        garbage = gb.ignore_garbage(options)
        is16 = isinstance(src, np.ndarray) and src.dtype == np.uint16
        n = int(src.shape[0])
        if garbage or is16 or n < 4:
            return super().base64_to_binary_details(src, options, last_chunk)
        tab = gb.value_table(options)
        # host peek: a strided sample of the body must be clean chars
        sample = np.asarray(src[: max(0, n - 4) : max(1, n // 2048)])
        if len(sample) and int(tab[sample].max(initial=0)) > 63:
            return super().base64_to_binary_details(src, options, last_chunk)

        srclen, pad_count, pad_pos = b64_strip(src, tab, garbage)
        nfull = srclen // 4 * 4
        tail_vals = [int(tab[int(c)]) for c in np.asarray(src[nfull:srclen])]
        if any(v > 63 for v in tail_vals):
            return super().base64_to_binary_details(src, options, last_chunk)

        url = bool(options & gb.BASE64_URL)
        both = bool(options & gb.BASE64_DEFAULT_OR_URL)
        x32, _ = _pad_b64c(src[:nfull])
        out, flag = kb64.clean_decode(x32, nfull // 4, url=url, both=both)
        if int(flag):
            return super().base64_to_binary_details(src, options, last_chunk)
        outlen = nfull // 4 * 3
        body = np.asarray(out).view(np.uint8).reshape(-1)[:outlen]
        idx = srclen - nfull
        full, extra = b64_tail_epilogue(
            outlen, idx, tail_vals, nfull, srclen,
            pad_count, pad_pos, garbage, last_chunk,
        )
        if len(extra):
            body = np.concatenate([body, extra])
        return full, body

    def binary_to_base64(self, src, options=0):
        from ..golden import base64_impl as gb

        n = int(src.shape[0])
        nfull = n // 3 * 3
        if nfull == 0:
            return super().binary_to_base64(src, options)
        url = bool(options & gb.BASE64_URL)
        x32, _ = _pad_b64p(src[:nfull])
        chars = kb64.block_encode(x32, url=url)
        body = np.asarray(chars).view(np.uint8).reshape(-1)[: nfull // 3 * 4]
        tail = gb.encode(np.asarray(src[nfull:]), options)
        return np.concatenate([body, np.asarray(tail, dtype=np.uint8)])




def _pad2d16(arr: np.ndarray):
    """uint16 -> ((BR + R + BR, W16) buffer with zero tiles fore and aft,
    length in units)."""
    n = int(arr.shape[0])
    out, start = _tile_layout(n, k16.W16, 1, 1, np.uint16, "pad2d16")
    out.reshape(-1)[start : start + n] = arr
    return out, np.int32(n)


def _pad_widen(arr: np.ndarray):
    """uint8 -> ((rows, 256) int16 pair view, length): the ASCII widen
    kernel's layout (2 bytes per lane, no halos)."""
    n = int(arr.shape[0])
    buf, start = _tile_layout(n, kv.W, 0, 0, np.uint8, "widen")
    buf.reshape(-1)[:n] = arr
    rows = buf.shape[0]
    return buf.view(np.int16).reshape(rows, ktr.W16), np.int32(n)


def _pad_narrow(arr: np.ndarray):
    """uint16 -> ((rows, 256) int32 pair view, unit length) for the ASCII
    narrow kernel (2 units per lane, 1 KiB rows)."""
    n = int(arr.shape[0])
    buf, start = _tile_layout(n, ktr.W16 * 2, 0, 0, np.uint16, "narrow")
    buf.reshape(-1)[:n] = arr
    rows = buf.shape[0]
    return buf.view(np.int32).reshape(rows, ktr.W16), np.int32(n)


def _pad_u2(arr: np.ndarray):
    """uint8 -> ((rows, 256) int32 view, length) for the uniform-2-byte
    transcode kernel (1 KiB of chars per row)."""
    n = int(arr.shape[0])
    buf, _ = _tile_layout(n, 1024, 0, 0, np.uint8, "u2")
    buf.reshape(-1)[:n] = arr
    return buf.view(np.int32).reshape(buf.shape[0], 256), np.int32(n)


def _pad_u3(arr: np.ndarray):
    """uint8 -> ((rows, 384) int32 view, length) for the uniform-3-byte
    transcode kernel (1.5 KiB = 512 chars per row)."""
    n = int(arr.shape[0])
    buf, _ = _tile_layout(n, 1536, 0, 0, np.uint8, "u3")
    buf.reshape(-1)[:n] = arr
    return buf.view(np.int32).reshape(buf.shape[0], 384), np.int32(n)


def _pad_u32k(arr: np.ndarray):
    """uint32 -> ((rows, 512) int32 view, length) for the BMP narrow
    kernel (one codepoint per lane, 2 KiB rows)."""
    n = int(arr.shape[0])
    buf, _ = _tile_layout(n, 512, 0, 0, np.uint32, "u32k")
    buf.reshape(-1)[:n] = arr
    return buf.view(np.int32).reshape(buf.shape[0], 512), np.int32(n)


def _pad_word32(arr: np.ndarray):
    """uint32 -> ((rows, 256) int32 view, unit length) for the astral
    wordmap kernels (one codepoint per lane, 1 KiB rows)."""
    n = int(arr.shape[0])
    buf, _ = _tile_layout(n, 256, 0, 0, np.uint32, "w32map")
    buf.reshape(-1)[:n] = arr
    return buf.view(np.int32).reshape(buf.shape[0], 256), np.int32(n)


def _pad_b64c(arr: np.ndarray):
    """uint8 chars -> ((rows, 512) int32 word view, length) for the clean
    base64 decode kernel (2 KiB of chars per row)."""
    n = int(arr.shape[0])
    buf, _ = _tile_layout(n, 2048, 0, 0, np.uint8, "b64c")
    buf.reshape(-1)[:n] = arr
    rows = buf.shape[0]
    return buf.view(np.int32).reshape(rows, 512), np.int32(n)


def _pad_b64p(arr: np.ndarray):
    """uint8 payload -> ((rows, 384) int32 view, length) for the block
    base64 encode kernel (1.5 KiB of payload per row)."""
    n = int(arr.shape[0])
    buf, _ = _tile_layout(n, 1536, 0, 0, np.uint8, "b64p")
    buf.reshape(-1)[:n] = arr
    rows = buf.shape[0]
    return buf.view(np.int32).reshape(rows, 384), np.int32(n)


def _pad_swar(arr: np.ndarray):
    """uint8 -> int32 view (BR + R + BR, 128) with zero tiles fore and aft
    for the SWAR kernel's lane halos."""
    n = int(arr.shape[0])
    buf, start = _tile_layout(n, kv.W, 1, 1, np.uint8, "swar")
    buf.reshape(-1)[start : start + n] = arr
    rows = buf.shape[0]
    return buf.view(np.int32).reshape(rows, ksw.W32), np.int32(n)


def _pad_swar16(arr: np.ndarray):
    """uint16 -> int32 view (BR + R + BR, 128) with zero tiles fore and
    aft for the UTF-16 SWAR kernel (2 units per word)."""
    n = int(arr.shape[0])
    buf, start = _tile_layout(n, k16.W16, 1, 1, np.uint16, "swar16")
    buf.reshape(-1)[start : start + n] = arr
    rows = buf.shape[0]
    return buf.view(np.int32).reshape(rows, ksw.W32), np.int32(n)
