/* cnative — C scalar tier for simdutf_tpu.
 *
 * Plays the role of the reference's fallback backend (src/fallback,
 * src/scalar): portable per-code-point machines with 8-byte ASCII fast
 * paths, exposed to Python via the CPython C API (no pybind11). Written
 * from the documented semantics (error codes / first-error positions per
 * include/simdutf/error.h and the scalar kernels' contracts); not a
 * translation of the reference sources.
 *
 * All entry points take buffers via the buffer protocol (zero-copy from
 * bytes / NumPy) and return plain tuples.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* error_code values — must match simdutf_tpu.errors.error_code */
enum {
  E_SUCCESS = 0,
  E_HEADER_BITS = 1,
  E_TOO_SHORT = 2,
  E_TOO_LONG = 3,
  E_OVERLONG = 4,
  E_TOO_LARGE = 5,
  E_SURROGATE = 6,
  E_INVALID_BASE64_CHARACTER = 7,
  E_BASE64_INPUT_REMAINDER = 8,
  E_BASE64_EXTRA_BITS = 9,
  E_OUTPUT_BUFFER_TOO_SMALL = 10
};

static inline int is_cont(uint8_t b) { return (b & 0xC0) == 0x80; }

static inline uint16_t load16(const uint8_t *p, int be) {
  return be ? (uint16_t)((p[0] << 8) | p[1]) : (uint16_t)(p[0] | (p[1] << 8));
}

static inline void store16(uint8_t *p, uint16_t v, int be) {
  if (be) {
    p[0] = (uint8_t)(v >> 8);
    p[1] = (uint8_t)v;
  } else {
    p[0] = (uint8_t)v;
    p[1] = (uint8_t)(v >> 8);
  }
}

static inline uint32_t load32le(const uint8_t *p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}

static inline void store32le(uint8_t *p, uint32_t v) {
  p[0] = (uint8_t)v;
  p[1] = (uint8_t)(v >> 8);
  p[2] = (uint8_t)(v >> 16);
  p[3] = (uint8_t)(v >> 24);
}

/* ---------------- ASCII ---------------- */

static int ascii_first_bad(const uint8_t *d, Py_ssize_t n, Py_ssize_t *pos) {
  Py_ssize_t i = 0;
  while (i + 8 <= n) {
    uint64_t v;
    memcpy(&v, d + i, 8);
    if (v & 0x8080808080808080ULL) break;
    i += 8;
  }
  for (; i < n; i++) {
    if (d[i] >= 0x80) {
      *pos = i;
      return E_TOO_LARGE;
    }
  }
  *pos = n;
  return E_SUCCESS;
}

/* ---------------- UTF-8 ----------------
 * Decode one sequence at d[i]; on success store codepoint+len, else error.
 */
static inline int utf8_seq(const uint8_t *d, Py_ssize_t n, Py_ssize_t i,
                           uint32_t *cp, int *len) {
  uint8_t b = d[i];
  if (b < 0x80) {
    *cp = b;
    *len = 1;
    return E_SUCCESS;
  }
  if ((b & 0xE0) == 0xC0) {
    if (i + 1 >= n || !is_cont(d[i + 1])) return E_TOO_SHORT;
    uint32_t c = ((uint32_t)(b & 0x1F) << 6) | (d[i + 1] & 0x3F);
    if (c < 0x80) return E_OVERLONG;
    *cp = c;
    *len = 2;
    return E_SUCCESS;
  }
  if ((b & 0xF0) == 0xE0) {
    if (i + 2 >= n) return E_TOO_SHORT;
    if (!is_cont(d[i + 1]) || !is_cont(d[i + 2])) return E_TOO_SHORT;
    uint32_t c = ((uint32_t)(b & 0x0F) << 12) |
                 ((uint32_t)(d[i + 1] & 0x3F) << 6) | (d[i + 2] & 0x3F);
    if (c < 0x800) return E_OVERLONG;
    if (c >= 0xD800 && c <= 0xDFFF) return E_SURROGATE;
    *cp = c;
    *len = 3;
    return E_SUCCESS;
  }
  if ((b & 0xF8) == 0xF0) {
    if (i + 3 >= n) return E_TOO_SHORT;
    if (!is_cont(d[i + 1]) || !is_cont(d[i + 2]) || !is_cont(d[i + 3]))
      return E_TOO_SHORT;
    uint32_t c = ((uint32_t)(b & 0x07) << 18) |
                 ((uint32_t)(d[i + 1] & 0x3F) << 12) |
                 ((uint32_t)(d[i + 2] & 0x3F) << 6) | (d[i + 3] & 0x3F);
    if (c <= 0xFFFF) return E_OVERLONG;
    if (c > 0x10FFFF) return E_TOO_LARGE;
    *cp = c;
    *len = 4;
    return E_SUCCESS;
  }
  return is_cont(b) ? E_TOO_LONG : E_HEADER_BITS;
}

static int utf8_first_bad(const uint8_t *d, Py_ssize_t n, Py_ssize_t *pos) {
  Py_ssize_t i = 0;
  while (i < n) {
    if (i + 8 <= n) { /* ASCII fast path */
      uint64_t v;
      memcpy(&v, d + i, 8);
      if (!(v & 0x8080808080808080ULL)) {
        i += 8;
        continue;
      }
    }
    if (d[i] < 0x80) {
      i++;
      continue;
    }
    uint32_t cp;
    int len;
    int e = utf8_seq(d, n, i, &cp, &len);
    if (e != E_SUCCESS) {
      *pos = i;
      return e;
    }
    i += len;
  }
  *pos = n;
  return E_SUCCESS;
}

/* ---------------- module functions ---------------- */

static PyObject *py_validate_ascii(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  Py_ssize_t pos;
  int code = ascii_first_bad((const uint8_t *)buf.buf, buf.len, &pos);
  PyBuffer_Release(&buf);
  return Py_BuildValue("(in)", code, pos);
}

static PyObject *py_validate_utf8(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  Py_ssize_t pos;
  int code = utf8_first_bad((const uint8_t *)buf.buf, buf.len, &pos);
  PyBuffer_Release(&buf);
  return Py_BuildValue("(in)", code, pos);
}

static PyObject *py_count_utf8(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len, cnt = 0;
  for (Py_ssize_t i = 0; i < n; i++) cnt += !is_cont(d[i]);
  PyBuffer_Release(&buf);
  return PyLong_FromSsize_t(cnt);
}

static PyObject *py_utf16_length_from_utf8(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len, cnt = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    cnt += !is_cont(d[i]);
    cnt += d[i] >= 0xF0;
  }
  PyBuffer_Release(&buf);
  return PyLong_FromSsize_t(cnt);
}

/* utf8 -> utf16 (be flag): returns (code, count, bytes)
 * count = units written on success, input error position on failure. */
static PyObject *py_utf8_to_utf16(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 2 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0, w = 0;
  int code = E_SUCCESS;
  while (i < n) {
    if (i + 8 <= n) {
      uint64_t v;
      memcpy(&v, d + i, 8);
      if (!(v & 0x8080808080808080ULL)) {
        for (int k = 0; k < 8; k++) store16(o + 2 * (w + k), d[i + k], be);
        i += 8;
        w += 8;
        continue;
      }
    }
    uint32_t cp;
    int len;
    code = utf8_seq(d, n, i, &cp, &len);
    if (code != E_SUCCESS) break;
    if (cp < 0x10000) {
      store16(o + 2 * w++, (uint16_t)cp, be);
    } else {
      cp -= 0x10000;
      store16(o + 2 * w++, (uint16_t)(0xD800 + (cp >> 10)), be);
      store16(o + 2 * w++, (uint16_t)(0xDC00 + (cp & 0x3FF)), be);
    }
    i += len;
  }
  _PyBytes_Resize(&out, 2 * w);
  PyObject *r = Py_BuildValue("(inN)", code, code == E_SUCCESS ? w : i, out);
  PyBuffer_Release(&buf);
  return r;
}

static PyObject *py_utf8_to_utf32(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 4 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0, w = 0;
  int code = E_SUCCESS;
  while (i < n) {
    if (i + 8 <= n) {
      uint64_t v;
      memcpy(&v, d + i, 8);
      if (!(v & 0x8080808080808080ULL)) {
        for (int k = 0; k < 8; k++) store32le(o + 4 * (w + k), d[i + k]);
        i += 8;
        w += 8;
        continue;
      }
    }
    uint32_t cp;
    int len;
    code = utf8_seq(d, n, i, &cp, &len);
    if (code != E_SUCCESS) break;
    store32le(o + 4 * w++, cp);
    i += len;
  }
  _PyBytes_Resize(&out, 4 * w);
  PyObject *r = Py_BuildValue("(inN)", code, code == E_SUCCESS ? w : i, out);
  PyBuffer_Release(&buf);
  return r;
}

/* utf8 -> latin1: its own error lattice (3/4-byte leads TOO_LARGE). */
static PyObject *py_utf8_to_latin1(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len;
  PyObject *out = PyBytes_FromStringAndSize(NULL, n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0, w = 0;
  int code = E_SUCCESS;
  while (i < n) {
    uint8_t b = d[i];
    if (b < 0x80) {
      o[w++] = b;
      i++;
    } else if ((b & 0xE0) == 0xC0) {
      if (i + 1 >= n || !is_cont(d[i + 1])) {
        code = E_TOO_SHORT;
        break;
      }
      uint32_t c = ((uint32_t)(b & 0x1F) << 6) | (d[i + 1] & 0x3F);
      if (c < 0x80) {
        code = E_OVERLONG;
        break;
      }
      if (c > 0xFF) {
        code = E_TOO_LARGE;
        break;
      }
      o[w++] = (uint8_t)c;
      i += 2;
    } else if ((b & 0xF0) == 0xE0 || (b & 0xF8) == 0xF0) {
      code = E_TOO_LARGE;
      break;
    } else if (is_cont(b)) {
      code = E_TOO_LONG;
      break;
    } else {
      code = E_HEADER_BITS;
      break;
    }
  }
  _PyBytes_Resize(&out, w);
  PyObject *r = Py_BuildValue("(inN)", code, code == E_SUCCESS ? w : i, out);
  PyBuffer_Release(&buf);
  return r;
}

/* ---------------- UTF-16 ---------------- */

static PyObject *py_validate_utf16(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 2, i = 0;
  int code = E_SUCCESS;
  while (i < n) {
    uint16_t w = load16(d + 2 * i, be);
    if ((w & 0xF800) == 0xD800) {
      if ((uint16_t)(w - 0xD800) > 0x3FF || i + 1 >= n ||
          (uint16_t)(load16(d + 2 * (i + 1), be) - 0xDC00) > 0x3FF) {
        code = E_SURROGATE;
        break;
      }
      i += 2;
    } else {
      i++;
    }
  }
  PyBuffer_Release(&buf);
  return Py_BuildValue("(in)", code, i);
}

/* U+FFFD substitution of ill-formed surrogates (utf16fix; local rule:
   bad = (high & !next_low) | (low & !prev_high), scalar/utf16.h:141-166) */
static PyObject *py_to_well_formed_utf16(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 2;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 2 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  int prev_high = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    uint16_t w = load16(d + 2 * i, be);
    int is_high = (w & 0xFC00) == 0xD800;
    int is_low = (w & 0xFC00) == 0xDC00;
    int next_low =
        (i + 1 < n) && ((load16(d + 2 * (i + 1), be) & 0xFC00) == 0xDC00);
    uint16_t v = ((is_high && !next_low) || (is_low && !prev_high)) ? 0xFFFD
                                                                    : w;
    if (be) {
      o[2 * i] = (uint8_t)(v >> 8);
      o[2 * i + 1] = (uint8_t)v;
    } else {
      o[2 * i] = (uint8_t)v;
      o[2 * i + 1] = (uint8_t)(v >> 8);
    }
    prev_high = is_high;
  }
  PyBuffer_Release(&buf);
  return out;
}

static PyObject *py_count_utf16(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 2, cnt = 0;
  for (Py_ssize_t i = 0; i < n; i++)
    cnt += (load16(d + 2 * i, be) & 0xFC00) != 0xDC00;
  PyBuffer_Release(&buf);
  return PyLong_FromSsize_t(cnt);
}

static PyObject *py_utf8_length_from_utf16(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 2, cnt = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    uint16_t w = load16(d + 2 * i, be);
    cnt += 1 + (w > 0x7F) + ((w > 0x7FF && w <= 0xD7FF) || w >= 0xE000);
  }
  PyBuffer_Release(&buf);
  return PyLong_FromSsize_t(cnt);
}

static PyObject *py_utf16_to_utf8(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 2;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 3 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0, w = 0;
  int code = E_SUCCESS;
  while (i < n) {
    uint16_t u = load16(d + 2 * i, be);
    if (u < 0x80) {
      o[w++] = (uint8_t)u;
      i++;
    } else if (u < 0x800) {
      o[w++] = (uint8_t)((u >> 6) | 0xC0);
      o[w++] = (uint8_t)((u & 0x3F) | 0x80);
      i++;
    } else if ((u & 0xF800) != 0xD800) {
      o[w++] = (uint8_t)((u >> 12) | 0xE0);
      o[w++] = (uint8_t)(((u >> 6) & 0x3F) | 0x80);
      o[w++] = (uint8_t)((u & 0x3F) | 0x80);
      i++;
    } else {
      if ((uint16_t)(u - 0xD800) > 0x3FF || i + 1 >= n) {
        code = E_SURROGATE;
        break;
      }
      uint16_t lo = load16(d + 2 * (i + 1), be);
      if ((uint16_t)(lo - 0xDC00) > 0x3FF) {
        code = E_SURROGATE;
        break;
      }
      uint32_t c =
          (((uint32_t)(u - 0xD800)) << 10) + (lo - 0xDC00) + 0x10000;
      o[w++] = (uint8_t)((c >> 18) | 0xF0);
      o[w++] = (uint8_t)(((c >> 12) & 0x3F) | 0x80);
      o[w++] = (uint8_t)(((c >> 6) & 0x3F) | 0x80);
      o[w++] = (uint8_t)((c & 0x3F) | 0x80);
      i += 2;
    }
  }
  _PyBytes_Resize(&out, w);
  PyObject *r = Py_BuildValue("(inN)", code, code == E_SUCCESS ? w : i, out);
  PyBuffer_Release(&buf);
  return r;
}

static PyObject *py_utf16_to_utf32(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 2;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 4 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0, w = 0;
  int code = E_SUCCESS;
  while (i < n) {
    uint16_t u = load16(d + 2 * i, be);
    if ((u & 0xF800) != 0xD800) {
      store32le(o + 4 * w++, u);
      i++;
    } else {
      if ((uint16_t)(u - 0xD800) > 0x3FF || i + 1 >= n) {
        code = E_SURROGATE;
        break;
      }
      uint16_t lo = load16(d + 2 * (i + 1), be);
      if ((uint16_t)(lo - 0xDC00) > 0x3FF) {
        code = E_SURROGATE;
        break;
      }
      store32le(o + 4 * w++,
                (((uint32_t)(u - 0xD800)) << 10) + (lo - 0xDC00) + 0x10000);
      i += 2;
    }
  }
  _PyBytes_Resize(&out, 4 * w);
  PyObject *r = Py_BuildValue("(inN)", code, code == E_SUCCESS ? w : i, out);
  PyBuffer_Release(&buf);
  return r;
}

static PyObject *py_utf16_to_latin1(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 2;
  PyObject *out = PyBytes_FromStringAndSize(NULL, n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0;
  int code = E_SUCCESS;
  for (; i < n; i++) {
    uint16_t u = load16(d + 2 * i, be);
    if (u > 0xFF) {
      code = E_TOO_LARGE;
      break;
    }
    o[i] = (uint8_t)u;
  }
  _PyBytes_Resize(&out, i);
  PyObject *r = Py_BuildValue("(inN)", code, i, out);
  PyBuffer_Release(&buf);
  return r;
}

/* ---------------- UTF-32 ---------------- */

static PyObject *py_validate_utf32(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 4, i = 0;
  int code = E_SUCCESS;
  for (; i < n; i++) {
    uint32_t w = load32le(d + 4 * i);
    if (w > 0x10FFFF) {
      code = E_TOO_LARGE;
      break;
    }
    if (w >= 0xD800 && w <= 0xDFFF) {
      code = E_SURROGATE;
      break;
    }
  }
  PyBuffer_Release(&buf);
  return Py_BuildValue("(in)", code, i);
}

static PyObject *py_utf32_to_utf8(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 4;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 4 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0, w = 0;
  int code = E_SUCCESS;
  for (; i < n; i++) {
    uint32_t c = load32le(d + 4 * i);
    if (c < 0x80) {
      o[w++] = (uint8_t)c;
    } else if (c < 0x800) {
      o[w++] = (uint8_t)((c >> 6) | 0xC0);
      o[w++] = (uint8_t)((c & 0x3F) | 0x80);
    } else if (c < 0x10000) {
      if (c >= 0xD800 && c <= 0xDFFF) {
        code = E_SURROGATE;
        break;
      }
      o[w++] = (uint8_t)((c >> 12) | 0xE0);
      o[w++] = (uint8_t)(((c >> 6) & 0x3F) | 0x80);
      o[w++] = (uint8_t)((c & 0x3F) | 0x80);
    } else {
      if (c > 0x10FFFF) {
        code = E_TOO_LARGE;
        break;
      }
      o[w++] = (uint8_t)((c >> 18) | 0xF0);
      o[w++] = (uint8_t)(((c >> 12) & 0x3F) | 0x80);
      o[w++] = (uint8_t)(((c >> 6) & 0x3F) | 0x80);
      o[w++] = (uint8_t)((c & 0x3F) | 0x80);
    }
  }
  _PyBytes_Resize(&out, w);
  PyObject *r = Py_BuildValue("(inN)", code, code == E_SUCCESS ? w : i, out);
  PyBuffer_Release(&buf);
  return r;
}

static PyObject *py_utf32_to_utf16(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 4;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 4 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0, w = 0;
  int code = E_SUCCESS;
  for (; i < n; i++) {
    uint32_t c = load32le(d + 4 * i);
    if (c < 0x10000) {
      if (c >= 0xD800 && c <= 0xDFFF) {
        code = E_SURROGATE;
        break;
      }
      store16(o + 2 * w++, (uint16_t)c, be);
    } else {
      if (c > 0x10FFFF) {
        code = E_TOO_LARGE;
        break;
      }
      c -= 0x10000;
      store16(o + 2 * w++, (uint16_t)(0xD800 + (c >> 10)), be);
      store16(o + 2 * w++, (uint16_t)(0xDC00 + (c & 0x3FF)), be);
    }
  }
  _PyBytes_Resize(&out, 2 * w);
  PyObject *r = Py_BuildValue("(inN)", code, code == E_SUCCESS ? w : i, out);
  PyBuffer_Release(&buf);
  return r;
}

static PyObject *py_utf32_to_latin1(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len / 4;
  PyObject *out = PyBytes_FromStringAndSize(NULL, n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0;
  int code = E_SUCCESS;
  for (; i < n; i++) {
    uint32_t c = load32le(d + 4 * i);
    if (c > 0xFF) {
      code = E_TOO_LARGE;
      break;
    }
    o[i] = (uint8_t)c;
  }
  _PyBytes_Resize(&out, i);
  PyObject *r = Py_BuildValue("(inN)", code, i, out);
  PyBuffer_Release(&buf);
  return r;
}

/* ---------------- Latin1 -> x ---------------- */

static PyObject *py_latin1_to_utf8(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 2 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t w = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    uint8_t b = d[i];
    if (b < 0x80) {
      o[w++] = b;
    } else {
      o[w++] = (uint8_t)((b >> 6) | 0xC0);
      o[w++] = (uint8_t)((b & 0x3F) | 0x80);
    }
  }
  _PyBytes_Resize(&out, w);
  PyBuffer_Release(&buf);
  return out;
}

static PyObject *py_latin1_to_utf16(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int be;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &be)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 2 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  for (Py_ssize_t i = 0; i < n; i++) store16(o + 2 * i, d[i], be);
  PyBuffer_Release(&buf);
  return out;
}

static PyObject *py_latin1_to_utf32(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len;
  PyObject *out = PyBytes_FromStringAndSize(NULL, 4 * n);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  for (Py_ssize_t i = 0; i < n; i++) store32le(o + 4 * i, d[i]);
  PyBuffer_Release(&buf);
  return out;
}

/* ---------------- base64 ---------------- */

static const char B64_STD[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
static const char B64_URL[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_";

static void build_table(uint8_t tab[256], int options) {
  memset(tab, 255, 256);
  const int url = options & 1, both = options & 8;
  if (!url || both)
    for (int i = 0; i < 64; i++) tab[(uint8_t)B64_STD[i]] = (uint8_t)i;
  if (url || both)
    for (int i = 0; i < 64; i++) tab[(uint8_t)B64_URL[i]] = (uint8_t)i;
  tab[' '] = tab['\t'] = tab['\n'] = tab['\r'] = tab['\f'] = 64;
}

static PyObject *py_b64_encode(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int options;
  if (!PyArg_ParseTuple(args, "y*i", &buf, &options)) return NULL;
  const uint8_t *d = (const uint8_t *)buf.buf;
  Py_ssize_t n = buf.len;
  const char *alpha = (options & 1) ? B64_URL : B64_STD;
  int pad = (((options & 1) == 0) ^ ((options & 2) == 2));
  Py_ssize_t cap = (n + 2) / 3 * 4;
  PyObject *out = PyBytes_FromStringAndSize(NULL, cap);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  Py_ssize_t i = 0, w = 0;
  for (; i + 2 < n; i += 3) {
    uint32_t t = ((uint32_t)d[i] << 16) | ((uint32_t)d[i + 1] << 8) | d[i + 2];
    o[w++] = alpha[(t >> 18) & 63];
    o[w++] = alpha[(t >> 12) & 63];
    o[w++] = alpha[(t >> 6) & 63];
    o[w++] = alpha[t & 63];
  }
  if (n - i == 1) {
    o[w++] = alpha[d[i] >> 2];
    o[w++] = alpha[(d[i] & 3) << 4];
    if (pad) {
      o[w++] = '=';
      o[w++] = '=';
    }
  } else if (n - i == 2) {
    o[w++] = alpha[d[i] >> 2];
    o[w++] = alpha[((d[i] & 3) << 4) | (d[i + 1] >> 4)];
    o[w++] = alpha[(d[i + 1] & 0x0F) << 2];
    if (pad) o[w++] = '=';
  }
  _PyBytes_Resize(&out, w);
  PyBuffer_Release(&buf);
  return out;
}

/* Full forgiving decode: returns (code, input_count, output_count, bytes).
 * ``is16`` selects char16 input (the reference templates the whole decode
 * over char/char16_t, src/scalar/base64.h:33; units >= 256 are invalid
 * base64 characters, matching is_eight_byte()). */
static PyObject *py_b64_decode(PyObject *self, PyObject *args) {
  Py_buffer buf;
  int options, last_chunk, is16 = 0;
  if (!PyArg_ParseTuple(args, "y*ii|i", &buf, &options, &last_chunk, &is16))
    return NULL;
  const uint8_t *d8 = (const uint8_t *)buf.buf;
  const uint16_t *d16 = (const uint16_t *)buf.buf;
  Py_ssize_t srclen = is16 ? buf.len / 2 : buf.len;
  uint8_t tab[256];
  build_table(tab, options);
  const int garbage = (options == 4 || options == 5 || options == 12);
#define AT(i) ((uint32_t)(is16 ? d16[(i)] : d8[(i)]))
#define VALOF(c) ((c) < 256 ? tab[(c)] : (uint8_t)255)

  Py_ssize_t pad_pos = srclen;
  Py_ssize_t pad_count = 0;
  if (!garbage) {
    while (srclen > 0 && VALOF(AT(srclen - 1)) == 64) srclen--;
    if (srclen > 0 && AT(srclen - 1) == '=') {
      pad_pos = --srclen;
      pad_count = 1;
      while (srclen > 0 && VALOF(AT(srclen - 1)) == 64) srclen--;
      if (srclen > 0 && AT(srclen - 1) == '=') {
        pad_pos = --srclen;
        pad_count = 2;
      }
    }
  }
#define RET(code, in, outn)                                             \
  do {                                                                  \
    _PyBytes_Resize(&out, (outn));                                      \
    PyObject *r_ = Py_BuildValue("(innN)", (code), (Py_ssize_t)(in),    \
                                 (Py_ssize_t)(outn), out);              \
    PyBuffer_Release(&buf);                                             \
    return r_;                                                          \
  } while (0)

  PyObject *out =
      PyBytes_FromStringAndSize(NULL, srclen > 0 ? (srclen + 3) / 4 * 3 + 2 : 0);
  if (!out) {
    PyBuffer_Release(&buf);
    return NULL;
  }
  uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
  if (srclen == 0) {
    if (!garbage && pad_count > 0) {
      if (last_chunk == 1) RET(E_BASE64_INPUT_REMAINDER, 0, 0);
      if (last_chunk == 2) RET(E_SUCCESS, 0, 0);
      RET(E_INVALID_BASE64_CHARACTER, pad_pos, 0);
    }
    RET(E_SUCCESS, 0, 0);
  }

  Py_ssize_t w = 0, i = 0;
  uint8_t buf4[4];
  int idx = 0;
  Py_ssize_t chunk_first_valid = -1;
  while (i < srclen) {
    uint8_t v = VALOF(AT(i));
    if (v <= 63) {
      if (idx == 0) chunk_first_valid = i;
      buf4[idx++] = v;
      if (idx == 4) {
        uint32_t t = ((uint32_t)buf4[0] << 18) | ((uint32_t)buf4[1] << 12) |
                     ((uint32_t)buf4[2] << 6) | buf4[3];
        o[w++] = (uint8_t)(t >> 16);
        o[w++] = (uint8_t)(t >> 8);
        o[w++] = (uint8_t)t;
        idx = 0;
        chunk_first_valid = -1;
      }
    } else if (v == 64 || garbage) {
      /* space (or tolerated garbage) */
    } else {
      RET(E_INVALID_BASE64_CHARACTER, i, w);
    }
    i++;
  }
  if (idx != 0 || (!garbage && pad_count > 0)) {
    if (!garbage && last_chunk == 1 && idx != 1 &&
        ((idx + pad_count) & 3) != 0)
      RET(E_BASE64_INPUT_REMAINDER, srclen, w);
    if (!garbage && last_chunk == 2 && ((idx + pad_count) & 3) != 0) {
      Py_ssize_t start = idx > 0 ? chunk_first_valid : srclen;
      RET(E_SUCCESS, start, w);
    }
    if (idx == 2) {
      uint32_t t = ((uint32_t)buf4[0] << 18) | ((uint32_t)buf4[1] << 12);
      if (!garbage && last_chunk == 1 && (t & 0xFFFF))
        RET(E_BASE64_EXTRA_BITS, srclen, w);
      o[w++] = (uint8_t)(t >> 16);
    } else if (idx == 3) {
      uint32_t t = ((uint32_t)buf4[0] << 18) | ((uint32_t)buf4[1] << 12) |
                   ((uint32_t)buf4[2] << 6);
      if (!garbage && last_chunk == 1 && (t & 0xFF))
        RET(E_BASE64_EXTRA_BITS, srclen, w);
      o[w++] = (uint8_t)(t >> 16);
      o[w++] = (uint8_t)(t >> 8);
    } else if (!garbage && idx == 1 && last_chunk != 2) {
      RET(E_BASE64_INPUT_REMAINDER, srclen, w);
    }
  }
  if (!garbage && last_chunk != 2 && pad_count > 0) {
    if ((w % 3 == 0) || ((w % 3) + 1 + pad_count != 4))
      RET(E_INVALID_BASE64_CHARACTER, pad_pos, w);
  }
  RET(E_SUCCESS, srclen, w);
#undef RET
#undef AT
#undef VALOF
}

/* ---------------- registration ---------------- */

/* Batch row packer: memcpy each bytes-like item of `items` into row i of
 * the (B, rowbytes) output buffer and zero the row tail. The Python-side
 * per-row loop this replaces dominates host time for large batches of
 * small strings (runtime/memory-management tier in C, like the rest of
 * this extension). */
static PyObject *py_pack_batch(PyObject *self, PyObject *args) {
  PyObject *seq_in;
  Py_buffer out;
  Py_ssize_t rowbytes;
  if (!PyArg_ParseTuple(args, "Ow*n", &seq_in, &out, &rowbytes))
    return NULL;
  PyObject *seq = PySequence_Fast(seq_in, "pack_batch: items must be a sequence");
  if (!seq) {
    PyBuffer_Release(&out);
    return NULL;
  }
  Py_ssize_t B = PySequence_Fast_GET_SIZE(seq);
  if (out.len < B * rowbytes) {
    Py_DECREF(seq);
    PyBuffer_Release(&out);
    PyErr_SetString(PyExc_ValueError, "pack_batch: output buffer too small");
    return NULL;
  }
  char *dst = (char *)out.buf;
  for (Py_ssize_t i = 0; i < B; i++) {
    PyObject *item = PySequence_Fast_GET_ITEM(seq, i);
    Py_buffer v;
    if (PyObject_GetBuffer(item, &v, PyBUF_SIMPLE) != 0) {
      Py_DECREF(seq);
      PyBuffer_Release(&out);
      return NULL;
    }
    if (v.len > rowbytes) {
      PyBuffer_Release(&v);
      Py_DECREF(seq);
      PyBuffer_Release(&out);
      PyErr_SetString(PyExc_ValueError, "pack_batch: item exceeds row size");
      return NULL;
    }
    memcpy(dst + i * rowbytes, v.buf, (size_t)v.len);
    memset(dst + i * rowbytes + v.len, 0, (size_t)(rowbytes - v.len));
    PyBuffer_Release(&v);
  }
  Py_DECREF(seq);
  PyBuffer_Release(&out);
  Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"pack_batch", py_pack_batch, METH_VARARGS, NULL},
    {"validate_ascii", py_validate_ascii, METH_VARARGS, NULL},
    {"validate_utf8", py_validate_utf8, METH_VARARGS, NULL},
    {"validate_utf16", py_validate_utf16, METH_VARARGS, NULL},
    {"validate_utf32", py_validate_utf32, METH_VARARGS, NULL},
    {"count_utf8", py_count_utf8, METH_VARARGS, NULL},
    {"count_utf16", py_count_utf16, METH_VARARGS, NULL},
    {"utf16_length_from_utf8", py_utf16_length_from_utf8, METH_VARARGS, NULL},
    {"utf8_length_from_utf16", py_utf8_length_from_utf16, METH_VARARGS, NULL},
    {"utf8_to_utf16", py_utf8_to_utf16, METH_VARARGS, NULL},
    {"utf8_to_utf32", py_utf8_to_utf32, METH_VARARGS, NULL},
    {"utf8_to_latin1", py_utf8_to_latin1, METH_VARARGS, NULL},
    {"utf16_to_utf8", py_utf16_to_utf8, METH_VARARGS, NULL},
    {"utf16_to_utf32", py_utf16_to_utf32, METH_VARARGS, NULL},
    {"utf16_to_latin1", py_utf16_to_latin1, METH_VARARGS, NULL},
    {"utf32_to_utf8", py_utf32_to_utf8, METH_VARARGS, NULL},
    {"utf32_to_utf16", py_utf32_to_utf16, METH_VARARGS, NULL},
    {"utf32_to_latin1", py_utf32_to_latin1, METH_VARARGS, NULL},
    {"latin1_to_utf8", py_latin1_to_utf8, METH_VARARGS, NULL},
    {"latin1_to_utf16", py_latin1_to_utf16, METH_VARARGS, NULL},
    {"latin1_to_utf32", py_latin1_to_utf32, METH_VARARGS, NULL},
    {"to_well_formed_utf16", py_to_well_formed_utf16, METH_VARARGS, NULL},
    {"b64_encode", py_b64_encode, METH_VARARGS, NULL},
    {"b64_decode", py_b64_decode, METH_VARARGS, NULL},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_cnative", "C scalar tier for simdutf_tpu", -1,
    Methods};

PyMODINIT_FUNC PyInit__cnative(void) { return PyModule_Create(&moduledef); }
