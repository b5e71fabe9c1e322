/* framesink — native frame-sink codecs for cellularautomatons3d_tpu.
 *
 * The engine's frame sink (the counterpart of the reference's canvas
 * presentation, main_pathtraced.js:1775-1794) writes rendered frames to
 * disk.  Pure-Python PNG encoding of a 1080p frame costs tens of
 * milliseconds — more than the render itself — so the hot encoders live
 * here as a C extension (CPython API + zlib):
 *
 *   encode_png(height, width, rgb_bytes, level=1) -> bytes
 *   pack_bits(u8_bytes) -> bytes         (8 cells/byte, LSB-first)
 *   unpack_bits(packed_bytes, n) -> bytes
 *
 * pack/unpack are the host-side bit-packing codecs used for fast
 * checkpoint IO of huge grids (1024^3 = 1 GiB dense -> 128 MiB packed).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>
#include <zlib.h>

static void put_u32be(uint8_t *p, uint32_t v) {
    p[0] = (uint8_t)(v >> 24);
    p[1] = (uint8_t)(v >> 16);
    p[2] = (uint8_t)(v >> 8);
    p[3] = (uint8_t)(v);
}

/* Append one PNG chunk (tag + data + crc) at *out; returns bytes written. */
static size_t put_chunk(uint8_t *out, const char *tag, const uint8_t *data,
                        size_t len) {
    put_u32be(out, (uint32_t)len);
    memcpy(out + 4, tag, 4);
    if (len) memcpy(out + 8, data, len);
    uLong crc = crc32(0L, (const Bytef *)(out + 4), (uInt)(len + 4));
    put_u32be(out + 8 + len, (uint32_t)crc);
    return 12 + len;
}

static PyObject *encode_png(PyObject *self, PyObject *args) {
    Py_ssize_t h, w;
    Py_buffer rgb;
    int level = 1;
    if (!PyArg_ParseTuple(args, "nny*|i", &h, &w, &rgb, &level)) return NULL;
    if (h <= 0 || w <= 0 || w > PY_SSIZE_T_MAX / 3 / h) {
        PyBuffer_Release(&rgb);
        PyErr_SetString(PyExc_ValueError,
                        "h and w must be positive and h*w*3 representable");
        return NULL;
    }
    if (rgb.len != h * w * 3) {
        PyBuffer_Release(&rgb);
        PyErr_SetString(PyExc_ValueError, "rgb buffer must be h*w*3 bytes");
        return NULL;
    }

    size_t stride = (size_t)w * 3;
    size_t raw_len = (size_t)h * (stride + 1);
    uint8_t *raw = (uint8_t *)PyMem_Malloc(raw_len);
    if (!raw) {
        PyBuffer_Release(&rgb);
        return PyErr_NoMemory();
    }
    const uint8_t *src = (const uint8_t *)rgb.buf;

    uLongf comp_cap;
    uint8_t *comp = NULL;
    int zrc;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t r = 0; r < h; r++) {
        raw[r * (stride + 1)] = 0; /* filter: none */
        memcpy(raw + r * (stride + 1) + 1, src + r * stride, stride);
    }
    comp_cap = compressBound((uLong)raw_len);
    comp = (uint8_t *)malloc(comp_cap);
    zrc = comp ? compress2(comp, &comp_cap, raw, (uLong)raw_len, level)
               : Z_MEM_ERROR;
    Py_END_ALLOW_THREADS
    PyMem_Free(raw);
    PyBuffer_Release(&rgb);
    if (zrc != Z_OK) {
        free(comp);
        PyErr_SetString(PyExc_RuntimeError, "zlib compression failed");
        return NULL;
    }

    /* signature + IHDR(13) + IDAT(comp) + IEND */
    size_t total = 8 + 25 + (12 + comp_cap) + 12;
    PyObject *out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)total);
    if (!out) {
        free(comp);
        return NULL;
    }
    uint8_t *p = (uint8_t *)PyBytes_AS_STRING(out);
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    memcpy(p, sig, 8);
    p += 8;
    uint8_t ihdr[13];
    put_u32be(ihdr, (uint32_t)w);
    put_u32be(ihdr + 4, (uint32_t)h);
    ihdr[8] = 8;   /* bit depth */
    ihdr[9] = 2;   /* color type: RGB */
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    p += put_chunk(p, "IHDR", ihdr, 13);
    p += put_chunk(p, "IDAT", comp, comp_cap);
    p += put_chunk(p, "IEND", NULL, 0);
    free(comp);
    return out;
}

static PyObject *pack_bits(PyObject *self, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
    Py_ssize_t n = buf.len;
    Py_ssize_t out_len = (n + 7) / 8;
    PyObject *out = PyBytes_FromStringAndSize(NULL, out_len);
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint8_t *dst = (uint8_t *)PyBytes_AS_STRING(out);
    const uint8_t *src = (const uint8_t *)buf.buf;
    Py_BEGIN_ALLOW_THREADS
    memset(dst, 0, (size_t)out_len);
    for (Py_ssize_t i = 0; i < n; i++) {
        if (src[i]) dst[i >> 3] |= (uint8_t)(1u << (i & 7));
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    return out;
}

static PyObject *unpack_bits(PyObject *self, PyObject *args) {
    Py_buffer buf;
    Py_ssize_t n;
    if (!PyArg_ParseTuple(args, "y*n", &buf, &n)) return NULL;
    if (n > buf.len * 8) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "n exceeds packed capacity");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, n);
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint8_t *dst = (uint8_t *)PyBytes_AS_STRING(out);
    const uint8_t *src = (const uint8_t *)buf.buf;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < n; i++) {
        dst[i] = (src[i >> 3] >> (i & 7)) & 1u;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    return out;
}

static PyMethodDef methods[] = {
    {"encode_png", encode_png, METH_VARARGS,
     "encode_png(h, w, rgb_bytes, level=1) -> PNG bytes"},
    {"pack_bits", pack_bits, METH_VARARGS,
     "pack_bits(u8_bytes) -> packed bytes (8 cells/byte, LSB-first)"},
    {"unpack_bits", unpack_bits, METH_VARARGS,
     "unpack_bits(packed, n) -> u8 bytes"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "framesink",
    "native frame-sink codecs (PNG, bit packing)", -1, methods,
};

PyMODINIT_FUNC PyInit_framesink(void) { return PyModule_Create(&module); }
