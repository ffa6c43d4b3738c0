/* Native host kernels for ethproof_tpu's witness path.
 *
 * Reference equivalent: the reference's entire host stack is native Rust
 * (SURVEY.md §2b); here the hot host-side primitive — keccak-f[1600] and
 * keccak256, hammered by MPT root hashing during witness generation and
 * trie binding — is a C extension (CPython C API; no pybind11 in the
 * image). ethproof_tpu.hash.keccak transparently uses it when built
 * (python native/build.py) and falls back to numpy otherwise.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int R[5][5] = {{0, 36, 3, 41, 18},
                            {1, 44, 10, 45, 2},
                            {62, 6, 43, 15, 61},
                            {28, 55, 25, 21, 56},
                            {27, 20, 39, 8, 14}};

#define ROTL(v, n) (((v) << (n)) | ((v) >> (64 - (n))))

/* state indexed s[x + 5*y] (lane order, matches the tables' convention) */
static void keccak_f(uint64_t s[25]) {
  uint64_t c[5], d[5], b[25];
  for (int round = 0; round < 24; round++) {
    for (int x = 0; x < 5; x++)
      c[x] = s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ ROTL(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) {
        uint64_t v = s[x + 5 * y] ^ d[x];
        int nx = y, ny = (2 * x + 3 * y) % 5;
        int r = R[x][y];
        b[nx + 5 * ny] = r ? ROTL(v, r) : v;
      }
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        s[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    s[0] ^= RC[round];
  }
}

static PyObject *py_keccak256(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  const uint8_t *data = (const uint8_t *)buf.buf;
  Py_ssize_t len = buf.len;
  uint64_t s[25];
  memset(s, 0, sizeof(s));
  const Py_ssize_t rate = 136;
  Py_ssize_t off = 0;
  uint8_t block[200];
  while (len - off >= rate) {
    for (int i = 0; i < rate / 8; i++) {
      uint64_t lane;
      memcpy(&lane, data + off + 8 * i, 8);
      s[i] ^= lane; /* little-endian host assumed (x86/arm64) */
    }
    keccak_f(s);
    off += rate;
  }
  memset(block, 0, rate);
  memcpy(block, data + off, len - off);
  block[len - off] ^= 0x01;
  block[rate - 1] ^= 0x80;
  for (int i = 0; i < rate / 8; i++) {
    uint64_t lane;
    memcpy(&lane, block + 8 * i, 8);
    s[i] ^= lane;
  }
  keccak_f(s);
  PyBuffer_Release(&buf);
  uint8_t out[32];
  memcpy(out, s, 32);
  return PyBytes_FromStringAndSize((const char *)out, 32);
}

static PyObject *py_keccak_f(PyObject *self, PyObject *args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
  if (buf.len != 200) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "state must be 200 bytes");
    return NULL;
  }
  uint64_t s[25];
  memcpy(s, buf.buf, 200);
  PyBuffer_Release(&buf);
  keccak_f(s);
  return PyBytes_FromStringAndSize((const char *)s, 200);
}

static PyMethodDef Methods[] = {
    {"keccak256", py_keccak256, METH_VARARGS,
     "Ethereum keccak256 of a bytes-like object."},
    {"keccak_f", py_keccak_f, METH_VARARGS,
     "keccak-f[1600] on a 200-byte lane-order state."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT,
                                       "_ethproof_native", NULL, -1, Methods};

PyMODINIT_FUNC PyInit__ethproof_native(void) {
  return PyModule_Create(&moduledef);
}
