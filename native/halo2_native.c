/* halo2_native: native 256-bit field arithmetic for the host-exact paths.
 *
 * The runtime around the TPU compute path (SURVEY.md: the reference's
 * equivalent layers are native Rust). This module accelerates the host
 * MockProver's vertical-gate stencil check and bulk modular arithmetic over
 * 32-byte little-endian scalars:
 *
 *   - gate check: q[i] * (A[i] + A[i+1]*A[i+2] - A[i+3]) == 0 over whole
 *     columns (the hot loop of backend/mock.py, SURVEY §3.1)
 *   - modmul/modadd/modsub over contiguous arrays
 *
 * Arithmetic: 4x64-bit limbs with __int128 schoolbook + Montgomery REDC
 * (R = 2^256); values enter/leave in canonical form.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

typedef struct {
    u64 p[4];      /* modulus, little-endian limbs */
    u64 n0;        /* -p^{-1} mod 2^64 */
    u64 r2[4];     /* R^2 mod p */
} FieldCtx;

static int geq(const u64 a[4], const u64 b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return 1;
}

static void sub4(u64 out[4], const u64 a[4], const u64 b[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        out[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static void addmod(u64 out[4], const u64 a[4], const u64 b[4], const FieldCtx *f) {
    u64 t[4];
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq(t, f->p)) {
        sub4(out, t, f->p);
    } else {
        memcpy(out, t, 32);
    }
}

static void submod(u64 out[4], const u64 a[4], const u64 b[4], const FieldCtx *f) {
    u64 t[4];
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + f->p[i] + carry;
            out[i] = (u64)s;
            carry = s >> 64;
        }
    } else {
        memcpy(out, t, 32);
    }
}

/* Montgomery product: out = a * b * R^{-1} mod p (CIOS). */
static void mont_mul(u64 out[4], const u64 a[4], const u64 b[4], const FieldCtx *f) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)t[j] + (u128)a[i] * b[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * f->n0;
        carry = 0;
        u128 s0 = (u128)t[0] + (u128)m * f->p[0];
        carry = s0 >> 64;
        for (int j = 1; j < 4; j++) {
            u128 sj = (u128)t[j] + (u128)m * f->p[j] + carry;
            t[j - 1] = (u64)sj;
            carry = sj >> 64;
        }
        s0 = (u128)t[4] + carry;
        t[3] = (u64)s0;
        t[4] = t[5] + (u64)(s0 >> 64);
        t[5] = 0;
    }
    if (t[4] || geq(t, f->p)) {
        sub4(out, t, f->p);
    } else {
        memcpy(out, t, 32);
    }
}

/* canonical product: mont_mul twice via R^2 */
static void mulmod(u64 out[4], const u64 a[4], const u64 b[4], const FieldCtx *f) {
    u64 ab_r_inv[4], a_r[4];
    mont_mul(a_r, a, f->r2, f);     /* a * R */
    mont_mul(ab_r_inv, a_r, b, f);  /* a * b */
    memcpy(out, ab_r_inv, 32);
}

static void ctx_from_bytes(FieldCtx *f, const unsigned char *p_bytes, const unsigned char *r2_bytes) {
    memcpy(f->p, p_bytes, 32);
    memcpy(f->r2, r2_bytes, 32);
    /* n0 = -p^{-1} mod 2^64 via Newton iteration */
    u64 inv = 1;
    for (int i = 0; i < 6; i++) {
        inv *= 2 - f->p[0] * inv;
    }
    f->n0 = (u64)(0 - inv);
}

/* ---- Python API ------------------------------------------------------- */

/* check_gates(p32, r2_32, col_bytes, sel_bytes, nrows) -> first bad row or -1
 * col_bytes: nrows * 32 bytes LE canonical values; sel_bytes: nrows chars. */
static PyObject *py_check_gates(PyObject *self, PyObject *args) {
    Py_buffer pb, r2b, colb, selb;
    Py_ssize_t nrows;
    if (!PyArg_ParseTuple(args, "y*y*y*y*n", &pb, &r2b, &colb, &selb, &nrows))
        return NULL;
    FieldCtx f;
    ctx_from_bytes(&f, pb.buf, r2b.buf);
    const unsigned char *cols = colb.buf;
    const unsigned char *sels = selb.buf;
    Py_ssize_t bad = -1;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t r = 0; r < nrows; r++) {
        if (!sels[r]) continue;
        u64 a[4] = {0}, b[4] = {0}, c[4] = {0}, d[4] = {0};
        memcpy(a, cols + 32 * r, 32);
        if (r + 1 < nrows) memcpy(b, cols + 32 * (r + 1), 32);
        if (r + 2 < nrows) memcpy(c, cols + 32 * (r + 2), 32);
        if (r + 3 < nrows) memcpy(d, cols + 32 * (r + 3), 32);
        u64 bc[4], lhs[4], res[4];
        mulmod(bc, b, c, &f);
        addmod(lhs, a, bc, &f);
        submod(res, lhs, d, &f);
        if (res[0] | res[1] | res[2] | res[3]) { bad = r; break; }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&pb); PyBuffer_Release(&r2b);
    PyBuffer_Release(&colb); PyBuffer_Release(&selb);
    return PyLong_FromSsize_t(bad);
}

/* elementwise modmul/addmod/submod over arrays of 32-byte values */
#define DEF_VEC_OP(name, op)                                                  \
static PyObject *py_##name(PyObject *self, PyObject *args) {                  \
    Py_buffer pb, r2b, ab, bb;                                                \
    if (!PyArg_ParseTuple(args, "y*y*y*y*", &pb, &r2b, &ab, &bb))             \
        return NULL;                                                          \
    if (ab.len != bb.len || ab.len % 32) {                                    \
        PyErr_SetString(PyExc_ValueError, "bad buffer sizes");                \
        PyBuffer_Release(&pb); PyBuffer_Release(&r2b);                        \
        PyBuffer_Release(&ab); PyBuffer_Release(&bb);                         \
        return NULL;                                                          \
    }                                                                         \
    FieldCtx f;                                                               \
    ctx_from_bytes(&f, pb.buf, r2b.buf);                                      \
    Py_ssize_t n = ab.len / 32;                                               \
    PyObject *out = PyBytes_FromStringAndSize(NULL, ab.len);                  \
    if (!out) goto done;                                                      \
    {                                                                         \
        unsigned char *o = (unsigned char *)PyBytes_AS_STRING(out);           \
        const unsigned char *ap = ab.buf, *bp = bb.buf;                       \
        Py_BEGIN_ALLOW_THREADS                                                \
        for (Py_ssize_t i = 0; i < n; i++) {                                  \
            u64 x[4], y[4], z[4];                                             \
            memcpy(x, ap + 32 * i, 32);                                       \
            memcpy(y, bp + 32 * i, 32);                                       \
            op(z, x, y, &f);                                                  \
            memcpy(o + 32 * i, z, 32);                                        \
        }                                                                     \
        Py_END_ALLOW_THREADS                                                  \
    }                                                                         \
done:                                                                         \
    PyBuffer_Release(&pb); PyBuffer_Release(&r2b);                            \
    PyBuffer_Release(&ab); PyBuffer_Release(&bb);                             \
    return out;                                                               \
}

DEF_VEC_OP(modmul_vec, mulmod)
DEF_VEC_OP(modadd_vec, addmod)
DEF_VEC_OP(modsub_vec, submod)

static PyMethodDef Methods[] = {
    {"check_gates", py_check_gates, METH_VARARGS,
     "first failing gate row of one column, or -1"},
    {"modmul_vec", py_modmul_vec, METH_VARARGS, "elementwise a*b mod p"},
    {"modadd_vec", py_modadd_vec, METH_VARARGS, "elementwise a+b mod p"},
    {"modsub_vec", py_modsub_vec, METH_VARARGS, "elementwise a-b mod p"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "halo2_native", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit_halo2_native(void) {
    return PyModule_Create(&moduledef);
}
