"""Goldilocks GF(p) arithmetic on uint32-pair lanes (jnp; Pallas-safe).

p = 2^64 - 2^32 + 1.  A field element x in [0, p) is carried as two uint32
arrays ``(lo, hi)`` with x = hi * 2^32 + lo.  Every function below keeps the
canonical invariant (result < p), uses only elementwise uint32 ops (add, mul
low-32, shifts, compares, selects), and therefore runs identically under jit
on TPU/CPU *and inside Pallas kernel bodies*.

Why uint32 pairs: the TPU VPU has no 64-bit integer lanes. A 64x64->128 mul
is built from four 32x32->64 partial products, each of which is built from
four 16x16->32 products (uint32 multiply on TPU returns the low 32 bits, and
16-bit-half products are exact in 32 bits). The 128-bit result is folded with
the Goldilocks identities 2^64 = 2^32 - 1 (mod p) and 2^96 = -1 (mod p).

Reference equivalent: `plonky2_field::goldilocks_field` add/sub/mul/reduce128
[dep: from knowledge; pin /root/reference/Cargo.lock:3466].
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from . import field_host

P = field_host.P
EPSILON = field_host.EPSILON  # 2^32 - 1 == 2^64 mod p
MULT_GROUP_GEN = field_host.MULT_GROUP_GEN
TWO_ADICITY = field_host.TWO_ADICITY

_U32 = jnp.uint32
_MASK16 = 0xFFFF


class GF(NamedTuple):
    """A Goldilocks element array: x = hi * 2^32 + lo, canonical in [0, p)."""

    lo: jnp.ndarray  # uint32
    hi: jnp.ndarray  # uint32

    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __getitem__(self, idx):
        return GF(self.lo[idx], self.hi[idx])


def gf(x) -> GF:
    """Build a GF from python ints / int sequences / uint64 ndarray."""
    lo, hi = field_host.to_u32_pairs(x)
    return GF(jnp.asarray(lo), jnp.asarray(hi))


def from_u64(arr: np.ndarray) -> GF:
    lo, hi = field_host.to_u32_pairs(arr)
    return GF(jnp.asarray(lo), jnp.asarray(hi))


def to_u64(a: GF) -> np.ndarray:
    """-> numpy uint64 array (host transfer)."""
    lo = np.asarray(a.lo, dtype=np.uint64)
    hi = np.asarray(a.hi, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def zeros(shape) -> GF:
    z = jnp.zeros(shape, dtype=_U32)
    return GF(z, z)


def ones(shape) -> GF:
    return GF(jnp.ones(shape, dtype=_U32), jnp.zeros(shape, dtype=_U32))


def full(shape, value: int) -> GF:
    value %= P
    return GF(
        jnp.full(shape, value & 0xFFFFFFFF, dtype=_U32),
        jnp.full(shape, value >> 32, dtype=_U32),
    )


def _b2u(b) -> jnp.ndarray:
    return b.astype(_U32)


def _canonical_reduce(lo, hi):
    """Conditionally subtract p from a value in [0, 2^64).

    v >= p  iff  hi == 0xFFFFFFFF and lo >= 1 (p = (0xFFFFFFFF << 32) | 1).
    Then v - p = (lo - 1, hi - 0xFFFFFFFF) = (lo - 1, 0)."""
    ge_p = (hi == _U32(0xFFFFFFFF)) & (lo != _U32(0))
    lo = lo - _b2u(ge_p)
    hi = jnp.where(ge_p, _U32(0), hi)
    return lo, hi


def add(a: GF, b: GF) -> GF:
    """a + b mod p (inputs canonical -> output canonical).

    With a, b < p the 65-bit sum folds as sum64 + overflow * EPSILON without a
    second overflow (sum64 < 2^64 - 2^33 + 2 when overflow=1)."""
    s_lo = a.lo + b.lo
    c0 = _b2u(s_lo < a.lo)
    t = a.hi + b.hi
    c1 = t < a.hi
    s_hi = t + c0
    c2 = s_hi < t
    over = _b2u(c1 | c2)  # 65th bit
    # + over * EPSILON, EPSILON = 0xFFFFFFFF: lo' = s_lo - over (mod 2^32);
    # the add s_lo + 0xFFFFFFFF carries into hi iff s_lo != 0.
    e_lo = s_lo - over
    carry = _b2u(over.astype(bool) & (s_lo != _U32(0)))
    e_hi = s_hi + carry
    return GF(*_canonical_reduce(e_lo, e_hi))


def sub(a: GF, b: GF) -> GF:
    """a - b mod p (canonical). On borrow, subtract EPSILON from the wrapped
    difference (d >= EPSILON is guaranteed since d = 2^64 + a - b > 2^64 - p)."""
    d_lo = a.lo - b.lo
    bor0 = _b2u(a.lo < b.lo)
    t = a.hi - b.hi
    bor1 = a.hi < b.hi
    d_hi = t - bor0
    bor2 = t < bor0
    borrow = _b2u(bor1 | bor2)
    # subtract borrow * EPSILON = borrow * (2^32 - 1): lo -= -borrow i.e. lo += borrow ... exact:
    # v - (2^32 - 1) = v + 1 - 2^32: lo' = lo + 1 (wrap), hi' = hi - 1 + (lo wrapped to 0)
    e_lo = d_lo + borrow
    hi_borrow = _b2u(borrow.astype(bool) & (e_lo != _U32(0)))
    e_hi = d_hi - hi_borrow
    return GF(e_lo, e_hi)


def neg(a: GF) -> GF:
    return sub(zeros(a.shape), a)


def _mul32x32(a, b):
    """Exact 32x32 -> 64 product via 16-bit halves. -> (lo32, hi32)."""
    a0 = a & _U32(_MASK16)
    a1 = a >> 16
    b0 = b & _U32(_MASK16)
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    mid_c = _b2u(mid < lh)  # carry out of mid (bit 32 of lh+hl)
    lo = ll + (mid << 16)
    lo_c = _b2u(lo < ll)
    hi = hh + (mid >> 16) + (mid_c << 16) + lo_c
    return lo, hi


def _add64(a_lo, a_hi, b_lo, b_hi):
    """(a + b) mod 2^64 with carry-out. -> (lo, hi, carry_u32)."""
    s_lo = a_lo + b_lo
    c0 = _b2u(s_lo < a_lo)
    t = a_hi + b_hi
    c1 = t < a_hi
    s_hi = t + c0
    c2 = s_hi < t
    return s_lo, s_hi, _b2u(c1 | c2)


def _mul64x64(a_lo, a_hi, b_lo, b_hi):
    """Exact 64x64 -> 128 product. -> four uint32 limbs (r0..r3, LSB first)."""
    p00_lo, p00_hi = _mul32x32(a_lo, b_lo)
    p01_lo, p01_hi = _mul32x32(a_lo, b_hi)
    p10_lo, p10_hi = _mul32x32(a_hi, b_lo)
    p11_lo, p11_hi = _mul32x32(a_hi, b_hi)

    r0 = p00_lo
    # r1 = p00_hi + p01_lo + p10_lo (collect carries into r2)
    s1 = p00_hi + p01_lo
    c1a = _b2u(s1 < p00_hi)
    r1 = s1 + p10_lo
    c1b = _b2u(r1 < s1)
    carry1 = c1a + c1b  # 0..2
    # r2 = p01_hi + p10_hi + p11_lo + carry1 (carries into r3)
    s2 = p01_hi + p10_hi
    c2a = _b2u(s2 < p01_hi)
    s2b = s2 + p11_lo
    c2b = _b2u(s2b < s2)
    r2 = s2b + carry1
    c2c = _b2u(r2 < s2b)
    carry2 = c2a + c2b + c2c
    r3 = p11_hi + carry2  # exact: true product < 2^128
    return r0, r1, r2, r3


def _reduce128(r0, r1, r2, r3):
    """Fold a 128-bit value mod p (canonical output).

    x = x_hi * 2^64 + x_lo with x_hi = (r3, r2), x_lo = (r1, r0).
    2^96 = -1 (mod p)      -> subtract r3 from x_lo
    2^64 = 2^32 - 1 (mod p)-> add r2 * EPSILON
    Mirrors plonky2's branch-free reduce128 [dep: from knowledge]."""
    # t0 = x_lo - r3 (64-bit, borrow -> further subtract EPSILON; cannot double-borrow)
    t0_lo = r0 - r3
    b0 = _b2u(r0 < r3)
    t0_hi = r1 - b0
    borrow = _b2u(r1 < b0)
    #   subtract borrow * EPSILON == add borrow then subtract borrow * 2^32
    t0_lo2 = t0_lo + borrow
    hi_bor = _b2u(borrow.astype(bool) & (t0_lo2 != _U32(0)))
    t0_hi2 = t0_hi - hi_bor
    # t1 = r2 * EPSILON = (r2 << 32) - r2
    t1_lo = _U32(0) - r2
    t1_hi = r2 - _b2u(r2 != _U32(0))
    # t2 = t0 + t1 (overflow -> add EPSILON; cannot double-overflow)
    s_lo, s_hi, over = _add64(t0_lo2, t0_hi2, t1_lo, t1_hi)
    e_lo = s_lo - over
    carry = _b2u(over.astype(bool) & (s_lo != _U32(0)))
    e_hi = s_hi + carry
    return _canonical_reduce(e_lo, e_hi)


def mul(a: GF, b: GF) -> GF:
    return GF(*_reduce128(*_mul64x64(a.lo, a.hi, b.lo, b.hi)))


def sqr(a: GF) -> GF:
    return mul(a, a)


def mul_const(a: GF, c: int) -> GF:
    """Multiply by a compile-time constant (broadcast)."""
    c %= P
    c_lo = jnp.full(a.lo.shape, c & 0xFFFFFFFF, dtype=_U32)
    c_hi = jnp.full(a.lo.shape, c >> 32, dtype=_U32)
    return mul(a, GF(c_lo, c_hi))


def pow_const(a: GF, e: int) -> GF:
    """a^e for a compile-time exponent (square-and-multiply, unrolled)."""
    e %= P - 1
    if e == 0:
        return ones(a.shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def _inv_impl(lo, hi):
    r = pow_const(GF(lo, hi), P - 2)
    return r.lo, r.hi


_inv_jit = None


def inv(a: GF) -> GF:
    """a^(p-2). 72 squarings/muls via addition-chain-free square&multiply.

    The chain runs as ONE jitted program per shape: eagerly it was ~130
    sequential dispatches (~1 s/call on the CPU tier — the dominant term
    of the warm per-proof floor via DEEP's denominator inversions).

    Zero input maps to zero (callers must guard if that matters)."""
    global _inv_jit
    if _inv_jit is None:
        import jax

        _inv_jit = jax.jit(_inv_impl)
    return GF(*_inv_jit(a.lo, a.hi))


def eq(a: GF, b: GF) -> jnp.ndarray:
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GF) -> jnp.ndarray:
    return (a.lo == _U32(0)) & (a.hi == _U32(0))


def to_canonical(a: GF) -> GF:
    return GF(*_canonical_reduce(a.lo, a.hi))


def select(pred, a: GF, b: GF) -> GF:
    """where(pred, a, b)."""
    return GF(jnp.where(pred, a.lo, b.lo), jnp.where(pred, a.hi, b.hi))


def concatenate(xs: Sequence[GF], axis=0) -> GF:
    return GF(
        jnp.concatenate([x.lo for x in xs], axis=axis),
        jnp.concatenate([x.hi for x in xs], axis=axis),
    )


def stack(xs: Sequence[GF], axis=0) -> GF:
    return GF(
        jnp.stack([x.lo for x in xs], axis=axis),
        jnp.stack([x.hi for x in xs], axis=axis),
    )


def reshape(a: GF, shape) -> GF:
    return GF(a.lo.reshape(shape), a.hi.reshape(shape))


def take(a: GF, idx, axis=0) -> GF:
    return GF(jnp.take(a.lo, idx, axis=axis), jnp.take(a.hi, idx, axis=axis))
