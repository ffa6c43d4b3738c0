"""Quadratic extension GF(p^2) = GF(p)[X] / (X^2 - W), W = 7.

Used for FRI / STARK soundness: challenges and quotient evaluations live in
the extension so the soundness error is ~ 1/p^2. W = 7 matches plonky2's
`QuadraticExtension<GoldilocksField>` [dep: from knowledge; pin
/root/reference/Cargo.lock:3441] and X^2 - 7 is irreducible over GF(p)
(7 is a quadratic non-residue; verified in tests/test_field.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import field as gfp
from .field import GF

W_EXT = 7


class GF2(NamedTuple):
    """a + b*X with X^2 = 7."""

    a: GF
    b: GF

    @property
    def shape(self):
        return self.a.lo.shape

    def __getitem__(self, idx):
        return GF2(self.a[idx], self.b[idx])


def from_base(x: GF) -> GF2:
    return GF2(x, gfp.zeros(x.shape))


def gf2(a, b=0) -> GF2:
    return GF2(gfp.gf(a), gfp.gf(b))


def zeros(shape) -> GF2:
    return GF2(gfp.zeros(shape), gfp.zeros(shape))


def ones(shape) -> GF2:
    return GF2(gfp.ones(shape), gfp.zeros(shape))


def add(x: GF2, y: GF2) -> GF2:
    return GF2(gfp.add(x.a, y.a), gfp.add(x.b, y.b))


def sub(x: GF2, y: GF2) -> GF2:
    return GF2(gfp.sub(x.a, y.a), gfp.sub(x.b, y.b))


def neg(x: GF2) -> GF2:
    return GF2(gfp.neg(x.a), gfp.neg(x.b))


def mul(x: GF2, y: GF2) -> GF2:
    """(a0 + b0 X)(a1 + b1 X) = a0 a1 + 7 b0 b1 + (a0 b1 + b0 a1) X."""
    a0a1 = gfp.mul(x.a, y.a)
    b0b1 = gfp.mul(x.b, y.b)
    a = gfp.add(a0a1, gfp.mul_const(b0b1, W_EXT))
    b = gfp.add(gfp.mul(x.a, y.b), gfp.mul(x.b, y.a))
    return GF2(a, b)


def mul_base(x: GF2, s: GF) -> GF2:
    return GF2(gfp.mul(x.a, s), gfp.mul(x.b, s))


def sqr(x: GF2) -> GF2:
    return mul(x, x)


def inv(x: GF2) -> GF2:
    """1 / (a + bX) = (a - bX) / (a^2 - 7 b^2) (norm in the base field)."""
    norm = gfp.sub(gfp.sqr(x.a), gfp.mul_const(gfp.sqr(x.b), W_EXT))
    ninv = gfp.inv(norm)
    return GF2(gfp.mul(x.a, ninv), gfp.mul(gfp.neg(x.b), ninv))


def pow_const(x: GF2, e: int) -> GF2:
    if e == 0:
        return ones(x.shape)
    result = None
    base = x
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def eq(x: GF2, y: GF2) -> jnp.ndarray:
    return gfp.eq(x.a, y.a) & gfp.eq(x.b, y.b)


def select(pred, x: GF2, y: GF2) -> GF2:
    return GF2(gfp.select(pred, x.a, y.a), gfp.select(pred, x.b, y.b))


def stack(xs, axis=0) -> GF2:
    return GF2(gfp.stack([x.a for x in xs], axis), gfp.stack([x.b for x in xs], axis))
