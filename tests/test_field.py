"""Golden tests: uint32-pair Goldilocks kernels vs exact python-int arithmetic.

This is the bottom of the whole prover (SURVEY.md section 7 step 1): every
downstream layer (NTT, Poseidon, FRI, STARK) assumes these ops are bit-exact.
"""

import numpy as np
import pytest

from ethproof_tpu.gf import field as gf
from ethproof_tpu.gf import field_host as host
from ethproof_tpu.gf import extension as gf2

P = host.P

# Adversarial values around every carry/borrow/reduction edge.
EDGE = [
    0,
    1,
    2,
    0xFFFF,
    0x10000,
    0xFFFFFFFF,          # EPSILON
    0x100000000,         # 2^32
    0x100000001,
    P - 1,
    P - 2,
    P - 0xFFFFFFFF,
    (1 << 63) - 1,
    1 << 63,
    (1 << 63) + 1,
    0xDEADBEEFCAFEBABE % P,
    0x123456789ABCDEF0 % P,
]


def rand_elems(n, seed):
    rng = np.random.default_rng(seed)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
    hi = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
    return [int((h << np.uint64(32)) | l) % P for l, h in zip(lo, hi)]


def pairs():
    xs = EDGE + rand_elems(200, 1)
    ys = list(reversed(EDGE)) + rand_elems(200, 2)
    return xs, ys


def check_unary(jax_fn, host_fn, xs):
    a = gf.gf(xs)
    got = gf.to_u64(jax_fn(a))
    want = np.array([host_fn(x) for x in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def check_binary(jax_fn, host_fn, xs, ys):
    a, b = gf.gf(xs), gf.gf(ys)
    got = gf.to_u64(jax_fn(a, b))
    want = np.array([host_fn(x, y) for x, y in zip(xs, ys)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


class TestBaseField:
    def test_roundtrip(self):
        xs = EDGE + rand_elems(64, 0)
        np.testing.assert_array_equal(gf.to_u64(gf.gf(xs)), np.array(xs, dtype=np.uint64))

    def test_add(self):
        check_binary(gf.add, host.add, *pairs())

    def test_sub(self):
        check_binary(gf.sub, host.sub, *pairs())

    def test_mul(self):
        check_binary(gf.mul, host.mul, *pairs())

    def test_neg(self):
        check_unary(gf.neg, host.neg, EDGE + rand_elems(100, 3))

    def test_sqr(self):
        check_unary(gf.sqr, lambda x: host.mul(x, x), EDGE + rand_elems(100, 4))

    def test_inv(self):
        xs = [x for x in EDGE if x % P != 0] + rand_elems(64, 5)
        a = gf.gf(xs)
        got = gf.to_u64(gf.mul(a, gf.inv(a)))
        np.testing.assert_array_equal(got, np.ones(len(xs), dtype=np.uint64))

    def test_pow_const(self):
        xs = rand_elems(32, 6)
        for e in [0, 1, 2, 3, 7, 1 << 20, P - 2]:
            check_unary(lambda a, e=e: gf.pow_const(a, e), lambda x, e=e: pow(x, e, P), xs)

    def test_mul_const(self):
        xs = rand_elems(32, 7)
        for c in [0, 1, 7, 0xFFFFFFFF, P - 1]:
            check_unary(lambda a, c=c: gf.mul_const(a, c), lambda x, c=c: x * c % P, xs)

    def test_mul_is_jittable(self):
        import jax

        xs, ys = pairs()
        a, b = gf.gf(xs), gf.gf(ys)
        got = gf.to_u64(jax.jit(gf.mul)(a, b))
        want = np.array([host.mul(x, y) for x, y in zip(xs, ys)], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)

    def test_canonicality_invariant(self):
        # add near the wrap boundary must stay < p
        a = gf.gf([P - 1] * 4)
        out = gf.to_u64(gf.add(a, a))
        assert all(int(v) < P for v in out)
        np.testing.assert_array_equal(out, np.array([(2 * (P - 1)) % P] * 4, dtype=np.uint64))


class TestRoots:
    def test_two_adic_generator_order(self):
        for k in [1, 2, 5, 16, 32]:
            g = host.primitive_root_of_unity(k)
            assert pow(g, 1 << k, P) == 1
            if k > 0:
                assert pow(g, 1 << (k - 1), P) == P - 1  # exact order

    def test_known_power_of_two_generator(self):
        # plonky2's POWER_OF_TWO_GENERATOR == 7^((p-1)/2^32) — derived, not copied.
        g32 = host.primitive_root_of_unity(32)
        assert pow(g32, 1 << 32, P) == 1
        assert pow(g32, 1 << 31, P) == P - 1


class TestExtension:
    def test_w_is_nonresidue(self):
        # X^2 - 7 irreducible iff 7^((p-1)/2) == -1
        assert pow(7, (P - 1) // 2, P) == P - 1

    def test_mul_matches_host(self):
        rng = np.random.default_rng(8)
        n = 64
        parts = [rand_elems(n, 10 + i) for i in range(4)]
        x = gf2.GF2(gf.gf(parts[0]), gf.gf(parts[1]))
        y = gf2.GF2(gf.gf(parts[2]), gf.gf(parts[3]))
        z = gf2.mul(x, y)
        za = gf.to_u64(z.a)
        zb = gf.to_u64(z.b)
        for i in range(n):
            a0, b0, a1, b1 = (parts[j][i] for j in range(4))
            assert int(za[i]) == (a0 * a1 + 7 * b0 * b1) % P
            assert int(zb[i]) == (a0 * b1 + b0 * a1) % P

    def test_inv(self):
        x = gf2.GF2(gf.gf(rand_elems(16, 20)), gf.gf(rand_elems(16, 21)))
        one = gf2.mul(x, gf2.inv(x))
        np.testing.assert_array_equal(gf.to_u64(one.a), np.ones(16, dtype=np.uint64))
        np.testing.assert_array_equal(gf.to_u64(one.b), np.zeros(16, dtype=np.uint64))

    def test_pow_matches_repeated_mul(self):
        x = gf2.gf2(rand_elems(8, 30), rand_elems(8, 31))
        acc = gf2.ones(x.shape)
        for e in range(1, 8):
            acc = gf2.mul(acc, x)
        want = gf2.pow_const(x, 7)
        assert bool(np.all(np.asarray(gf2.eq(acc, want))))
