"""NTT / LDE golden tests: device kernels vs exact python-bigint models."""

import numpy as np
import pytest

from ethproof_tpu.gf import field as gfp
from ethproof_tpu.gf import field_host as fh
import ethproof_tpu.poly.ntt as nttm

P = fh.P
RNG = np.random.default_rng(11)


def rand_u64(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint64)


class TestPowers:
    def test_powers_of_7(self):
        out = gfp.to_u64(nttm.powers(gfp.gf(7), 16))
        assert [int(x) for x in out] == [pow(7, i, P) for i in range(16)]


class TestNTT:
    @pytest.mark.parametrize("log_n", [0, 1, 3, 6])
    def test_matches_naive_dft(self, log_n):
        n = 1 << log_n
        vals = rand_u64((n,))
        dev = gfp.to_u64(nttm.ntt(gfp.from_u64(vals)))
        host = nttm.ntt_host([int(v) for v in vals])
        assert [int(x) for x in dev] == host

    def test_roundtrip(self):
        vals = rand_u64((3, 256))
        a = gfp.from_u64(vals)
        back = gfp.to_u64(nttm.intt(nttm.ntt(a)))
        assert np.array_equal(back, vals)

    def test_linearity(self):
        x, y = rand_u64((128,)), rand_u64((128,))
        fx = gfp.to_u64(nttm.ntt(gfp.from_u64(x))).astype(object)
        fy = gfp.to_u64(nttm.ntt(gfp.from_u64(y))).astype(object)
        s = (x.astype(object) + y.astype(object)) % P
        fs = gfp.to_u64(nttm.ntt(gfp.gf([int(v) for v in s])))
        assert [int(v) for v in fs] == [(a + b) % P for a, b in zip(fx, fy)]

    def test_batched_matches_single(self):
        vals = rand_u64((4, 64))
        batched = gfp.to_u64(nttm.ntt(gfp.from_u64(vals)))
        for i in range(4):
            single = gfp.to_u64(nttm.ntt(gfp.from_u64(vals[i])))
            assert np.array_equal(batched[i], single)


class TestCosetLDE:
    def test_lde_evaluates_polynomial_on_coset(self):
        n, rate_bits, shift = 8, 2, fh.MULT_GROUP_GEN
        coeffs = rand_u64((n,))
        evals = gfp.to_u64(nttm.coset_lde(gfp.from_u64(coeffs), rate_bits, shift))
        big_n = n << rate_bits
        w = fh.primitive_root_of_unity(big_n.bit_length() - 1)
        for i in range(big_n):
            x = shift * pow(w, i, P) % P
            expect = sum(int(c) * pow(x, j, P) for j, c in enumerate(coeffs)) % P
            assert int(evals[i]) == expect

    def test_coset_intt_inverts_lde_at_rate_0(self):
        coeffs = rand_u64((2, 32))
        a = gfp.from_u64(coeffs)
        evals = nttm.coset_lde(a, 0, fh.MULT_GROUP_GEN)
        back = gfp.to_u64(nttm.coset_intt(evals, fh.MULT_GROUP_GEN))
        assert np.array_equal(back, coeffs)

    def test_lde_prefix_consistency(self):
        # LDE on the big domain restricted to the subgroup's image equals the
        # rate-0 evaluation on the shifted subgroup: H embeds in H' by i -> 4i.
        n, rate_bits = 16, 2
        coeffs = rand_u64((n,))
        a = gfp.from_u64(coeffs)
        small = gfp.to_u64(nttm.coset_lde(a, 0, 3))
        big = gfp.to_u64(nttm.coset_lde(a, rate_bits, 3))
        assert np.array_equal(big[:: 1 << rate_bits], small)
