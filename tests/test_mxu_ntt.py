"""MXU four-step NTT: exact equivalence with the radix-2 path."""

import numpy as np
import pytest

from ethproof_tpu.gf import field as gfp
import ethproof_tpu.poly.mxu_ntt as mx
import ethproof_tpu.poly.ntt as nttm

RNG = np.random.default_rng(5)


class TestMxuNtt:
    @pytest.mark.parametrize("log_n", [6, 7, 8, 10, 13])
    def test_matches_radix2(self, log_n):
        n = 1 << log_n
        vals = RNG.integers(0, gfp.P, size=(n,), dtype=np.uint64)
        a = gfp.from_u64(vals)
        assert np.array_equal(
            gfp.to_u64(mx.mxu_ntt(a)), gfp.to_u64(nttm.ntt(a))
        )

    def test_roundtrip(self):
        vals = RNG.integers(0, gfp.P, size=(1 << 12,), dtype=np.uint64)
        a = gfp.from_u64(vals)
        assert np.array_equal(gfp.to_u64(mx.mxu_intt(mx.mxu_ntt(a))), vals)

    def test_batched(self):
        vals = RNG.integers(0, gfp.P, size=(3, 256), dtype=np.uint64)
        a = gfp.from_u64(vals)
        batched = gfp.to_u64(mx.mxu_ntt(a))
        for i in range(3):
            single = gfp.to_u64(nttm.ntt(gfp.from_u64(vals[i])))
            assert np.array_equal(batched[i], single)

    def test_coset_lde_matches(self):
        vals = RNG.integers(0, gfp.P, size=(128,), dtype=np.uint64)
        a = gfp.from_u64(vals)
        assert np.array_equal(
            gfp.to_u64(mx.mxu_coset_lde(a, 2, 7)),
            gfp.to_u64(nttm.coset_lde(a, 2, 7)),
        )
