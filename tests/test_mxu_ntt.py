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

    @pytest.mark.parametrize("log_n", [1, 4, 7, 8])
    def test_i8_encoding_matches_bf16(self, log_n):
        """The int8 MXU encoding (offset data digits + balanced weight
        digits + constant-row correction) is bit-identical to the bf16
        chunked encoding on the base DFT, both directions."""
        vals = RNG.integers(0, gfp.P, size=(5, 1 << log_n), dtype=np.uint64)
        a = gfp.from_u64(vals)
        for inverse in (False, True):
            got = gfp.to_u64(mx._field_matmul_dft_i8(a, log_n, inverse))
            saved = mx._ENCODING
            mx._ENCODING = "bf16"
            try:
                want = gfp.to_u64(mx._field_matmul_dft(a, log_n, inverse))
            finally:
                mx._ENCODING = saved
            assert np.array_equal(got, want)

    def test_balanced_digits_cover_full_range(self):
        """Every canonical field value (incl. the > 0x7f7f.. band that
        needs the w - p representative) reconstructs mod p."""
        edge = np.array(
            [0, 1, 0x7F7F7F7F7F7F7F7F, 0x7F7F7F7F7F7F7F80,
             gfp.P - 1, gfp.P // 2, (1 << 63) - 1, 1 << 63],
            dtype=np.uint64,
        ) % np.uint64(gfp.P)
        digits = mx._balanced_digits_u64(edge)
        recon = np.zeros(len(edge), dtype=object)
        for c in range(8):
            recon += digits[c].astype(object) * (1 << (8 * c))
        assert all(int(r) % gfp.P == int(v) for r, v in zip(recon, edge))
