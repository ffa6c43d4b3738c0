"""Keccak-f[1600] / keccak256 golden tests."""

import numpy as np

from ethproof_tpu.hash import keccak as kk


class TestKeccak256:
    def test_empty(self):
        assert (
            kk.keccak256(b"").hex()
            == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
        )

    def test_abc(self):
        assert (
            kk.keccak256(b"abc").hex()
            == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
        )

    def test_multiblock(self):
        # > 136 bytes forces two permutation calls
        out1 = kk.keccak256(b"q" * 135)
        out2 = kk.keccak256(b"q" * 136)
        out3 = kk.keccak256(b"q" * 137)
        assert len({out1, out2, out3}) == 3

    def test_exact_rate_boundary_padding(self):
        # pad_len == rate when message length is a multiple of the rate
        assert len(kk.keccak256(b"z" * 272)) == 32


class TestKeccakF:
    def test_zero_state_known_value(self):
        # keccak-f[1600] on the all-zero state: first lane of the result
        # is the well-known 0xF1258F7940E1DDE7
        s = np.zeros((5, 5), dtype=np.uint64)
        out = kk.keccak_f(s)
        assert int(out[0, 0]) == 0xF1258F7940E1DDE7
        assert int(out[1, 0]) == 0x84D5CCF933C0478A

    def test_trace_consistency(self):
        rng = np.random.default_rng(0)
        s = rng.integers(0, 1 << 63, size=(5, 5)).astype(np.uint64)
        states = kk.keccak_f_trace(s)
        assert len(states) == 25
        assert np.array_equal(states[0], s)
        assert np.array_equal(states[-1], kk.keccak_f(s))
        # each step is one round
        step = kk.keccak_round(states[10], int(kk.ROUND_CONSTANTS[10]))
        assert np.array_equal(states[11], step)
