"""Keccak-f STARK table: trace semantics + prove/verify on tiny blocks."""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.hash.keccak import keccak_f
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.verify import stark_verify
from ethproof_tpu.tables import keccak as kt

CFG = StarkConfig(
    num_challenges=2,
    fri_config=FriConfig(
        rate_bits=2,
        cap_height=1,
        proof_of_work_bits=4,
        num_query_rounds=8,
        arity_bits=2,
        final_poly_bits=2,
    ),
)


def _state(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, size=(5, 5)).astype(np.uint64)


class TestTrace:
    def test_out_limbs_match_keccak_f(self):
        st = _state(1)
        tr = kt.generate_trace([st], 32)
        out = keccak_f(st)
        last = kt.NUM_ROUNDS - 1
        for x in range(5):
            for y in range(5):
                lane = 0
                for l in range(4):
                    lane |= int(tr[kt.OUT_LIMBS[(x + 5 * y) * 4 + l], last]) << (16 * l)
                assert lane == int(out[x, y])

    def test_filters(self):
        tr = kt.generate_trace([_state(2)], 64)
        assert tr[kt.FIRST_FILTER, 0] == 1
        assert tr[kt.LAST_FILTER, 23] == 1
        assert tr[kt.ACTIVE, :24].all()
        assert not tr[kt.ACTIVE, 24:].any()


@pytest.mark.slow
class TestProve:
    def test_roundtrip(self):
        tr = kt.generate_trace([_state(3)], 32)
        proof = stark_prove(kt.KeccakStark(), tr, [], CFG)
        assert stark_verify(kt.KeccakStark(), proof, CFG)

    def test_corrupt_output_rejected(self):
        tr = kt.generate_trace([_state(4)], 32)
        tr[kt.OUT_LIMBS[0], kt.NUM_ROUNDS - 1] ^= 1
        proof = stark_prove(kt.KeccakStark(), tr, [], CFG)
        assert not stark_verify(kt.KeccakStark(), proof, CFG)

    def test_corrupt_round_state_rejected(self):
        tr = kt.generate_trace([_state(5)], 32)
        tr[kt.A_BITS[100], 7] ^= 1
        proof = stark_prove(kt.KeccakStark(), tr, [], CFG)
        assert not stark_verify(kt.KeccakStark(), proof, CFG)
