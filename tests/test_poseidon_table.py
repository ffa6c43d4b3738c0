"""Poseidon STARK table: trace semantics + prove/verify."""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.hash import poseidon as ps
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.verify import stark_verify
from ethproof_tpu.tables import poseidon_table as pt

CFG = StarkConfig(
    num_challenges=2,
    fri_config=FriConfig(
        rate_bits=2,
        cap_height=1,
        proof_of_work_bits=4,
        num_query_rounds=10,
        arity_bits=2,
        final_poly_bits=2,
    ),
)


class TestTrace:
    def test_out_matches_permute_host(self):
        state = list(range(12))
        tr = pt.generate_trace([state], 32)
        out = ps.permute_host(state)
        last = pt.N_ROUNDS - 1
        assert [int(tr[pt.OUT[i], last]) for i in range(12)] == out

    def test_perm_ids_and_filters(self):
        tr = pt.generate_trace([[1] * 12, [2] * 12], 64)
        assert tr[pt.FIRST_FILTER, 0] == 1 and tr[pt.FIRST_FILTER, 30] == 1
        assert tr[pt.LAST_FILTER, 29] == 1 and tr[pt.LAST_FILTER, 59] == 1
        assert tr[pt.PERM_ID, 35] == 1


class TestProve:
    def test_roundtrip(self):
        tr = pt.generate_trace([list(range(12))], 32)
        proof = stark_prove(pt.PoseidonStark(), tr, [], CFG)
        assert stark_verify(pt.PoseidonStark(), proof, CFG)

    def test_corrupt_output_rejected(self):
        tr = pt.generate_trace([list(range(12))], 32)
        tr[pt.OUT[0], pt.N_ROUNDS - 1] ^= 1
        proof = stark_prove(pt.PoseidonStark(), tr, [], CFG)
        assert not stark_verify(pt.PoseidonStark(), proof, CFG)

    def test_corrupt_midround_rejected(self):
        tr = pt.generate_trace([list(range(12))], 32)
        tr[pt.STATE[5], 11] = (int(tr[pt.STATE[5], 11]) + 1) % (2**64 - 2**32 + 1)
        proof = stark_prove(pt.PoseidonStark(), tr, [], CFG)
        assert not stark_verify(pt.PoseidonStark(), proof, CFG)
