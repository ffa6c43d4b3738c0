"""Arithmetic table: trace generation semantics + STARK prove/verify."""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.verify import stark_verify
from ethproof_tpu.tables import arithmetic as ar
from ethproof_tpu.tables.common import limbs_to_int

CFG = StarkConfig(
    num_challenges=2,
    fri_config=FriConfig(
        rate_bits=2,
        cap_height=1,
        proof_of_work_bits=4,
        num_query_rounds=12,
        arity_bits=2,
        final_poly_bits=2,
    ),
)


class TestTraceGen:
    def test_add_result(self):
        _, res = ar.generate_trace([(ar.OP_ADD, 30, 25)], 64)
        assert res == [55]

    def test_add_wraps_mod_2_256(self):
        # full-width values work in trace gen with a big table
        a = (1 << 256) - 1
        tr, res = ar.generate_trace([(ar.OP_ADD, a, 5)], 1 << 16)
        assert res == [4]

    def test_mul_wraps(self):
        a = (1 << 255) + 3
        tr, res = ar.generate_trace([(ar.OP_MUL, a, 6)], 1 << 16)
        assert res == [(a * 6) % (1 << 256)]

    def test_sub_and_lt(self):
        _, res = ar.generate_trace(
            [(ar.OP_SUB, 50, 8), (ar.OP_LT, 8, 50), (ar.OP_LT, 50, 8)], 1 << 16
        )
        assert res == [42, 1, 0]

    def test_range_check_rejects_oversized_table_values(self):
        with pytest.raises(AssertionError):
            ar.generate_trace([(ar.OP_ADD, 1 << 200, 0)], 64)


class TestProveVerify:
    def test_small_table_roundtrip(self):
        reqs = [
            (ar.OP_ADD, 30, 25),
            (ar.OP_SUB, 50, 8),
            (ar.OP_LT, 50, 8),
            (ar.OP_MUL, 6, 7),
        ]
        tr, _ = ar.generate_trace(reqs, 64)
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_wrong_sum_rejected(self):
        tr, _ = ar.generate_trace([(ar.OP_ADD, 30, 25)], 64)
        tr[ar.OUT[0], 0] = 56  # claim 30 + 25 = 56
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert not stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_wrong_mul_rejected(self):
        tr, _ = ar.generate_trace([(ar.OP_MUL, 6, 7)], 64)
        tr[ar.OUT[0], 0] = 43
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert not stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_out_of_range_limb_rejected(self):
        # forge a limb beyond the counter range; fix multiplicities to match
        tr, _ = ar.generate_trace([(ar.OP_ADD, 1, 2)], 64)
        tr[ar.IN0[0], 0] = 70  # >= n_rows: not coverable by the range table
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert not stark_verify(ar.ArithmeticStark(), proof, CFG)
