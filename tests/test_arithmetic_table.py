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


class TestDivModTraceGen:
    """DIV/MOD semantics (reference arithmetic STARK div/mod rows)."""

    def test_div_mod_results(self):
        reqs = [
            (ar.OP_DIV, 100, 7),
            (ar.OP_MOD, 100, 7),
            (ar.OP_DIV, 100, 0),  # EVM: x / 0 = 0
            (ar.OP_MOD, 100, 0),  # EVM: x % 0 = 0
            (ar.OP_DIV, 5, 100),
            (ar.OP_MOD, 5, 100),
            (ar.OP_DIV, 100, 1),
        ]
        _, res = ar.generate_trace(reqs, 1 << 16)
        assert res == [14, 2, 0, 0, 0, 5, 100]

    def test_div_full_width(self):
        a = (1 << 256) - 1
        b = (1 << 128) + 3
        _, res = ar.generate_trace(
            [(ar.OP_DIV, a, b), (ar.OP_MOD, a, b)], 1 << 16
        )
        assert res == [a // b, a % b]


class TestShiftTraceGen:
    def test_shl_shr_results(self):
        a = 0xDEADBEEF_12345678_90ABCDEF_55AA55AA
        reqs = [
            (ar.OP_SHL, a, 0),
            (ar.OP_SHR, a, 0),
            (ar.OP_SHL, a, 13),
            (ar.OP_SHR, a, 13),
            (ar.OP_SHL, a, 247),
            (ar.OP_SHR, a, 100),
            (ar.OP_SHL, a, 256),  # count >= 256 -> 0
            (ar.OP_SHR, a, 1 << 200),
            (ar.OP_SHR, a, 300),
        ]
        _, res = ar.generate_trace(reqs, 1 << 16)
        assert res == [
            a, a, (a << 13) % (1 << 256), a >> 13,
            (a << 247) % (1 << 256), a >> 100, 0, 0, 0,
        ]


class TestDivModShiftProveVerify:
    def _roundtrip(self, reqs, tamper=None):
        tr, _ = ar.generate_trace(reqs, 64)
        if tamper:
            tamper(tr)
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        return stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_divmod_shift_roundtrip(self):
        # small values: the 64-row test table bounds limbs by 64
        assert self._roundtrip(
            [
                (ar.OP_DIV, 45, 7),
                (ar.OP_MOD, 45, 7),
                (ar.OP_DIV, 45, 0),
                (ar.OP_SHL, 5, 3),
                (ar.OP_SHR, 40, 3),
                (ar.OP_SHR, 40, 2),
            ]
        )

    def test_wrong_quotient_rejected(self):
        def tamper(tr):
            tr[ar.OUT[0], 0] = 7  # claim 45 // 7 == 7
            tr[ar.QUO[0], 0] = 7

        assert not self._roundtrip([(ar.OP_DIV, 45, 7)], tamper)

    def test_div_by_zero_forged_output_rejected(self):
        def tamper(tr):
            tr[ar.OUT[0], 0] = 45  # claim 45 // 0 == 45
            tr[ar.QUO[0], 0] = 45

        assert not self._roundtrip([(ar.OP_DIV, 45, 0)], tamper)

    def test_remainder_ge_divisor_rejected(self):
        def tamper(tr):
            # 45 = 5*7 + 10 also satisfies the product identity, but
            # violates REM < divisor
            tr[ar.QUO[0], 0] = 5
            tr[ar.REM[0], 0] = 10
            tr[ar.OUT[0], 0] = 5
            # best-effort b - rem - 1 chain for rem > b: limb 0 is
            # 7 - 10 - 1 = -4, so a borrow is forced all the way up and
            # the final borrow lands on 1 where the constraint pins 0
            tr[ar.SCRATCH[0], 0] = 7 - 10 - 1 + (1 << 16)
            tr[ar.CARRY[0], 0] = 1
            for i in range(1, 16):
                tr[ar.SCRATCH[i], 0] = (1 << 16) - 1
                tr[ar.CARRY[i], 0] = 1

        assert not self._roundtrip([(ar.OP_DIV, 45, 7)], tamper)

    def test_wrong_shift_rejected(self):
        def tamper(tr):
            tr[ar.OUT[0], 0] = 41  # claim 5 << 3 == 41

        assert not self._roundtrip([(ar.OP_SHL, 5, 3)], tamper)

    def test_modop_results(self):
        big = (1 << 256) - 1
        _, res = ar.generate_trace(
            [
                (ar.OP_ADDMOD, big, 5, 7),
                (ar.OP_MULMOD, big, big, (1 << 130) + 3),
                (ar.OP_ADDMOD, 10, 20, 0),
                (ar.OP_MULMOD, 10, 20, 0),
            ],
            1 << 16,
        )
        assert res == [
            (big + 5) % 7,
            (big * big) % ((1 << 130) + 3),
            0,
            0,
        ]

    def test_modop_roundtrip(self):
        # 64-row tier: tiny operands keep every limb below the table bound
        reqs = [
            (ar.OP_ADDMOD, 45, 5, 7),   # 50 % 7 = 1
            (ar.OP_MULMOD, 6, 7, 5),    # 42 % 5 = 2
            (ar.OP_ADDMOD, 3, 4, 0),    # N == 0 -> 0
        ]
        tr, res = ar.generate_trace(reqs, 64)
        assert res == [1, 2, 0]
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_modop_wrong_result_rejected(self):
        tr, _ = ar.generate_trace([(ar.OP_ADDMOD, 45, 5, 7)], 64)
        tr[ar.OUT[0], 0] = 2  # claim (45+5) % 7 == 2
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert not stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_modop_zero_modulus_forgery_rejected(self):
        tr, _ = ar.generate_trace([(ar.OP_ADDMOD, 3, 4, 0)], 64)
        tr[ar.OUT[0], 0] = 7  # EVM: x addmod 0 must be 0
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert not stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_byte_results(self):
        v = 0x0102 << 240
        _, res = ar.generate_trace(
            [
                (ar.OP_BYTE, v, 0),
                (ar.OP_BYTE, v, 1),
                (ar.OP_BYTE, 0xAB, 31),
                (ar.OP_BYTE, 0xAB, 32),
                (ar.OP_BYTE, 0xAB, 1 << 200),
            ],
            1 << 16,
        )
        assert res == [1, 2, 171, 0, 0]

    def test_byte_roundtrip(self):
        # 1024-row tier: limbs < 1024 and BYTE_LO_SC = lo*256 < 1024
        reqs = [
            (ar.OP_BYTE, 0x0302, 31),  # low byte of limb 0 -> 2
            (ar.OP_BYTE, 0x0302, 30),  # high byte of limb 0 -> 3
            (ar.OP_BYTE, 0x0302, 32),  # invalid index -> 0
            (ar.OP_BYTE, 0x0302, 1 << 200),  # huge index -> 0
        ]
        tr, res = ar.generate_trace(reqs, 1 << 10)
        assert res == [2, 3, 0, 0]
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_wrong_byte_rejected(self):
        def tamper(tr):
            tr[ar.OUT[0], 0] = 3  # claim byte 31 of 0x0302 == 3

        tr, _ = ar.generate_trace([(ar.OP_BYTE, 0x0302, 31)], 1 << 10)
        tamper(tr)
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert not stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_byte_validity_forgery_rejected(self):
        # prover claims the valid index 31 is invalid (tries to output 0)
        tr, _ = ar.generate_trace([(ar.OP_BYTE, 0x0302, 31)], 1 << 10)
        tr[ar.B_VALID, 0] = 0
        tr[ar.KSEL[0], 0] = 0
        tr[ar.G_SHIFT, 0] = 1
        tr[ar.BIGINV, 0] = 1  # bigsum == 0: no valid inverse exists
        tr[ar.BYTE_LO, 0] = 0
        tr[ar.BYTE_LO_SC, 0] = 0
        tr[ar.OUT[0], 0] = 0
        proof = stark_prove(ar.ArithmeticStark(), tr, [], CFG)
        assert not stark_verify(ar.ArithmeticStark(), proof, CFG)

    def test_shift_validity_forgery_rejected(self):
        # prover claims a small count is invalid (tries to output 0)
        def tamper(tr):
            tr[ar.B_VALID, 0] = 0
            tr[ar.KSEL[0], 0] = 0
            tr[ar.TSEL[3], 0] = 0
            tr[ar.G_SHIFT, 0] = 1
            tr[ar.BIGINV, 0] = 1  # bigsum == 0: no valid inverse exists
            for i in range(16):
                tr[ar.OUT[i], 0] = 0
                tr[ar.SH_LO[i], 0] = 0
                tr[ar.SH_HI[i], 0] = 0

        assert not self._roundtrip([(ar.OP_SHL, 5, 3)], tamper)
