"""Logic + Memory table tests: trace semantics and prove/verify."""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.verify import stark_verify
from ethproof_tpu.tables import logic as lg
from ethproof_tpu.tables import memory as mem

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

A = 0xDEADBEEF_CAFEBABE_12345678_9ABCDEF0 << 128 | 0xFFFF0000_11112222
B = 0x0F0F0F0F_F0F0F0F0 << 64 | 0x12345678_87654321


class TestLogicTrace:
    def test_results(self):
        _, res = lg.generate_trace(
            [(lg.OP_AND, A, B), (lg.OP_OR, A, B), (lg.OP_XOR, A, B)], 8
        )
        assert res == [A & B, A | B, A ^ B]


class TestLogicProve:
    def test_roundtrip(self):
        tr, _ = lg.generate_trace(
            [(lg.OP_AND, A, B), (lg.OP_XOR, A, B), (lg.OP_OR, 0, 0)], 16
        )
        proof = stark_prove(lg.LogicStark(), tr, [], CFG)
        assert stark_verify(lg.LogicStark(), proof, CFG)

    def test_wrong_out_rejected(self):
        tr, _ = lg.generate_trace([(lg.OP_AND, A, B)], 16)
        tr[lg.OUT[0], 0] ^= 1
        proof = stark_prove(lg.LogicStark(), tr, [], CFG)
        assert not stark_verify(lg.LogicStark(), proof, CFG)

    def test_nonboolean_bit_rejected(self):
        tr, _ = lg.generate_trace([(lg.OP_XOR, 3, 1)], 16)
        tr[lg.IN0_BITS[0], 0] = 2
        proof = stark_prove(lg.LogicStark(), tr, [], CFG)
        assert not stark_verify(lg.LogicStark(), proof, CFG)


def _ops():
    return [
        mem.MemoryOp(0, 1, 5, 1, 0, 1234),  # write 1234 @ (0,1,5)
        mem.MemoryOp(0, 1, 5, 2, 1, 1234),  # read back
        mem.MemoryOp(0, 1, 7, 3, 0, 999),  # write other slot
        mem.MemoryOp(0, 2, 0, 4, 1, 0),  # fresh read -> must be 0
        mem.MemoryOp(0, 1, 7, 9, 1, 999),
    ]


class TestMemory:
    def test_roundtrip(self):
        tr = mem.generate_trace(_ops(), 32)
        proof = stark_prove(mem.MemoryStark(), tr, [], CFG)
        assert stark_verify(mem.MemoryStark(), proof, CFG)

    def test_inconsistent_read_rejected(self):
        ops = _ops()
        ops[1] = mem.MemoryOp(0, 1, 5, 2, 1, 4321)  # read wrong value
        tr = mem.generate_trace(ops, 32)
        proof = stark_prove(mem.MemoryStark(), tr, [], CFG)
        assert not stark_verify(mem.MemoryStark(), proof, CFG)

    def test_fresh_read_nonzero_rejected(self):
        ops = _ops()
        ops[3] = mem.MemoryOp(0, 2, 0, 4, 1, 55)  # fresh addr read non-zero
        tr = mem.generate_trace(ops, 32)
        proof = stark_prove(mem.MemoryStark(), tr, [], CFG)
        assert not stark_verify(mem.MemoryStark(), proof, CFG)

    def test_unsorted_forgery_rejected(self):
        # hand-build a trace that swaps two rows (breaking sort order) and
        # fixes selectors naively — the RC range check must catch it
        tr = mem.generate_trace(_ops(), 32)
        r0 = tr[:, 1].copy()
        tr[:, 1] = tr[:, 2]
        tr[:, 2] = r0
        proof = stark_prove(mem.MemoryStark(), tr, [], CFG)
        assert not stark_verify(mem.MemoryStark(), proof, CFG)
