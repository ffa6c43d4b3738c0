"""End-to-end STARK: device prover -> host verifier on a Fibonacci table."""

import numpy as np
import pytest

from ethproof_tpu.fri.challenger import Challenger
from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.stark import Stark
from ethproof_tpu.stark.verify import stark_verify

P = fh.P

CFG = StarkConfig(
    num_challenges=2,
    fri_config=FriConfig(
        rate_bits=2,
        cap_height=1,
        proof_of_work_bits=4,
        num_query_rounds=16,
        arity_bits=2,
        final_poly_bits=2,
    ),
)


class FibonacciStark(Stark):
    """x0' = x1, x1' = x0 + x1; PIs: x0(0), x1(0), x1(n-1)."""

    num_columns = 2
    num_public_inputs = 3
    constraint_degree = 2

    def eval(self, ctx):
        c, o = ctx.consumer, ctx.ops
        c.constraint_first_row(o.sub(ctx.local(0), ctx.public_input(0)))
        c.constraint_first_row(o.sub(ctx.local(1), ctx.public_input(1)))
        c.constraint_transition(o.sub(ctx.next(0), ctx.local(1)))
        c.constraint_transition(
            o.sub(ctx.next(1), o.add(ctx.local(0), ctx.local(1)))
        )
        c.constraint_last_row(o.sub(ctx.local(1), ctx.public_input(2)))


def fib_trace(n, x0=0, x1=1):
    a, b = x0, x1
    rows = []
    for _ in range(n):
        rows.append((a, b))
        a, b = b, (a + b) % P
    tr = np.array(rows, dtype=np.uint64).T.copy()  # (2, n)
    return tr, [x0, x1, int(tr[1, -1])]


class TestFibStark:
    def test_prove_verify_roundtrip(self):
        trace, pis = fib_trace(64)
        proof = stark_prove(FibonacciStark(), trace, pis, CFG)
        assert stark_verify(FibonacciStark(), proof, CFG)

    def test_wrong_public_input_rejected(self):
        trace, pis = fib_trace(64)
        proof = stark_prove(FibonacciStark(), trace, pis, CFG)
        proof.public_inputs[2] = (proof.public_inputs[2] + 1) % P
        assert not stark_verify(FibonacciStark(), proof, CFG)

    def test_invalid_trace_rejected(self):
        trace, pis = fib_trace(64)
        trace = trace.copy()
        trace[0, 17] = (int(trace[0, 17]) + 1) % P  # break one transition
        proof = stark_prove(FibonacciStark(), trace, pis, CFG)
        assert not stark_verify(FibonacciStark(), proof, CFG)

    def test_tampered_opening_rejected(self):
        trace, pis = fib_trace(64)
        proof = stark_prove(FibonacciStark(), trace, pis, CFG)
        proof.openings.trace_at_zeta = proof.openings.trace_at_zeta.copy()
        proof.openings.trace_at_zeta[0, 0] ^= 1
        assert not stark_verify(FibonacciStark(), proof, CFG)

    def test_tampered_query_values_rejected(self):
        trace, pis = fib_trace(64)
        proof = stark_prove(FibonacciStark(), trace, pis, CFG)
        proof.trace_query_openings.values[0, 0] ^= 1
        assert not stark_verify(FibonacciStark(), proof, CFG)
