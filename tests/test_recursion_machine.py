"""Verifier-machine STARK: gates, poseidon blocks, bus routing, PI binding."""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.hash import poseidon
from ethproof_tpu.recursion.circuit import CBuilder, interpret
from ethproof_tpu.recursion.machine import RecursionStark, generate_trace
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.verify import stark_verify

P = fh.P

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


def _hash_circuit():
    """PI = poseidon digest of y where y = x^2 + 3x + 5, x witnessed."""
    b = CBuilder()
    x = b.wit("x")
    y = b.add(b.add(b.mul(x, x), b.mulc(3, x)), b.const(5))
    state = [y] + [b.const(0)] * 11
    out = b.poseidon(state)
    for k in range(4):
        b.expose(out[k], k)
    return b.build()


def _gadget_circuit():
    """Exercises bool/select/inverse/bit-decomposition gadgets."""
    b = CBuilder()
    bit = b.bool_check(b.wit("bit"))
    x = b.wit("x")
    y = b.wit("y")
    sel = b.select(bit, x, y)
    inv = b.inverse(sel)
    b.assert_eq(b.mul(sel, inv), b.const(1))
    bits = b.decompose_bits(x, 64)
    # low bit exposed through a tiny hash for PI uniformity
    out = b.poseidon([sel, bits[0]] + [b.const(0)] * 10)
    for k in range(4):
        b.expose(out[k], k)
    return b.build()


def _prove(circuit, witness, log_n=None):
    vals = interpret(circuit, witness, public_inputs=[0, 0, 0, 0], check=False)
    stark = RecursionStark(circuit)
    n = 1 << (log_n or max(circuit.num_rows - 1, 1).bit_length())
    tr = generate_trace(stark, vals, n)
    return stark, tr, vals


class TestMachine:
    def test_hash_circuit_roundtrip(self):
        circuit = _hash_circuit()
        x = 7
        y = (x * x + 3 * x + 5) % P
        digest = poseidon.permute_host([y] + [0] * 11)[:4]
        vals = interpret(circuit, [x], digest)
        stark = RecursionStark(circuit)
        n = 1 << max(circuit.num_rows - 1, 1).bit_length()
        tr = generate_trace(stark, vals, n)
        proof = stark_prove(stark, tr, digest, CFG)
        assert stark_verify(stark, proof, CFG)

    def test_wrong_pi_rejected(self):
        circuit = _hash_circuit()
        x = 7
        y = (x * x + 3 * x + 5) % P
        digest = poseidon.permute_host([y] + [0] * 11)[:4]
        vals = interpret(circuit, [x], digest)
        stark = RecursionStark(circuit)
        n = 1 << max(circuit.num_rows - 1, 1).bit_length()
        tr = generate_trace(stark, vals, n)
        bad = [digest[0] ^ 1] + digest[1:]
        proof = stark_prove(stark, tr, bad, CFG)
        assert not stark_verify(stark, proof, CFG)

    def test_tampered_wire_rejected(self):
        """Forge one bus value: routing must catch it."""
        circuit = _hash_circuit()
        x = 7
        y = (x * x + 3 * x + 5) % P
        digest = poseidon.permute_host([y] + [0] * 11)[:4]
        vals = interpret(circuit, [x], digest)
        stark = RecursionStark(circuit)
        n = 1 << max(circuit.num_rows - 1, 1).bit_length()
        tr = generate_trace(stark, vals, n)
        # find the first poseidon row and corrupt its slot-0 input value
        from ethproof_tpu.recursion.machine import F_QPOSE_FIRST, V

        fx = stark.fixed_columns(n)
        row = int(np.nonzero(fx[F_QPOSE_FIRST])[0][0])
        tr[V[0], row] = (int(tr[V[0], row]) + 1) % P
        proof = stark_prove(stark, tr, digest, CFG)
        assert not stark_verify(stark, proof, CFG)

    def test_gadgets_roundtrip(self):
        circuit = _gadget_circuit()
        x, y, bit = 0xDEADBEEF, 12345, 1
        sel = x if bit else y
        # witness stream: bit, x, y, inverse, then 64 bits of x
        wit = [bit, x, y, pow(sel, P - 2, P)] + [(x >> i) & 1 for i in range(64)]
        digest = poseidon.permute_host([sel, x & 1] + [0] * 10)[:4]
        vals = interpret(circuit, wit, digest)
        stark = RecursionStark(circuit)
        n = 1 << max(circuit.num_rows - 1, 1).bit_length()
        tr = generate_trace(stark, vals, n)
        proof = stark_prove(stark, tr, digest, CFG)
        assert stark_verify(stark, proof, CFG)

    def test_interpret_catches_bad_witness(self):
        circuit = _gadget_circuit()
        wit = [2, 5, 6, 1] + [0] * 64  # bit = 2 violates bool
        with pytest.raises(AssertionError):
            interpret(circuit, wit, [0] * 4)
