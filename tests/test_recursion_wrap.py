"""Verifier-circuit compiler: wrap + aggregation over machine proofs.

Default tier exercises the compiled verifier through the circuit
INTERPRETER (pure python — every compiled assertion checked on ints),
which is the fast, complete logic check; the slow tier STARK-proves the
wrap/agg machines and verifies succinctly.

Reference parity: proof_gen's shrink + aggregation circuits
(/root/reference/ops/src/lib.rs:52-101)."""

import copy

import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.hash import poseidon
from ethproof_tpu.recursion.aggregate import (
    AggLadder,
    build_agg,
    combine_digests,
    expected_digest,
    fold_proofs,
    verify_fold,
)
from ethproof_tpu.recursion.circuit import CBuilder, interpret
from ethproof_tpu.recursion.machine import RecursionStark, generate_trace
from ethproof_tpu.recursion.wrap import MachineProof, build_wrap, verify_machine
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.verify import stark_verify

P = fh.P

CFG = StarkConfig(
    num_challenges=1,
    fri_config=FriConfig(
        rate_bits=2, cap_height=1, proof_of_work_bits=2,
        num_query_rounds=3, arity_bits=2, final_poly_bits=2,
    ),
)


def _leaf_circuit():
    """PI = poseidon digest of y where y = x^2 + 3x + 5, x witnessed."""
    b = CBuilder()
    x = b.wit("x")
    y = b.add(b.add(b.mul(x, x), b.mulc(3, x)), b.const(5))
    out = b.poseidon([y] + [b.const(0)] * 11)
    for k in range(4):
        b.expose(out[k], k)
    return b.build()


@pytest.fixture(scope="module")
def leaf():
    """(stark, proof, digest) for one small machine proof."""
    circuit = _leaf_circuit()
    x = 7
    y = (x * x + 3 * x + 5) % P
    digest = poseidon.permute_host([y] + [0] * 11)[:4]
    stark = RecursionStark(circuit)
    n = 1 << max(circuit.num_rows - 1, 1).bit_length()
    vals = interpret(circuit, [x], digest)
    tr = generate_trace(stark, vals, n)
    proof = stark_prove(stark, tr, digest, CFG)
    assert stark_verify(stark, proof, CFG)
    return stark, proof, digest


@pytest.fixture(scope="module")
def wrap(leaf):
    stark, proof, _ = leaf
    return build_wrap(stark, proof.degree_bits, CFG)


class TestWrapInterpreter:
    def test_wrap_interprets_clean(self, leaf, wrap):
        _, proof, digest = leaf
        pis = [int(v) for v in proof.public_inputs]
        interpret(wrap.compiled.circuit, wrap.compiled.witness(proof), pis, check=True)
        assert pis == [int(v) for v in digest]

    def test_tampered_opening_rejected(self, leaf, wrap):
        _, proof, _ = leaf
        bad = copy.deepcopy(proof)
        bad.openings.trace_at_zeta[0][0] ^= 1
        pis = [int(v) for v in proof.public_inputs]
        with pytest.raises(AssertionError):
            interpret(wrap.compiled.circuit, wrap.compiled.witness(bad), pis, check=True)

    def test_tampered_cap_rejected(self, leaf, wrap):
        _, proof, _ = leaf
        bad = copy.deepcopy(proof)
        bad.trace_cap = bad.trace_cap.copy()
        bad.trace_cap[0, 0] ^= 1
        pis = [int(v) for v in proof.public_inputs]
        with pytest.raises(AssertionError):
            interpret(wrap.compiled.circuit, wrap.compiled.witness(bad), pis, check=True)

    def test_tampered_pow_rejected(self, leaf, wrap):
        _, proof, _ = leaf
        bad = copy.deepcopy(proof)
        bad.fri_proof.pow_witness = (bad.fri_proof.pow_witness + 1) % P
        pis = [int(v) for v in proof.public_inputs]
        with pytest.raises(AssertionError):
            interpret(wrap.compiled.circuit, wrap.compiled.witness(bad), pis, check=True)

    def test_wrong_pi_rejected(self, leaf, wrap):
        _, proof, digest = leaf
        bad_pis = [int(digest[0]) ^ 1] + [int(v) for v in digest[1:]]
        with pytest.raises(AssertionError):
            interpret(
                wrap.compiled.circuit, wrap.compiled.witness(proof), bad_pis, check=True
            )


class TestAggInterpreter:
    def test_agg_interprets_clean(self, leaf):
        stark, proof, digest = leaf
        agg = build_agg(stark, proof.degree_bits, CFG)
        mp = MachineProof(proof=proof, log_n=proof.degree_bits)
        witness = agg.vc.stream((mp, mp))
        pis = combine_digests(
            [int(v) for v in digest], [int(v) for v in digest]
        )
        interpret(agg.stark.circuit, witness, pis, check=True)

    def test_expected_digest_padding(self):
        d1, d2, d3 = [[i] * 4 for i in (1, 2, 3)]
        top = expected_digest([d1, d2, d3])
        assert top == combine_digests(
            combine_digests(d1, d2), combine_digests(d3, d3)
        )


@pytest.mark.slow
class TestWrapProving:
    def test_wrap_prove_verify(self, leaf, wrap):
        _, proof, digest = leaf
        wp = wrap.prove(proof, CFG)
        assert verify_machine(wrap.stark, wp, CFG)
        assert [int(v) for v in wp.proof.public_inputs] == [int(v) for v in digest]

    def test_fold_three_leaves_succinct(self, leaf):
        stark, proof, digest = leaf
        ladder = AggLadder(stark, proof.degree_bits, CFG)
        leaves = [MachineProof(proof=proof, log_n=proof.degree_bits)] * 3
        top, level = fold_proofs(ladder, leaves, CFG)
        assert level == 2
        # succinct: one machine verification + host digest replay
        assert verify_fold(ladder, top, level, [list(digest)] * 3, CFG)
        # wrong leaf digest set must fail
        bad = [list(digest)] * 2 + [[0, 0, 0, 0]]
        assert not verify_fold(ladder, top, level, bad, CFG)
