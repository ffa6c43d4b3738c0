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
    chain_seams,
    combine_digests,
    expected_statement,
    fold_proofs,
    verify_fold,
)
from ethproof_tpu.recursion.circuit import CBuilder, interpret
from ethproof_tpu.recursion.machine import RecursionStark, generate_trace
from ethproof_tpu.recursion.root import SEAM_WORDS, leaf_statement
from ethproof_tpu.recursion.verifier_circuit import sponge_hash
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


def _seam(i: int):
    """Chained toy seams: tx i spans txn i->i+1, gas 100i->100(i+1),
    root limbs i -> i+1."""
    return [i, i + 1, 100 * i, 100 * (i + 1)] + [i] * 16 + [i + 1] * 16


def _statement_leaf_circuit():
    """A toy leaf exposing a REAL statement E = sponge(seam ++ digest)
    over 40 witnessed words — same shape the tx root circuits expose, so
    agg circuits over it exercise the seam-chaining constraints."""
    b = CBuilder()
    ins = [b.wit(f"s{i}") for i in range(SEAM_WORDS + 4)]
    out = sponge_hash(b, ins, 4)
    for k in range(4):
        b.expose(out[k], k)
    return b.build()


def _statement_leaf_proof(stark, i: int):
    seam = _seam(i)
    digest = [i + 10] * 4
    pis = leaf_statement(seam, digest)
    n = 1 << max(stark.num_rows - 1, 1).bit_length()
    vals = interpret(stark.circuit, seam + digest, pis)
    tr = generate_trace(stark, vals, n)
    mp = MachineProof(
        proof=stark_prove(stark, tr, pis, CFG),
        log_n=(n - 1).bit_length(),
        seam=seam,
        digest=digest,
    )
    return mp


@pytest.fixture(scope="module")
def stmt_leaves():
    """Three chained statement leaves over one circuit (one vkey)."""
    stark = RecursionStark(_statement_leaf_circuit())
    return stark, [_statement_leaf_proof(stark, i) for i in range(3)]


class TestAggInterpreter:
    def test_agg_chains_clean(self, stmt_leaves):
        stark, leaves = stmt_leaves
        l0, l1 = leaves[0], leaves[1]
        agg = build_agg(stark, l0.log_n, CFG)
        witness = agg.vc.stream((l0, l1))
        pis = leaf_statement(
            chain_seams(l0.seam, l1.seam, False),
            combine_digests(l0.digest, l1.digest),
        )
        interpret(agg.stark.circuit, witness, pis, check=True)

    def test_agg_rejects_broken_seam(self, stmt_leaves):
        """leaf0 -> leaf2 skips txn 1: the in-circuit left.after ==
        right.before constraints must fail at interpretation."""
        stark, leaves = stmt_leaves
        l0, l2 = leaves[0], leaves[2]
        agg = build_agg(stark, l0.log_n, CFG)
        witness = agg.vc.stream((l0, l2))
        pis = leaf_statement(
            chain_seams(l0.seam, l2.seam, False),
            combine_digests(l0.digest, l2.digest),
        )
        with pytest.raises(AssertionError):
            interpret(agg.stark.circuit, witness, pis, check=True)

    def test_agg_pad_replays_left(self, stmt_leaves):
        stark, leaves = stmt_leaves
        l2 = leaves[2]
        agg = build_agg(stark, l2.log_n, CFG)
        witness = agg.vc.stream((l2, l2))
        pis = leaf_statement(
            chain_seams(l2.seam, l2.seam, True),
            combine_digests(l2.digest, l2.digest),
        )
        interpret(agg.stark.circuit, witness, pis, check=True)

    def test_expected_statement_padding(self):
        parts = [(_seam(i), [i + 10] * 4) for i in range(3)]
        top = expected_statement(parts)
        assert top is not None
        seam, digest = top
        # seams chain 0 -> 3 (the padded 4th repeats leaf 2)
        assert seam[:4] == [0, 3, 0, 300]
        d01 = combine_digests([10] * 4, [11] * 4)
        d22 = combine_digests([12] * 4, [12] * 4)
        assert digest == combine_digests(d01, d22)

    def test_expected_statement_broken_chain(self):
        parts = [(_seam(0), [10] * 4), (_seam(2), [12] * 4)]
        assert expected_statement(parts) is None


@pytest.mark.slow
class TestWrapProving:
    def test_wrap_prove_verify(self, leaf, wrap):
        _, proof, digest = leaf
        wp = wrap.prove(proof, CFG)
        assert verify_machine(wrap.stark, wp, CFG)
        assert [int(v) for v in wp.proof.public_inputs] == [int(v) for v in digest]

    def test_fold_three_leaves_succinct(self, stmt_leaves):
        stark, leaves = stmt_leaves
        ladder = AggLadder(stark, leaves[0].log_n, CFG)
        top, level = fold_proofs(ladder, leaves, CFG)
        assert level == 2
        parts = [(l.seam, l.digest) for l in leaves]
        # succinct: one machine verification + host statement replay
        assert verify_fold(ladder, top, level, parts, CFG)
        # wrong leaf digest set must fail
        bad = parts[:2] + [(leaves[2].seam, [0, 0, 0, 0])]
        assert not verify_fold(ladder, top, level, bad, CFG)
        # non-chaining leaf seams must fail
        bad2 = [parts[0], parts[2], parts[1]]
        assert not verify_fold(ladder, top, level, bad2, CFG)
