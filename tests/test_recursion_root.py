"""Tx ROOT circuit tests: the compiled multi-table verifier.

`build_tx_root` compiles verify_multi (shared challenger pre-phase, all
table STARK verifications via the traced Stark.eval, cross-table
grand-product consistency) into one machine circuit. These tests check
the circuit at the INTERPRETER level (the same assert set the machine
STARK arithmetizes): a real transfer MultiProof streams in and verifies;
tampered proofs are rejected. Machine-proving a root circuit is covered
by the TPU drive (it needs production-size compute).
"""

import sys

import pytest

sys.path.insert(0, "tests")
from test_transfer_e2e import CFG, SIZES, make_transfer_witness

from ethproof_tpu.evm.transfer import derive_pi_words, overlap_pattern, prove_transfer
from ethproof_tpu.recursion.circuit import interpret
from ethproof_tpu.recursion.root import build_tx_root, tx_statement_digest
from ethproof_tpu.tables.cpu import pi_limbs


@pytest.fixture(scope="module")
def setup():
    gi = make_transfer_witness()
    proof = prove_transfer(gi, CFG, SIZES)
    overlap = overlap_pattern(proof.sender, proof.recipient, proof.miner)
    from ethproof_tpu.evm.transfer import transfer_cpu_stark

    root = build_tx_root(transfer_cpu_stark(overlap), SIZES, CFG)
    return proof, root


class TestTxRoot:
    def test_root_interprets_clean(self, setup):
        proof, root = setup
        digest = tx_statement_digest(pi_limbs(proof.pi_words))
        witness = root.vc.stream(proof.multi)
        interpret(root.stark.circuit, witness, digest, check=True)

    def test_wrong_statement_digest_rejected(self, setup):
        proof, root = setup
        digest = tx_statement_digest(pi_limbs(proof.pi_words))
        bad = [digest[0] ^ 1] + digest[1:]
        witness = root.vc.stream(proof.multi)
        with pytest.raises(AssertionError):
            interpret(root.stark.circuit, witness, bad, check=True)

    def test_tampered_table_opening_rejected(self, setup):
        import copy

        proof, root = setup
        digest = tx_statement_digest(pi_limbs(proof.pi_words))
        bad = copy.deepcopy(proof.multi)
        # flip one opened trace value of the CPU table at zeta
        o = bad.proofs[0].openings.trace_at_zeta
        o[0][0] = (int(o[0][0]) + 1) % ((1 << 64) - (1 << 32) + 1)
        witness = root.vc.stream(bad)
        with pytest.raises(AssertionError):
            interpret(root.stark.circuit, witness, digest, check=True)

    def test_tampered_ctl_rejected(self, setup):
        import copy

        proof, root = setup
        digest = tx_statement_digest(pi_limbs(proof.pi_words))
        bad = copy.deepcopy(proof.multi)
        # swap two tables' aux caps: CTL product consistency must break
        a = bad.proofs[0].aux_cap
        bad.proofs[0].aux_cap = bad.proofs[1].aux_cap
        bad.proofs[1].aux_cap = a
        witness = root.vc.stream(bad)
        with pytest.raises(AssertionError):
            interpret(root.stark.circuit, witness, digest, check=True)
