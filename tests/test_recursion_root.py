"""Tx ROOT circuit tests: the compiled multi-table verifier.

`build_tx_root` compiles verify_multi (shared challenger pre-phase, all
table STARK verifications via the recorded constraint IR, cross-table
grand-product consistency) into one machine circuit exposing the leaf
statement E = sponge(seam ++ D_tx), with the seam's state roots wired to
the kernel's own root PI limbs. These tests check the circuit at the
INTERPRETER level (the same assert set the machine STARK arithmetizes);
machine-proving the root + ladder end-to-end is covered by the succinct
block tests (test_succinct_block.py) and the TPU drive.
"""

import sys

import pytest

sys.path.insert(0, "tests")
from test_transfer_e2e import CFG, SIZES, make_transfer_witness

from ethproof_tpu.evm.transfer import overlap_pattern, prove_transfer
from ethproof_tpu.recursion.circuit import interpret
from ethproof_tpu.recursion.root import (
    _RootFill,
    build_tx_root,
    leaf_statement,
    tx_seam,
    tx_statement_digest,
)
from ethproof_tpu.tables.cpu import pi_limbs


@pytest.fixture(scope="module")
def setup():
    gi = make_transfer_witness()
    proof = prove_transfer(gi, CFG, SIZES)
    overlap = overlap_pattern(proof.sender, proof.recipient, proof.miner)
    from ethproof_tpu.evm.transfer import transfer_cpu_stark

    root = build_tx_root(transfer_cpu_stark(overlap), SIZES, CFG)
    return gi, proof, root


def _statement(gi, proof):
    return tx_seam(gi), tx_statement_digest(pi_limbs(proof.pi_words))


class TestTxRoot:
    def test_root_interprets_clean(self, setup):
        gi, proof, root = setup
        seam, digest = _statement(gi, proof)
        witness = root.vc.stream(_RootFill(multi=proof.multi, seam=seam))
        interpret(
            root.stark.circuit, witness, leaf_statement(seam, digest),
            check=True,
        )

    def test_wrong_statement_rejected(self, setup):
        gi, proof, root = setup
        seam, digest = _statement(gi, proof)
        good = leaf_statement(seam, digest)
        bad = [good[0] ^ 1] + good[1:]
        witness = root.vc.stream(_RootFill(multi=proof.multi, seam=seam))
        with pytest.raises(AssertionError):
            interpret(root.stark.circuit, witness, bad, check=True)

    def test_seam_root_is_stark_bound(self, setup):
        """Claiming a different post-state root in the seam must fail:
        the root limbs are the kernel's own PI wires, so the claimed
        statement hash cannot match the recomputed one."""
        gi, proof, root = setup
        seam, digest = _statement(gi, proof)
        lying = list(seam)
        lying[20] ^= 1  # first limb of root_post
        witness = root.vc.stream(_RootFill(multi=proof.multi, seam=lying))
        with pytest.raises(AssertionError):
            interpret(
                root.stark.circuit, witness, leaf_statement(lying, digest),
                check=True,
            )

    def test_txn_increment_enforced(self, setup):
        """seam.txn_after != txn_before + 1 violates the in-circuit
        increment constraint."""
        gi, proof, root = setup
        seam, digest = _statement(gi, proof)
        lying = list(seam)
        lying[1] += 1
        witness = root.vc.stream(_RootFill(multi=proof.multi, seam=lying))
        with pytest.raises(AssertionError):
            interpret(
                root.stark.circuit, witness, leaf_statement(lying, digest),
                check=True,
            )

    def test_tampered_table_opening_rejected(self, setup):
        import copy

        gi, proof, root = setup
        seam, digest = _statement(gi, proof)
        bad = copy.deepcopy(proof.multi)
        # flip one opened trace value of the CPU table at zeta
        o = bad.proofs[0].openings.trace_at_zeta
        o[0][0] = (int(o[0][0]) + 1) % ((1 << 64) - (1 << 32) + 1)
        witness = root.vc.stream(_RootFill(multi=bad, seam=seam))
        with pytest.raises(AssertionError):
            interpret(
                root.stark.circuit, witness, leaf_statement(seam, digest),
                check=True,
            )

    def test_tampered_ctl_rejected(self, setup):
        import copy

        gi, proof, root = setup
        seam, digest = _statement(gi, proof)
        bad = copy.deepcopy(proof.multi)
        # swap two tables' aux caps: CTL product consistency must break
        a = bad.proofs[0].aux_cap
        bad.proofs[0].aux_cap = bad.proofs[1].aux_cap
        bad.proofs[1].aux_cap = a
        witness = root.vc.stream(_RootFill(multi=bad, seam=seam))
        with pytest.raises(AssertionError):
            interpret(
                root.stark.circuit, witness, leaf_statement(seam, digest),
                check=True,
            )
