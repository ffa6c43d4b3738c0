"""Block wrap circuits: parent-block chaining in-circuit.

Reference parity: proof_gen's block circuit verifies the agg proof AND
the parent block proof cyclically (/root/reference/ops/src/lib.rs:
84-101); recursion/block.py re-expresses the cyclic vkey as a
witnessed cap bound into the statement chain, pinned by one host
equality at the outermost verifier.
"""

import copy

import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.recursion.aggregate import AggLadder, fold_proofs
from ethproof_tpu.recursion.block import (
    BlockWrapProof,
    block_statement,
    build_block_wraps,
    verify_block_chain,
)
from ethproof_tpu.recursion.circuit import CBuilder, interpret
from ethproof_tpu.recursion.machine import RecursionStark, generate_trace
from ethproof_tpu.recursion.root import SEAM_WORDS, leaf_statement
from ethproof_tpu.recursion.verifier_circuit import sponge_hash
from ethproof_tpu.recursion.wrap import MachineProof
from ethproof_tpu.stark.prove import stark_prove

P = fh.P

CFG = StarkConfig(
    num_challenges=1,
    fri_config=FriConfig(
        rate_bits=2, cap_height=1, proof_of_work_bits=2,
        num_query_rounds=3, arity_bits=2, final_poly_bits=2,
    ),
)


def _seam(i: int):
    return [i, i + 1, 100 * i, 100 * (i + 1)] + [i] * 16 + [i + 1] * 16


def _statement_leaf_circuit():
    b = CBuilder()
    ins = [b.wit(f"s{i}") for i in range(SEAM_WORDS + 4)]
    out = sponge_hash(b, ins, 4)
    for k in range(4):
        b.expose(out[k], k)
    return b.build()


def _leaf_proof(stark, i: int):
    seam = _seam(i)
    digest = [i + 10] * 4
    pis = leaf_statement(seam, digest)
    n = 1 << max(stark.num_rows - 1, 1).bit_length()
    vals = interpret(stark.circuit, seam + digest, pis)
    tr = generate_trace(stark, vals, n)
    return MachineProof(
        proof=stark_prove(stark, tr, pis, CFG),
        log_n=(n - 1).bit_length(),
        seam=seam,
        digest=digest,
    )


class TestStatementAlgebra:
    def test_block_statement_distinguishes_base(self):
        seam, dig, ep, w = _seam(0), [1] * 4, [0] * 4, [5] * 8
        a = block_statement(seam, dig, ep, w, 1)
        b = block_statement(seam, dig, ep, w, 0)
        assert a != b

    def test_block_statement_binds_w(self):
        seam, dig, ep = _seam(0), [1] * 4, [0] * 4
        a = block_statement(seam, dig, ep, [5] * 8, 1)
        b = block_statement(seam, dig, ep, [6] * 8, 1)
        assert a != b


@pytest.mark.slow
class TestBlockChainProving:
    @pytest.fixture(scope="class")
    def chain(self):
        """Two 2-tx blocks, folded + wrapped: base(block1), step(block2)."""
        stark = RecursionStark(_statement_leaf_circuit())
        leaves = [_leaf_proof(stark, i) for i in range(4)]
        ladder = AggLadder(stark, leaves[0].log_n, CFG)
        top1, lvl1 = fold_proofs(ladder, leaves[0:2], CFG)
        top2, lvl2 = fold_proofs(ladder, leaves[2:4], CFG)
        assert lvl1 == lvl2 == 1
        wraps = build_block_wraps(ladder, 1, CFG)
        b1 = wraps.prove_base(top1)
        b2 = wraps.prove_step(top2, b1)
        parts1 = [(l.seam, l.digest) for l in leaves[0:2]]
        parts2 = [(l.seam, l.digest) for l in leaves[2:4]]
        return wraps, b1, b2, parts1, parts2

    def test_two_block_chain_verifies(self, chain):
        wraps, b1, b2, parts1, parts2 = chain
        assert verify_block_chain(wraps, b2, [parts1, parts2], CFG)

    def test_single_block_base_verifies(self, chain):
        wraps, b1, _b2, parts1, _parts2 = chain
        assert verify_block_chain(wraps, b1, [parts1], CFG)

    def test_wrong_block_order_rejected(self, chain):
        wraps, _b1, b2, parts1, parts2 = chain
        assert not verify_block_chain(wraps, b2, [parts2, parts1], CFG)

    def test_tampered_top_rejected(self, chain):
        wraps, _b1, b2, parts1, parts2 = chain
        bad = copy.deepcopy(b2)
        bad.mp.proof.trace_query_openings.values[0, 0] ^= 1
        assert not verify_block_chain(wraps, bad, [parts1, parts2], CFG)

    def test_wrong_leaf_digest_rejected(self, chain):
        wraps, _b1, b2, parts1, parts2 = chain
        bad2 = [parts2[0], (parts2[1][0], [0, 0, 0, 0])]
        assert not verify_block_chain(wraps, b2, [parts1, bad2], CFG)

    def test_step_circuit_rejects_broken_parent_chain(self, chain):
        """A parent whose root_post does not match the child's root_pre
        must fail the step circuit's own assertions at proving time."""
        wraps, b1, _b2, _p1, _p2 = chain
        stark = RecursionStark(_statement_leaf_circuit())
        # a block whose first leaf starts at root 7 (not block1's 2)
        leaves = [_leaf_proof(stark, i) for i in (7, 8)]
        ladder = AggLadder(stark, leaves[0].log_n, CFG)
        top_bad, _ = fold_proofs(ladder, leaves, CFG)
        with pytest.raises(AssertionError):
            wraps.prove_step(top_bad, b1)
