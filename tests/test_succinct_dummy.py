"""Succinct block with a PROVED padding dummy in the fold.

The no-op dummy leaf joins the aggregation ladder as its own machine
proof (recursion/root.build_dummy_root) instead of the host-only
verify_dummy tier — reference padding parity
(/root/reference/leader/src/padding_and_withdrawals.rs:147-178).
"""

import sys

import pytest

sys.path.insert(0, "tests")
from test_succinct_block import SIZES, TINY, make_transfer_chain

from ethproof_tpu.recursion.state import recursion_state
from ethproof_tpu.runtime.ops import verify_block
from ethproof_tpu.runtime.scheduler import Runtime, prove_block
from ethproof_tpu.witness.types import (
    BlockMetadata,
    GenerationInputs,
    TrieInputs,
    TrieRoots,
)


@pytest.mark.slow
class TestSuccinctWithDummy:
    @pytest.fixture(scope="class")
    def block(self):
        gis = make_transfer_chain(2)
        last = gis[-1]
        # the dummy's state == tx 2's post state: take tx 3's PRE state
        # from a longer chain built with identical parameters
        gis3 = make_transfer_chain(3)
        dummy_state = gis3[2].tries.state_trie  # == post of tx 2
        dummy = GenerationInputs(
            txn_number_before=2,
            gas_used_before=last.gas_used_after,
            gas_used_after=last.gas_used_after,
            signed_txn=None,
            tries=TrieInputs(state_trie=dummy_state.copy()),
            trie_roots_after=TrieRoots(state_root=dummy_state.hash()),
            checkpoint_state_trie_root=gis[0].tries.state_trie.hash(),
            block_metadata=last.block_metadata,
        )
        bp = prove_block(
            gis + [dummy], TINY, sizes=SIZES,
            runtime=Runtime(num_workers=2), recursion=True,
        )
        return bp

    def _rstate(self, succ):
        return recursion_state(
            succ.sizes, TINY,
            binding_shape=succ.binding_shape,
            evm_shapes=succ.evm_shapes,
            wd_counts=succ.wd_counts,
        )

    def test_dummy_joins_the_fold(self, block):
        assert block.succinct is not None
        # 3 leaves (2 txs + proved dummy) pad to 4 -> level 2
        assert block.succinct.level == 2
        assert verify_block(block, TINY, recursion=self._rstate(block.succinct))

    def test_tampered_dummy_statement_rejected(self, block):
        import copy

        bad = copy.deepcopy(block)
        # claim the dummy changed the state root: host replay's parts no
        # longer match the proved top statement
        bad.agg.right.gen_inputs.trie_roots_after.state_root = b"\x01" * 32
        assert not verify_block(bad, TINY, recursion=self._rstate(bad.succinct))
