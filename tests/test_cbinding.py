"""Contract-call in-circuit state binding (evm/cbinding.py): storage
slot chains + account updates as a kasm kernel, cross-checked against
the EVM machine's public inputs.

Host tier here: building the CONCRETE kernel runs every emitted assert
against the kasm host model (KAsm.assert0 raises on violation), and
cpu.execute replays the instruction stream; the slow-tier e2e proves
the multi-proof (test_contract_call.py)."""

import pytest

import sys

sys.path.insert(0, "tests")
from test_contract_call import MINER, TOKEN, make_erc20_witness
from test_transfer_e2e import PK

from ethproof_tpu.evm import cbinding as CB
from ethproof_tpu.evm import contract as C
from ethproof_tpu.evm.binding import KernelShape, Unsupported
from ethproof_tpu.evm.tx import private_key_to_address
from ethproof_tpu.tables.cpu import execute

SHAPE = KernelShape(levels=3, node_words=20)


def _setup(**kw):
    gi = make_erc20_witness(**kw)
    shape, _inputs, res = C.machine_inputs_for_tx(gi)
    sender = private_key_to_address(PK)
    gas = gi.gas_used_after
    pi = CB.expected_cb_pi(gi, res.pi_words, shape, sender, TOKEN, MINER, gas)
    return gi, shape, res, sender, pi


class TestWitnessAndKernel:
    def test_expected_pi_roundtrip(self):
        gi, shape, res, sender, pi = _setup()
        from ethproof_tpu.evm.kasm import le_word

        assert pi[CB.CB_STATE_ROOT_PRE] == le_word(gi.tries.state_trie.hash())
        assert pi[CB.CB_STATE_ROOT_POST] == le_word(
            gi.trie_roots_after.state_root
        )
        assert pi[CB.CB_SUCCESS] == 1
        # two slots changed (sender/bob token balances)
        assert len(pi) == CB.cb_num_pi_words(2)

    def test_concrete_kernel_builds_and_executes(self):
        gi, shape, res, sender, pi = _setup()
        bw = CB.build_contract_binding_witness(
            gi, res.pi_words, shape, sender, TOKEN, MINER, pi, SHAPE
        )
        assert len(bw.slots) == 2 and len(bw.accounts) == 3
        kasm = CB.build_contract_kernel(len(bw.slots), SHAPE, pi, bw)
        # the host interpreter replays the stream (asserts must hold)
        n = 1 << (len(kasm.prog) - 1).bit_length()
        execute(kasm.prog, pi, n, witness=kasm.witness)

    def test_program_is_statement_pure(self):
        gi, shape, res, sender, pi = _setup()
        bw = CB.build_contract_binding_witness(
            gi, res.pi_words, shape, sender, TOKEN, MINER, pi, SHAPE
        )
        concrete = CB.build_contract_kernel(len(bw.slots), SHAPE, pi, bw)
        program_only = CB.build_contract_kernel(len(bw.slots), SHAPE)
        assert concrete.prog == program_only.prog

    def test_reverted_frame_has_no_slot_chain(self):
        gi, shape, res, sender, pi = _setup(amount=101, sender_tokens=100)
        assert pi[CB.CB_SUCCESS] == 0
        assert len(pi) == CB.cb_num_pi_words(0)
        assert pi[CB.CB_SROOT_PRE] == pi[CB.CB_SROOT_POST]
        bw = CB.build_contract_binding_witness(
            gi, res.pi_words, shape, sender, TOKEN, MINER, pi, SHAPE
        )
        assert bw.slots == []
        kasm = CB.build_contract_kernel(0, SHAPE, pi, bw)
        n = 1 << (len(kasm.prog) - 1).bit_length()
        execute(kasm.prog, pi, n, witness=kasm.witness)

    def test_forged_slot_value_fails_kernel(self):
        gi, shape, res, sender, pi = _setup()
        bw = CB.build_contract_binding_witness(
            gi, res.pi_words, shape, sender, TOKEN, MINER, pi, SHAPE
        )
        bad = list(pi)
        bad[CB.CB_SLOTS + 1] += 1  # slot 0 vpost forged
        with pytest.raises(AssertionError):
            CB.build_contract_kernel(len(bw.slots), SHAPE, bad, bw)

    def test_forged_miner_credit_fails_kernel(self):
        gi, shape, res, sender, pi = _setup()
        bw = CB.build_contract_binding_witness(
            gi, res.pi_words, shape, sender, TOKEN, MINER, pi, SHAPE
        )
        bad = list(pi)
        bad[CB.CB_MINER_BAL_POST] += 1
        with pytest.raises(AssertionError):
            CB.build_contract_kernel(len(bw.slots), SHAPE, bad, bw)

    def test_slot_deletion_unsupported(self):
        # storing 0 deletes the leaf -> restructuring -> host fallback
        from ethproof_tpu.evm.binding import (
            build_slot_update_witness,
            encode_slot_value,
        )
        from ethproof_tpu.trie.trie import PartialTrie

        strie = PartialTrie()
        strie.insert(C._slot_key(1), encode_slot_value(5))
        strie.insert(C._slot_key(2), encode_slot_value(9))
        with pytest.raises(Unsupported):
            build_slot_update_witness(strie, C._slot_key(1), 0, SHAPE)
        # absent slot -> restructuring as well
        with pytest.raises(Unsupported):
            build_slot_update_witness(strie, C._slot_key(3), 7, SHAPE)
        # a legitimate update round-trips
        uw, post = build_slot_update_witness(strie, C._slot_key(1), 6, SHAPE)
        assert post.hash() != strie.hash()

    def test_depth_envelope_unsupported(self):
        gi, shape, res, sender, pi = _setup()
        tight = KernelShape(levels=1, node_words=20)
        with pytest.raises(Unsupported):
            CB.build_contract_binding_witness(
                gi, res.pi_words, shape, sender, TOKEN, MINER, pi, tight
            )


class TestProveFallback:
    def test_overlap_witness_falls_back_to_host_tier(self):
        # miner == sender is outside the in-circuit envelope: "auto" mode
        # must return the host tier (no binding proof), "require" raises
        from ethproof_tpu.evm.contract import _prove_binding
        from test_transfer_e2e import CFG

        gi = make_erc20_witness()
        shape, _inputs, res = C.machine_inputs_for_tx(gi)
        sender = private_key_to_address(PK)
        multi, pi, n, ks = _prove_binding(
            gi, res.pi_words, shape, sender, TOKEN, sender,  # miner==sender
            gi.gas_used_after, CFG, "auto", None,
        )
        assert multi is None and pi is None and n == 0 and ks is None
        with pytest.raises(Unsupported):
            _prove_binding(
                gi, res.pi_words, shape, sender, TOKEN, sender,
                gi.gas_used_after, CFG, "require", None,
            )
