"""End-to-end: GenerationInputs -> transfer kernel -> 5-table proof -> verify.

The minimum end-to-end slice of SURVEY.md §7: witness (synthetic, no RPC)
-> host trace generation for all tables -> multi-table STARK proof with
CTLs -> verification including trie binding. Values are kept tiny so the
range tables stay small enough for the CPU test backend; realistic sizes
run on the TPU (see the verify recipe).
"""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.hash.keccak import keccak256
from ethproof_tpu.evm.transfer import (
    TxProof,
    derive_pi_words,
    prove_transfer,
    verify_transfer,
)
from ethproof_tpu.evm.tx import private_key_to_address, sign_legacy_tx
from ethproof_tpu.tables.all import TableSizes
from ethproof_tpu.trie.nibbles import Nibbles
from ethproof_tpu.trie.trie import PartialTrie
from ethproof_tpu.witness.mpt import encode_account
from ethproof_tpu.witness.types import (
    BlockMetadata,
    GenerationInputs,
    TrieInputs,
    TrieRoots,
)

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
# default CPU tier: 5 tables (transfers issue no hash requests; the keccak
# pair is covered by test_keccak_sponge and the slow 7-table test below)
SIZES = TableSizes(cpu=5, arithmetic=6, logic=4, bytepacking=9, memory=7, keccak=None)
SIZES7 = TableSizes(cpu=5, arithmetic=6, logic=4, bytepacking=9, memory=7)

PK = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF


def _key(addr):
    return Nibbles.from_bytes(keccak256(addr))


def _acct(nonce, balance):
    return encode_account(
        {
            "nonce": nonce,
            "balance": balance,
            "storage_root": PartialTrie().hash(),
            "code_hash": keccak256(b""),
        }
    )


def make_transfer_witness(
    value=3,
    gas_price=0,
    sender_bal=40,
    tamper_root=False,
    recipient_is_sender=False,
    miner_is_sender=False,
    miner_is_recipient=False,
    tx_type=0,
    base_fee=0,
    priority_fee=0,
):
    """tx_type 2 treats gas_price as max_fee_per_gas; the effective price
    is min(max_fee, base_fee + priority_fee) and base_fee * gas is burned
    (EIP-1559 fee split, evm/tx.py). gas_used is always the consensus
    intrinsic 21000 (enforced by derive_pi_words) — nonzero gas_price
    therefore means fees >= 21000, which needs the 2^16 arithmetic range
    table when proving (use gas_price=0 in small default-tier proofs)."""
    gas_used = 21000  # intrinsic gas of an empty-data transfer
    from ethproof_tpu.evm.tx import sign_eip1559_tx, sign_eip2930_tx

    sender = private_key_to_address(PK)
    recipient = sender if recipient_is_sender else b"\xbb" * 20
    miner = (
        sender if miner_is_sender else recipient if miner_is_recipient else b"\xcc" * 20
    )
    state = PartialTrie()
    state.insert(_key(sender), _acct(4, sender_bal))
    if recipient != sender:
        state.insert(_key(recipient), _acct(0, 30))
    if miner not in (sender, recipient):
        state.insert(_key(miner), _acct(0, 7))
    if tx_type == 0:
        raw = sign_legacy_tx(4, gas_price, 21000, recipient, value, b"", PK, chain_id=1)
        effective = gas_price
    elif tx_type == 1:
        raw = sign_eip2930_tx(1, 4, gas_price, 21000, recipient, value, b"", PK)
        effective = gas_price
    elif tx_type == 2:
        raw = sign_eip1559_tx(
            1, 4, priority_fee, gas_price, 21000, recipient, value, b"", PK
        )
        effective = min(gas_price, base_fee + priority_fee)
    else:
        raise ValueError(tx_type)
    fee = effective * gas_used
    tip = (effective - base_fee) * gas_used
    # sequential EVM semantics: deduct value+fee, credit value, credit tip
    balances = {sender: sender_bal}
    balances.setdefault(recipient, 30)
    balances.setdefault(miner, 7)
    balances[sender] -= value + fee
    balances[recipient] += value
    balances[miner] += tip
    post = state.copy()
    post.insert(_key(sender), _acct(5, balances[sender]))
    if recipient != sender:
        post.insert(_key(recipient), _acct(0, balances[recipient]))
    if miner not in (sender, recipient):
        post.insert(_key(miner), _acct(0, balances[miner]))
    root_after = post.hash()
    if tamper_root:
        root_after = keccak256(b"wrong")
    return GenerationInputs(
        txn_number_before=0,
        gas_used_before=0,
        gas_used_after=gas_used,
        signed_txn=raw,
        tries=TrieInputs(state_trie=state),
        trie_roots_after=TrieRoots(state_root=root_after),
        checkpoint_state_trie_root=state.hash(),
        block_metadata=BlockMetadata(
            block_beneficiary=miner, block_chain_id=1, block_base_fee=base_fee
        ),
    )


class TestPiDerivation:
    def test_pi_words(self):
        gi = make_transfer_witness()
        pi, sender, recipient, miner = derive_pi_words(gi)
        assert pi[4] == 3 and pi[5] == 0  # value, fee
        assert pi[0] == 4 and pi[6] == 5  # nonce pre/post
        assert pi[1] == 40 and pi[7] == 37
        assert pi[8] == 33 and pi[9] == 7
        assert recipient == b"\xbb" * 20 and miner == b"\xcc" * 20


class TestTransferE2E:
    def test_prove_verify(self):
        gi = make_transfer_witness()
        proof = prove_transfer(gi, CFG, SIZES)
        assert verify_transfer(proof, CFG)

    def test_tampered_pi_rejected(self):
        gi = make_transfer_witness()
        proof = prove_transfer(gi, CFG, SIZES)
        proof.pi_words = list(proof.pi_words)
        proof.pi_words[8] += 1  # claim recipient got one extra wei
        assert not verify_transfer(proof, CFG)

    def test_wrong_state_root_rejected(self):
        gi = make_transfer_witness(tamper_root=True)
        proof = prove_transfer(gi, CFG, SIZES)
        assert not verify_transfer(proof, CFG)


class TestTransferSevenTables:
    """Default tier: the flagship 7-table configuration (VERDICT r1 weak #5)."""

    def test_full_seven_table_proof(self):
        gi = make_transfer_witness()
        proof = prove_transfer(gi, CFG, SIZES7)
        assert len(proof.multi.proofs) == 7
        assert verify_transfer(proof, CFG)


class TestOverlapTransfers:
    """Overlapping-party transfers (self-transfer, miner overlap) — the
    reference kernel covers these as ordinary txs; VERDICT r1 weak #7."""

    def _host_roundtrip(self, gi):
        from ethproof_tpu.evm.transfer import check_trie_binding
        from ethproof_tpu.evm.transfer import (
            overlap_pattern,
            transfer_kernel_program,
        )
        from ethproof_tpu.tables.cpu import execute

        pi, sender, recipient, miner = derive_pi_words(gi)
        prog = transfer_kernel_program(overlap_pattern(sender, recipient, miner))
        execute(prog, pi, 64)  # kernel asserts must hold
        dummy = TxProof(
            multi=None, pi_words=pi, gen_inputs=gi,
            sender=sender, recipient=recipient, miner=miner,
        )
        assert check_trie_binding(dummy)

    def test_self_transfer_host(self):
        self._host_roundtrip(make_transfer_witness(recipient_is_sender=True))

    def test_miner_is_sender_host(self):
        self._host_roundtrip(
            make_transfer_witness(
                miner_is_sender=True, gas_price=1, sender_bal=30000
            )
        )

    def test_miner_is_recipient_host(self):
        self._host_roundtrip(
            make_transfer_witness(
                miner_is_recipient=True, gas_price=1, sender_bal=30000
            )
        )

    def test_all_same_party_host(self):
        self._host_roundtrip(
            make_transfer_witness(
                recipient_is_sender=True, miner_is_sender=True,
                gas_price=1, sender_bal=30000,
            )
        )

    # overlap kernels carry duplication asserts on top of the tip split,
    # pushing past 2^5 cpu rows
    SIZES_OVL = TableSizes(
        cpu=6, arithmetic=6, logic=4, bytepacking=9, memory=7, keccak=None
    )

    def test_miner_is_sender_proof(self):
        # gas_price=0 keeps balance limbs inside the small range table;
        # the real-fee overlap proof runs in the slow tier below
        gi = make_transfer_witness(miner_is_sender=True)
        proof = prove_transfer(gi, CFG, self.SIZES_OVL)
        assert verify_transfer(proof, CFG)

    @pytest.mark.slow
    def test_self_transfer_proof(self):
        gi = make_transfer_witness(recipient_is_sender=True)
        proof = prove_transfer(gi, CFG, self.SIZES_OVL)
        assert verify_transfer(proof, CFG)

    @pytest.mark.slow
    def test_all_same_party_proof(self):
        # consensus fee 21000 wei: limbs up to ~30000 need the 2^16
        # arithmetic range table (same shape as test_binding's slow e2e)
        gi = make_transfer_witness(
            recipient_is_sender=True, miner_is_sender=True,
            gas_price=1, sender_bal=30000,
        )
        sizes_fee = TableSizes(
            cpu=6, arithmetic=16, logic=4, bytepacking=9, memory=7, keccak=None
        )
        proof = prove_transfer(gi, CFG, sizes_fee)
        assert verify_transfer(proof, CFG)


class TestDynamicSizing:
    """CircuitConfig-driven per-proof degree fit (VERDICT r1 missing #6)."""

    def test_fit_matches_explicit_sizes(self):
        from ethproof_tpu.runtime.prover_state import CircuitConfig
        from ethproof_tpu.tables.all import TableSizes, kernel_counts
        from ethproof_tpu.evm.transfer import transfer_kernel_program

        ranges = {
            "cpu": range(5, 9),
            "arithmetic": range(6, 9),
            "logic": range(4, 7),
            "byte_packing": range(9, 11),
            "memory": range(7, 10),
            "keccak": range(5, 8),
            "keccak_sponge": range(8, 10),
        }
        cfg = CircuitConfig(ranges)
        counts = kernel_counts(transfer_kernel_program())
        assert TableSizes.fit(cfg, counts) == SIZES7

    def test_fit_grows_above_floor(self):
        from ethproof_tpu.runtime.prover_state import CircuitConfig
        from ethproof_tpu.tables.all import CircuitSizeError, TableSizes

        cfg = CircuitConfig({
            "cpu": range(3, 8), "arithmetic": range(3, 8),
            "logic": range(3, 8), "byte_packing": range(3, 8),
            "memory": range(3, 8), "keccak": range(3, 8),
            "keccak_sponge": range(3, 8),
        })
        sz = TableSizes.fit(cfg, {"cpu": 100, "arithmetic": 9, "memory": 1})
        assert sz.cpu == 7 and sz.arithmetic == 4 and sz.memory == 3
        with pytest.raises(CircuitSizeError):
            TableSizes.fit(cfg, {"cpu": 1 << 9})

    def test_prove_with_circuit_config(self):
        from ethproof_tpu.runtime.prover_state import CircuitConfig

        ranges = {
            "cpu": range(5, 9),
            "arithmetic": range(6, 9),
            "logic": range(4, 7),
            "byte_packing": range(9, 11),
            "memory": range(7, 10),
            "keccak": range(5, 8),
            "keccak_sponge": range(8, 10),
        }
        gi = make_transfer_witness()
        # shapes equal SIZES7, so this shares the compile cache with the
        # seven-table test above
        proof = prove_transfer(gi, CFG, CircuitConfig(ranges))
        assert len(proof.multi.proofs) == 7
        assert verify_transfer(proof, CFG)
