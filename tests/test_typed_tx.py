"""Typed transactions (EIP-2930 type 1, EIP-1559 type 2): decode,
sender recovery, fee semantics, kernel + trie-binding integration.

Reference parity: the reference's RPC layer serves typed txs
transparently through `signed_txn` bytes; fee semantics follow
consensus EIP-1559 (effective price, miner tip, base-fee burn)."""

import pytest

from ethproof_tpu.evm.transfer import (
    PI_FEE,
    PI_TIP,
    TxProof,
    check_trie_binding,
    derive_pi_words,
    overlap_pattern,
    transfer_kernel_program,
)
from ethproof_tpu.evm.tx import (
    Eip1559Tx,
    Eip2930Tx,
    LegacyTx,
    decode_tx,
    private_key_to_address,
    sign_eip1559_tx,
    sign_eip2930_tx,
    sign_legacy_tx,
)
from ethproof_tpu.tables.cpu import execute

from test_transfer_e2e import PK, make_transfer_witness

ADDR = b"\xbb" * 20
SENDER = private_key_to_address(PK)


class TestDecode:
    def test_legacy_roundtrip(self):
        raw = sign_legacy_tx(7, 5, 21000, ADDR, 9, b"\x01\x02", PK, chain_id=1)
        tx = decode_tx(raw)
        assert isinstance(tx, LegacyTx)
        assert tx.tx_type == 0 and tx.chain_id == 1
        assert (tx.nonce, tx.gas_price, tx.gas_limit) == (7, 5, 21000)
        assert (tx.to, tx.value, tx.data) == (ADDR, 9, b"\x01\x02")
        assert tx.sender() == SENDER

    def test_eip2930_roundtrip(self):
        al = ((b"\xaa" * 20, (b"\x11" * 32, b"\x22" * 32)), (b"\xab" * 20, ()))
        raw = sign_eip2930_tx(1, 7, 5, 60000, ADDR, 9, b"\x03", PK, access_list=al)
        assert raw[0] == 0x01
        tx = decode_tx(raw)
        assert isinstance(tx, Eip2930Tx)
        assert tx.tx_type == 1 and tx.chain_id == 1
        assert tx.access_list == al
        assert tx.sender() == SENDER
        assert tx.effective_gas_price(2) == 5
        assert tx.miner_tip_per_gas(2) == 3

    def test_eip1559_roundtrip(self):
        raw = sign_eip1559_tx(1, 7, 2, 10, 60000, ADDR, 9, b"", PK)
        assert raw[0] == 0x02
        tx = decode_tx(raw)
        assert isinstance(tx, Eip1559Tx)
        assert tx.tx_type == 2 and tx.chain_id == 1
        assert (tx.max_priority_fee_per_gas, tx.max_fee_per_gas) == (2, 10)
        assert tx.sender() == SENDER

    def test_eip1559_effective_price(self):
        raw = sign_eip1559_tx(1, 0, 2, 10, 21000, ADDR, 0, b"", PK)
        tx = decode_tx(raw)
        # tip-capped: base 5 -> effective 7, tip 2
        assert tx.effective_gas_price(5) == 7
        assert tx.miner_tip_per_gas(5) == 2
        # fee-capped: base 9 -> effective 10, tip 1
        assert tx.effective_gas_price(9) == 10
        assert tx.miner_tip_per_gas(9) == 1
        with pytest.raises(AssertionError):
            tx.effective_gas_price(11)  # base fee above max fee

    def test_unknown_type_rejected(self):
        with pytest.raises(AssertionError):
            decode_tx(b"\x05\xc0")

    def test_tampered_signature_changes_sender(self):
        raw = bytearray(sign_eip1559_tx(1, 7, 2, 10, 60000, ADDR, 9, b"", PK))
        tx = decode_tx(bytes(raw))
        tampered = Eip1559Tx(**{**tx.__dict__, "value": tx.value + 1})
        assert tampered.sender() != SENDER


def _host_roundtrip(gi):
    pi, sender, recipient, miner = derive_pi_words(gi)
    prog = transfer_kernel_program(overlap_pattern(sender, recipient, miner))
    execute(prog, pi, 64)  # kernel asserts must hold
    proof = TxProof(
        multi=None, pi_words=pi, gen_inputs=gi,
        sender=sender, recipient=recipient, miner=miner,
    )
    assert check_trie_binding(proof)
    return pi


GAS = 21000  # consensus intrinsic gas of an empty-data transfer


class TestFeeSplit:
    def test_1559_burn_host(self):
        # max_fee 5, priority 1, base 3 -> effective 4, tip 1, burn 3/gas
        gi = make_transfer_witness(
            tx_type=2, gas_price=5, priority_fee=1, base_fee=3,
            sender_bal=100000,
        )
        pi = _host_roundtrip(gi)
        assert pi[PI_FEE] == 4 * GAS and pi[PI_TIP] == 1 * GAS

    def test_2930_host(self):
        gi = make_transfer_witness(tx_type=1, gas_price=2, sender_bal=50000)
        pi = _host_roundtrip(gi)
        assert pi[PI_FEE] == 2 * GAS and pi[PI_TIP] == 2 * GAS

    def test_legacy_with_base_fee_host(self):
        # post-London legacy: gas_price 5, base 3 -> tip 2/gas, burn 3/gas
        gi = make_transfer_witness(gas_price=5, base_fee=3, sender_bal=120000)
        pi = _host_roundtrip(gi)
        assert pi[PI_FEE] == 5 * GAS and pi[PI_TIP] == 2 * GAS

    def test_wrong_miner_credit_rejected(self):
        gi = make_transfer_witness(
            tx_type=2, gas_price=5, priority_fee=1, base_fee=3,
            sender_bal=100000,
        )
        pi, sender, recipient, miner = derive_pi_words(gi)
        bad = list(pi)
        bad[9] += 3 * GAS  # miner claims the burned base fee too
        proof = TxProof(
            multi=None, pi_words=bad, gen_inputs=gi,
            sender=sender, recipient=recipient, miner=miner,
        )
        assert not check_trie_binding(proof)

    def test_non_consensus_gas_rejected(self):
        gi = make_transfer_witness()
        gi.gas_used_after += 1  # witness claims more than intrinsic
        with pytest.raises(AssertionError, match="intrinsic"):
            derive_pi_words(gi)

    def test_1559_proof(self):
        # zero-fee type-2: exercises decode/signature/binding through the
        # STARK inside the small range tables; the real-fee split proof
        # runs in the slow tier below
        from test_transfer_e2e import CFG, SIZES
        from ethproof_tpu.evm.transfer import prove_transfer, verify_transfer

        gi = make_transfer_witness(tx_type=2)
        proof = prove_transfer(gi, CFG, SIZES)
        assert verify_transfer(proof, CFG)

    @pytest.mark.slow
    def test_1559_real_fee_proof(self):
        from test_transfer_e2e import CFG
        from ethproof_tpu.evm.transfer import prove_transfer, verify_transfer
        from ethproof_tpu.tables.all import TableSizes

        gi = make_transfer_witness(
            tx_type=2, gas_price=5, priority_fee=1, base_fee=3,
            sender_bal=100000,
        )
        sizes = TableSizes(
            cpu=5, arithmetic=16, logic=4, bytepacking=9, memory=7, keccak=None
        )
        proof = prove_transfer(gi, CFG, sizes)
        assert verify_transfer(proof, CFG)
