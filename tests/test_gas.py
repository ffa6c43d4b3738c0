"""Consensus gas accounting: the meter (evm/gas.py), machine
integration (tables/evm.py), and tx-level derivation (evm/contract.py).

Reference parity: evm_arithmetization charges gas in its kernel and the
witness's gas_used_after is consensus data; here the same quantities are
re-derived and enforced (Berlin/London rules: EIP-2028/2929/2200/3529)."""

import pytest

from ethproof_tpu.evm import gas as G
from ethproof_tpu.tables import evm as E


class TestMeterUnits:
    def test_memory_cost(self):
        assert G.memory_cost(0) == 0
        assert G.memory_cost(1) == 3
        assert G.memory_cost(32) == 3 * 32 + 2  # 1024 // 512
        assert G.words_for(0, 32) == 1
        assert G.words_for(1, 32) == 2  # straddles a word boundary
        assert G.words_for(5, 0) == 0  # zero-length touch expands nothing

    def test_intrinsic(self):
        from ethproof_tpu.evm.tx import decode_tx, sign_eip2930_tx, sign_legacy_tx

        pk = 0x1234
        to = b"\xbb" * 20
        raw = sign_legacy_tx(0, 1, 21000, to, 0, b"", pk, chain_id=1)
        assert G.intrinsic_gas(decode_tx(raw)) == 21000
        raw = sign_legacy_tx(0, 1, 30000, to, 0, b"\x00\x01\x00", pk, chain_id=1)
        assert G.intrinsic_gas(decode_tx(raw)) == 21000 + 4 + 16 + 4
        al = ((b"\xaa" * 20, (b"\x01" * 32, b"\x02" * 32)),)
        raw = sign_eip2930_tx(1, 0, 1, 50000, to, 0, b"", pk, access_list=al)
        assert G.intrinsic_gas(decode_tx(raw)) == 21000 + 2400 + 2 * 1900

    def test_sload_cold_warm(self):
        m = G.GasMeter(original={})
        m.charge_sload(5)
        m.charge_sload(5)
        assert m.used == 2100 + 100

    def test_sstore_matrix(self):
        # (original, current, value) -> (charge, refund delta); slot warm
        cases = [
            ((0, 0, 0), (100, 0)),  # no-op store
            ((0, 0, 5), (20000, 0)),  # fresh set
            ((0, 5, 0), (100, 19900)),  # dirty clear back to original 0
            ((0, 5, 7), (100, 0)),  # dirty overwrite
            ((9, 9, 0), (2900, 4800)),  # clean clear (EIP-3529 refund)
            ((9, 9, 7), (2900, 0)),  # clean reset
            ((9, 0, 9), (100, -4800 + 2800), ),  # dirty restore from 0
            ((9, 7, 9), (100, 2800)),  # dirty restore
            ((9, 7, 0), (100, 4800)),  # dirty clear
        ]
        for (orig, cur, val), (want_charge, want_refund) in cases:
            m = G.GasMeter(original={1: orig}, warm={1})
            m.charge_sstore(1, cur, val)
            assert (m.used, m.refund) == (want_charge, want_refund), (
                orig, cur, val
            )

    def test_sstore_cold_surcharge(self):
        m = G.GasMeter(original={1: 0})
        m.charge_sstore(1, 0, 5)
        assert m.used == 2100 + 20000

    def test_refund_cap(self):
        # refund capped at total // 5; forfeited on revert
        assert G.tx_gas_used(21000, 10000, 50000, success=1) == 31000 - 6200
        assert G.tx_gas_used(21000, 10000, 100, success=1) == 31000 - 100
        assert G.tx_gas_used(21000, 10000, 50000, success=0) == 31000


def _run(code, storage_pre=None, warm_pre=(), calldata=b""):
    _, _, res = E.discover_and_execute(
        code, calldata, 0xAA, 0, dict(storage_pre or {}), log_rows=9,
        warm_pre=warm_pre,
    )
    return res


class TestMachineMetering:
    def test_simple_arith(self):
        code = E.asm(("push", 1), ("push", 2), E.ADD, E.STOP)
        assert _run(code).gas_used == 3 + 3 + 3

    def test_memory_expansion(self):
        # MSTORE@0 expands to 1 word; MLOAD@0 is then free of expansion
        code = E.asm(("push", 7), ("push", 0), E.MSTORE,
                     ("push", 0), E.MLOAD, E.STOP)
        assert _run(code).gas_used == (3 + 3 + 3 + 3) + (3 + 3)

    def test_keccak_word_cost(self):
        # store a word then hash 32 bytes: 30 + 6*1, no new expansion
        code = E.asm(("push", 7), ("push", 0), E.MSTORE,
                     ("push", 32), ("push", 0), E.KECCAK256, E.STOP)
        r = _run(code)
        assert r.gas_used == (3 + 3 + 3 + 3) + (3 + 3 + 30 + 6)

    def test_sload_cold_then_warm(self):
        code = E.asm(("push", 1), E.SLOAD, E.POP,
                     ("push", 1), E.SLOAD, E.POP, E.STOP)
        r = _run(code, storage_pre={1: 0})
        assert r.gas_used == (3 + 2100 + 2) + (3 + 100 + 2)

    def test_access_list_prewarm(self):
        code = E.asm(("push", 1), E.SLOAD, E.POP, E.STOP)
        cold = _run(code, storage_pre={1: 0}).gas_used
        warm = _run(code, storage_pre={1: 0}, warm_pre=(1,)).gas_used
        assert cold - warm == 2100 - 100

    def test_log_cost(self):
        # LOG1 with 32 bytes of data from expanded memory
        code = E.asm(("push", 7), ("push", 0), E.MSTORE,
                     ("push", 0xEE), ("push", 32), ("push", 0),
                     E.LOG0 + 1, E.STOP)
        r = _run(code)
        assert r.gas_used == (3 + 3 + 3 + 3) + (
            3 + 3 + 3 + 375 + 375 + 8 * 32
        )


class TestTxGas:
    def test_erc20_gas_matches_witness(self):
        import sys

        sys.path.insert(0, "tests")
        from test_contract_call import make_erc20_witness

        from ethproof_tpu.evm.contract import consensus_gas_used

        gi = make_erc20_witness()
        assert gi.gas_used_after == consensus_gas_used(gi)
        # both slots pre-populated: two cold accesses + two resets
        assert 30000 < gi.gas_used_after < 40000
        # fresh recipient slot: the reset becomes a 20000 set (mainnet's
        # familiar ~51k ERC-20 transfer shape)
        fresh = make_erc20_witness(bob_tokens=0)
        assert consensus_gas_used(fresh) - gi.gas_used_after == 20000 - 2900

    def test_tampered_gas_fails_binding(self):
        import sys

        sys.path.insert(0, "tests")
        from test_contract_call import MINER, TOKEN, make_erc20_witness

        from ethproof_tpu.evm import contract as C
        from ethproof_tpu.evm.tx import private_key_to_address
        from test_transfer_e2e import PK

        gi = make_erc20_witness()
        gi.gas_used_after += 1  # overcharges the sender
        shape, _, res = C.machine_inputs_for_tx(gi)
        proof = C.ContractCallProof(
            multi=None, shape=shape, machine_pi=list(res.pi_words),
            gen_inputs=gi, sender=private_key_to_address(PK), to=TOKEN,
            miner=MINER, gas_used=gi.gas_used_after,
        )
        assert not C.check_contract_binding(proof)
