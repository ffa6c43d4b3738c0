"""ERC-20 transfer on the EVM machine: the flagship contract workload.

Semantics, constraint satisfaction, CTL multisets, and (slow tier) the
full 7-table prove/verify.
"""

import pytest

import sys

sys.path.insert(0, "tests")
from test_evm_machine import check_constraints, pi_limbs
from test_evm_e2e import CFG, ctl_multisets_ok, make_traces

from ethproof_tpu.evm import erc20
from ethproof_tpu.tables import all as A
from ethproof_tpu.tables import evm as E

ALICE = 0xA11CE00000000000000000000000000000000001
BOB = 0xB0B0000000000000000000000000000000000002

# arithmetic at its 2^16 production floor: ERC-20 operands (160-bit
# addresses, keccak slots) carry full 16-bit limbs
SIZES = A.TableSizes(
    cpu=9, arithmetic=16, logic=9, bytepacking=9, memory=13, keccak=7,
    keccak_sponge=8,
)


def run_transfer(caller, to, amount, balances):
    shape, inputs = erc20.transfer_inputs(caller, to, amount, balances)
    shape, inputs, res = E.discover_and_execute(
        inputs.code, inputs.calldata, inputs.caller, inputs.callvalue,
        inputs.storage_pre, shape.log_rows,
    )
    return shape, inputs, res


class TestSemantics:
    def test_success_path(self):
        shape, _, res = run_transfer(ALICE, BOB, 30, {ALICE: 100, BOB: 5})
        assert res.success == 1
        assert int.from_bytes(res.return_data, "big") == 1
        assert res.storage_post[erc20.balance_slot(ALICE)] == 70
        assert res.storage_post[erc20.balance_slot(BOB)] == 35
        # Transfer event with the right topics and data
        (topics, data) = res.logs[0]
        assert topics == [erc20.TRANSFER_TOPIC, ALICE, BOB]
        assert int.from_bytes(data, "big") == 30

    def test_insufficient_balance_reverts(self):
        shape, _, res = run_transfer(ALICE, BOB, 101, {ALICE: 100})
        assert res.success == 0
        assert res.logs == []

    def test_self_transfer(self):
        shape, _, res = run_transfer(ALICE, ALICE, 10, {ALICE: 100})
        assert res.success == 1
        assert res.storage_post[erc20.balance_slot(ALICE)] == 100

    def test_unknown_selector_reverts(self):
        shape, inputs = erc20.transfer_inputs(ALICE, BOB, 1, {ALICE: 5})
        bad_calldata = b"\xde\xad\xbe\xef" + inputs.calldata[4:]
        shape2 = E.EvmShape(
            shape.code_len, len(bad_calldata), shape.n_skeys, shape.log_rows
        )
        res = E.execute_evm(
            shape2,
            E.EvmInputs(inputs.code, bad_calldata, ALICE, 0, inputs.storage_pre),
        )
        assert res.success == 0

    def test_address_masking(self):
        dirty_to = (0xFF << 160) | BOB  # high bits must be masked off
        _, inputs = erc20.transfer_inputs(ALICE, BOB, 7, {ALICE: 10})
        calldata = erc20.transfer_calldata(dirty_to, 7)
        _, _, res = E.discover_and_execute(
            inputs.code, calldata, ALICE, 0, inputs.storage_pre,
            log_rows=9,
        )
        assert res.storage_post[erc20.balance_slot(BOB)] == 7


class TestProof:
    @pytest.fixture(scope="class")
    def setup(self):
        shape, _, res = run_transfer(ALICE, BOB, 30, {ALICE: 100, BOB: 5})
        return shape, E.EvmStark(shape), res

    def test_constraints_satisfied(self, setup):
        shape, machine, res = setup
        bad = check_constraints(machine, res.trace, pi_limbs(res.pi_words))
        assert bad == [], bad[:8]

    def test_ctl_multisets(self, setup):
        shape, machine, res = setup
        traces = make_traces(shape, res, SIZES)
        starks = A.all_starks(machine, with_keccak=True)
        problems = ctl_multisets_ok(starks, traces, A.build_ctls_evm(machine))
        assert problems == [], problems

    @pytest.mark.slow
    def test_prove_verify(self, setup):
        shape, machine, res = setup
        proof = A.prove_evm_tables(machine, res, SIZES, CFG)
        assert A.verify_evm_tables(machine, res.pi_words, proof, CFG)
        bad = list(res.pi_words)
        # forge the recipient's post balance
        bad[shape.pi_layout["storage"] + 7] += 1
        assert not A.verify_evm_tables(machine, bad, proof, CFG)
