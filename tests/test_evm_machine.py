"""EVM machine: trace-gen semantics + in-table constraint satisfaction.

The scalar harness below runs EvmStark.eval row by row over the host
trace with python-int field ops — it checks every in-table constraint
(not lookups/CTLs, which the full multi-table e2e covers in
test_evm_e2e.py)."""

import numpy as np
import pytest

from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.stark.stark import EvalContext
from ethproof_tpu.tables import evm as E

P = fh.P


class ScalarOps:
    def add(self, a, b):
        return (a + b) % P

    def sub(self, a, b):
        return (a - b) % P

    def mul(self, a, b):
        return (a * b) % P

    def constant(self, v):
        return v % P

    def zero(self):
        return 0

    def one(self):
        return 1


class RowConsumer:
    def __init__(self, row, n):
        self.row, self.n = row, n
        self.violations = []

    def _chk(self, v, kind):
        if v % P != 0:
            self.violations.append((self.row, kind, v % P))

    def constraint(self, v):
        self._chk(v, "every")

    def constraint_transition(self, v):
        if self.row < self.n - 1:
            self._chk(v, "transition")

    def constraint_first_row(self, v):
        if self.row == 0:
            self._chk(v, "first")

    def constraint_last_row(self, v):
        if self.row == self.n - 1:
            self._chk(v, "last")


def check_constraints(stark, trace, pis, max_report=8):
    n = trace.shape[1]
    fixed = stark.fixed_columns(n)
    bad = []
    for r in range(n):
        rn = (r + 1) % n
        cons = RowConsumer(r, n)
        ctx = EvalContext(
            ScalarOps(),
            [int(trace[i, r]) for i in range(trace.shape[0])],
            [int(trace[i, rn]) for i in range(trace.shape[0])],
            [int(x) for x in pis],
            cons,
            fixed_local=[int(fixed[i, r]) for i in range(fixed.shape[0])],
            fixed_next=[int(fixed[i, rn]) for i in range(fixed.shape[0])],
        )
        stark.eval(ctx)
        bad.extend(cons.violations)
        if len(bad) >= max_report:
            break
    return bad


def pi_limbs(words):
    out = []
    for w in words:
        out.extend(E._word_limbs(w))
    return out


def run(code, calldata=b"", caller=0xC0FFEE, callvalue=0, storage=None,
        log_rows=9):
    storage = storage or {}
    shape, _inputs, res = E.discover_and_execute(
        code, calldata, caller, callvalue, storage, log_rows
    )
    return shape, res


class TestTraceGen:
    def test_arith_and_return(self):
        code = E.asm(("push", 5), ("push", 7), E.ADD, ("push", 0), E.MSTORE,
                     ("push", 32), ("push", 0), E.RETURN)
        _, res = run(code)
        assert res.success == 1
        assert int.from_bytes(res.return_data, "big") == 12

    def test_storage_roundtrip(self):
        key = 0xDEADBEEF
        code = E.asm(("push", key), E.SLOAD, ("push", 1), E.ADD,
                     ("push", key), E.SSTORE, E.STOP)
        _, res = run(code, storage={key: 41})
        assert res.storage_post == {key: 42}

    def test_keccak_matches_host(self):
        from ethproof_tpu.hash.keccak import keccak256

        code = E.asm(("push", 0x1234), ("push", 0), E.MSTORE,
                     ("push", 32), ("push", 0), E.KECCAK256,
                     ("push", 0), E.MSTORE, ("push", 32), ("push", 0),
                     E.RETURN)
        _, res = run(code)
        assert res.return_data == keccak256((0x1234).to_bytes(32, "big"))

    def test_jumpi_and_calldata(self):
        # returns 1 if calldata word 0 == 99 else 2
        code = E.asm(
            ("push", 0), E.CALLDATALOAD, ("push", 99), E.EQ,
            ("push", 17), E.JUMPI,
            ("push", 2), ("push", 0), E.MSTORE, ("push", 23), E.JUMP,
            E.JUMPDEST,  # pc 17
            ("push", 1), ("push", 0), E.MSTORE,
            E.JUMPDEST,  # pc 23
            ("push", 32), ("push", 0), E.RETURN,
        )
        _, res = run(code, calldata=(99).to_bytes(32, "big"))
        assert int.from_bytes(res.return_data, "big") == 1
        _, res = run(code, calldata=(98).to_bytes(32, "big"))
        assert int.from_bytes(res.return_data, "big") == 2

    def test_revert_success_flag(self):
        code = E.asm(("push", 0), ("push", 0), E.REVERT)
        _, res = run(code)
        assert res.success == 0

    def test_unsupported_opcode_raises(self):
        with pytest.raises(E.Unsupported):
            run(bytes([0x3B]))  # EXTCODESIZE


class TestConstraints:
    def _sat(self, code, calldata=b"", storage=None, **kw):
        shape, res = run(code, calldata=calldata, storage=storage, **kw)
        stark = E.EvmStark(shape)
        bad = check_constraints(stark, res.trace, pi_limbs(res.pi_words))
        assert bad == [], bad[:8]
        return shape, res, stark

    def test_everything_program(self):
        # one program exercising every opcode family
        key = (1 << 160) + 7
        code = E.asm(
            # env + calldata
            E.CALLER, E.POP, E.CALLVALUE, E.POP, E.CALLDATASIZE, E.POP,
            ("push", 0), E.CALLDATALOAD, ("push", 224), E.SHR, E.POP,
            # arithmetic
            ("push", 7), ("push", 5), ("push", 45), E.ADDMOD, E.POP,
            ("push", 5), ("push", 7), ("push", 6), E.MULMOD, E.POP,
            ("push", 9), ("push", 45), E.DIV, E.POP,
            ("push", 7), ("push", 45), E.MOD, E.POP,
            ("push", 3), ("push", 5), E.MUL, ("push", 14), E.ADD,
            ("push", 2), E.SWAP1, E.SUB, E.DUP1, E.GT, E.POP,
            ("push", 1), ("push", 2), E.LT, E.ISZERO, E.POP,
            # logic
            ("push", 0xF0), ("push", 0xCC), E.AND_, E.POP,
            ("push", 0xF0), ("push", 0xCC), E.OR_, ("push", 0xF0),
            E.XOR_, E.NOT_, E.POP,
            ("push", 31), ("push", 0xAB), E.BYTE_, E.POP,
            # memory + keccak
            ("push", 0x42), ("push", 0), E.MSTORE,
            ("push", 0), E.MLOAD, E.POP,
            ("push", 32), ("push", 0), E.KECCAK256, E.POP,
            # storage
            ("push", key), E.SLOAD, ("push", 1), E.ADD,
            ("push", key), E.SSTORE,
            # control flow + event (topic=1, 32 data bytes at offset 0)
            ("push", 1), ("push", 32), ("push", 0),
            E.LOG0 + 1,
            E.PC_OP, E.POP,
            E.STOP,
        )
        shape, res, stark = self._sat(
            code, calldata=b"\x12\x34\x56\x78", storage={key: 5}, log_rows=9
        )
        assert res.storage_post[key] == 6

    def test_tampered_pc_rejected(self):
        code = E.asm(("push", 1), E.POP, E.STOP)
        shape, res = run(code)
        stark = E.EvmStark(shape)
        tr = res.trace.copy()
        tr[E.PC, stark.exec_start + 1] += 1
        bad = check_constraints(stark, tr, pi_limbs(res.pi_words))
        assert bad

    def test_tampered_success_rejected(self):
        code = E.asm(("push", 0), ("push", 0), E.REVERT)
        shape, res = run(code)
        stark = E.EvmStark(shape)
        pis = pi_limbs(res.pi_words)
        pis[16 * shape.pi_layout["success"]] = 1  # claim success
        bad = check_constraints(stark, res.trace, pis)
        assert bad

    def test_tampered_storage_post_rejected(self):
        key = 0xBEEF
        code = E.asm(("push", 7), ("push", key), E.SSTORE, E.STOP)
        shape, res = run(code, storage={key: 1})
        stark = E.EvmStark(shape)
        pis = pi_limbs(res.pi_words)
        pis[16 * (shape.pi_layout["storage"] + 2)] = 9  # forge vpost
        bad = check_constraints(stark, res.trace, pis)
        assert bad
