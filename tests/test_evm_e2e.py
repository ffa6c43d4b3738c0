"""EVM machine end-to-end: full 7-table prove/verify with CTLs.

Includes a host-side CTL multiset checker (debug oracle) that resolves
every CtlSpec over the host traces and compares looking vs looked
multisets — the same statement the grand-product argument proves.
"""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.tables import all as A
from ethproof_tpu.tables import arithmetic, bytepacking, keccak, keccak_sponge, logic, memory
from ethproof_tpu.tables import evm as E

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


def _resolve(spec, trace, fixed, row):
    def col(i):
        if i < trace.shape[0]:
            return int(trace[i, row])
        return int(fixed[i - trace.shape[0], row])

    out = []
    for c in spec.columns:
        if isinstance(c, int):
            out.append(col(c) % fh.P)
        else:
            v = c.const
            for idx, coeff in c.terms:
                v += coeff * col(idx)
            out.append(v % fh.P)
    return tuple(out)


def ctl_multisets_ok(starks, traces, ctls, max_report=4):
    """Oracle for the grand-product CTL argument: every group's looking
    and looked multisets must be equal."""
    from collections import Counter

    fixeds = [s.fixed_columns(t.shape[1]) for s, t in zip(starks, traces)]
    problems = []
    for g, ctl in enumerate(ctls):
        def side(pairs):
            ms = Counter()
            for tbl, spec in pairs:
                tr, fx = traces[tbl], fixeds[tbl]
                for r in range(tr.shape[1]):
                    if spec.filter_col is not None:
                        f = (
                            int(tr[spec.filter_col, r])
                            if spec.filter_col < tr.shape[0]
                            else int(fx[spec.filter_col - tr.shape[0], r])
                        )
                        if f == 0:
                            continue
                        assert f == 1, (g, tbl, r, f)
                    ms[_resolve(spec, tr, fx, r)] += 1
            return ms

        looking = side(ctl.looking)
        looked = side([ctl.looked])
        if looking != looked:
            only_a = list((looking - looked).items())[:max_report]
            only_b = list((looked - looking).items())[:max_report]
            problems.append((g, only_a, only_b))
    return problems


def build(code, calldata=b"", caller=0xC0FFEE, callvalue=0, storage=None,
          log_rows=9):
    storage = storage or {}
    shape, _inputs, res = E.discover_and_execute(
        code, calldata, caller, callvalue, storage, log_rows
    )
    machine = E.EvmStark(shape)
    return shape, machine, res


def make_traces(shape, res, sizes):
    arith_tr, _ = arithmetic.generate_trace(res.arith_requests, 1 << sizes.arithmetic)
    bp_tr, bp_mem = bytepacking.generate_trace(res.pack_requests, 1 << sizes.bytepacking)
    sponge = keccak_sponge.generate_trace(list(res.hash_requests), 1 << sizes.keccak_sponge)
    logic_tr, _ = logic.generate_trace(
        res.logic_requests + sponge.logic_requests, 1 << sizes.logic
    )
    mem_tr = memory.generate_trace(
        res.mem_ops + bp_mem + sponge.mem_ops, 1 << sizes.memory
    )
    keccak_tr = keccak.generate_trace(sponge.perm_inputs, 1 << sizes.keccak)
    return [res.trace, arith_tr, logic_tr, bp_tr, mem_tr, keccak_tr, sponge.trace]


SIZES = A.TableSizes(
    cpu=9, arithmetic=8, logic=9, bytepacking=9, memory=13, keccak=6,
    keccak_sponge=8,
)

CODE = E.asm(
    # storage[key] += calldata word at 4; hash a scratch pair; return 1
    ("push", 4), E.CALLDATALOAD,
    ("push", 0xBEEF), E.SLOAD, E.ADD,
    ("push", 0xBEEF), E.SSTORE,
    E.CALLER, ("push", 0), E.MSTORE,
    ("push", 0xBEEF), ("push", 32), E.MSTORE,
    ("push", 64), ("push", 0), E.KECCAK256, E.POP,
    ("push", 1), ("push", 0), E.MSTORE,
    ("push", 32), ("push", 0), E.RETURN,
)
CALLDATA = bytes([0xA9, 0x05, 0x9C, 0xBB]) + (7).to_bytes(32, "big")


@pytest.fixture(scope="module")
def setup():
    shape, machine, res = build(CODE, CALLDATA, storage={0xBEEF: 35})
    return shape, machine, res


class TestCtlMultisets:
    def test_ctl_multisets_match(self, setup):
        shape, machine, res = setup
        traces = make_traces(shape, res, SIZES)
        starks = A.all_starks(machine, with_keccak=True)
        problems = ctl_multisets_ok(starks, traces, A.build_ctls_evm(machine))
        assert problems == [], problems


class TestEvmE2E:
    def test_prove_verify(self, setup):
        shape, machine, res = setup
        assert res.storage_post == {0xBEEF: 42}
        proof = A.prove_evm_tables(machine, res, SIZES, CFG)
        assert A.verify_evm_tables(machine, res.pi_words, proof, CFG)
        # tampered public input (forged post-storage) must fail
        bad = list(res.pi_words)
        bad[shape.pi_layout["storage"] + 3] = 41
        assert not A.verify_evm_tables(machine, bad, proof, CFG)


class TestCallCtlMultisets:
    def test_precompile_call_ctls(self):
        import hashlib

        code = E.asm(
            ("push", 0xDEAD), ("push", 0), E.MSTORE,
            ("push", 32), ("push", 64), ("push", 32), ("push", 0),
            ("push", 2), ("push", 50000), E.STATICCALL, E.POP,
            E.RETURNDATASIZE, E.POP,
            ("push", 32), ("push", 0), ("push", 96), E.RETURNDATACOPY,
            ("push", 96), E.MLOAD, ("push", 0), E.MSTORE,
            ("push", 32), ("push", 0), E.RETURN,
        )
        shape, machine, res = build(code, log_rows=10)
        assert res.return_data == hashlib.sha256(
            (0xDEAD).to_bytes(32, "big")
        ).digest()
        sizes = A.TableSizes(
            cpu=10, arithmetic=8, logic=9, bytepacking=10, memory=13,
            keccak=6, keccak_sponge=8,
        )
        traces = make_traces(shape, res, sizes)
        starks = A.all_starks(machine, with_keccak=True)
        problems = ctl_multisets_ok(starks, traces, A.build_ctls_evm(machine))
        assert problems == [], problems


class TestExpCtlMultisets:
    def test_exp_ctls(self):
        code = E.asm(
            ("push", (0xABCD << 64) | 0x1234, 32), ("push", 3), E.EXP,
            ("push", 0), E.MSTORE,
            ("push", 32), ("push", 0), E.RETURN,
        )
        shape, machine, res = build(code, log_rows=11)
        assert int.from_bytes(res.return_data, "big") == pow(
            3, (0xABCD << 64) | 0x1234, 1 << 256
        )
        sizes = A.TableSizes(
            cpu=11, arithmetic=16, logic=9, bytepacking=9, memory=13,
            keccak=6, keccak_sponge=8,
        )
        traces = make_traces(shape, res, sizes)
        starks = A.all_starks(machine, with_keccak=True)
        problems = ctl_multisets_ok(starks, traces, A.build_ctls_evm(machine))
        assert problems == [], problems


class TestNewPrecompileCtls:
    """Precompiles 0x05-0x09 (modexp, bn128 add/mul, blake2f) through the
    PI-bound call directory: result correctness + CTL multiset closure.
    Golden values are independent (pow(), EIP-196 2G point, the EIP-152
    RFC 7693 test vector)."""

    SIZES = A.TableSizes(
        cpu=10, arithmetic=8, logic=9, bytepacking=10, memory=13,
        keccak=7, keccak_sponge=8,
    )

    def _check(self, code, expect, log_rows=10):
        shape, machine, res = build(code, log_rows=log_rows)
        assert res.success == 1
        assert res.return_data == expect, (
            res.return_data.hex(), expect.hex()
        )
        traces = make_traces(shape, res, self.SIZES)
        starks = A.all_starks(machine, with_keccak=True)
        problems = ctl_multisets_ok(starks, traces, A.build_ctls_evm(machine))
        assert problems == [], problems

    def test_modexp(self):
        # 3^5 mod 7 with 32-byte operands; retLen pinned to msize
        stores = []
        for i, w in enumerate((32, 32, 32, 3, 5, 7)):
            stores += [("push", w), ("push", 32 * i), E.MSTORE]
        code = E.asm(
            *stores,
            ("push", 32), ("push", 192), ("push", 192), ("push", 0),
            ("push", 5), ("push", 50000), E.STATICCALL, E.POP,
            ("push", 32), ("push", 192), E.RETURN,
        )
        self._check(code, pow(3, 5, 7).to_bytes(32, "big"))

    def test_bn128_add(self):
        # G + G = 2G (generator (1, 2))
        two_g = (
            0x030644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD3,
            0x15ED738C0E0A7C92E7845F96B2AE9C0A68A6A449E3538FC7FF3EBF7A5A18A2C4,
        )
        stores = []
        for i, w in enumerate((1, 2, 1, 2)):
            stores += [("push", w), ("push", 32 * i), E.MSTORE]
        code = E.asm(
            *stores,
            ("push", 64), ("push", 128), ("push", 128), ("push", 0),
            ("push", 6), ("push", 50000), E.STATICCALL, E.POP,
            ("push", 64), ("push", 128), E.RETURN,
        )
        self._check(
            code, two_g[0].to_bytes(32, "big") + two_g[1].to_bytes(32, "big")
        )

    def test_bn128_mul(self):
        from ethproof_tpu.tables.evm import _bn128_mul

        k = 9
        x, y = _bn128_mul((1, 2), k)
        # independent check: 9G by repeated addition
        from ethproof_tpu.tables.evm import _bn128_add

        acc = None
        for _ in range(k):
            acc = _bn128_add(acc, (1, 2)) if acc else (1, 2)
        assert (x, y) == acc
        stores = []
        for i, w in enumerate((1, 2, k)):
            stores += [("push", w), ("push", 32 * i), E.MSTORE]
        code = E.asm(
            *stores,
            ("push", 64), ("push", 96), ("push", 96), ("push", 0),
            ("push", 7), ("push", 50000), E.STATICCALL, E.POP,
            ("push", 64), ("push", 96), E.RETURN,
        )
        self._check(code, x.to_bytes(32, "big") + y.to_bytes(32, "big"))

    def test_blake2f(self):
        inp = bytes.fromhex(
            "0000000c"
            "48c9bdf267e6096a3ba7ca8485ae67bb2bf894fe72f36e3cf1361d5f3af54fa5"
            "d182e6ad7f520e511f6c3e2b8c68059b6bbd41fbabd9831f79217e1319cde05b"
            "6162630000000000000000000000000000000000000000000000000000000000"
            "0000000000000000000000000000000000000000000000000000000000000000"
            "0000000000000000000000000000000000000000000000000000000000000000"
            "0000000000000000000000000000000000000000000000000000000000000000"
            "0300000000000000"
            "0000000000000000"
            "01"
        )
        assert len(inp) == 213
        exp = bytes.fromhex(
            "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1"
            "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923"
        )
        padded = inp.ljust(224, b"\0")
        stores = []
        for i in range(7):
            stores += [
                ("push", int.from_bytes(padded[32 * i : 32 * i + 32], "big"), 32),
                ("push", 32 * i), E.MSTORE,
            ]
        code = E.asm(
            *stores,
            ("push", 64), ("push", 224), ("push", 213), ("push", 0),
            ("push", 9), ("push", 50000), E.STATICCALL, E.POP,
            ("push", 64), ("push", 224), E.RETURN,
        )
        self._check(code, exp)

    def test_gas_starved_call_unsupported(self):
        # forwarding less than the precompile cost must leave the
        # envelope at generation time, not prove success=1
        code = E.asm(
            ("push", 3), ("push", 0), E.MSTORE,
            ("push", 32), ("push", 32), ("push", 32), ("push", 0),
            ("push", 2), ("push", 50), E.STATICCALL, E.POP, E.STOP,
        )
        with pytest.raises(E.Unsupported):
            build(code, log_rows=10)
