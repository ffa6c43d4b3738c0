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
