"""KeccakSponge <-> Keccak <-> Logic <-> Memory integration.

The four tables are proven under one transcript with the CTL wiring the
production prover uses: sponge rows join permutation blocks by PERM_ID,
xor via the Logic table, staged-word reads via the Memory table.
"""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.hash.keccak import keccak256
from ethproof_tpu.stark.multi import CrossTableLookup, prove_multi, verify_multi
from ethproof_tpu.tables import keccak as kt
from ethproof_tpu.tables import keccak_sponge as ks
from ethproof_tpu.tables import logic as lg
from ethproof_tpu.tables import memory as mem

CFG = StarkConfig(
    num_challenges=2,
    fri_config=FriConfig(
        rate_bits=2,
        cap_height=1,
        proof_of_work_bits=4,
        num_query_rounds=8,
        arity_bits=2,
        final_poly_bits=2,
    ),
)

T_KECCAK, T_SPONGE, T_LOGIC, T_MEM = range(4)

CTLS = [
    CrossTableLookup(
        looking=((T_SPONGE, ks.keccak_input_ctl_spec()),),
        looked=(T_KECCAK, kt.KeccakStark().input_ctl_spec()),
    ),
    CrossTableLookup(
        looking=((T_SPONGE, ks.keccak_output_ctl_spec()),),
        looked=(T_KECCAK, kt.KeccakStark().output_ctl_spec()),
    ),
    CrossTableLookup(
        looking=tuple((T_SPONGE, s) for s in ks.logic_ctl_specs()),
        looked=(T_LOGIC, lg.LogicStark.ctl_spec),
    ),
    CrossTableLookup(
        looking=tuple((T_SPONGE, s) for s in ks.memory_ctl_specs()),
        looked=(T_MEM, mem.MemoryStark.ctl_spec),
    ),
]


def _build(messages):
    reqs = [
        ks.HashRequest(ctx=0, seg=3, virt=16 * i, ts=2 + 2 * i, message=m)
        for i, m in enumerate(messages)
    ]
    sp = ks.generate_trace(reqs, 256)
    n_perms = len(sp.perm_inputs)
    n_keccak = 1 << max(7, (24 * n_perms - 1).bit_length())
    keccak_tr = kt.generate_trace(sp.perm_inputs, n_keccak)
    logic_tr, _ = lg.generate_trace(sp.logic_requests, 16)
    mem_tr = mem.generate_trace(sp.mem_ops, 256)
    starks = [kt.KeccakStark(), ks.KeccakSpongeStark(), lg.LogicStark(), mem.MemoryStark()]
    traces = [keccak_tr, sp.trace, logic_tr, mem_tr]
    return starks, traces, sp


class TestSpongeTrace:
    def test_digest_matches_keccak256(self):
        msgs = [b"hello world", b"x" * 200]
        _, _, sp = _build(msgs)
        for m, d in zip(msgs, sp.digests):
            assert d == keccak256(m), (m, d.hex())

    def test_block_counts(self):
        _, _, sp = _build([b"a" * 135, b"a" * 136])
        # 135 bytes -> 1 block; 136 -> full block + empty final block
        assert len(sp.perm_inputs) == 1 + 2


@pytest.mark.slow
class TestSpongeProve:
    def test_integration_roundtrip(self):
        starks, traces, _ = _build([b"hello world"])
        proof = prove_multi(starks, traces, [[], [], [], []], CTLS, CFG)
        assert verify_multi(starks, proof, CTLS, CFG)

    def test_corrupt_digest_rejected(self):
        starks, traces, sp = _build([b"hello world"])
        # tamper the sponge's claimed output state
        final_rows = np.nonzero(traces[T_SPONGE][ks.IS_FINAL])[0]
        traces[T_SPONGE][ks.STATE_OUT[0], final_rows[0]] ^= 1
        proof = prove_multi(starks, traces, [[], [], [], []], CTLS, CFG)
        assert not verify_multi(starks, proof, CTLS, CFG)
