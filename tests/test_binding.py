"""In-circuit MPT binding tests.

Executor tier (fast): the binding kernel's asserts all hold on honest
witnesses for every overlap variant, the program shape is witness-
independent, and tampered witnesses (wrong balance, wrong node bytes,
wrong root) are rejected by the same asserts the STARK arithmetizes.
STARK tier (--runslow): a full 7-table proof with the binding section
verifies, and a tampered post-root fails verification with host-side
trie checks DISABLED — the soundness claim of evm/binding.py.
"""

import sys

import pytest

sys.path.insert(0, "tests")
from test_transfer_e2e import CFG, make_transfer_witness

from ethproof_tpu.evm.binding import (
    KernelShape,
    Unsupported,
    build_binding_witness,
    walk_path,
)
from ethproof_tpu.evm.transfer import (
    NUM_PI_WORDS,
    PI_STATE_ROOT_POST,
    _binding_finals,
    build_kernel,
    derive_pi_words,
    overlap_pattern,
)
from ethproof_tpu.hash.keccak import keccak256
from ethproof_tpu.tables.cpu import execute
from ethproof_tpu.trie.nibbles import Nibbles

SHAPE = KernelShape(levels=3, node_words=10)


def _setup(**kw):
    gi = make_transfer_witness(**kw)
    pi, s, r, m = derive_pi_words(gi)
    overlap = overlap_pattern(s, r, m)
    bw = build_binding_witness(
        gi.tries.state_trie, _binding_finals(gi, pi, s, r, m), SHAPE
    )
    return gi, pi, overlap, bw


def _run(overlap, pi, bw):
    k = build_kernel(overlap, SHAPE, pi, bw)
    n = 1 << (len(k.prog) - 1).bit_length()
    execute(k.prog, pi, n, witness=k.witness)
    return k


def test_binding_kernel_honest_distinct():
    gi, pi, overlap, bw = _setup()
    assert overlap == "distinct" and len(bw.updates) == 3
    k = _run(overlap, pi, bw)
    # witness-independent program shape
    assert k.prog == build_kernel(overlap, SHAPE).prog


@pytest.mark.parametrize(
    "kw,expect",
    [
        ({"miner_is_sender": True}, "s_eq_m"),
        ({"recipient_is_sender": True}, "s_eq_r"),
        ({"miner_is_recipient": True}, "r_eq_m"),
        ({"miner_is_sender": True, "recipient_is_sender": True}, "all_eq"),
    ],
)
def test_binding_kernel_honest_overlaps(kw, expect):
    gi, pi, overlap, bw = _setup(**kw)
    assert overlap == expect
    _run(overlap, pi, bw)


def test_tampered_balance_pi_rejected():
    gi, pi, overlap, bw = _setup()
    bad = list(pi)
    bad[7] += 1  # claim the sender kept one extra wei
    # transfer arithmetic itself rejects (PI7 = deducted amount), so give
    # the arithmetic consistent-but-false words: bump pre AND post
    bad[1] += 1
    bad[7] += 0
    with pytest.raises(AssertionError):
        # the leaf pre-balance no longer matches the trie leaf
        build_kernel(overlap, SHAPE, bad, bw)


def test_tampered_node_rejected():
    gi, pi, overlap, bw = _setup()
    # flip one byte inside the root node of the sender path: containment
    # vs the PI root digest must fail
    n0 = bytearray(bw.updates[0].pre.nodes[0])
    n0[len(n0) // 2] ^= 1
    bw.updates[0].pre.nodes[0] = bytes(n0)
    with pytest.raises(AssertionError):
        build_kernel(overlap, SHAPE, pi, bw)


def test_tampered_post_root_rejected():
    gi, pi, overlap, bw = _setup()
    bad = list(pi)
    bad[PI_STATE_ROOT_POST] ^= 1
    with pytest.raises(AssertionError):
        build_kernel(overlap, SHAPE, bad, bw)


def test_wrong_child_index_rejected():
    gi, pi, overlap, bw = _setup()
    # point the sender path at a different branch child
    bw.updates[0].pre.idxs[0] = (bw.updates[0].pre.idxs[0] + 1) % 16
    with pytest.raises(AssertionError):
        build_kernel(overlap, SHAPE, pi, bw)


def test_unsupported_shapes_raise():
    gi, pi, overlap, _ = _setup()
    tight = KernelShape(levels=1, node_words=10)  # depth-2 paths don't fit
    with pytest.raises(Unsupported):
        build_binding_witness(
            gi.tries.state_trie,
            _binding_finals(gi, pi, *_roles(gi)),
            tight,
        )
    # absent account
    with pytest.raises(Unsupported):
        walk_path(gi.tries.state_trie, Nibbles.from_bytes(keccak256(b"\xee" * 20)))


def _roles(gi):
    pi, s, r, m = derive_pi_words(gi)
    return s, r, m


def test_num_pi_words():
    assert NUM_PI_WORDS == 13


@pytest.mark.slow
def test_binding_stark_e2e_and_soundness():
    """Full 7-table proof with the binding section (single-account
    all_eq overlap: the smallest bound kernel); then tamper the post
    root and check the STARK alone rejects (host trie checks skipped)."""
    from ethproof_tpu.evm.transfer import prove_transfer, verify_transfer
    from ethproof_tpu.tables.all import TableSizes

    gi = make_transfer_witness(
        miner_is_sender=True, recipient_is_sender=True, gas_price=1,
        sender_bal=30000,
    )
    shape = KernelShape(levels=2, node_words=10)
    # arithmetic needs its 2^16 production floor: comparisons of 256-bit
    # digests produce wrapped-difference limbs up to 65535
    sizes = TableSizes(
        cpu=12, arithmetic=16, logic=6, bytepacking=9, memory=14,
        keccak=8, keccak_sponge=8,
    )
    proof = prove_transfer(gi, CFG, sizes, binding=shape)
    assert proof.binding_shape == shape
    assert verify_transfer(proof, CFG)

    # tamper: claim a different post state root. Host layers are skipped
    # (skip_stark checks only those); the STARK must reject on its own.
    from ethproof_tpu.evm.transfer import transfer_cpu_stark
    from ethproof_tpu.tables.all import verify_all_tables

    cpu = transfer_cpu_stark(proof.overlap, proof.binding_shape)
    good_pi = list(proof.pi_words)
    bad_pi = list(good_pi)
    bad_pi[PI_STATE_ROOT_POST] ^= 1
    assert verify_all_tables(cpu, good_pi, proof.multi, CFG)
    assert not verify_all_tables(cpu, bad_pi, proof.multi, CFG)
