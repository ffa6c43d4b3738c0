"""Kernel-assembler gadget tests: host-model vs. the CPU executor.

Every gadget builds in concrete mode, then the emitted program is run by
`tables.cpu.execute` on the same witness stream — the executor's register
file must agree with the builder's host model, and assertion gadgets must
raise on bad witnesses. These are executor-level tests; the STARK-level
binding is covered by test_binding / test_transfer_e2e.
"""

import pytest

from ethproof_tpu.evm.kasm import KAsm, le_word
from ethproof_tpu.hash.keccak import keccak256
from ethproof_tpu.tables.cpu import execute


def run(k: KAsm, regs, pi_words=()):
    res = execute(k.prog, list(pi_words), 1 << max(len(k.prog).bit_length(), 4),
                  witness=list(k.witness))
    import numpy as np
    from ethproof_tpu.tables.cpu import OUT

    # rebuild the final register file from the trace's dst writes
    final = {}
    for clk, ins in enumerate(k.prog):
        if ins.op == 0:
            continue
        val = 0
        for i in reversed(range(16)):
            val = (val << 16) | int(res.trace[OUT[i], clk])
        final[ins.dst] = val
    return {r: final.get(r, 0) for r in regs}


def test_arith_gadgets_match_model():
    k = KAsm()
    a, b = k.const(0xDEADBEEF), k.const(12345)
    s = k.add(a, b)
    d = k.sub(a, b)
    m = k.mul(a, b)
    q = k.div(a, b)
    r = k.mod(a, b)
    lo = k.shr(a, k.const(8))
    hi = k.shl(a, k.const(200))
    regs = [s, d, m, q, r, lo, hi]
    out = run(k, regs)
    for reg in regs:
        assert out[reg] == k.val(reg), f"reg {reg}"
    assert out[s] == 0xDEADBEEF + 12345
    assert out[q] == 0xDEADBEEF // 12345
    assert out[hi] == (0xDEADBEEF << 200) % (1 << 256)


def test_select_eq_iszero():
    k = KAsm()
    one, five = k.const(1), k.const(5)
    t = k.select(k.eq(five, k.const(5)), one, five)
    f = k.select(k.eq(five, k.const(6)), one, five)
    z = k.is_zero(k.sub(five, five))
    out = run(k, [t, f, z])
    assert out[t] == 1 and out[f] == 5 and out[z] == 1


def test_wit_bool_rejects_nonbool():
    k = KAsm()
    with pytest.raises(AssertionError):
        k.wit_bool(lambda: 2)


def test_assert0_raises_in_model_and_executor():
    k = KAsm()
    k.assert0(k.const(0))  # fine
    with pytest.raises(AssertionError):
        k.assert0(k.const(3))


def test_dynamic_load_roundtrip():
    k = KAsm(region_words=8)
    base = k.alloc_region(8)
    vals = [le_word(bytes([i + 1] * 32)) for i in range(8)]
    for i, v in enumerate(vals):
        k.wit_to(base + i, lambda v=v: v)
    idx = k.wit(lambda: 5)
    got = k.loadw(k.add(k.const(base), idx))
    out = run(k, [got])
    assert out[got] == vals[5]


def test_byte_at_and_extract_across_blocks():
    # message spanning 2 rate blocks incl. the 8-byte tail word
    msg = bytes((7 * i + 3) % 256 for i in range(200))
    k = KAsm(region_words=10)
    base = k.alloc_region(10)
    k.stage_bytes(base, lambda: msg, 10)
    # byte probes incl. tail-word (128..135) and block-2 positions
    probes = [0, 31, 32, 127, 128, 135, 136, 199]
    regs = []
    for p in probes:
        off = k.wit(lambda p=p: p)
        regs.append(k.byte_at(base, off))
    # 32-byte windows at awkward offsets: word-straddle, tail-straddle,
    # block-straddle, aligned
    wins = [0, 17, 100, 110, 120, 128, 136, 96, 168]
    for w in wins:
        off = k.wit(lambda w=w: w)
        regs.append(k.extract(base, off, 32))
    # short extracts
    shorts = [(5, 1), (133, 4), (130, 8), (0, 32)]
    for off_v, nb in shorts:
        off = k.wit(lambda off_v=off_v: off_v)
        regs.append(k.extract(base, off, nb))
    out = run(k, regs)
    i = 0
    for p in probes:
        assert out[regs[i]] == msg[p], f"byte_at({p})"
        i += 1
    for w in wins:
        assert out[regs[i]] == le_word(msg[w : w + 32]), f"extract({w}, 32)"
        i += 1
    for off_v, nb in shorts:
        assert out[regs[i]] == le_word(msg[off_v : off_v + nb]), (
            f"extract({off_v}, {nb})"
        )
        i += 1


def test_be_value():
    k = KAsm()
    raw = bytes.fromhex("01020304")
    x = k.const(le_word(raw))
    v = k.be_value(x, k.const(4), 8)
    zero = k.be_value(k.const(0), k.const(0), 8)
    out = run(k, [v, zero])
    assert out[v] == 0x01020304
    assert out[zero] == 0


def test_keccak_region_digest_value():
    msg = b"trie node bytes" * 9  # 135 bytes -> 1 block
    k = KAsm(region_words=5)
    base = k.alloc_region(5)
    k.stage_bytes(base, lambda: msg, 5)
    d = k.keccak_region(base, ts=10_000, blocks=1, msg_fn=lambda: msg)
    assert k.val(d) == le_word(keccak256(msg))
    reqs = k.hash_requests()
    assert len(reqs) == 1 and not reqs[0].staged and reqs[0].virt == base
    out = run(k, [d])
    assert out[d] == le_word(keccak256(msg))


def test_program_shape_witness_independent():
    def build(concrete, msg):
        k = KAsm(concrete=concrete, region_words=5)
        base = k.alloc_region(5)
        k.stage_bytes(base, lambda: msg, 5)
        off = k.wit(lambda: 3)
        k.extract(base, off, 16)
        k.keccak_region(base, ts=9_999, blocks=1, msg_fn=lambda: msg)
        return k.prog

    p1 = build(True, b"abc" * 20)
    p2 = build(False, None)
    assert p1 == p2
