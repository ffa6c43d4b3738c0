"""Arithmetic table: 256-bit ADD / SUB / LT / MUL over 16-bit limbs.

Reference equivalent: evm_arithmetization's Arithmetic STARK (add/mul/
sub/cmp over 256-bit operands in 16-bit limbs, range-checked) [dep: from
knowledge; pin /root/reference/Cargo.lock:1675; table named at
/root/reference/common/src/prover_state/circuit.rs:61].

Limb equations hold over the integers (all terms < 2^40 << p), so the
field constraints pin the exact 2^256-modular results:

- ADD: in0_i + in1_i + c_{i-1} = out_i + 2^16 c_i, carries boolean.
- SUB: in0_i - in1_i - b_{i-1} + 2^16 b_i = out_i, borrows boolean.
- LT : the SUB borrow chain run on scratch limbs; out = final borrow.
- MUL: sum_{i+j=k} in0_i in1_j + carry_{k-1} = out_k + 2^16 carry_k,
  carry_k = mclo_k + 2^16 mchi_k, both 16-bit (bounds the carry < 2^32,
  which keeps every equation exact over Z — soundness needs no tighter
  bound). Overflow past limb 15 is discarded: mod-2^256 semantics.

All value/scratch limbs are range-checked to 16 bits by one logUp
against the row-counter column — the production table therefore runs at
degree >= 16 (the reference's ARITHMETIC minimum, circuit.rs:77-87).

CTL surface: (op_id, in0, in1, out) filtered by `filter`, looked up by
the CPU table.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..stark.stark import CtlSpec, LookupSpec, Stark
from .common import Cols, LIMB_BASE, N_LIMBS, int_to_limbs, limbs_to_int

OP_ADD, OP_SUB, OP_LT, OP_MUL = 1, 2, 3, 4

_c = Cols()
IS_ADD = _c.one()
IS_SUB = _c.one()
IS_LT = _c.one()
IS_MUL = _c.one()
OP_ID = _c.one()
FILTER = _c.one()
IN0 = _c.many(N_LIMBS)
IN1 = _c.many(N_LIMBS)
OUT = _c.many(N_LIMBS)
CARRY = _c.many(N_LIMBS)  # boolean carry/borrow chain (add/sub/lt)
SCRATCH = _c.many(N_LIMBS)  # LT difference limbs (16-bit)
MCLO = _c.many(N_LIMBS)  # mul carry low 16 bits
MCHI = _c.many(N_LIMBS)  # mul carry high bits (16-bit checked)
COUNTER = _c.one()
RC_MULT = _c.one()
NUM_COLUMNS = _c.count

RANGE_CHECKED = IN0 + IN1 + OUT + SCRATCH + MCLO + MCHI


class ArithmeticStark(Stark):
    num_columns = NUM_COLUMNS
    num_public_inputs = 0
    constraint_degree = 3
    lookups = [
        LookupSpec(
            looking_cols=tuple(RANGE_CHECKED),
            table_col=COUNTER,
            multiplicity_col=RC_MULT,
        )
    ]

    # CPU-facing lookup tuple
    ctl_spec = CtlSpec(
        columns=tuple([OP_ID] + IN0 + IN1 + OUT), filter_col=FILTER
    )

    def eval(self, ctx):
        c, o = ctx.consumer, ctx.ops
        one = o.one()
        sels = [ctx.local(i) for i in (IS_ADD, IS_SUB, IS_LT, IS_MUL)]
        for s in sels:
            c.constraint(o.mul(s, o.sub(s, one)))
        filt = ctx.local(FILTER)
        acc = sels[0]
        for s in sels[1:]:
            acc = o.add(acc, s)
        c.constraint(o.sub(filt, acc))
        c.constraint(o.mul(filt, o.sub(filt, one)))  # at most one op per row
        # op id linkage
        op = o.mul(o.constant(OP_ADD), sels[0])
        for w, s in zip((OP_SUB, OP_LT, OP_MUL), sels[1:]):
            op = o.add(op, o.mul(o.constant(w), s))
        c.constraint(o.sub(ctx.local(OP_ID), op))

        base = o.constant(LIMB_BASE)
        is_add, is_sub, is_lt, is_mul = sels
        carries = [ctx.local(i) for i in CARRY]
        for cy in carries:
            c.constraint(o.mul(cy, o.sub(cy, one)))

        # ADD / SUB / LT limb chains
        for i in range(N_LIMBS):
            a = ctx.local(IN0[i])
            b = ctx.local(IN1[i])
            out = ctx.local(OUT[i])
            cin = carries[i - 1] if i > 0 else o.zero()
            # add: a + b + cin - out - base*cout = 0
            c.constraint(
                o.mul(
                    is_add,
                    o.sub(
                        o.add(o.add(a, b), cin),
                        o.add(out, o.mul(base, carries[i])),
                    ),
                )
            )
            # sub: a - b - bin + base*bout - out = 0
            sub_expr = o.sub(
                o.add(o.sub(o.sub(a, b), cin), o.mul(base, carries[i])), out
            )
            c.constraint(o.mul(is_sub, sub_expr))
            # lt: same chain with scratch difference limbs
            d = ctx.local(SCRATCH[i])
            lt_expr = o.sub(
                o.add(o.sub(o.sub(a, b), cin), o.mul(base, carries[i])), d
            )
            c.constraint(o.mul(is_lt, lt_expr))
        # lt output: out_0 = final borrow, out_i>0 = 0
        c.constraint(o.mul(is_lt, o.sub(ctx.local(OUT[0]), carries[N_LIMBS - 1])))
        for i in range(1, N_LIMBS):
            c.constraint(o.mul(is_lt, ctx.local(OUT[i])))

        # MUL: schoolbook low half with 32-bit carries
        prev_carry = o.zero()
        for k in range(N_LIMBS):
            acc = None
            for i in range(k + 1):
                j = k - i
                term = o.mul(ctx.local(IN0[i]), ctx.local(IN1[j]))
                acc = term if acc is None else o.add(acc, term)
            carry_k = o.add(
                ctx.local(MCLO[k]), o.mul(base, ctx.local(MCHI[k]))
            )
            expr = o.sub(
                o.add(acc, prev_carry),
                o.add(ctx.local(OUT[k]), o.mul(base, carry_k)),
            )
            c.constraint(o.mul(is_mul, expr))
            prev_carry = carry_k

        # counter column: 0, 1, 2, ... (the range table)
        c.constraint_first_row(ctx.local(COUNTER))
        c.constraint_transition(
            o.sub(ctx.next(COUNTER), o.add(ctx.local(COUNTER), one))
        )


def generate_trace(
    requests: List[Tuple[int, int, int]], n_rows: int
) -> Tuple[np.ndarray, List[int]]:
    """requests: [(op, a, b)] -> (trace (NUM_COLUMNS, n_rows) u64, results).

    n_rows must be >= 2^16 for sound range checks in production; tests may
    use smaller tables with small values.
    """
    assert len(requests) <= n_rows
    tr = np.zeros((NUM_COLUMNS, n_rows), dtype=np.uint64)
    tr[COUNTER] = np.arange(n_rows, dtype=np.uint64)
    results: List[int] = []
    mult = np.zeros(n_rows, dtype=np.uint64)

    def rc(v: int) -> int:
        assert 0 <= v < n_rows, f"range-checked value {v} exceeds table size"
        mult[v] += 1
        return v

    for r, (op, a, b) in enumerate(requests):
        a_l, b_l = int_to_limbs(a), int_to_limbs(b)
        tr[OP_ID, r] = op
        tr[FILTER, r] = 1
        for i in range(N_LIMBS):
            tr[IN0[i], r] = rc(a_l[i])
            tr[IN1[i], r] = rc(b_l[i])
        if op == OP_ADD:
            tr[IS_ADD, r] = 1
            res = (a + b) % (1 << 256)
            out_l = int_to_limbs(res)
            carry = 0
            for i in range(N_LIMBS):
                s = a_l[i] + b_l[i] + carry
                carry = s >> 16
                tr[CARRY[i], r] = carry
                tr[OUT[i], r] = rc(out_l[i])
            for i in range(N_LIMBS):
                rc(0), rc(0), rc(0)  # scratch/mclo/mchi are zero
        elif op in (OP_SUB, OP_LT):
            diff = (a - b) % (1 << 256)
            d_l = int_to_limbs(diff)
            borrow = 0
            borrows = []
            for i in range(N_LIMBS):
                s = a_l[i] - b_l[i] - borrow
                borrow = 1 if s < 0 else 0
                borrows.append(borrow)
                tr[CARRY[i], r] = borrow
            if op == OP_SUB:
                tr[IS_SUB, r] = 1
                res = diff
                for i in range(N_LIMBS):
                    tr[OUT[i], r] = rc(d_l[i])
                    rc(0), rc(0), rc(0)
            else:
                tr[IS_LT, r] = 1
                res = 1 if a < b else 0
                tr[OUT[0], r] = rc(res)
                for i in range(1, N_LIMBS):
                    tr[OUT[i], r] = rc(0)
                for i in range(N_LIMBS):
                    tr[SCRATCH[i], r] = rc(d_l[i])
                    rc(0), rc(0)  # mclo/mchi zero
        elif op == OP_MUL:
            tr[IS_MUL, r] = 1
            res = (a * b) % (1 << 256)
            out_l = int_to_limbs(res)
            carry = 0
            for k in range(N_LIMBS):
                acc = sum(a_l[i] * b_l[k - i] for i in range(k + 1)) + carry
                out_k = acc & 0xFFFF
                assert out_k == out_l[k]
                carry = acc >> 16
                tr[OUT[k], r] = rc(out_k)
                tr[MCLO[k], r] = rc(carry & 0xFFFF)
                tr[MCHI[k], r] = rc(carry >> 16)
            for i in range(N_LIMBS):
                rc(0)  # scratch zero
        else:
            raise ValueError(f"unknown arithmetic op {op}")
        results.append(res)

    # padding rows: all-zero values still hit the range table (value 0)
    mult[0] += (n_rows - len(requests)) * len(RANGE_CHECKED)
    tr[RC_MULT] = mult
    return tr, results
