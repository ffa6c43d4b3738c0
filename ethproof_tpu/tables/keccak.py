"""Keccak table: keccak-f[1600], one round per row.

Reference equivalent: evm_arithmetization's Keccak STARK (bit-level
round arithmetization over 24-row blocks) [dep: from knowledge; pin
/root/reference/Cargo.lock:1675; named at
/root/reference/common/src/prover_state/circuit.rs:64].

Arithmetization (degree <= 4 — still exact on the rate-4 LDE):

- A bits (1600): round input state. B bits (1600): state after
  theta+rho+pi, committed with linkage B[pi(x,y),rot(z)] = A ^ D (deg 3),
  where D[x][z] = P[x-1][z] ^ P[x+1][z-1] and P/Q (320 each) decompose
  the theta column sums S = P + 2Q (P boolean, Q in {0,1,2}).
- chi is a degree-3 expression over B; the round linkage
  (A_next ^ RC) = chi(B), gated by the FIXED not-last-round flag, is
  degree 4. Round constants are fixed columns (row % 24 patterns).
- OUT bits (1600) materialize the permutation output on last-round rows.
- IN_LIMBS / OUT_LIMBS (100 each: 25 lanes x 4 x 16-bit) are the packed
  CTL surface for the sponge table (degree-1 packing constraints).

Padding soundness: inactive blocks carry REAL zero-state permutation
traces, so every algebraic constraint holds ungated; only the CTL filter
columns (ACTIVE x first/last-round) exclude padding from lookups.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..stark.stark import CtlSpec, Stark
from .common import Cols
from ..hash.keccak import ROTATIONS, ROUND_CONSTANTS, keccak_f_trace

NUM_ROUNDS = 24


def _bit_index(x: int, y: int, z: int) -> int:
    return (x * 5 + y) * 64 + z


def _pq_index(x: int, z: int) -> int:
    return x * 64 + z


_c = Cols()
ACTIVE = _c.one()
FIRST_FILTER = _c.one()  # ACTIVE * (row%24 == 0)
LAST_FILTER = _c.one()  # ACTIVE * (row%24 == 23)
PERM_ID = _c.one()  # block counter — joins input/output CTLs per permutation
A_BITS = _c.many(1600)
B_BITS = _c.many(1600)
P_COLS = _c.many(320)
Q_COLS = _c.many(320)
OUT_BITS = _c.many(1600)
IN_LIMBS = _c.many(100)
OUT_LIMBS = _c.many(100)
NUM_COLUMNS = _c.count

_ALL_XYZ = [(x, y, z) for x in range(5) for y in range(5) for z in range(64)]


def _slice_vec(ops, vec, idxs):
    if isinstance(vec, list):
        return [vec[i] for i in idxs]
    from ..gf.field import GF

    idx = np.asarray(idxs)
    return GF(vec.lo[idx], vec.hi[idx])


class KeccakStark(Stark):
    num_columns = NUM_COLUMNS
    num_public_inputs = 0
    constraint_degree = 4
    lookups = []

    # fixed columns
    F_IS_FIRST = 0
    F_IS_LAST = 1
    F_NOT_LAST = 2
    F_RC = list(range(3, 3 + 64))
    num_fixed_columns = 3 + 64

    def fixed_columns(self, n: int) -> np.ndarray:
        fx = np.zeros((self.num_fixed_columns, n), dtype=np.uint64)
        for r in range(n):
            rnd = r % NUM_ROUNDS
            fx[self.F_IS_FIRST, r] = 1 if rnd == 0 else 0
            fx[self.F_IS_LAST, r] = 1 if rnd == NUM_ROUNDS - 1 else 0
            fx[self.F_NOT_LAST, r] = 0 if rnd == NUM_ROUNDS - 1 else 1
            rc = int(ROUND_CONSTANTS[rnd])
            for z in range(64):
                fx[self.F_RC[z], r] = (rc >> z) & 1
        return fx

    def _f(self, i: int) -> int:
        return NUM_COLUMNS + i

    def input_ctl_spec(self) -> CtlSpec:
        return CtlSpec(columns=tuple([PERM_ID] + IN_LIMBS), filter_col=FIRST_FILTER)

    def output_ctl_spec(self) -> CtlSpec:
        return CtlSpec(columns=tuple([PERM_ID] + OUT_LIMBS), filter_col=LAST_FILTER)

    def eval(self, ctx):
        c, o = ctx.consumer, ctx.ops
        one = o.one()
        two = o.constant(2)

        def xor(u, v):
            return o.sub(o.add(u, v), o.mul(two, o.mul(u, v)))

        act = ctx.local(ACTIVE)
        c.constraint(o.mul(act, o.sub(act, one)))
        # ACTIVE constant within a block; may only fall at block boundaries
        c.constraint_transition(
            o.mul(ctx.fixed(self.F_NOT_LAST), o.sub(ctx.next(ACTIVE), act))
        )
        c.constraint_transition(
            o.mul(
                ctx.fixed(self.F_IS_LAST),
                o.mul(ctx.next(ACTIVE), o.sub(one, act)),
            )
        )
        # filter linkage
        c.constraint(
            o.sub(ctx.local(FIRST_FILTER), o.mul(act, ctx.fixed(self.F_IS_FIRST)))
        )
        c.constraint(
            o.sub(ctx.local(LAST_FILTER), o.mul(act, ctx.fixed(self.F_IS_LAST)))
        )
        # PERM_ID: 0 on the first row, constant within a block, +1 across
        # block boundaries — a stable join key for the sponge's in/out CTLs
        c.constraint_first_row(ctx.local(PERM_ID))
        d_id = o.sub(ctx.next(PERM_ID), ctx.local(PERM_ID))
        c.constraint_transition(o.mul(ctx.fixed(self.F_NOT_LAST), d_id))
        c.constraint_transition(
            o.mul(ctx.fixed(self.F_IS_LAST), o.sub(d_id, one))
        )

        a = ctx.local_stack(A_BITS)
        b = ctx.local_stack(B_BITS)
        p = ctx.local_stack(P_COLS)
        q = ctx.local_stack(Q_COLS)
        out_bits = ctx.local_stack(OUT_BITS)

        for bits in (a, b, out_bits, p):
            c.constraint_vec(o.mul(bits, o.sub(bits, one)))
        c.constraint_vec(o.mul(q, o.mul(o.sub(q, one), o.sub(q, two))))

        # theta sums: sum_y A[x][y][z] = P + 2Q
        sums = None
        for y in range(5):
            part = ctx.local_stack(
                [A_BITS[_bit_index(x, y, z)] for x in range(5) for z in range(64)]
            )
            sums = part if sums is None else o.add(sums, part)
        c.constraint_vec(o.sub(sums, o.add(p, o.mul(two, q))))

        # B linkage (rho+pi applied to A ^ D)
        p1 = ctx.local_stack(
            [P_COLS[_pq_index((x - 1) % 5, z)] for (x, y, z) in _ALL_XYZ]
        )
        p2 = ctx.local_stack(
            [P_COLS[_pq_index((x + 1) % 5, (z - 1) % 64)] for (x, y, z) in _ALL_XYZ]
        )
        after_theta = xor(a, xor(p1, p2))  # degree 3
        b_perm = ctx.local_stack(
            [
                B_BITS[
                    _bit_index(y, (2 * x + 3 * y) % 5, (z + ROTATIONS[x][y]) % 64)
                ]
                for (x, y, z) in _ALL_XYZ
            ]
        )
        c.constraint_vec(o.sub(b_perm, after_theta))

        # chi (degree 3 over committed B)
        b1 = ctx.local_stack(
            [B_BITS[_bit_index((x + 1) % 5, y, z)] for (x, y, z) in _ALL_XYZ]
        )
        b2 = ctx.local_stack(
            [B_BITS[_bit_index((x + 2) % 5, y, z)] for (x, y, z) in _ALL_XYZ]
        )
        chi = xor(b, o.mul(o.sub(one, b1), b2))

        lane00 = list(range(64))
        rest = list(range(64, 1600))
        chi00 = _slice_vec(o, chi, lane00)
        chi_rest = _slice_vec(o, chi, rest)
        rc_bits = ctx.fixed_stack(self.F_RC)

        # round linkage (iota folded into the A_next side, degree <= 4)
        gate = ctx.fixed(self.F_NOT_LAST)
        a_next00 = ctx.next_stack([A_BITS[i] for i in lane00])
        a_next_rest = ctx.next_stack([A_BITS[i] for i in rest])
        c.constraint_vec_transition(o.mul(gate, o.sub(xor(a_next00, rc_bits), chi00)))
        c.constraint_vec_transition(o.mul(gate, o.sub(a_next_rest, chi_rest)))

        # output materialization on last-round rows
        last = ctx.fixed(self.F_IS_LAST)
        out00 = _slice_vec(o, out_bits, lane00)
        out_rest = _slice_vec(o, out_bits, rest)
        c.constraint_vec(o.mul(last, o.sub(xor(out00, rc_bits), chi00)))
        c.constraint_vec(o.mul(last, o.sub(out_rest, chi_rest)))

        # packed limb interfaces — lane order x + 5y (keccak absorption
        # order, shared with the sponge table's CTL tuples)
        w16 = [1 << i for i in range(16)]
        lane_order_bits = [
            _bit_index(idx % 5, idx // 5, z) for idx in range(25) for z in range(64)
        ]
        a_lane = ctx.local_stack([A_BITS[i] for i in lane_order_bits])
        out_lane = ctx.local_stack([OUT_BITS[i] for i in lane_order_bits])
        c.constraint_vec(
            o.sub(ctx.local_stack(IN_LIMBS), o.pack_weighted(a_lane, w16, 16))
        )
        c.constraint_vec(
            o.sub(ctx.local_stack(OUT_LIMBS), o.pack_weighted(out_lane, w16, 16))
        )


def _fill_block(tr: np.ndarray, base: int, state: np.ndarray, active: bool, n_rows: int) -> None:
    """Fill up to 24 rows from `base` with the permutation trace of `state`."""
    states = keccak_f_trace(state)
    out_state = states[-1]
    perm_id = base // NUM_ROUNDS
    for rnd in range(min(NUM_ROUNDS, n_rows - base)):
        r = base + rnd
        cur = states[rnd]
        tr[PERM_ID, r] = perm_id
        if active:
            tr[ACTIVE, r] = 1
            if rnd == 0:
                tr[FIRST_FILTER, r] = 1
            if rnd == NUM_ROUNDS - 1:
                tr[LAST_FILTER, r] = 1
        cbits = [
            [(sum((int(cur[x, y]) >> z) & 1 for y in range(5))) for z in range(64)]
            for x in range(5)
        ]
        for x in range(5):
            for z in range(64):
                s = cbits[x][z]
                tr[P_COLS[_pq_index(x, z)], r] = s & 1
                tr[Q_COLS[_pq_index(x, z)], r] = s >> 1
        for x in range(5):
            for y in range(5):
                lane = int(cur[x, y])
                for z in range(64):
                    bit = (lane >> z) & 1
                    tr[A_BITS[_bit_index(x, y, z)], r] = bit
                    d = (cbits[(x - 1) % 5][z] & 1) ^ (
                        cbits[(x + 1) % 5][(z - 1) % 64] & 1
                    )
                    tgt = _bit_index(
                        y, (2 * x + 3 * y) % 5, (z + ROTATIONS[x][y]) % 64
                    )
                    tr[B_BITS[tgt], r] = bit ^ d
                for l in range(4):
                    tr[IN_LIMBS[(x + 5 * y) * 4 + l], r] = (lane >> (16 * l)) & 0xFFFF
        if rnd == NUM_ROUNDS - 1:
            for x in range(5):
                for y in range(5):
                    lane = int(out_state[x, y])
                    for z in range(64):
                        tr[OUT_BITS[_bit_index(x, y, z)], r] = (lane >> z) & 1
                    for l in range(4):
                        tr[OUT_LIMBS[(x + 5 * y) * 4 + l], r] = (lane >> (16 * l)) & 0xFFFF


def generate_trace(perm_inputs: List[np.ndarray], n_rows: int) -> np.ndarray:
    """perm_inputs: list of (5,5) uint64 input states; 24 rows each.

    Padding blocks are real zero-state permutations (ACTIVE=0), so every
    constraint holds on them without gating.
    """
    assert NUM_ROUNDS * len(perm_inputs) <= n_rows
    tr = np.zeros((NUM_COLUMNS, n_rows), dtype=np.uint64)
    base = 0
    for state in perm_inputs:
        _fill_block(tr, base, state, True, n_rows)
        base += NUM_ROUNDS
    zero = np.zeros((5, 5), dtype=np.uint64)
    while base < n_rows:
        _fill_block(tr, base, zero, False, n_rows)
        base += NUM_ROUNDS
    return tr
