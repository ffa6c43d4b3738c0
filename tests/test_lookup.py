"""In-table logUp lookup (range check) tests."""

import numpy as np

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.stark import LookupSpec, Stark
from ethproof_tpu.stark.verify import stark_verify

CFG = StarkConfig(
    num_challenges=2,
    fri_config=FriConfig(
        rate_bits=2,
        cap_height=1,
        proof_of_work_bits=4,
        num_query_rounds=16,
        arity_bits=2,
        final_poly_bits=2,
    ),
)


class RangeCheckedStark(Stark):
    """cols [v0, v1, counter, mult]: v0, v1 must lie in [0, n).

    The counter column is 0..n-1 (enforced: starts at 0, increments by 1);
    multiplicities are witness data.
    """

    num_columns = 4
    num_public_inputs = 0
    constraint_degree = 2
    lookups = [LookupSpec(looking_cols=(0, 1), table_col=2, multiplicity_col=3)]

    def eval(self, ctx):
        c, o = ctx.consumer, ctx.ops
        c.constraint_first_row(ctx.local(2))
        c.constraint_transition(
            o.sub(ctx.next(2), o.add(ctx.local(2), o.one()))
        )


def _trace(values0, values1, n=32):
    tr = np.zeros((4, n), dtype=np.uint64)
    tr[0, : len(values0)] = values0
    tr[1, : len(values1)] = values1
    tr[2] = np.arange(n, dtype=np.uint64)
    counts = np.zeros(n, dtype=np.uint64)
    for v in list(tr[0]) + list(tr[1]):
        if int(v) < n:
            counts[int(v)] += 1
    tr[3] = counts
    return tr


class TestLookup:
    def test_in_range_verifies(self):
        tr = _trace([3, 7, 31, 0, 7], [1, 1, 1, 30, 2])
        proof = stark_prove(RangeCheckedStark(), tr, [], CFG)
        assert stark_verify(RangeCheckedStark(), proof, CFG)

    def test_out_of_range_rejected(self):
        tr = _trace([3, 7], [1, 2])
        tr[0, 5] = 77  # outside [0, 32); multiplicity table can't cover it
        proof = stark_prove(RangeCheckedStark(), tr, [], CFG)
        assert not stark_verify(RangeCheckedStark(), proof, CFG)

    def test_wrong_multiplicity_rejected(self):
        tr = _trace([3, 7], [1, 2])
        tr[3, 3] = 5  # claim value 3 appears 5 times (it appears once)
        proof = stark_prove(RangeCheckedStark(), tr, [], CFG)
        assert not stark_verify(RangeCheckedStark(), proof, CFG)


class ClampedRangeStark(Stark):
    """cols [v0, mult]; FIXED col (index 2) = min(row, BOUND-1).

    The preprocessed clamped range table (ADVICE r1 high fix): the range
    bound stays BOUND even when the trace is longer, and the prover has
    no freedom over the table side at all.
    """

    BOUND = 8
    num_columns = 2
    num_fixed_columns = 1
    num_public_inputs = 0
    constraint_degree = 2
    lookups = [LookupSpec(looking_cols=(0,), table_col=2, multiplicity_col=1)]

    def fixed_columns(self, n):
        return np.minimum(np.arange(n, dtype=np.uint64), np.uint64(self.BOUND - 1))[
            None, :
        ]

    def eval(self, ctx):
        pass


def _clamped_trace(values, n=32):
    tr = np.zeros((2, n), dtype=np.uint64)
    tr[0, : len(values)] = values
    counts = np.zeros(n, dtype=np.uint64)
    for v in tr[0]:
        if int(v) < ClampedRangeStark.BOUND:
            counts[int(v)] += 1
    tr[1] = counts
    return tr


class TestClampedFixedRange:
    def test_within_bound_verifies(self):
        tr = _clamped_trace([3, 7, 0, 5])
        proof = stark_prove(ClampedRangeStark(), tr, [], CFG)
        assert stark_verify(ClampedRangeStark(), proof, CFG)

    def test_above_bound_below_n_rejected(self):
        # 20 < n = 32 but >= BOUND = 8: the unclamped counter of round 1
        # would have accepted this (the ADVICE r1 forge); the clamped
        # fixed table cannot cover it no matter what multiplicities the
        # prover commits.
        tr = _clamped_trace([3, 7])
        tr[0, 5] = 20
        tr[1, 20] = 1  # prover's best attempt at covering it
        proof = stark_prove(ClampedRangeStark(), tr, [], CFG)
        assert not stark_verify(ClampedRangeStark(), proof, CFG)
