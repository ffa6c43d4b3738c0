"""Stark table interface + constraint consumer.

Reference equivalent: starky's `Stark` trait and `ConstraintConsumer`
[dep: from knowledge; pin /root/reference/Cargo.lock:4529]:

- `constraint(c)`: c must vanish on ALL of H.
- `constraint_transition(c)`: all rows but the last — implemented by
  multiplying c with z_last(x) = x - g^(n-1) before the Z_H division.
- `constraint_first_row(c)` / `constraint_last_row(c)`: multiplied by the
  (unnormalized-consistent) Lagrange selectors L_first = Z_H/(n*(x-1)),
  L_last = Z_H/(n*g^(n-1)... ) — both provided by the evaluation context so
  prover (device arrays over the LDE coset) and verifier (host extension
  scalars at zeta) use identical algebra.
- Accumulation is Horner in alpha per soundness challenge:
  acc = acc * alpha + term.

A table is a `Stark` subclass defining column/public-input counts, the
constraint degree bound (<= 3: quotient fits in the rate-4 LDE), and
`eval(ctx)` written against ctx's field ops — the SAME code path is traced
by XLA for the whole-domain prover sweep and run on python ints at zeta by
the verifier, which is what guarantees the two agree.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple


class FieldOps:
    """Abstract field arithmetic used by constraint evaluators."""

    def add(self, a, b):  # pragma: no cover - interface
        raise NotImplementedError

    def sub(self, a, b):
        raise NotImplementedError

    def mul(self, a, b):
        raise NotImplementedError

    def constant(self, c: int):
        raise NotImplementedError

    def zero(self):
        return self.constant(0)

    def one(self):
        return self.constant(1)


class DeviceOps(FieldOps):
    """Base-field GF arrays over the LDE domain (prover sweep)."""

    def __init__(self, shape):
        from ..gf import field as gfp

        self._gfp = gfp
        self._shape = shape

    def add(self, a, b):
        return self._gfp.add(a, b)

    def sub(self, a, b):
        return self._gfp.sub(a, b)

    def mul(self, a, b):
        return self._gfp.mul(a, b)

    def constant(self, c: int):
        return self._gfp.full(self._shape, c)


class HostExtOps(FieldOps):
    """GF(p^2) python-int pairs at the out-of-domain point (verifier)."""

    P = 0xFFFFFFFF00000001
    W = 7

    def add(self, a, b):
        return ((a[0] + b[0]) % self.P, (a[1] + b[1]) % self.P)

    def sub(self, a, b):
        return ((a[0] - b[0]) % self.P, (a[1] - b[1]) % self.P)

    def mul(self, a, b):
        return (
            (a[0] * b[0] + self.W * a[1] * b[1]) % self.P,
            (a[0] * b[1] + a[1] * b[0]) % self.P,
        )

    def constant(self, c: int):
        return (c % self.P, 0)


class ConstraintConsumer:
    """Accumulates weighted constraints, Horner-style per alpha."""

    def __init__(self, ops: FieldOps, alphas: List[Any], z_last, l_first, l_last):
        self.ops = ops
        self.alphas = alphas
        self.accs = [ops.zero() for _ in alphas]
        self.z_last = z_last
        self.l_first = l_first
        self.l_last = l_last

    def _accumulate(self, term) -> None:
        o = self.ops
        self.accs = [o.add(o.mul(acc, a), term) for acc, a in zip(self.accs, self.alphas)]

    def constraint(self, c) -> None:
        self._accumulate(c)

    def constraint_transition(self, c) -> None:
        self._accumulate(self.ops.mul(c, self.z_last))

    def constraint_first_row(self, c) -> None:
        self._accumulate(self.ops.mul(c, self.l_first))

    def constraint_last_row(self, c) -> None:
        self._accumulate(self.ops.mul(c, self.l_last))


class EvalContext:
    """What a table's `eval` sees: rows, public inputs, consumer, ops."""

    def __init__(self, ops, local_values, next_values, public_inputs, consumer):
        self.ops = ops
        self._local = local_values
        self._next = next_values
        self._public = public_inputs
        self.consumer = consumer

    def local(self, i: int):
        return self._local[i]

    def next(self, i: int):
        return self._next[i]

    def public_input(self, i: int):
        return self._public[i]


class Stark:
    """Base class for a provable table."""

    num_columns: int = 0
    num_public_inputs: int = 0
    constraint_degree: int = 3  # max total degree of any accumulated term

    def eval(self, ctx: EvalContext) -> None:  # pragma: no cover - interface
        """Emit constraints via ctx.consumer.* using ctx.ops arithmetic."""
        raise NotImplementedError

    def effective_degree(self, has_ctls: bool) -> int:
        # CTL transition constraints are degree 3 (Z * filter * combine)
        return max(self.constraint_degree, 3) if has_ctls else self.constraint_degree

    def quotient_chunks(self, has_ctls: bool = False) -> int:
        # deg(sum w*c) <= d*(n-1)+1; after /Z_H the quotient has degree
        # < (d-1)*n -> that many size-n chunks.
        return max(self.effective_degree(has_ctls) - 1, 1)


# -- cross-table lookups -----------------------------------------------------


@dataclass(frozen=True)
class CtlSpec:
    """One side of a lookup: which columns form the tuple, which column
    (0/1-valued) filters participating rows (None = all rows)."""

    columns: Tuple[int, ...]
    filter_col: Optional[int] = None


@dataclass(frozen=True)
class CtlInstance:
    """A table-local Z-column instance: spec + bound challenges.

    The grand-product argument (starky CTL semantics [dep: from knowledge;
    pin /root/reference/Cargo.lock:4529]): with challenges (beta, gamma),
    combine(row) = gamma + sum_j beta^j * col_j, and
    factor(row) = filter * (combine - 1) + 1. The committed Z column is the
    running product of factor over the subgroup rows; the final value
    (`total`) is a prover message checked across tables by the multi-table
    verifier: prod(looking totals) == looked total.
    """

    spec: CtlSpec
    beta: int
    gamma: int


def eval_ctl_constraints(ops, consumer, local, nxt, local_zs, next_zs, instances, totals):
    """Shared (device sweep / host-at-zeta) CTL constraint emission.

    local/nxt: trace column values; local_zs/next_zs: Z column values
    (one per instance); totals: claimed final products (field constants).
    """

    def combine(vals, inst):
        acc = ops.constant(inst.gamma)
        b = 1
        for j in inst.spec.columns:
            acc = ops.add(acc, ops.mul(ops.constant(b), vals[j]))
            b = b * inst.beta % HostExtOps.P
        return acc

    def factor(vals, inst):
        c = combine(vals, inst)
        if inst.spec.filter_col is None:
            return c
        f = vals[inst.spec.filter_col]
        one = ops.one()
        return ops.add(ops.mul(f, ops.sub(c, one)), one)

    for k, inst in enumerate(instances):
        f_local = factor(local, inst)
        f_next = factor(nxt, inst)
        z_l, z_n = local_zs[k], next_zs[k]
        consumer.constraint_first_row(ops.sub(z_l, f_local))
        consumer.constraint_transition(ops.sub(z_n, ops.mul(z_l, f_next)))
        consumer.constraint_last_row(ops.sub(z_l, ops.constant(totals[k])))
