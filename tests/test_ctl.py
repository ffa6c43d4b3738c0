"""Cross-table lookup tests: two tables stitched by a shared multiset."""

import numpy as np
import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.stark.multi import CrossTableLookup, prove_multi, verify_multi
from ethproof_tpu.stark.stark import CtlSpec, Stark

P = fh.P

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


class RequesterStark(Stark):
    """cols [x, y, f]: rows with f=1 claim (x, y) appears in the provider.

    Local constraint: f is boolean. The relation y = 3x is NOT constrained
    here — it is imported via the lookup (that's the point of CTLs).
    """

    num_columns = 3
    num_public_inputs = 0
    constraint_degree = 2

    def eval(self, ctx):
        c, o = ctx.consumer, ctx.ops
        f = ctx.local(2)
        c.constraint(o.mul(f, o.sub(f, o.one())))


class ProviderStark(Stark):
    """cols [x, y, f]: the table of valid pairs; enforces y = 3x on f rows."""

    num_columns = 3
    num_public_inputs = 0
    constraint_degree = 2

    def eval(self, ctx):
        c, o = ctx.consumer, ctx.ops
        f = ctx.local(2)
        c.constraint(o.mul(f, o.sub(f, o.one())))
        c.constraint(
            o.mul(f, o.sub(ctx.local(1), o.mul(o.constant(3), ctx.local(0))))
        )


CTLS = [
    CrossTableLookup(
        looking=((0, CtlSpec(columns=(0, 1), filter_col=2)),),
        looked=(1, CtlSpec(columns=(0, 1), filter_col=2)),
    )
]


def _traces(requests, n=32):
    """requests: list of x values the requester uses (with y = 3x)."""
    req = np.zeros((3, n), dtype=np.uint64)
    for i, x in enumerate(requests):
        req[0, i] = x
        req[1, i] = 3 * x % P
        req[2, i] = 1
    prov = np.zeros((3, n), dtype=np.uint64)
    for i, x in enumerate(requests):  # same multiset, shuffled
        j = (i * 7 + 3) % n
        while prov[2, j]:
            j = (j + 1) % n
        prov[0, j] = x
        prov[1, j] = 3 * x % P
        prov[2, j] = 1
    return [req, prov]


class TestCtl:
    def test_valid_lookup_verifies(self):
        traces = _traces([5, 11, 11, 900], n=32)
        mp = prove_multi(
            [RequesterStark(), ProviderStark()], traces, [[], []], CTLS, CFG
        )
        assert verify_multi([RequesterStark(), ProviderStark()], mp, CTLS, CFG)

    def test_missing_provider_row_rejected(self):
        traces = _traces([5, 11, 900], n=32)
        traces[1][2, :] = 0  # provider filters nothing -> multiset mismatch
        traces[1][1, :] = 0
        traces[1][0, :] = 0
        mp = prove_multi(
            [RequesterStark(), ProviderStark()], traces, [[], []], CTLS, CFG
        )
        assert not verify_multi([RequesterStark(), ProviderStark()], mp, CTLS, CFG)

    def test_requester_fabricated_pair_rejected(self):
        # requester claims (7, 22) which provider (y=3x) can never contain
        traces = _traces([5], n=32)
        traces[0][0, 1] = 7
        traces[0][1, 1] = 22
        traces[0][2, 1] = 1
        # provider gets a second filtered row (7, 21) — correct per ITS
        # constraint but a different tuple
        traces[1][0, 9] = 7
        traces[1][1, 9] = 21
        traces[1][2, 9] = 1
        mp = prove_multi(
            [RequesterStark(), ProviderStark()], traces, [[], []], CTLS, CFG
        )
        assert not verify_multi([RequesterStark(), ProviderStark()], mp, CTLS, CFG)

    def test_multiplicity_matters(self):
        # requester uses x=5 twice; provider lists it once -> mismatch
        traces = _traces([5, 5], n=32)
        prov = traces[1]
        live = np.nonzero(prov[2])[0]
        prov[0, live[1]] = 0
        prov[1, live[1]] = 0
        prov[2, live[1]] = 0
        mp = prove_multi(
            [RequesterStark(), ProviderStark()], traces, [[], []], CTLS, CFG
        )
        assert not verify_multi([RequesterStark(), ProviderStark()], mp, CTLS, CFG)
