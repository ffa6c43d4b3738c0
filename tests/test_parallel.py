"""Sharded proving steps on the virtual 8-device mesh.

Mirrors the reference's multi-worker-without-a-cluster trick (in-memory
runtime, README.md:7-11): the same sharded code paths compile and run on
8 virtual CPU devices.
"""

import numpy as np
import pytest

import jax

from ethproof_tpu.gf import field as gfp
from ethproof_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


class TestMesh:
    def test_mesh_axes(self):
        m = pmesh.make_mesh(8, tx=2)
        assert m.devices.shape == (2, 4)
        assert m.axis_names == ("tx", "col")

    def test_sharded_commit_matches_single_device(self):
        rng = np.random.default_rng(0)
        tx, cols, n = 2, 8, 64
        trace = gfp.from_u64(
            rng.integers(0, gfp.P, size=(tx, cols, n), dtype=np.uint64)
        )
        mesh = pmesh.make_mesh(8, tx=2)
        commit, shard_fn = pmesh.trace_commit_sharded(mesh, cols, n)
        lo, hi = shard_fn(np.asarray(trace.lo), np.asarray(trace.hi))
        cap_lo, cap_hi = commit(lo, hi)

        # single-device reference
        from ethproof_tpu.hash import merkle
        import ethproof_tpu.poly.ntt as nttm
        from ethproof_tpu.gf.field import GF

        for t in range(tx):
            tr = GF(trace.lo[t], trace.hi[t])
            lde = nttm.coset_lde(nttm.intt(tr), 2, 7)
            tree = merkle.build(lde, 2)
            assert np.array_equal(
                np.asarray(cap_lo[t]), np.asarray(tree.cap.lo)
            ), f"tx {t} cap mismatch"

    def test_sharded_sweep_matches_host(self):
        rng = np.random.default_rng(1)
        cols, n = 8, 32
        lde = rng.integers(0, gfp.P, size=(cols, n), dtype=np.uint64)
        w = rng.integers(0, gfp.P, size=(cols,), dtype=np.uint64)
        mesh = pmesh.make_mesh(8, tx=1)
        sweep = pmesh.constraint_sweep_sharded(mesh)
        g = gfp.from_u64(lde)
        wg = gfp.from_u64(w)
        out_lo, out_hi = sweep(g.lo, g.hi, wg.lo, wg.hi)
        lo, hi = np.asarray(out_lo), np.asarray(out_hi)
        P = gfp.P
        for j in range(n):
            got = (int(hi[j]) << 32) | int(lo[j])
            expect = sum(int(w[c]) * int(lde[c, j]) for c in range(cols)) % P
            assert got == expect, j