"""Poseidon + Merkle-cap tests: device kernel vs pure-python golden model."""

import numpy as np
import jax.numpy as jnp
import pytest

from ethproof_tpu.gf import field as gfp
from ethproof_tpu.hash import constants as C
from ethproof_tpu.hash import merkle, poseidon as ps

RNG = np.random.default_rng(7)


def rand_u64(shape):
    return RNG.integers(0, C.P, size=shape, dtype=np.uint64)


class TestConstants:
    def test_round_constant_count_and_range(self):
        rc = C.ALL_ROUND_CONSTANTS
        assert rc.shape == (C.N_ROUNDS * C.WIDTH,)
        assert int(rc.max()) < C.P
        # deterministic across regeneration
        assert np.array_equal(rc, C.grain_round_constants())

    def test_mds_matrix_is_circulant_plus_diag(self):
        m = C.mds_matrix()
        assert m[0, 0] == C.MDS_MATRIX_CIRC[0] + C.MDS_MATRIX_DIAG[0]
        assert m[3, 7] == C.MDS_MATRIX_CIRC[4]


class TestPermutation:
    def test_device_matches_host(self):
        n = 8
        state = rand_u64((12, n))
        dev = gfp.to_u64(ps.permute(gfp.from_u64(state)))
        for lane in range(n):
            host = ps.permute_host([int(x) for x in state[:, lane]])
            assert [int(v) for v in dev[:, lane]] == host

    def test_zero_state_nontrivial(self):
        out = ps.permute_host([0] * 12)
        assert any(x != 0 for x in out)

    def test_diffusion(self):
        a = ps.permute_host([0] * 12)
        b = ps.permute_host([1] + [0] * 11)
        assert sum(x != y for x, y in zip(a, b)) == 12


class TestSponge:
    @pytest.mark.parametrize("length", [1, 4, 8, 9, 16, 23])
    def test_hash_n_to_m_matches_host(self, length):
        data = rand_u64((length, 3))
        dev = gfp.to_u64(ps.hash_n_to_m_no_pad(gfp.from_u64(data)))
        for lane in range(3):
            host = ps.hash_n_to_m_no_pad_host([int(x) for x in data[:, lane]])
            assert [int(v) for v in dev[:, lane]] == host

    def test_hash_or_noop_short_input_is_padded_copy(self):
        data = rand_u64((3, 2))
        out = gfp.to_u64(ps.hash_or_noop(gfp.from_u64(data)))
        assert out.shape == (4, 2)
        assert np.array_equal(out[:3], data)
        assert np.all(out[3] == 0)

    def test_two_to_one_matches_host(self):
        l, r = rand_u64((4, 2)), rand_u64((4, 2))
        dev = gfp.to_u64(ps.two_to_one(gfp.from_u64(l), gfp.from_u64(r)))
        for lane in range(2):
            host = ps.two_to_one_host(
                [int(x) for x in l[:, lane]], [int(x) for x in r[:, lane]]
            )
            assert [int(v) for v in dev[:, lane]] == host


class TestMerkle:
    def test_build_shapes(self):
        rows = gfp.from_u64(rand_u64((7, 32)))
        tree = merkle.build(rows, cap_height=2)
        assert len(tree.levels) == 1 + (5 - 2)
        assert tree.cap.lo.shape == (4, 4)

    def test_path_verifies(self):
        rows_np = rand_u64((7, 32))
        rows = gfp.from_u64(rows_np)
        tree = merkle.build(rows, cap_height=2)
        idx = jnp.asarray([0, 5, 17, 31])
        leaf = merkle.hash_leaves(rows)[..., idx]
        path = merkle.open_path(tree, idx)
        ok = merkle.verify_path(leaf, idx, path, tree.cap)
        assert bool(np.all(np.asarray(ok)))

    def test_corrupt_leaf_fails(self):
        rows_np = rand_u64((7, 32))
        tree = merkle.build(gfp.from_u64(rows_np), cap_height=2)
        idx = jnp.asarray([5])
        bad_leaf = gfp.from_u64(rand_u64((4, 1)))
        path = merkle.open_path(tree, idx)
        ok = merkle.verify_path(bad_leaf, idx, path, tree.cap)
        assert not bool(np.any(np.asarray(ok)))

    def test_root_matches_host_reference(self):
        # cap_height=0 single root; cross-check against pure-python tree
        rows_np = rand_u64((5, 8))
        tree = merkle.build(gfp.from_u64(rows_np), cap_height=0)
        digests = [
            ps.tree_digest_host([int(x) for x in rows_np[:, i]])
            for i in range(8)
        ]
        while len(digests) > 1:
            digests = [
                ps.two_to_one_host(digests[i], digests[i + 1])
                for i in range(0, len(digests), 2)
            ]
        root = gfp.to_u64(tree.cap)[:, 0]
        assert [int(x) for x in root] == digests[0]

    def test_tree_digest_wide_matches_host(self):
        rows_np = rand_u64((23, 4))
        dev = gfp.to_u64(ps.tree_digest(gfp.from_u64(rows_np)))
        for lane in range(4):
            host = ps.tree_digest_host([int(x) for x in rows_np[:, lane]])
            assert [int(v) for v in dev[:, lane]] == host
