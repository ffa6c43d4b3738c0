"""Merkle trees with caps, built level-by-level on device.

Reference equivalent: plonky2's `MerkleTree`/`MerkleCap` (pin
/root/reference/Cargo.lock:3441): leaves are rows of field elements hashed
with `hash_or_noop`, interior nodes are Poseidon `two_to_one`, and the tree
is truncated at `cap_height` — the commitment is the 2^cap_height digests at
that level (cap_height 4 in `standard_fast_config`, selected at
/root/reference/common/src/prover_state/circuit.rs:204).

TPU mapping: one level = one batched `two_to_one` over all node pairs —
log2(N) - cap_height fused device steps, each a pure elementwise uint32
computation of width shrinking by 2x. All levels are kept (2x leaf storage)
so query-phase Merkle paths are device gathers, not recomputation.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..gf import field as gfp
from ..gf.field import GF
from . import poseidon


class MerkleTree(NamedTuple):
    """levels[0] = leaf digests (4, N) ... levels[-1] = cap (4, 2^cap_height)."""

    levels: List[GF]
    cap_height: int

    @property
    def cap(self) -> GF:
        return self.levels[-1]

    @property
    def num_leaves(self) -> int:
        return self.levels[0].lo.shape[1]


def hash_leaves(rows: GF) -> GF:
    """Hash rows (L, N) -> leaf digests (4, N).

    L <= 4: padded copy (hash_or_noop). Wider rows: balanced two_to_one
    tree — log-depth and width-vectorized (see poseidon.tree_digest).
    """
    return poseidon.tree_digest(rows)


# leaf-digest block budget (elements of the (L, n) leaf matrix per
# block): Poseidon's unrolled rounds over the whole batch generate
# O(L*n) HLO temps — at a production LDE (100+ cols x 2^18) that
# exceeds a 16 GB chip's HBM, so leaves hash in sequential domain
# blocks (lax.map) once the matrix passes this budget. Interior levels
# are 4 rows wide and never need blocking.
import os as _os

_LEAF_BLOCK_ELEMS = int(
    _os.environ.get("ETHPROOF_MERKLE_BLOCK", str(1 << 22))
)


def _leaf_digests(rows: GF) -> GF:
    L, n = rows.lo.shape
    nblk = 1
    while L * (n // nblk) > _LEAF_BLOCK_ELEMS and (n // nblk) > 1:
        nblk *= 2
    if nblk <= 1:
        return poseidon._tree_digest_impl(rows)
    m = n // nblk
    lo_b = rows.lo.reshape(L, nblk, m).transpose(1, 0, 2)
    hi_b = rows.hi.reshape(L, nblk, m).transpose(1, 0, 2)
    d = jax.lax.map(
        lambda c: poseidon._tree_digest_impl(GF(c[0], c[1])), (lo_b, hi_b)
    )
    # (nblk, 4, m) -> (4, n); blocks are contiguous domain slices
    return GF(
        d.lo.transpose(1, 0, 2).reshape(4, n),
        d.hi.transpose(1, 0, 2).reshape(4, n),
    )


@partial(jax.jit, static_argnums=1)
def _build_levels(rows: GF, cap_height: int):
    n = rows.lo.shape[1]
    depth = n.bit_length() - 1
    digests = _leaf_digests(rows)
    levels = [digests]
    for _ in range(depth - cap_height):
        left = GF(digests.lo[:, 0::2], digests.hi[:, 0::2])
        right = GF(digests.lo[:, 1::2], digests.hi[:, 1::2])
        digests = poseidon._two_to_one_impl(left, right)
        levels.append(digests)
    return levels


def build(rows: GF, cap_height: int) -> MerkleTree:
    """Build a cap-truncated Merkle tree over N = rows.shape[1] leaves."""
    n = rows.lo.shape[1]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    assert 0 <= cap_height <= n.bit_length() - 1
    return MerkleTree(_build_levels(rows, cap_height), cap_height)


def open_path(tree: MerkleTree, index) -> GF:
    """Merkle path (sibling digests) for a leaf index.

    index: int or int array (Q,). Returns GF of shape (path_len, 4) or
    (path_len, 4, Q) — the sibling digest at each level from leaf to cap.
    Pure gathers; jit/vmap-safe for batched query opening.
    """
    idx = jnp.asarray(index)
    sibs_lo, sibs_hi = [], []
    for level in tree.levels[:-1]:
        sib = idx ^ 1
        sibs_lo.append(level.lo[:, sib])
        sibs_hi.append(level.hi[:, sib])
        idx = idx >> 1
    return GF(jnp.stack(sibs_lo), jnp.stack(sibs_hi))


@jax.jit
def verify_path(
    leaf_digest: GF, index, path: GF, cap: GF
) -> jnp.ndarray:
    """Check leaf -> cap against a path. Returns bool array (batch shape).

    leaf_digest: (4, ...); path: (path_len, 4, ...); cap: (4, 2^cap_height).
    """
    idx = jnp.asarray(index)
    current = leaf_digest
    path_len = path.lo.shape[0]
    for i in range(path_len):
        sib = GF(path.lo[i], path.hi[i])
        is_right = (idx & 1).astype(bool)  # current node is the right child
        left = gfp.select(is_right, sib, current)
        right = gfp.select(is_right, current, sib)
        current = poseidon.two_to_one(left, right)
        idx = idx >> 1
    expect = GF(cap.lo[:, idx], cap.hi[:, idx])
    return jnp.all(gfp.eq(current, expect), axis=0)
