"""Poseidon permutation and sponge hash over Goldilocks, batch-vectorized.

Shape follows plonky2's `Poseidon` for `GoldilocksField` (pin
/root/reference/Cargo.lock:3441): width 12, S-box x^7, 30 rounds,
circulant+diagonal MDS from `constants.py`, round order
constant_layer(r) -> sbox_layer -> mds_layer. Deviation: ALL 30 rounds
are full rounds (the classic 4+22+4 partial schedule only cheapens
in-circuit proving; on TPU the full-width S-box costs the same and the
per-lane masking partial rounds need destroys XLA:CPU scan
vectorization — see `_permute_impl`). Strictly stronger cryptographically.

TPU mapping: a batch of N states is carried as a GF array of shape (12, N) —
the 12 lanes are unrolled in Python (static), all arithmetic is elementwise
over the N axis, so the whole permutation is one fused XLA computation over
uint32 lanes. The MDS layer exploits tiny matrix entries (< 2^7): each term
s*c is a 3-limb (96-bit) product, accumulated limb-wise and reduced once per
output lane — 1 reduction instead of 12.

Used for: Merkle leaf/node hashing (caps), Fiat-Shamir challenger duplex.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..gf import field as gfp
from ..gf.field import GF, _b2u, _reduce128  # reuse exact limb helpers
from . import constants as C

_U32 = jnp.uint32

SPONGE_WIDTH = C.WIDTH  # 12
SPONGE_RATE = 8
SPONGE_CAPACITY = 4
HASH_OUT = 4  # HashOut<GoldilocksField> = 4 field elements (256-bit digest)

_MDS = C.mds_matrix()  # (12, 12) uint64, entries < 2^7
_RC = C.ALL_ROUND_CONSTANTS.reshape(C.N_ROUNDS, C.WIDTH)  # (30, 12) uint64


_MDS_F32 = _MDS.astype(np.float32)  # entries < 2^6; jnp-converted at trace time


def _mds_layer(state: GF) -> GF:
    """out[i] = sum_j MDS[i][j] * state[j] over the lane axis, via one exact
    f32 matmul on 8-bit chunks (MXU-friendly, ~80 HLO ops total).

    Each element splits into 8 bytes; MDS entries < 2^6, so every matmul
    output is < 12 * 2^6 * 2^8 = 2^17.6 — an integer exactly representable
    in f32 (HIGHEST precision forces exact f32 accumulation on TPU). The 8
    byte-weighted partial sums are then recombined into a 96-bit value with
    explicit u32 carries and reduced mod p once per output lane.
    """
    lo, hi = state.lo, state.hi  # (12, ...)
    bytes_ = jnp.stack(
        [(lo >> (8 * k)) & _U32(0xFF) for k in range(4)]
        + [(hi >> (8 * k)) & _U32(0xFF) for k in range(4)]
    )  # (8, 12, ...)
    prod = jnp.einsum(
        "ij,kj...->ki...",
        jnp.asarray(_MDS_F32),
        bytes_.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    r = prod.astype(_U32)  # (8, 12, ...) each < 2^18, weight 2^(8k)

    # accumulate sum_k r[k] << (8k) into 3 u32 limbs with explicit carries
    acc0 = r[0]
    acc1 = jnp.zeros_like(acc0)
    acc2 = jnp.zeros_like(acc0)
    for k in range(1, 8):
        sh = (8 * k) % 32
        low = r[k] << sh if sh else r[k]
        high = (r[k] >> (32 - sh)) if sh else jnp.zeros_like(r[k])
        if 8 * k < 32:
            acc0 = acc0 + low
            c = _b2u(acc0 < low)
            acc1 = acc1 + high + c  # high < 2^18, no overflow in sum
        else:
            acc1 = acc1 + low
            c = _b2u(acc1 < low)
            acc2 = acc2 + high + c
    zero = jnp.zeros_like(acc0)
    out_lo, out_hi = _reduce128(acc0, acc1, acc2, zero)
    return GF(out_lo, out_hi)


def _sbox(x: GF) -> GF:
    x2 = gfp.mul(x, x)
    x3 = gfp.mul(x2, x)
    x4 = gfp.mul(x2, x2)
    return gfp.mul(x3, x4)


def _apply_round(state: GF, rc: GF, partial_round: bool) -> GF:
    """constant_layer -> sbox_layer -> mds_layer on a (12, ...) state."""
    s = gfp.add(state, rc)  # rc broadcast (12, 1...) over trailing dims
    if partial_round:
        x0 = _sbox(GF(s.lo[0], s.hi[0]))
        s = GF(s.lo.at[0].set(x0.lo), s.hi.at[0].set(x0.hi))
    else:
        s = _sbox(s)  # S-box is elementwise: all 12 lanes at once
    return _mds_layer(s)


# One lax.scan over all 30 rounds. EVERY round applies the full-width
# S-box (a deliberate strengthening of the classic 4+22+4 full/partial
# schedule): partial rounds exist to cheapen in-circuit proving, but on
# TPU the S-box is a fused elementwise sweep whose cost is identical
# either way — and the per-round lane MASK required by partial rounds
# de-vectorizes XLA:CPU's fused scan loop by ~1000x (measured; as does
# any gather/dynamic-slice in the body, which is why round constants
# enter via a one-hot reduction against the counter carry instead of
# scan xs). 30 full rounds are strictly stronger than 8 full + 22
# partial against all known attacks.


def _permute_impl(state: GF) -> GF:
    rest = (1,) * (state.lo.ndim - 1)
    rc_lo_c = jnp.asarray((_RC & 0xFFFFFFFF).astype(np.uint32))  # (30, 12)
    rc_hi_c = jnp.asarray((_RC >> np.uint64(32)).astype(np.uint32))
    iota_r = jnp.arange(C.N_ROUNDS, dtype=jnp.int32)

    def body(carry, _):
        s, i = carry
        onehot = (iota_r == i).astype(jnp.uint32)  # (30,)
        rc = GF(
            (rc_lo_c * onehot[:, None]).sum(axis=0).reshape((SPONGE_WIDTH,) + rest),
            (rc_hi_c * onehot[:, None]).sum(axis=0).reshape((SPONGE_WIDTH,) + rest),
        )
        s = _sbox(gfp.add(s, rc))
        return (_mds_layer(s), i + 1), None

    (out, _), _ = jax.lax.scan(
        body, (state, jnp.int32(0)), None, length=C.N_ROUNDS
    )
    return out


permute = jax.jit(_permute_impl)
permute.__doc__ = "Poseidon permutation. state: GF of shape (12, ...) -> same shape."


def _hash_n_to_m_impl(inputs: GF, m: int = HASH_OUT) -> GF:
    """Sponge with no padding (plonky2 `hash_n_to_m_no_pad` semantics).

    inputs: GF of shape (L, ...) — L field elements per lane, batched over
    trailing dims. Absorb in chunks of SPONGE_RATE (overwriting the rate
    part), permute after each chunk; squeeze the first m elements.
    """
    L = inputs.lo.shape[0]
    shape = inputs.lo.shape[1:]
    state = gfp.zeros((SPONGE_WIDTH,) + shape)
    for start in range(0, L, SPONGE_RATE):
        chunk = min(SPONGE_RATE, L - start)
        lo = state.lo.at[0:chunk].set(inputs.lo[start : start + chunk])
        hi = state.hi.at[0:chunk].set(inputs.hi[start : start + chunk])
        state = _permute_impl(GF(lo, hi))
    return GF(state.lo[:m], state.hi[:m])


hash_n_to_m_no_pad = jax.jit(_hash_n_to_m_impl, static_argnums=1)


def _hash_or_noop_impl(inputs: GF) -> GF:
    """<=4 inputs: zero-padded copy (no permutation); else sponge hash.

    Matches plonky2 `hash_or_noop` used for Merkle leaves of short rows.
    L is static so the branch is resolved at trace time.
    """
    L = inputs.lo.shape[0]
    if L <= HASH_OUT:
        shape = inputs.lo.shape[1:]
        pad = HASH_OUT - L
        if pad == 0:
            return inputs
        z = jnp.zeros((pad,) + shape, dtype=_U32)
        return GF(
            jnp.concatenate([inputs.lo, z]), jnp.concatenate([inputs.hi, z])
        )
    return _hash_n_to_m_impl(inputs, HASH_OUT)


hash_or_noop = jax.jit(_hash_or_noop_impl)


def _tree_digest_impl(inputs: GF) -> GF:
    """Leaf digest for WIDE rows: balanced two_to_one tree over 4-element
    groups (zero-padded). Unlike the sponge, depth is log2(L/4) — compile
    stays bounded and the work vectorizes across groups, which matters for
    traces thousands of columns wide. For L <= 4 this is the same padded
    copy as hash_or_noop.
    """
    L = inputs.lo.shape[0]
    shape = inputs.lo.shape[1:]
    if L <= HASH_OUT:
        return _hash_or_noop_impl(inputs)
    k = (L + 3) // 4
    pad = 4 * k - L
    lo = jnp.concatenate([inputs.lo, jnp.zeros((pad,) + shape, dtype=_U32)])
    hi = jnp.concatenate([inputs.hi, jnp.zeros((pad,) + shape, dtype=_U32)])
    # (4k, ...) -> (k, 4, ...) -> digests (4, k, ...)
    d = GF(
        jnp.moveaxis(lo.reshape((k, 4) + shape), 1, 0),
        jnp.moveaxis(hi.reshape((k, 4) + shape), 1, 0),
    )
    while k > 1:
        half = k // 2
        left = GF(d.lo[:, :half], d.hi[:, :half])
        right = GF(d.lo[:, half : 2 * half], d.hi[:, half : 2 * half])
        merged = _two_to_one_impl(left, right)
        if k & 1:
            merged = GF(
                jnp.concatenate([merged.lo, d.lo[:, -1:]], axis=1),
                jnp.concatenate([merged.hi, d.hi[:, -1:]], axis=1),
            )
            k = half + 1
        else:
            k = half
        d = merged
    return GF(d.lo[:, 0], d.hi[:, 0])


tree_digest = jax.jit(_tree_digest_impl)


def tree_digest_host(inputs) -> list:
    """Host mirror of tree_digest on a list of ints."""
    xs = [x % _P for x in inputs]
    if len(xs) <= HASH_OUT:
        return xs + [0] * (HASH_OUT - len(xs))
    k = (len(xs) + 3) // 4
    xs = xs + [0] * (4 * k - len(xs))
    ds = [xs[4 * i : 4 * i + 4] for i in range(k)]
    while len(ds) > 1:
        half = len(ds) // 2
        nxt = [
            two_to_one_host(ds[i], ds[half + i]) for i in range(half)
        ]
        if len(ds) & 1:
            nxt.append(ds[-1])
        ds = nxt
    return ds[0]


def _two_to_one_impl(left: GF, right: GF) -> GF:
    shape = left.lo.shape[1:]
    z = jnp.zeros((SPONGE_CAPACITY,) + shape, dtype=_U32)
    state = GF(
        jnp.concatenate([left.lo, right.lo, z]),
        jnp.concatenate([left.hi, right.hi, z]),
    )
    out = _permute_impl(state)
    return GF(out.lo[:HASH_OUT], out.hi[:HASH_OUT])


two_to_one = jax.jit(_two_to_one_impl)
two_to_one.__doc__ = "Compress two 4-element digests -> one (Merkle node)."


# ---------------------------------------------------------------------------
# Host (numpy) reference implementation — golden model for kernel tests and
# for host-side transcript work where a device round-trip isn't worth it.
# ---------------------------------------------------------------------------

_P = C.P


def _np_mds(state):
    out = []
    for i in range(SPONGE_WIDTH):
        acc = 0
        for j in range(SPONGE_WIDTH):
            acc += int(_MDS[i, j]) * state[j]
        out.append(acc % _P)
    return out


def permute_host(state: Sequence[int]) -> list:
    """Pure-python permutation on 12 ints (golden reference).

    All 30 rounds are full rounds — see the note on `_permute_impl`.
    """
    s = [x % _P for x in state]
    for r in range(C.N_ROUNDS):
        s = [(x + int(_RC[r, i])) % _P for i, x in enumerate(s)]
        s = [pow(x, C.SBOX_EXP, _P) for x in s]
        s = _np_mds(s)
    return s


def hash_n_to_m_no_pad_host(inputs: Sequence[int], m: int = HASH_OUT) -> list:
    state = [0] * SPONGE_WIDTH
    xs = [x % _P for x in inputs]
    for start in range(0, len(xs), SPONGE_RATE):
        chunk = xs[start : start + SPONGE_RATE]
        state[: len(chunk)] = chunk
        state = permute_host(state)
    return state[:m]


def two_to_one_host(left: Sequence[int], right: Sequence[int]) -> list:
    state = list(left) + list(right) + [0] * SPONGE_CAPACITY
    return permute_host(state)[:HASH_OUT]
