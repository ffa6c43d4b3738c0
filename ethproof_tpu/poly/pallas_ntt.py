"""Fused Pallas kernel for the MXU NTT's base-DFT level.

The XLA formulation of one base-DFT level (mxu_ntt._field_matmul_dft)
is HBM-bound, not FLOP-bound: the 8 chunk matmuls materialize ~64
bytes/element of f32 partial products plus 60 bytes/element of int32
buckets in HBM before the limb recombination collapses them back to
8 bytes/element (measured 23 ms per 2^24-element level on v5e, ~10x
the pure-matmul time). This kernel fuses the whole level — u32 chunk
extraction, the 8 bf16 MXU dots, int32 bucket accumulation, and the
5-limb carry recombination + Goldilocks fold — inside VMEM, so HBM
sees only the 16 B/element in and 16 B/element out.

Exactness argument (same as mxu_ntt): 8-bit chunks are exact in bf16;
each bf16 product < 2^16 accumulates in the MXU's f32 accumulator,
exact while the dot length is <= 256; each dot result converts to
int32 BEFORE bucket accumulation (bucket sums reach 2^27, beyond f32's
integer range but comfortably int32).

Reference equivalent: the rayon-parallel NTT inner loops of
`plonky2_field` [dep: from knowledge; pin /root/reference/Cargo.lock:3466]
— re-imagined as a systolic-array integer-in-float matmul rather than a
butterfly network, per the TPU hardware model (pallas_guide.md).

DFT sizes below 128 are handled at full MXU width by block-diagonal
embedding: a (128, 128) weight matrix holding 128/n copies of the
n-point DFT matrix applies independent n-point DFTs to each n-segment
of a 128-lane row — no lane is wasted and callers never reshape.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..gf import field as gfp
from ..gf.field import GF, _b2u, _reduce128

_U32 = jnp.uint32

# Flag for tests / debugging: force the XLA fallback.
_DISABLED = os.environ.get("ETHPROOF_NO_PALLAS", "") not in ("", "0")

# Rows per grid step, sized so one block's working set (in/out u32
# pairs, 8 bf16 chunk planes, one f32 dot result, 15 int32 buckets,
# 5 u32 limbs — ~70 B/element live at peak) stays a few MB of the
# ~16 MB VMEM, leaving room for the pipeline's double buffering.
_BLOCK_ROW_ELEMS = 1 << 15


@lru_cache(maxsize=32)
def _w_table_np(log_n: int, inverse: bool) -> np.ndarray:
    """(8, L, L) f32 chunked DFT weights, TRANSPOSED for out = d @ W.

    L = max(n, 128); for n < 128 the n-point matrix is block-diagonally
    replicated to fill all 128 lanes.
    """
    from .mxu_ntt import _dft_matrix_chunks

    n = 1 << log_n
    wt = np.swapaxes(_dft_matrix_chunks(log_n, inverse), 1, 2)  # [wc, i, k]
    if n >= 128:
        return np.ascontiguousarray(wt)
    reps = 128 // n
    out = np.zeros((8, 128, 128), dtype=np.float32)
    for r in range(reps):
        out[:, r * n : (r + 1) * n, r * n : (r + 1) * n] = wt
    return out


@lru_cache(maxsize=32)
def _w_table_i8_np(log_n: int, inverse: bool):
    """int8 weights for out = d @ W (mxu_ntt._dft_matrix_i8 layout,
    transposed to [wc, i, k] and block-diagonally replicated below 128
    lanes) plus the (2, L) u32 per-lane GF correction row. Zero padding
    entries have zero digits and the per-lane correction only sums the
    lane's own block row, so replication preserves exactness."""
    from .mxu_ntt import _dft_matrix_i8

    n = 1 << log_n
    digits, corr = _dft_matrix_i8(log_n, inverse)
    wt = np.swapaxes(digits, 1, 2)  # [wc, i, k]
    if n >= 128:
        return np.ascontiguousarray(wt), np.ascontiguousarray(corr)
    reps = 128 // n
    out = np.zeros((8, 128, 128), dtype=np.int8)
    for r in range(reps):
        out[:, r * n : (r + 1) * n, r * n : (r + 1) * n] = wt
    return out, np.tile(corr, (1, reps))


def _dft_kernel(lo_ref, hi_ref, w_ref, olo_ref, ohi_ref):
    lo = lo_ref[:]  # (B, L) u32
    hi = hi_ref[:]
    b_rows = lo.shape[0]
    # 8-bit chunk planes, stacked along rows: (8B, L) bf16.
    # (Mosaic has no u32->bf16 cast; go through int32 -> f32.)
    planes = [
        ((lo >> (8 * c)) & _U32(0xFF)).astype(jnp.int32) for c in range(4)
    ] + [((hi >> (8 * c)) & _U32(0xFF)).astype(jnp.int32) for c in range(4)]
    d = (
        jnp.concatenate(planes, axis=0)
        .astype(jnp.float32)
        .astype(jnp.bfloat16)
    )
    # 8 MXU dots (one per weight chunk), buckets accumulated in int32.
    buckets = [None] * 15
    for wc in range(8):
        m = jnp.dot(d, w_ref[wc], preferred_element_type=jnp.float32)
        mi = m.astype(jnp.int32)  # exact: every dot result < 2^24
        for dc in range(8):
            b = wc + dc
            piece = mi[dc * b_rows : (dc + 1) * b_rows]
            buckets[b] = piece if buckets[b] is None else buckets[b] + piece
    # value = sum_b bucket_b * 2^(8b) -> five u32 limbs with carries,
    # then 2^128 ≡ -2^32 fold (identical algebra to _field_matmul_dft).
    limbs = [jnp.zeros((b_rows, lo.shape[1]), dtype=_U32) for _ in range(5)]

    def add_at(i, v):
        carry = v
        for j in range(i, 5):
            limbs[j] = limbs[j] + carry
            carry = _b2u(limbs[j] < carry)

    for b in range(15):
        v = buckets[b].astype(_U32)
        sh = (8 * b) % 32
        li = (8 * b) // 32
        add_at(li, (v << sh) if sh else v)
        if sh:
            add_at(li + 1, v >> (32 - sh))
    rlo, rhi = _reduce128(limbs[0], limbs[1], limbs[2], limbs[3])
    res = gfp.sub(GF(rlo, rhi), GF(jnp.zeros_like(rlo), limbs[4]))
    olo_ref[:] = res.lo
    ohi_ref[:] = res.hi


def _dft_kernel_i8(lo_ref, hi_ref, w_ref, clo_ref, chi_ref, olo_ref, ohi_ref):
    """int8-encoding variant (mxu_ntt._dft_matrix_i8): offset data digits
    (chunk - 128, encoding v - K carry-free), balanced signed weight
    digits (exact), native s8 MXU dots with int32 accumulation — 2x the
    bf16 MXU rate on v5e and half the chunk-plane VMEM — then the same
    5-limb recombination on bias-shifted buckets and one GF constant-row
    correction per lane."""
    from .mxu_ntt import _I8_BIAS

    lo = lo_ref[:]  # (B, L) u32
    hi = hi_ref[:]
    b_rows = lo.shape[0]
    off = jnp.int32(128)
    planes = [
        ((lo >> (8 * c)) & _U32(0xFF)).astype(jnp.int32) - off for c in range(4)
    ] + [((hi >> (8 * c)) & _U32(0xFF)).astype(jnp.int32) - off for c in range(4)]
    d = jnp.concatenate(planes, axis=0).astype(jnp.int8)  # (8B, L)
    buckets = [None] * 15
    for wc in range(8):
        mi = jnp.dot(d, w_ref[wc], preferred_element_type=jnp.int32)
        for dc in range(8):
            b = wc + dc
            piece = mi[dc * b_rows : (dc + 1) * b_rows]
            buckets[b] = piece if buckets[b] is None else buckets[b] + piece
    bias = jnp.int32(_I8_BIAS)
    limbs = [jnp.zeros((b_rows, lo.shape[1]), dtype=_U32) for _ in range(5)]

    def add_at(i, v):
        carry = v
        for j in range(i, 5):
            limbs[j] = limbs[j] + carry
            carry = _b2u(limbs[j] < carry)

    for b in range(15):
        v = (buckets[b] + bias).astype(_U32)
        sh = (8 * b) % 32
        li = (8 * b) // 32
        add_at(li, (v << sh) if sh else v)
        if sh:
            add_at(li + 1, v >> (32 - sh))
    rlo, rhi = _reduce128(limbs[0], limbs[1], limbs[2], limbs[3])
    res = gfp.sub(GF(rlo, rhi), GF(jnp.zeros_like(rlo), limbs[4]))
    res = gfp.add(res, GF(clo_ref[:], chi_ref[:]))
    olo_ref[:] = res.lo
    ohi_ref[:] = res.hi


# test hook: run the kernel under the Pallas interpreter (CPU backends)
_INTERPRET = os.environ.get("ETHPROOF_PALLAS_INTERPRET", "") not in ("", "0")


def _pallas_call(lo2, hi2, w, block_rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = lo2.shape
    spec_data = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    spec_w = pl.BlockSpec(
        (8, lanes, lanes), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _dft_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.uint32),
        ),
        in_specs=[spec_data, spec_data, spec_w],
        out_specs=(spec_data, spec_data),
        grid=(rows // block_rows,),
        interpret=_INTERPRET,
    )(lo2, hi2, w)


def _pallas_call_i8(lo2, hi2, w8, corr, block_rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = lo2.shape
    spec_data = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    spec_w = pl.BlockSpec(
        (8, lanes, lanes), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    spec_c = pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dft_kernel_i8,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.uint32),
        ),
        in_specs=[spec_data, spec_data, spec_w, spec_c, spec_c],
        out_specs=(spec_data, spec_data),
        grid=(rows // block_rows,),
        interpret=_INTERPRET,
    )(lo2, hi2, w8, corr[0][None, :], corr[1][None, :])


def supported(total_elems: int, log_n: int) -> bool:
    """Can the fused kernel run this level? (TPU backend, shape fits.)"""
    if _DISABLED or log_n > 8:
        return False
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    lanes = max(1 << log_n, 128)
    rows = total_elems // lanes
    return (
        total_elems % lanes == 0
        and rows >= 8
        and rows % min(rows, max(8, _BLOCK_ROW_ELEMS // lanes)) == 0
    )


def dft_last_axis(a: GF, log_n: int, inverse: bool) -> GF:
    """Base-DFT over the last axis of a (..., n) GF array, n = 2^log_n <= 256.

    Same contract as mxu_ntt._field_matmul_dft; caller checks supported().
    """
    from .mxu_ntt import _ENCODING

    n = 1 << log_n
    lanes = max(n, 128)
    shape = a.lo.shape
    lo2 = a.lo.reshape(-1, lanes)
    hi2 = a.hi.reshape(-1, lanes)
    rows = lo2.shape[0]
    block_rows = min(rows, max(8, _BLOCK_ROW_ELEMS // lanes))
    if _ENCODING == "i8":
        w8_np, corr_np = _w_table_i8_np(log_n, inverse)
        w8 = jnp.asarray(w8_np)
        corr = jnp.asarray(corr_np)
        out_lo, out_hi = _pallas_call_i8(lo2, hi2, w8, corr, block_rows)
    else:
        w = jnp.asarray(_w_table_np(log_n, inverse), dtype=jnp.bfloat16)
        out_lo, out_hi = _pallas_call(lo2, hi2, w, block_rows)
    return GF(out_lo.reshape(shape), out_hi.reshape(shape))
