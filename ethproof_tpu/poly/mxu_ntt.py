"""MXU NTT: four-step decomposition with exact chunked-f32 matmuls.

The radix-2 NTT (ntt.py) runs on the VPU as u32 limb arithmetic — its
throughput ceiling is scalar-ish integer ops. The MXU (128x128 systolic
array) does f32 matmuls at ~2 orders of magnitude higher FLOP rates, and
a DFT IS a matmul — so we rebuild the NTT as matmuls with an EXACT
integer-in-float encoding:

- Bailey four-step: n = n1 * n2 with x[i1*n2 + i2]:
    1. n1-point DFTs along i1 (a matmul over the i2 batch)
    2. twiddle by w_n^(i2*k1) (elementwise field mul, precomputed table)
    3. n2-point DFTs along i2
    4. output is the (k1, k2) transpose: out[k2*n1 + k1]
  Sizes beyond the base recurse (4096 = 64 x 64, 2^24 = 4096 x 4096...).
- Exact field matmul: split data and DFT-matrix entries into 8-bit
  chunks. Integers 0..255 are EXACT in bfloat16 (8 effective mantissa
  bits), each chunk-pair product is < 2^16, and the MXU accumulates in
  f32 — exact while partial sums stay < 2^24, i.e. for dot lengths up
  to 256 (255*255*256 = 16.65M < 2^24). So the chunk matmuls run as
  native bf16 MXU ops (measured ~6x the f32-HIGHEST rate on v5e, which
  XLA implements as a 6-pass bf16 decomposition we don't need). The
  8x8 chunk products accumulate into 15 weight buckets (int32, < 2^25,
  exact), which recombine into u32 limbs with explicit carries and one
  Goldilocks reduction.
- Level partition: a DFT matmul of size 2^b costs 64*2^b MACs/element
  at MXU efficiency ~min(1,(2^b/128)^2) (the systolic array is 128x128;
  tiny tiles waste it), plus a fixed per-level elementwise cost
  (twiddle GF mul + limb recombination, HBM-bound). `_partition` picks
  the level sizes by DP over that cost model — e.g. 2^20 = 7+7+6
  (128/128/64-point bases), not the naive halving 5+5+5+5 cascade of
  MXU-starving 32-point matmuls. Bases are capped at 2^8 by f32
  accumulator exactness.

Matches ntt.ntt / ntt.intt bit-for-bit (natural order in and out).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..gf import field as gfp
from ..gf import field_host as fh
from ..gf.field import GF, _b2u, _reduce128
from . import ntt as nttm

_U32 = jnp.uint32
MAX_BASE_LOG = 8  # exactness cap: dot length <= 256 keeps f32 accum exact
# Per-element DP cost of a 2^lb-point base matmul: 2^lb MACs scaled by
# MXU-tile efficiency (128x128 array; sub-128 operands pad to a full
# tile in both M and K). In the same units, one level's elementwise
# overhead (twiddle mul + 15-bucket limb recombination, ~90 VPU u32 ops
# at ~400x the per-MAC cost / 64 chunk factor) is ~500.
_LEVEL_COST = 512
_BASE_COST = {
    lb: (1 << lb) * max(1, (128 // (1 << lb)) ** 2) for lb in range(1, 9)
}


@lru_cache(maxsize=None)
def _partition(log_n: int) -> Tuple[int, ...]:
    """Optimal level sizes (each <= MAX_BASE_LOG) for a 2^log_n NTT."""
    if log_n <= MAX_BASE_LOG:
        return (log_n,)
    best, best_cost = None, float("inf")
    for lb in range(1, MAX_BASE_LOG + 1):
        if lb >= log_n:
            continue
        rest = _partition(log_n - lb)
        cost = (
            _BASE_COST[lb]
            + _LEVEL_COST * (len(rest) + 1)
            + sum(_BASE_COST[p] for p in rest)
        )
        if cost < best_cost:
            best, best_cost = (lb,) + rest, cost
    return best


@lru_cache(maxsize=32)
def _dft_matrix_u64(log_n: int, inverse: bool) -> np.ndarray:
    """(n, n) u64: the DFT matrix W[k, i] = w^(k*i), canonical mod p.

    The 1/n iNTT scale is NOT folded in here (applied by the caller once).
    """
    n = 1 << log_n
    w = fh.primitive_root_of_unity(log_n)
    if inverse:
        w = fh.inv(w)
    rows = np.zeros((n, n), dtype=np.uint64)
    wk = 1
    for k in range(n):
        val = 1
        for i in range(n):
            rows[k, i] = val
            val = val * wk % fh.P
        wk = wk * w % fh.P
    return rows


@lru_cache(maxsize=32)
def _dft_matrix_chunks(log_n: int, inverse: bool) -> np.ndarray:
    """(8, n, n) f32: the DFT matrix, 8-bit chunked (bf16 encoding)."""
    rows = _dft_matrix_u64(log_n, inverse)
    chunks = np.zeros((8,) + rows.shape, dtype=np.float32)
    for c in range(8):
        chunks[c] = ((rows >> np.uint64(8 * c)) & np.uint64(0xFF)).astype(np.float32)
    return chunks


# -- int8 encoding (MXU s8 path: 2x the bf16 rate on v5e, int32 accum) --------
#
# Matrix entries use BALANCED signed digits of a centered representative
# (w, or w - p when w's unsigned digits would overflow the signed range):
# W' = sum_c m8[c] * 2^(8c) with m8 in [-128, 127] and W' ≡ W (mod p) —
# exact, no correction needed. Data uses OFFSET digits d8[c] =
# ((v >> 8c) & 255) - 128, which encode v - K with K = 128 * (2^64-1)/255
# and need no carries; the matmul then computes
#   C_k = sum_i (v_i - K) W'_ki = T_k - K * R_k,   R_k = sum_i W'_ki,
# so T_k ≡ C_k + K * R_k (mod p): one per-k GF constant fixes everything.
# Signed int32 buckets are biased by _I8_BIAS before the (unsigned) limb
# recombination; the bias total folds into the same constant. Dot lengths
# to 2^16 stay exact in the int32 accumulator (vs 256 for bf16/f32) —
# |product| <= 2^14, |bucket| <= 8 * n * 2^14.

_K_OFF = 128 * ((1 << 64) - 1) // 255  # value the data offset-digits drop
_I8_BIAS = 1 << 26  # makes biased buckets nonnegative (|bucket| < 2^25)
_BIAS_TOTAL = _I8_BIAS * sum(1 << (8 * b) for b in range(15))


def _balanced_digits_u64(rows: np.ndarray) -> np.ndarray:
    """(..., ) u64 canonical mod p -> (8, ...) int8 balanced digits of a
    representative ≡ rows (mod p). Entries above 0x7f7f... use w - p
    (two's-complement wrap); the digit window [-0x8080.., 0x7f7f..] then
    covers every representative, so the greedy mod-2^64 digit loop is
    exact by uniqueness."""
    thr = np.uint64(0x7F7F7F7F7F7F7F7F)
    wrap = np.uint64((1 << 64) - fh.P)
    u = np.where(rows > thr, rows + wrap, rows)  # u64 wraparound = w - p
    digits = np.zeros((8,) + rows.shape, dtype=np.int8)
    rem = u.copy()
    for c in range(8):
        d = (rem & np.uint64(255)).astype(np.int64)
        db = np.where(d >= 128, d - 256, d)
        digits[c] = db.astype(np.int8)
        rem = (rem - db.astype(np.uint64)) >> np.uint64(8)
    return digits


@lru_cache(maxsize=32)
def _dft_matrix_i8(log_n: int, inverse: bool):
    """((8, n, n) int8 digits [c, k, i], (2, n) u32 correction GF row):
    out_k = recombine(biased buckets) + corr_k (mod p)."""
    rows = _dft_matrix_u64(log_n, inverse)
    digits = _balanced_digits_u64(rows)
    n = rows.shape[0]
    corr = np.zeros(n, dtype=np.uint64)
    for k in range(n):
        r_k = int(rows[k].astype(object).sum()) % fh.P
        corr[k] = (_K_OFF * r_k - _BIAS_TOTAL) % fh.P
    return digits, np.stack(
        [(corr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
         (corr >> np.uint64(32)).astype(np.uint32)]
    )


# NTT matmul encoding: "i8" (default — native s8 MXU matmuls, 2x the
# bf16 rate on v5e, larger exact dot lengths) or "bf16" (the round-3
# scheme, kept as the differential oracle / fallback).
_ENCODING = os.environ.get("ETHPROOF_NTT_ENCODING", "i8")


def _recombine_buckets(buckets) -> GF:
    """value = sum_b bucket_b * 2^(8b) mod p, for 15 u32-safe buckets.

    Buckets < 2^28, so the exact total can reach ~2^140 — five u32
    limbs with full carry propagation, then fold limb 4 via
    2^128 ≡ -2^32 (mod p); limb4 * 2^32 < p keeps the result canonical.
    """
    limbs = [jnp.zeros_like(buckets[0], dtype=_U32) for _ in range(5)]

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
    lo, hi = _reduce128(limbs[0], limbs[1], limbs[2], limbs[3])
    return gfp.sub(GF(lo, hi), GF(jnp.zeros_like(lo), limbs[4]))


def _field_matmul_dft(a: GF, log_n: int, inverse: bool) -> GF:
    """DFT over the LAST axis of a (..., n) GF array via exact matmuls.

    out[..., k] = sum_i a[..., i] * W[k, i]. Contracting the minor-most
    axis keeps the batch layout intact — no transposes enter or leave
    the matmul (a moveaxis-to-front formulation costs an extra HBM pass
    each way; measured 36 ms -> 23 ms per 2^24-element level on v5e).
    """
    if _ENCODING == "i8":
        return _field_matmul_dft_i8(a, log_n, inverse)
    n = 1 << log_n
    # 8-bit chunks are exact in bf16; MXU accumulates bf16 products in
    # f32, exact for dot lengths <= 256 (MAX_BASE_LOG cap). Native-rate
    # matmuls — no HIGHEST-precision multi-pass decomposition needed.
    w_chunks = jnp.asarray(
        _dft_matrix_chunks(log_n, inverse), dtype=jnp.bfloat16
    )  # (8, n, n) indexed [wc, k, i]
    # data 8-bit chunks on a LEADING axis: (8, ..., n)
    d = jnp.stack(
        [(a.lo >> (8 * c)) & _U32(0xFF) for c in range(4)]
        + [(a.hi >> (8 * c)) & _U32(0xFF) for c in range(4)]
    ).astype(jnp.bfloat16)
    nd = d.ndim
    # chunk products into 15 weight buckets (int32 exact)
    buckets = [None] * 15
    for wc in range(8):
        m = jax.lax.dot_general(
            d,
            w_chunks[wc],
            dimension_numbers=(((nd - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, ..., k) — contraction over i
        mi = m.astype(jnp.int32)
        for dc in range(8):
            b = wc + dc
            buckets[b] = mi[dc] if buckets[b] is None else buckets[b] + mi[dc]
    return _recombine_buckets(buckets)


def _field_matmul_dft_i8(a: GF, log_n: int, inverse: bool) -> GF:
    """int8-encoding variant of _field_matmul_dft (see _dft_matrix_i8):
    8 native s8 MXU dots, signed int32 buckets biased into the shared
    unsigned recombination, one GF constant-row correction."""
    w_digits, corr = _dft_matrix_i8(log_n, inverse)
    w8 = jnp.asarray(w_digits)  # (8, n, n) int8 indexed [wc, k, i]
    off = jnp.int32(128)
    d = jnp.stack(
        [((a.lo >> (8 * c)) & _U32(0xFF)).astype(jnp.int32) - off for c in range(4)]
        + [((a.hi >> (8 * c)) & _U32(0xFF)).astype(jnp.int32) - off for c in range(4)]
    ).astype(jnp.int8)  # (8, ..., n) — encodes (v - K) exactly
    nd = d.ndim
    buckets = [None] * 15
    for wc in range(8):
        mi = jax.lax.dot_general(
            d,
            w8[wc],
            dimension_numbers=(((nd - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (8, ..., k), exact signed int32
        for dc in range(8):
            b = wc + dc
            buckets[b] = mi[dc] if buckets[b] is None else buckets[b] + mi[dc]
    bias = jnp.int32(_I8_BIAS)
    raw = _recombine_buckets([bk + bias for bk in buckets])
    c_gf = GF(jnp.asarray(corr[0]), jnp.asarray(corr[1]))  # (n,) per-k
    return gfp.add(raw, c_gf)


def _twiddle_table(log_n1: int, log_n2: int, inverse: bool) -> GF:
    """w_n^(i2*k1) as a device (n1, n2) GF array (computed on device)."""
    log_n = log_n1 + log_n2
    w = fh.primitive_root_of_unity(log_n)
    if inverse:
        w = fh.inv(w)
    n1, n2 = 1 << log_n1, 1 << log_n2
    # row k1 of the table is powers of w^k1: build as outer power structure
    # pow(w, i2 * k1) = (w^k1)^i2; compute w^k1 ladder then per-row powers.
    base_pows = nttm.powers(nttm._scalar_gf(w), n1)  # w^k1 for k1 < n1
    # table[k1, i2] = base_pows[k1]^i2 — log-doubling over i2
    t = gfp.ones((n1, 1))
    acc = base_pows
    length = 1
    while length < n2:
        nxt = gfp.mul(
            t,
            GF(
                jnp.broadcast_to(acc.lo[:, None], (n1, length)),
                jnp.broadcast_to(acc.hi[:, None], (n1, length)),
            ),
        )
        t = GF(
            jnp.concatenate([t.lo, nxt.lo], axis=1),
            jnp.concatenate([t.hi, nxt.hi], axis=1),
        )
        acc = gfp.mul(acc, acc)
        length *= 2
    return t


def _mxu_ntt_rec(a: GF, log_n: int, inverse: bool) -> GF:
    """Natural-order four-step NTT over the LAST axis."""
    if log_n <= MAX_BASE_LOG:  # small sizes: one matmul over the last axis
        from . import pallas_ntt

        if pallas_ntt.supported(a.lo.size, log_n):
            return pallas_ntt.dft_last_axis(a, log_n, inverse)
        return _field_matmul_dft(a, log_n, inverse)
    log_n2 = _partition(log_n)[-1]  # base-matmul level (DP-chosen)
    log_n1 = log_n - log_n2
    n1, n2 = 1 << log_n1, 1 << log_n2
    batch = a.lo.shape[:-1]
    # x[i1*n2 + i2] -> X[..., i1, i2]
    x = GF(a.lo.reshape(batch + (n1, n2)), a.hi.reshape(batch + (n1, n2)))
    # step 1: n1-point DFT over i1
    s1 = _mxu_ntt_rec(
        GF(jnp.swapaxes(x.lo, -1, -2), jnp.swapaxes(x.hi, -1, -2)),
        log_n1,
        inverse,
    )  # (..., i2, k1)
    # step 2: twiddle w^(i2*k1)
    tw = _twiddle_table(log_n1, log_n2, inverse)  # (n1, n2) indexed [k1, i2]
    tw_t = GF(jnp.swapaxes(tw.lo, 0, 1), jnp.swapaxes(tw.hi, 0, 1))  # (i2, k1)
    s2 = gfp.mul(s1, tw_t)
    # step 3: n2-point DFT over i2
    s3 = _mxu_ntt_rec(
        GF(jnp.swapaxes(s2.lo, -1, -2), jnp.swapaxes(s2.hi, -1, -2)),
        log_n2,
        inverse,
    )  # (..., k1, k2)
    # step 4: out[k2*n1 + k1] -> transpose to (k2, k1) then flatten
    out = GF(jnp.swapaxes(s3.lo, -1, -2), jnp.swapaxes(s3.hi, -1, -2))
    return GF(
        out.lo.reshape(batch + (1 << log_n,)), out.hi.reshape(batch + (1 << log_n,))
    )


def _mxu_ntt_impl(a: GF, inverse: bool) -> GF:
    n = a.lo.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    out = _mxu_ntt_rec(a, log_n, inverse)
    if inverse:
        out = gfp.mul(out, nttm._scalar_gf(fh.inv(n)))
    return out


mxu_ntt = jax.jit(partial(_mxu_ntt_impl, inverse=False))
mxu_ntt.__doc__ = "MXU four-step NTT over the last axis (natural order)."
mxu_intt = jax.jit(partial(_mxu_ntt_impl, inverse=True))


def mxu_coset_lde(coeffs: GF, rate_bits: int, shift: int) -> GF:
    n = coeffs.lo.shape[-1]
    big_n = n << rate_bits
    batch = coeffs.lo.shape[:-1]
    sp = nttm.powers(nttm._scalar_gf(shift), n)
    scaled = gfp.mul(coeffs, sp)
    pad = [(0, 0)] * len(batch) + [(0, big_n - n)]
    padded = GF(jnp.pad(scaled.lo, pad), jnp.pad(scaled.hi, pad))
    return _ntt_auto_impl(padded, inverse=False)


# -- size-dispatched transforms (prover-facing) ------------------------------

_MXU_MIN = 1 << 9  # below this the radix-2 VPU path wins / ties

# HBM budget for the four-step kernel, in FIELD ELEMENTS in flight per
# sub-call. The exact-f32 matmul's peak temporaries run ~300-350 bytes
# per input element (the 8-bit chunk stacks, the (n, 8, batch) matmul
# outputs and the 15 int32 weight buckets), so 2^24 elements tops out
# around 5-6 GB of HLO temps — comfortable on a 16 GB chip with room
# for the resident trace. Measured: 256 cols x 2^20 unblocked asks for
# 86 GB on a v5e (OOM); blocked at 2^24 it fits. Tunable for bigger
# chips via ETHPROOF_MXU_BLOCK_ELEMS.
_BLOCK_ELEMS = int(os.environ.get("ETHPROOF_MXU_BLOCK_ELEMS", str(1 << 24)))


def set_block_elems(n: int) -> None:
    """Test/tuning hook: cap on field elements per four-step sub-call."""
    global _BLOCK_ELEMS
    _BLOCK_ELEMS = n


def _map_rows(fn, a: GF, block: int) -> GF:
    """Apply `fn` (GF (n,) -> GF (m,), vmapped by lax.map) in row blocks
    of `block`, bounding peak HBM to one block's temporaries. `a` may
    carry arbitrary leading batch dims (flattened into rows)."""
    n = a.lo.shape[-1]
    batch = a.lo.shape[:-1]
    lo2 = a.lo.reshape(-1, n)
    hi2 = a.hi.reshape(-1, n)

    def f(xs):
        out = fn(GF(xs[0], xs[1]))
        return out.lo, out.hi

    out_lo, out_hi = jax.lax.map(f, (lo2, hi2), batch_size=block)
    m = out_lo.shape[-1]
    return GF(out_lo.reshape(batch + (m,)), out_hi.reshape(batch + (m,)))


def _mxu_ntt_big(a: GF, inverse: bool) -> GF:
    """Four-step NTT of ONE huge vector (n > _BLOCK_ELEMS) with each
    step row-blocked so peak HBM stays ~one block of temps plus the
    O(n) data/twiddle buffers. Enables 2^24..2^30 single-column
    transforms on a 16 GB chip (BASELINE.md north-star shape)."""
    n = a.lo.shape[-1]
    log_n = n.bit_length() - 1
    assert a.lo.ndim == 1 and (1 << log_n) == n
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    x = GF(a.lo.reshape(n1, n2), a.hi.reshape(n1, n2))  # [i1, i2]
    # step 1: n1-point DFT over i1, batched over i2 (row-blocked)
    xt = GF(jnp.swapaxes(x.lo, 0, 1), jnp.swapaxes(x.hi, 0, 1))  # [i2, i1]
    s1 = _ntt_auto_impl(xt, inverse)  # [i2, k1]
    # steps 2+3 fused per row block: twiddle by w^(i2*k1) then n2-point
    # DFT over i2. Layout (k1, i2) so the twiddle table's rows align
    # with the mapped axis. The iNTT scale folds into the table (every
    # output passes through exactly one twiddle, and the NTT is
    # linear): step 1 already applied 1/n1, so fold the remaining 1/n2.
    s1t = GF(jnp.swapaxes(s1.lo, 0, 1), jnp.swapaxes(s1.hi, 0, 1))
    tw = _twiddle_table(log_n1, log_n2, inverse)  # [k1, i2]
    if inverse:
        tw = gfp.mul(tw, nttm._scalar_gf(fh.inv(n2)))
    block = max(1, _BLOCK_ELEMS // n2)

    def f(xs):
        s = gfp.mul(GF(xs[0], xs[1]), GF(xs[2], xs[3]))
        out = _mxu_ntt_rec(s, log_n2, inverse)
        return out.lo, out.hi

    s3_lo, s3_hi = jax.lax.map(
        f, (s1t.lo, s1t.hi, tw.lo, tw.hi), batch_size=block
    )  # [k1, k2]
    out = GF(jnp.swapaxes(s3_lo, 0, 1), jnp.swapaxes(s3_hi, 0, 1))
    return GF(out.lo.reshape(n), out.hi.reshape(n))


def _ntt_auto_impl(a: GF, inverse: bool) -> GF:
    """HBM-aware dispatch: radix-2 for small n; MXU four-step whole when
    it fits the budget; row-blocked lax.map for wide batches; staged big
    path for single vectors beyond the budget. Bit-identical outputs."""
    n = a.lo.shape[-1]
    if n < _MXU_MIN:
        return nttm._ntt_impl(a, inverse)
    total = a.lo.size
    if total <= _BLOCK_ELEMS:
        return _mxu_ntt_impl(a, inverse)
    if n > _BLOCK_ELEMS:
        # each row alone busts the budget: staged big transform per row
        if a.lo.ndim == 1:
            return _mxu_ntt_big(a, inverse)
        return _map_rows(
            lambda row: _mxu_ntt_big(row, inverse), a, 1
        )
    block = max(1, _BLOCK_ELEMS // n)
    return _map_rows(lambda rows: _mxu_ntt_impl(rows, inverse), a, block)


def _best_ntt_impl(a: GF, inverse: bool) -> GF:
    return _ntt_auto_impl(a, inverse)


best_ntt = jax.jit(partial(_best_ntt_impl, inverse=False))
best_intt = jax.jit(partial(_best_ntt_impl, inverse=True))


def _best_coset_lde_impl(coeffs: GF, rate_bits: int, shift: int) -> GF:
    if (coeffs.lo.shape[-1] << rate_bits) >= _MXU_MIN:
        return mxu_coset_lde(coeffs, rate_bits, shift)
    return nttm._coset_lde_impl(coeffs, rate_bits, shift)


best_coset_lde = jax.jit(_best_coset_lde_impl, static_argnums=(1, 2))


def _best_coset_intt_impl(evals: GF, shift: int) -> GF:
    coeffs = _best_ntt_impl(evals, inverse=True)
    inv_sp = nttm.powers(nttm._scalar_gf(fh.inv(shift)), evals.lo.shape[-1])
    return gfp.mul(coeffs, inv_sp)


best_coset_intt = jax.jit(_best_coset_intt_impl, static_argnums=1)
