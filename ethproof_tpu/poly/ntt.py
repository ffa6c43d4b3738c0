"""Radix-2 NTT / iNTT / coset-LDE over Goldilocks on TPU.

Reference equivalent: `plonky2_field` fft module (DIT butterflies with
precomputed `fft_root_table`, coset LDE used by starky's polynomial
commitments) [dep: from knowledge; pin /root/reference/Cargo.lock:3466].

TPU design (not a port of the Rust loop nest):
- A length-n transform is log2(n) *stages*; each stage is one batched
  butterfly over the whole array expressed as reshape + slice + elementwise
  GF mul/add/sub — no scalar loops, no dynamic shapes, everything fuses
  into a handful of uint32 VPU ops per stage.
- Data layout: the transform runs over the LAST axis; leading axes are
  batch (columns of a trace matrix). u32-pair lanes throughout.
- Twiddle tables are computed ON DEVICE at trace time by log-doubling
  (`powers`) and become XLA constants per (n, inverse) — the analogue of
  plonky2's cached `fft_root_table`, but they live in HBM and are shared
  by every column in the batch.
- Bit-reversal is a single static gather (`jnp.take`) with a host-computed
  index vector (vectorized numpy, no python-per-element work).

Orderings: `ntt` maps natural-order coefficients -> natural-order
evaluations over H = <w_n> (w_n = plonky2's power_of_two_generator chain);
`intt` is its exact inverse. `coset_lde` evaluates on shift * H' where H'
is the 2^rate_bits-times-larger subgroup, matching starky's LDE with
`standard_fast_config` rate_bits=2 (selected via
/root/reference/common/src/prover_state/circuit.rs:204).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gf import field as gfp
from ..gf import field_host
from ..gf.field import GF

_U32 = jnp.uint32


def _bitrev_indices(log_n: int) -> jnp.ndarray:
    """Bit-reversal permutation indices, computed ON DEVICE from iota.

    Embedding a host-precomputed table would bake an O(n) constant into the
    compiled program (at 2^24 that is a 64 MB HLO constant — rejected by
    the remote-compile transport); log_n shift/or ops on an iota cost
    nothing and keep the executable tiny.
    """
    n = 1 << log_n
    idx = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.zeros(n, dtype=jnp.int32)
    for b in range(log_n):
        rev = (rev << 1) | ((idx >> b) & 1)
    return rev


def _powers_impl(lo, hi, n: int):
    p = gfp.ones((1,))
    acc = GF(lo, hi)
    length = 1
    while length < n:
        nxt = gfp.mul(p, GF(jnp.broadcast_to(acc.lo, (length,)),
                            jnp.broadcast_to(acc.hi, (length,))))
        p = gfp.concatenate([p, nxt])
        acc = gfp.mul(acc, acc)
        length *= 2
    return p.lo, p.hi


_powers_jit = None


def powers(base: GF, n: int) -> GF:
    """[1, base, base^2, ..., base^(n-1)] via log-doubling (log2 n muls).

    base: GF scalar (shape ()). Device computation — no host bignum
    loops; jitted per length so the doubling chain is one dispatch.
    """
    assert n & (n - 1) == 0 and n >= 1
    global _powers_jit
    if _powers_jit is None:
        import jax

        _powers_jit = jax.jit(_powers_impl, static_argnums=2)
    return GF(*_powers_jit(base.lo, base.hi, n))


def _scalar_gf(x: int) -> GF:
    x %= field_host.P
    return GF(jnp.asarray(x & 0xFFFFFFFF, dtype=_U32), jnp.asarray(x >> 32, dtype=_U32))


def _stage_twiddles(log_n: int, inverse: bool) -> list:
    """Twiddles per DIT stage s (m = 2^(s+1)): powers of the order-m root."""
    tw = []
    for s in range(log_n):
        m = 1 << (s + 1)
        root = field_host.primitive_root_of_unity(s + 1)
        if inverse:
            root = field_host.inv(root)
        tw.append(powers(_scalar_gf(root), m // 2))
    return tw


def _ntt_impl(a: GF, inverse: bool) -> GF:
    n = a.lo.shape[-1]
    assert n & (n - 1) == 0, "length must be a power of two"
    log_n = n.bit_length() - 1
    if n == 1:
        return a
    rev = _bitrev_indices(log_n)
    x = GF(jnp.take(a.lo, rev, axis=-1), jnp.take(a.hi, rev, axis=-1))
    batch = x.lo.shape[:-1]
    twiddles = _stage_twiddles(log_n, inverse)
    for s in range(log_n):
        half = 1 << s  # m/2
        blocks = n >> (s + 1)
        shape = batch + (blocks, 2, half)
        xr = gfp.reshape(x, shape)
        x0 = GF(xr.lo[..., 0, :], xr.hi[..., 0, :])
        x1 = GF(xr.lo[..., 1, :], xr.hi[..., 1, :])
        w = twiddles[s]  # (half,) broadcasts over batch + blocks
        t = gfp.mul(x1, w)
        e = gfp.add(x0, t)
        o = gfp.sub(x0, t)
        x = GF(
            jnp.stack([e.lo, o.lo], axis=-2).reshape(batch + (n,)),
            jnp.stack([e.hi, o.hi], axis=-2).reshape(batch + (n,)),
        )
    if inverse:
        n_inv = field_host.inv(n)
        x = gfp.mul(x, _scalar_gf(n_inv))
    return x


ntt = jax.jit(partial(_ntt_impl, inverse=False))
ntt.__doc__ = "Forward NTT over the last axis (natural -> natural order)."
intt = jax.jit(partial(_ntt_impl, inverse=True))
intt.__doc__ = "Inverse NTT over the last axis (exact inverse of ntt)."


def _coset_lde_impl(coeffs: GF, rate_bits: int, shift: int) -> GF:
    """Evaluate poly (coeffs over last axis, natural order) on shift * H'.

    |H'| = len * 2^rate_bits. Returns evaluations in natural order of H'.
    """
    n = coeffs.lo.shape[-1]
    big_n = n << rate_bits
    batch = coeffs.lo.shape[:-1]
    # scale coefficients: p(shift * x) has coeffs c_i * shift^i
    sp = powers(_scalar_gf(shift), n)
    scaled = gfp.mul(coeffs, sp)
    pad = [(0, 0)] * (len(batch)) + [(0, big_n - n)]
    padded = GF(jnp.pad(scaled.lo, pad), jnp.pad(scaled.hi, pad))
    return _ntt_impl(padded, inverse=False)


coset_lde = jax.jit(_coset_lde_impl, static_argnums=(1, 2))
coset_lde.__doc__ = _coset_lde_impl.__doc__


def _coset_intt_impl(evals: GF, shift: int) -> GF:
    """Inverse of evaluation on shift * H: evaluations -> coefficients."""
    n = evals.lo.shape[-1]
    coeffs = _ntt_impl(evals, inverse=True)
    inv_sp = powers(_scalar_gf(field_host.inv(shift)), n)
    return gfp.mul(coeffs, inv_sp)


coset_intt = jax.jit(_coset_intt_impl, static_argnums=1)
coset_intt.__doc__ = _coset_intt_impl.__doc__


# Host reference (exact, slow) for golden tests ------------------------------

def ntt_host(vals: list[int]) -> list[int]:
    """O(n^2) DFT over H, python ints — golden model for small sizes."""
    n = len(vals)
    w = field_host.primitive_root_of_unity(n.bit_length() - 1)
    return [
        sum(vals[j] * pow(w, i * j, field_host.P) for j in range(n)) % field_host.P
        for i in range(n)
    ]
