"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1, for TPU.

TPUs have no native 64-bit integer datapath, so field elements are carried as
pairs of uint32 lanes (lo, hi). All carry/borrow chains are explicit and exact;
every op keeps values canonical in [0, p). The same pure jnp functions run
unchanged inside Pallas kernels (they only use elementwise uint32 ops).

Reference equivalent: the `plonky2_field` crate (Goldilocks arithmetic, NTT
root tables) pinned by /root/reference/Cargo.lock:3466.
"""

from .field import (  # noqa: F401
    P,
    EPSILON,
    MULT_GROUP_GEN,
    TWO_ADICITY,
    GF,
    gf,
    from_u64,
    to_u64,
    zeros,
    ones,
    full,
    add,
    sub,
    neg,
    mul,
    sqr,
    mul_const,
    pow_const,
    inv,
    eq,
    is_zero,
    to_canonical,
    select,
    concatenate,
    stack,
    reshape,
    take,
)
from . import field_host  # noqa: F401
from .extension import GF2, W_EXT  # noqa: F401
