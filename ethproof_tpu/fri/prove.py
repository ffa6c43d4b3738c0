"""FRI prover: batched commit/fold on device, host-driven transcript.

Reference equivalent: plonky2 `fri::prover::fri_proof` [dep: from knowledge;
pin /root/reference/Cargo.lock:3441] — commit phase over reduction arities,
proof-of-work grind, query-round openings. Re-designed for TPU:

- The codeword lives on device as a GF2 (pair of GF u32-lane arrays) in
  NATURAL domain order (index i <-> point s * g^i).
- A commit round with arity A = 2^a builds one Merkle tree whose leaf j
  packs the whole fold-coset {j + k * (m/A)}: the verifier needs exactly one
  path per round per query. Leaf rows are the 2A base-field lanes.
- Folding is `a` radix-2 butterfly steps, each one fused elementwise pass
  (add/sub/mul by device-computed inverse-point powers) — same shape of op
  as an NTT stage, evaluated at beta^(2^t) per sub-step t.
- Proof-of-work grinding is a data-parallel Poseidon sweep over candidate
  witnesses — the TPU replaces plonky2's rayon search loop.
- Query openings are static gathers over the retained tree levels.

The host Challenger (challenger.py) sequences caps -> betas -> pow ->
query indices; only caps/betas/final-poly cross the host boundary.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..gf import extension as gf2
from ..gf import field as gfp
from ..gf import field_host as fh
from ..gf.extension import GF2
from ..gf.field import GF
from ..hash import merkle, poseidon
from .challenger import Challenger
from .config import FriConfig

_U32 = jnp.uint32
_INV2 = fh.inv(2)


# -- proof container (host-side numpy; serializable) -------------------------


@dataclass
class FriQueryRound:
    """Per-commit-round openings for all queries, batched over queries."""

    leaf_values: np.ndarray  # (num_q, arity, 2) u64 — ext elements per coset
    merkle_paths: np.ndarray  # (num_q, path_len, 4) u64


@dataclass
class FriProof:
    commit_caps: List[np.ndarray]  # per round: (4, 2^cap_height) u64
    query_rounds: List[FriQueryRound]
    final_poly: np.ndarray  # (final_len, 2) u64 extension coefficients
    pow_witness: int
    degree_bits: int  # log2 of claimed degree bound
    # Derived (not part of the transcript): the sampled codeword indices, so
    # outer protocols (STARK) can open their own oracles at the same points.
    query_indices: np.ndarray | None = None


# -- device kernels ----------------------------------------------------------


def _scalar_gf(x: int) -> GF:
    x %= fh.P
    return GF(jnp.asarray(x & 0xFFFFFFFF, dtype=_U32), jnp.asarray(x >> 32, dtype=_U32))


def _leaf_rows(code: GF2, arity: int) -> GF:
    """Pack codeword (m,) ext elements into Merkle rows (2*arity, m/arity).

    Row layout per leaf j: [a_0, b_0, a_1, b_1, ...] for coset members
    k = 0..arity-1, value v[j + k*(m/arity)] = a_k + b_k X.
    """
    m = code.a.lo.shape[-1]
    leaves = m // arity
    rows_lo, rows_hi = [], []
    for k in range(arity):
        sl = slice(k * leaves, (k + 1) * leaves)
        rows_lo += [code.a.lo[sl], code.b.lo[sl]]
        rows_hi += [code.a.hi[sl], code.b.hi[sl]]
    return GF(jnp.stack(rows_lo), jnp.stack(rows_hi))


@jax.jit
def _fold_step(code: GF2, beta: GF2, xinv: GF) -> GF2:
    """One radix-2 FRI fold: m -> m/2 (natural order maintained).

    f'(x^2) = (f(x) + f(-x))/2 + beta * (f(x) - f(-x)) / (2x), where the
    i-th point pairs with i + m/2 (g^(m/2) = -1) and xinv[i] = (s g^i)^-1.
    """
    m = code.a.lo.shape[-1]
    half = m // 2
    lo_part = code[..., :half]
    hi_part = code[..., half:]
    e = gf2.add(lo_part, hi_part)
    d = gf2.sub(lo_part, hi_part)
    o = gf2.mul_base(d, xinv)
    folded = gf2.add(e, gf2.mul(beta, o))
    return gf2.mul_base(folded, _scalar_gf(_INV2))


def _half_domain_inverses(shift: int, log_m: int):
    """xinv[i] = (shift * g^i)^-1 for i < 2^(log_m-1), device-computed."""
    from ..poly import ntt as nttm

    g_inv = fh.inv(fh.primitive_root_of_unity(log_m))
    p = nttm.powers(_scalar_gf(g_inv), 1 << (log_m - 1))
    return gfp.mul(p, _scalar_gf(fh.inv(shift)))


@jax.jit
def _pow_hashes(challenge: GF, candidates: GF) -> GF:
    """hash(challenge, w)[0] for a batch of candidate witnesses."""
    n = candidates.lo.shape[0]
    ch = GF(
        jnp.broadcast_to(challenge.lo, (n,)), jnp.broadcast_to(challenge.hi, (n,))
    )
    inp = gfp.stack([ch, candidates], axis=0)  # (2, n)
    out = poseidon._hash_n_to_m_impl(inp, 1)
    return GF(out.lo[0], out.hi[0])


def grind_pow(challenge: int, pow_bits: int, batch: int | None = None) -> int:
    """Find w with pow_bits leading zeros in hash(challenge, w)[0].

    Batch scales with expected search size (2^pow_bits candidates): small
    difficulties shouldn't pay for a huge sweep (matters on the CPU test
    backend, where a 2^15-lane Poseidon batch is minutes of work).
    """
    if pow_bits == 0:
        return 0
    if batch is None:
        batch = min(1 << (pow_bits + 2), 1 << 15)
    ch = _scalar_gf(challenge)
    threshold = 1 << (64 - pow_bits)
    base = 0
    while True:
        cand = np.arange(base, base + batch, dtype=np.uint64)
        h = gfp.to_u64(_pow_hashes(ch, gfp.from_u64(cand)))
        ok = np.nonzero(h < np.uint64(threshold))[0]
        if ok.size:
            return int(cand[ok[0]])
        base += batch


def pow_response(challenge: int, witness: int) -> int:
    return poseidon.hash_n_to_m_no_pad_host([challenge, witness], 1)[0]


# -- prover ------------------------------------------------------------------


def fri_prove(
    codeword: GF2,
    degree_bits: int,
    config: FriConfig,
    challenger: Challenger,
) -> FriProof:
    """Prove `codeword` (length 2^(degree_bits + rate_bits), natural order
    over coset shift*H) is the evaluation of a degree < 2^degree_bits poly.
    """
    m = codeword.a.lo.shape[-1]
    assert m == 1 << (degree_bits + config.rate_bits)
    arities = config.reduction_arity_bits(degree_bits)

    shift = config.coset_shift
    log_m = degree_bits + config.rate_bits

    caps: List[np.ndarray] = []
    trees = []
    codes = [codeword]
    code = codeword
    for a_bits in arities:
        arity = 1 << a_bits
        rows = _leaf_rows(code, arity)
        tree = merkle.build(rows, config.cap_height)
        trees.append(tree)
        cap = gfp.to_u64(tree.cap)
        caps.append(cap)
        challenger.observe_cap(cap)
        beta_ints = challenger.get_extension_challenge()
        beta = GF2(_scalar_gf(beta_ints[0]), _scalar_gf(beta_ints[1]))
        for _ in range(a_bits):
            xinv = _half_domain_inverses(shift, log_m)
            code = _fold_step(code, beta, xinv)
            beta = gf2.mul(beta, beta)
            shift = shift * shift % fh.P
            log_m -= 1
        codes.append(code)

    # final polynomial: coset iNTT, keep the low-degree coefficients
    from ..poly import ntt as nttm

    final_len = 1 << (log_m - config.rate_bits)
    from ..poly import mxu_ntt as mxnt
    coeff_a = mxnt._best_coset_intt_impl(code.a, shift)
    coeff_b = mxnt._best_coset_intt_impl(code.b, shift)
    fp = np.stack(
        [gfp.to_u64(coeff_a)[:final_len], gfp.to_u64(coeff_b)[:final_len]], axis=1
    )
    for c in fp:
        challenger.observe_extension((int(c[0]), int(c[1])))

    # proof of work
    pow_challenge = challenger.get_challenge()
    pow_witness = grind_pow(pow_challenge, config.proof_of_work_bits)
    challenger.observe_element(pow_response(pow_challenge, pow_witness))

    # query indices
    lde_size = 1 << (degree_bits + config.rate_bits)
    indices = np.array(
        [challenger.get_challenge() % lde_size for _ in range(config.num_query_rounds)],
        dtype=np.int64,
    )

    # openings per round (device gathers, pulled to host)
    query_rounds: List[FriQueryRound] = []
    idx = indices
    for r, a_bits in enumerate(arities):
        arity = 1 << a_bits
        m_r = codes[r].a.lo.shape[-1]
        leaves = m_r // arity
        j = idx % leaves
        jj = jnp.asarray(j)
        rows = _leaf_rows(codes[r], arity)  # (2*arity, leaves)
        vals = gfp.to_u64(GF(rows.lo[:, jj], rows.hi[:, jj]))  # (2A, num_q)
        leaf_values = np.transpose(vals).reshape(len(indices), arity, 2)
        path = merkle.open_path(trees[r], jj)  # (path_len, 4, num_q)
        paths = np.transpose(gfp.to_u64(path), (2, 0, 1))
        query_rounds.append(FriQueryRound(leaf_values, paths))
        idx = j

    return FriProof(
        commit_caps=caps,
        query_rounds=query_rounds,
        final_poly=fp,
        pow_witness=pow_witness,
        degree_bits=degree_bits,
        query_indices=indices,
    )
