"""Aggregation ladder: per-level agg circuits over machine proofs.

Reference equivalent: proof_gen's aggregation circuit — verify two child
(root-or-agg) proofs in one plonky2 circuit — and the leader's binary
tree fold over it (/root/reference/ops/src/lib.rs:67-82,
/root/reference/leader/src/prover.rs:26-36). The TPU re-design avoids
plonky2's cyclic self-verification: the ladder is a PER-LEVEL family of
circuits (level k verifies two level k-1 machine proofs), built lazily
and cached — the direct analogue of the reference's per-degree circuit
ladders living in the cached prover state
(/root/reference/common/src/prover_state/circuit.rs:77-100).

Leaf lists are padded to a power of two by REPEATING the last leaf proof
(the analogue of the reference's dummy-padding to >= 2 leaves,
/root/reference/leader/src/padding_and_withdrawals.rs:38-80 — repeating
an already-proven statement needs no dummy circuits, and the verifier
replays the padding in its host digest computation).

Statement algebra (4-element Poseidon digests):
  leaf:  D_tx              (exposed by the tx root circuit)
  agg:   D = two_to_one(D_left, D_right)

A block verifier therefore checks ONE machine proof and re-derives the
expected digest tree from the per-tx statements by host hashing — cost
independent of transaction count beyond O(#tx) host Poseidon calls, and
proof size constant in the number of transactions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from ..fri.config import StarkConfig
from ..gf import field_host as fh
from ..hash import poseidon
from .machine import RecursionStark
from .verifier_circuit import CircuitChallenger, VerifierCompiler, add_stark_verify
from .wrap import MachineProof, machine_degree, prove_circuit, verify_machine

P = fh.P
NUM_PI = 4


def combine_digests(left: Sequence[int], right: Sequence[int]) -> List[int]:
    """Host mirror of the agg circuit's statement combination."""
    return poseidon.two_to_one_host(list(left), list(right))


@dataclass
class AggCircuit:
    """Level-k aggregation: verifies two level-(k-1) machine proofs and
    exposes two_to_one(D_left, D_right)."""

    vc: VerifierCompiler
    stark: RecursionStark
    log_n: int

    def prove(
        self, left: MachineProof, right: MachineProof, config: StarkConfig
    ) -> MachineProof:
        witness = self.vc.stream((left, right))
        pis = combine_digests(
            [int(x) % P for x in left.proof.public_inputs],
            [int(x) % P for x in right.proof.public_inputs],
        )
        return prove_circuit(self.stark, witness, pis, config, self.log_n)


def _variant_cap_wires(vc, child_starks, n: int, config: StarkConfig, side: int):
    """Child vkey cap as wires. One registered child shape: constants.
    Several (same machine shape, same log_n, different fixed columns —
    e.g. per-overlap tx root circuits): mux the K constant caps by a
    witnessed, bool-checked variant selector. Soundness: the selector
    only picks WHICH vkey the proof must verify against; the statement
    digest itself is recomputed by the outer verifier from the witness,
    so a wrong-variant proof cannot carry the forced public inputs."""
    from ..stark.prove import fixed_commitment
    from .verifier_circuit import mux

    b = vc.b
    caps = [fixed_commitment(s, n, config).cap for s in child_starks]
    if len(caps) == 1:
        vk = caps[0]
        return [
            [b.const(int(vk[r, i])) for r in range(4)] for i in range(vk.shape[1])
        ]
    k_bits = max(len(caps) - 1, 1).bit_length()
    while len(caps) & (len(caps) - 1):
        caps.append(caps[-1])
    sel = [
        vc.inp(
            lambda c, side=side, j=j: (int(c[side].variant) >> j) & 1,
            f"variant[{side}][{j}]",
        )
        for j in range(k_bits)
    ]
    for s in sel:
        b.bool_check(s)
    cap_w = caps[0].shape[1]
    return [
        [
            mux(b, [b.const(int(vk[r, i])) for vk in caps], sel)
            for r in range(4)
        ]
        for i in range(cap_w)
    ]


def build_agg(
    child_starks: "RecursionStark | List[RecursionStark]",
    child_log_n: int,
    config: StarkConfig,
) -> AggCircuit:
    if not isinstance(child_starks, list):
        child_starks = [child_starks]
    vc = VerifierCompiler()
    b = vc.b
    zero = b.const(0)
    n = 1 << child_log_n
    left_pis = [
        vc.inp(lambda c, k=k: int(c[0].proof.public_inputs[k]) % P, f"l_pi[{k}]")
        for k in range(NUM_PI)
    ]
    right_pis = [
        vc.inp(lambda c, k=k: int(c[1].proof.public_inputs[k]) % P, f"r_pi[{k}]")
        for k in range(NUM_PI)
    ]
    add_stark_verify(
        vc, child_starks[0], child_log_n, config,
        CircuitChallenger(b), left_pis, proof_of=lambda c: c[0].proof,
        fixed_cap=_variant_cap_wires(vc, child_starks, n, config, 0),
    )
    add_stark_verify(
        vc, child_starks[0], child_log_n, config,
        CircuitChallenger(b), right_pis, proof_of=lambda c: c[1].proof,
        fixed_cap=_variant_cap_wires(vc, child_starks, n, config, 1),
    )
    out = b.poseidon(left_pis + right_pis + [zero] * 4, "combine")[:NUM_PI]
    for k in range(NUM_PI):
        b.expose(out[k], k, f"pi[{k}]")
    circuit = b.build()
    return AggCircuit(
        vc=vc, stark=RecursionStark(circuit), log_n=machine_degree(circuit)
    )


class AggLadder:
    """Lazy per-level circuit cache over a fixed leaf machine shape.

    Level 0: the leaf (tx root) machine circuit, given at construction.
    Level k >= 1: the agg circuit whose children are level k-1 proofs.
    Building a level costs one verifier compilation + one fixed-column
    commitment; both are cached for the process lifetime (the analogue of
    the reference's prover_state disk cache, §L1.5).
    """

    def __init__(
        self,
        leaf_starks: "RecursionStark | List[RecursionStark]",
        leaf_log_n: int,
        config: StarkConfig,
    ):
        if not isinstance(leaf_starks, list):
            leaf_starks = [leaf_starks]
        self.config = config
        self._shape: Dict[int, Tuple[List[RecursionStark], int]] = {
            0: (leaf_starks, leaf_log_n)
        }
        self._agg: Dict[int, AggCircuit] = {}

    def agg(self, level: int) -> AggCircuit:
        assert level >= 1
        if level not in self._agg:
            cs, cn = self.level_shape(level - 1)
            a = build_agg(cs, cn, self.config)
            self._agg[level] = a
            self._shape[level] = ([a.stark], a.log_n)
        return self._agg[level]

    def level_shape(self, level: int) -> Tuple[List[RecursionStark], int]:
        if level not in self._shape:
            self.agg(level)
        return self._shape[level]


def fold_proofs(
    ladder: AggLadder, leaves: List[MachineProof], config: StarkConfig
) -> Tuple[MachineProof, int]:
    """Balanced binary fold of leaf proofs -> (top proof, top level)."""
    assert leaves, "need at least one leaf"
    proofs = list(leaves)
    while len(proofs) & (len(proofs) - 1):
        proofs.append(proofs[-1])  # pad to pow2 (verifier replays this)
    level = 0
    while len(proofs) > 1:
        level += 1
        agg = ladder.agg(level)
        proofs = [
            agg.prove(proofs[i], proofs[i + 1], config)
            for i in range(0, len(proofs), 2)
        ]
    return proofs[0], level


def expected_digest(leaf_digests: List[List[int]]) -> List[int]:
    """Host replay of the fold's statement algebra (incl. padding)."""
    ds = [list(d) for d in leaf_digests]
    while len(ds) & (len(ds) - 1):
        ds.append(ds[-1])
    while len(ds) > 1:
        ds = [combine_digests(ds[i], ds[i + 1]) for i in range(0, len(ds), 2)]
    return ds[0]


def verify_fold(
    ladder: AggLadder,
    top: MachineProof,
    top_level: int,
    leaf_digests: List[List[int]],
    config: StarkConfig,
) -> bool:
    """Succinct verification: ONE machine proof + host digest replay."""
    starks, log_n = ladder.level_shape(top_level)
    if top.log_n != log_n:
        return False
    if top.variant >= len(starks):
        return False
    if [int(x) % P for x in top.proof.public_inputs] != expected_digest(leaf_digests):
        return False
    return verify_machine(starks[top.variant], top, config)
