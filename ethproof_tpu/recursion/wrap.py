"""Prove / verify machine circuits; the wrap (shrink) step.

Reference equivalent: proof_gen's per-table shrink ladder — each STARK
proof is recursively wrapped until it reaches a fixed size
(/root/reference/common/src/prover_state/circuit.rs:200-206 [dep: from
knowledge of proof_gen 0.1.3]). Here a "wrap" is one machine proof whose
circuit verifies the child proof and re-exposes its public inputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..fri.config import StarkConfig
from ..gf import field_host as fh
from ..stark.prove import StarkProof, stark_prove
from ..stark.verify import stark_verify
from .circuit import Circuit, interpret
from .machine import RecursionStark, generate_trace
from .verifier_circuit import CompiledVerifier, compile_stark_verifier

P = fh.P


def machine_degree(target, floor_bits: int = 6) -> int:
    """log2 rows for a machine proof (next pow2, floored).

    Accepts the RecursionStark (whose layout knows the PACKED row count
    after 4-lane scheduling) or a bare Circuit (pre-packing upper bound
    — only for sizing before a stark exists)."""
    rows = target.num_rows  # RecursionStark.num_rows or Circuit.num_rows
    need = max(rows, 1 << floor_bits)
    return (need - 1).bit_length()


@dataclass
class MachineProof:
    """A machine STARK proof plus the (static) identity of its circuit.

    `variant` selects among registered same-shape leaf circuits (e.g. the
    per-overlap transfer root circuits) when a parent agg circuit muxes
    the child vkey — see aggregate.build_agg.

    `seam`/`digest` are the statement PREIMAGE (aggregation sextuple +
    inner kernel digest; recursion/root.py layout) whose sponge equals
    the proof's 4 public-input words. They are prover-side plumbing: a
    parent agg circuit witnesses them to recompute and chain the child
    statements; verifiers re-derive them from the witness instead."""

    proof: StarkProof
    log_n: int
    variant: int = 0
    seam: Optional[List[int]] = None
    digest: Optional[List[int]] = None


def prove_circuit(
    stark: RecursionStark,
    witness: Sequence[int],
    public_inputs: List[int],
    config: StarkConfig,
    log_n: Optional[int] = None,
) -> MachineProof:
    """Interpret the circuit (checking every assertion — the prover-side
    sanity run), generate the machine trace, and STARK-prove it."""
    vals = interpret(stark.circuit, witness, public_inputs, check=True)
    bits = log_n or machine_degree(stark)
    tr = generate_trace(stark, vals, 1 << bits)
    return MachineProof(
        proof=stark_prove(stark, tr, public_inputs, config), log_n=bits
    )


def verify_machine(
    stark: RecursionStark, mp: MachineProof, config: StarkConfig
) -> bool:
    if mp.proof.degree_bits != mp.log_n:
        return False
    return stark_verify(stark, mp.proof, config)


@dataclass
class WrapCircuit:
    """Compiled wrap step: machine circuit + its prover-side machinery."""

    compiled: CompiledVerifier
    stark: RecursionStark
    log_n: int  # machine degree of the WRAP proof

    def prove(self, child_proof: StarkProof, config: StarkConfig) -> MachineProof:
        witness = self.compiled.witness(child_proof)
        pis = [int(x) % P for x in child_proof.public_inputs]
        return prove_circuit(self.stark, witness, pis, config, self.log_n)


def build_wrap(child_stark, child_log_n: int, config: StarkConfig) -> WrapCircuit:
    """Compile the circuit verifying `child_stark` proofs at degree
    2^child_log_n, and set up its machine STARK."""
    compiled = compile_stark_verifier(child_stark, child_log_n, config)
    stark = RecursionStark(compiled.circuit)
    return WrapCircuit(
        compiled=compiled, stark=stark, log_n=machine_degree(stark)
    )
