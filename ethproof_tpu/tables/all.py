"""All-tables wiring: the multi-table zkEVM proof for one transaction.

Reference equivalent: evm_arithmetization's `AllStark` with its
cross-table lookups (cpu<->arithmetic, cpu<->logic, cpu/bytepacking<->
memory, ...) [dep: from knowledge; pin /root/reference/Cargo.lock:1675].
Table order mirrors the reference's Circuit enum
(/root/reference/common/src/prover_state/circuit.rs:59-67) with the
keccak pair pending (roadmap; see ARCHITECTURE.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..fri.config import StarkConfig
from ..stark.multi import CrossTableLookup, MultiProof, prove_multi, verify_multi
from . import arithmetic, bytepacking, logic, memory
from .cpu import CpuStark, CpuTraceResult, Instr, execute, pi_limbs

# table indices (stable order)
T_CPU, T_ARITH, T_LOGIC, T_BYTEPACK, T_MEM = range(5)


def build_ctls(cpu: CpuStark) -> List[CrossTableLookup]:
    mem_looking = [(T_CPU, spec) for spec in cpu.memory_ctl_specs()]
    mem_looking += [(T_BYTEPACK, s) for s in bytepacking.memory_ctl_specs()]
    return [
        CrossTableLookup(
            looking=((T_CPU, cpu.arith_ctl_spec()),),
            looked=(T_ARITH, arithmetic.ArithmeticStark.ctl_spec),
        ),
        CrossTableLookup(
            looking=((T_CPU, cpu.logic_ctl_spec()),),
            looked=(T_LOGIC, logic.LogicStark.ctl_spec),
        ),
        CrossTableLookup(
            looking=tuple(mem_looking),
            looked=(T_MEM, memory.MemoryStark.ctl_spec),
        ),
    ]


@dataclass
class TableSizes:
    """log2 trace lengths per table — the analogue of the reference's
    *_CIRCUIT_SIZE ranges (/root/reference/common/src/prover_state/
    circuit.rs:77-100). Tests use tiny sizes; production uses >= the
    range-check minimums (arith 2^16, bytepacking 2^9 ...)."""

    cpu: int = 5
    arithmetic: int = 6
    logic: int = 4
    bytepacking: int = 9
    memory: int = 7


def prove_all_tables(
    cpu: CpuStark,
    pi_words: List[int],
    sizes: TableSizes,
    config: StarkConfig,
) -> Tuple[MultiProof, CpuTraceResult]:
    """Execute the kernel and prove all five tables under one transcript."""
    res = execute(cpu.program, pi_words, 1 << sizes.cpu)
    arith_tr, _ = arithmetic.generate_trace(res.arith_requests, 1 << sizes.arithmetic)
    logic_tr, _ = logic.generate_trace(res.logic_requests, 1 << sizes.logic)
    bp_tr, bp_mem_ops = bytepacking.generate_trace([], 1 << sizes.bytepacking)
    mem_tr = memory.generate_trace(res.mem_ops + bp_mem_ops, 1 << sizes.memory)

    starks = [
        cpu,
        arithmetic.ArithmeticStark(),
        logic.LogicStark(),
        bytepacking.BytePackingStark(),
        memory.MemoryStark(),
    ]
    traces = [res.trace, arith_tr, logic_tr, bp_tr, mem_tr]
    pis: List[List[int]] = [pi_limbs(pi_words), [], [], [], []]
    proof = prove_multi(starks, traces, pis, build_ctls(cpu), config)
    return proof, res


def verify_all_tables(
    cpu: CpuStark,
    pi_words: List[int],
    proof: MultiProof,
    config: StarkConfig,
) -> bool:
    starks = [
        cpu,
        arithmetic.ArithmeticStark(),
        logic.LogicStark(),
        bytepacking.BytePackingStark(),
        memory.MemoryStark(),
    ]
    if len(proof.proofs) != len(starks):
        return False
    # the CPU proof must carry exactly the claimed public inputs
    if proof.proofs[T_CPU].public_inputs != pi_limbs(pi_words):
        return False
    return verify_multi(starks, proof, build_ctls(cpu), config)
