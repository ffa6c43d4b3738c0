"""The tx ROOT circuit: verify a whole multi-table proof in one machine.

Reference equivalent: proof_gen's `root` circuit — a plonky2 circuit that
verifies all 7 shrunk table proofs plus cross-table-lookup consistency,
producing the per-transaction `AggregatableProof::Txn`
(/root/reference/ops/src/lib.rs:52, circuit built at
/root/reference/common/src/prover_state/circuit.rs:200-206 [dep: from
knowledge of proof_gen 0.1.3]). The TPU re-design compiles
`stark/multi.verify_multi` monolithically: the shared-challenger
pre-phase, each table's full STARK verification (via the shared
`Stark.eval` traced over wires), and the cross-table grand-product
consistency check all become one machine circuit whose 4-element public
digest D_tx = sponge(cpu table public inputs) is the transaction
statement fed to the aggregation ladder (recursion/aggregate.py).

A root circuit is determined by (cpu program shape, table sizes, stark
config) — the same parameters that key the reference's cached prover
state (/root/reference/common/src/prover_state/circuit.rs:177-197).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from ..fri.config import StarkConfig
from ..gf import field_host as fh
from ..hash import poseidon
from ..stark.multi import MultiProof, _instances_for_table
from ..tables.all import TableSizes, all_starks, build_ctls
from ..tables.cpu import CpuStark
from .machine import RecursionStark
from .verifier_circuit import (
    CircuitChallenger,
    VerifierCompiler,
    add_stark_verify,
    sponge_hash,
)
from .wrap import MachineProof, machine_degree, prove_circuit

P = fh.P


def tx_statement_digest(pi_limbs: List[int]) -> List[int]:
    """Host mirror of the root circuit's exposed statement digest."""
    return poseidon.hash_n_to_m_no_pad_host([int(x) % P for x in pi_limbs], 4)


@dataclass
class TxRootCircuit:
    """Compiled root: machine circuit verifying one MultiProof."""

    vc: VerifierCompiler
    stark: RecursionStark
    log_n: int

    def prove(self, multi: MultiProof, config: StarkConfig) -> MachineProof:
        witness = self.vc.stream(multi)
        pis = tx_statement_digest(multi.proofs[0].public_inputs)
        return prove_circuit(self.stark, witness, pis, config, self.log_n)


def build_tx_root(
    cpu: CpuStark, sizes: TableSizes, config: StarkConfig
) -> TxRootCircuit:
    """Compile the circuit verifying `prove_all_tables(cpu, ., sizes, .)`
    proofs. Mirrors verify_multi (stark/multi.py) exactly."""
    with_keccak = sizes.keccak is not None
    starks = all_starks(cpu, with_keccak)
    ctls = build_ctls(cpu, with_keccak)
    log_ns = sizes.degree_bits(with_keccak)
    return _build_root(starks, ctls, log_ns, config)


def build_evm_root(machine, sizes: TableSizes, config: StarkConfig) -> TxRootCircuit:
    """Root circuit for the EVM machine's 7-table proofs
    (tables/evm.py + tables/all.build_ctls_evm): verifies a
    prove_evm_tables MultiProof and exposes the statement digest over
    the machine's public inputs (caller/callvalue/calldata/codehash/
    storage journal/success)."""
    from ..tables.all import build_ctls_evm

    starks = all_starks(machine, with_keccak=True)
    ctls = build_ctls_evm(machine)
    log_ns = [machine.shape.log_rows] + sizes.degree_bits(True)[1:]
    return _build_root(starks, ctls, log_ns, config)


def _build_root(starks, ctls, log_ns, config: StarkConfig) -> TxRootCircuit:
    assert len(log_ns) == len(starks)
    nc = config.num_challenges

    vc = VerifierCompiler()
    b = vc.b
    ch = CircuitChallenger(b)
    zero = b.const(0)

    # --- pre-phase (multi.py _pre_phase) ---
    ch.observe(b.const(len(starks)))
    table_pis: List[List] = []
    table_caps: List = []
    for t, (stark, log_n) in enumerate(zip(starks, log_ns)):
        pis_t = [
            vc.inp(
                lambda m, t=t, k=k: int(m.proofs[t].public_inputs[k]) % P,
                f"pis[{t}][{k}]",
            )
            for k in range(stark.num_public_inputs)
        ]
        ch.observe_many(pis_t)
        ch.observe(b.const(log_n))
        cap_t = vc.inp_cap(
            lambda m, t=t: m.proofs[t].trace_cap,
            config.fri_config.cap_height,
            f"cap[{t}]",
        )
        ch.observe_cap(cap_t)
        table_pis.append(pis_t)
        table_caps.append(cap_t)

    challenges = [(ch.get_challenge(), ch.get_challenge()) for _ in range(nc)]
    challenges_ext = [((bt, zero), (gm, zero)) for bt, gm in challenges]

    # --- per-table verification on the shared challenger ---
    looking_prod: Dict[Tuple[int, int], object] = {}
    looked_val: Dict[Tuple[int, int], object] = {}
    for t, (stark, log_n) in enumerate(zip(starks, log_ns)):
        instances, labels = _instances_for_table(t, ctls, challenges_ext)
        spec_ch = [(i.spec, i.beta, i.gamma) for i in instances]
        wires = add_stark_verify(
            vc, stark, log_n, config, ch, table_pis[t],
            proof_of=lambda m, t=t: m.proofs[t],
            ctl_specs_with_challenges=spec_ch or None,
            trace_cap=table_caps[t],
        )
        for (ci, hi, role, _pos, _t), total in zip(labels, wires.ctl_totals):
            key = (ci, hi)
            if role == "looking":
                prev = looking_prod.get(key)
                looking_prod[key] = total if prev is None else b.mul(prev, total)
            else:
                looked_val[key] = total

    # --- cross-table multiset equality (multi.py verify_multi tail) ---
    one = b.const(1)
    for ci in range(len(ctls)):
        for hi in range(nc):
            key = (ci, hi)
            b.assert_eq(
                looking_prod.get(key, one),
                looked_val.get(key, one),
                f"ctl-product[{ci}][{hi}]",
            )

    # --- statement digest: the cpu table's public inputs ---
    digest = sponge_hash(b, table_pis[0], 4)
    for k in range(4):
        b.expose(digest[k], k, f"pi[{k}]")

    circuit = b.build()
    return TxRootCircuit(
        vc=vc, stark=RecursionStark(circuit), log_n=machine_degree(circuit)
    )
