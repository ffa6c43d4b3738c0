"""Succinct recursive aggregation: the verifier machine.

Reference equivalent: proof_gen's `AllRecursiveCircuits` — plonky2 circuits
that verify STARK/recursive proofs so that aggregation yields constant-size
proofs (/root/reference/common/src/prover_state/circuit.rs:200-206,
/root/reference/ops/src/lib.rs:52-101). The TPU-native re-design replaces
plonky2's gate/CircuitBuilder stack with:

- `circuit`: a wire/gate straight-line IR + builder + interpreter;
- `compile_verifier`: compiles THIS framework's own STARK verifier
  (transcript replay, constraint-at-zeta, FRI, Merkle binding) into that
  IR — the constraint-at-zeta part is obtained by running each table's
  `Stark.eval` over symbolic wire operations (the same FieldOps
  polymorphism that unifies the device sweep and the host verifier);
- `machine`: a STARK whose trace executes a circuit — one gate per row,
  one Poseidon round per row (30-row permutation blocks), with dataflow
  routed by an in-table logUp bus over preprocessed wire tags;
- `aggregate`: tx -> agg -> block proof algebra over machine proofs.
"""

from .aggregate import AggLadder, combine_digests, expected_statement, fold_proofs, verify_fold
from .circuit import CBuilder, Circuit, Gate, interpret
from .machine import RecursionStark, generate_trace
from .root import TxRootCircuit, build_tx_root, leaf_statement, tx_seam, tx_statement_digest
from .wrap import MachineProof, build_wrap, prove_circuit, verify_machine
