"""Proof orchestration runtime.

Reference equivalents: `leader/src/prover.rs` (map/fold/block pipeline),
`ops/src/lib.rs` (TxProof/AggProof/BlockProof operations),
`common/src/prover_state` (circuit config + persistence), and the paladin
runtime (replaced by in-process scheduling + jax.sharding; SURVEY.md §2d).
"""

from . import parsing, prover_state, ops, scheduler  # noqa: F401
