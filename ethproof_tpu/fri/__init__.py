"""FRI layer: Fiat-Shamir challenger, low-degree commit/fold/query, verifier.

Reference equivalent: plonky2's `fri` module + `iop::challenger::Challenger`
(pin /root/reference/Cargo.lock:3441), as used by starky with
`standard_fast_config` — rate_bits 2, cap_height 4, pow_bits 16, 84 query
rounds (selected at /root/reference/common/src/prover_state/circuit.rs:204).
"""

from . import challenger, config, prove, verify  # noqa: F401
