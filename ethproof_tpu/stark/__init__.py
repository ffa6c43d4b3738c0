"""STARK engine: generic table prover/verifier (starky equivalent).

Reference equivalent: the `starky 0.4.0` crate (pin
/root/reference/Cargo.lock:4529) — trace commit (LDE + Merkle cap),
constraint/quotient evaluation on the LDE domain, DEEP composition at zeta,
FRI opening proof. Re-designed for TPU: every per-row loop is a batched
device sweep; constraints are written once against a field-ops interface
and traced by XLA over the whole domain (prover) or executed on host
extension scalars at zeta (verifier).
"""

from . import stark, prove, verify  # noqa: F401
