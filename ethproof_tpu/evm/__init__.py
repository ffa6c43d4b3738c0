"""EVM front-end: transaction parsing, sender recovery, kernel drivers.

Reference equivalent: the transaction-semantics half of
evm_arithmetization's Kernel (tx decoding, signature recovery, balance/
nonce/gas transition) [dep: from knowledge; pin
/root/reference/Cargo.lock:1675]. Host-side: trace GENERATION is
sequential interpretation (SURVEY.md §2b); the proving of those traces is
the TPU workload in ethproof_tpu.tables.
"""

from . import secp256k1, tx  # noqa: F401
