"""zkEVM STARK tables.

Reference equivalent: `evm_arithmetization`'s `AllStark` — the 7-table
zkEVM (Arithmetic, BytePacking, Cpu, Keccak, KeccakSponge, Logic, Memory)
stitched by cross-table lookups [dep: from knowledge; pin
/root/reference/Cargo.lock:1675; table enum mirrored from
/root/reference/common/src/prover_state/circuit.rs:59-67].

Data model: 256-bit EVM words as 16 little-endian 16-bit limbs, each limb
a Goldilocks element range-checked by an in-table logUp against a counter
column. 16-bit limbs keep every constraint's integer arithmetic far below
p (no wraparound), so limb equations hold over Z.
"""

from . import (  # noqa: F401
    arithmetic,
    bytepacking,
    cpu,
    keccak,
    keccak_sponge,
    logic,
    memory,
)
