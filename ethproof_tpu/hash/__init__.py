"""Hash layer: Poseidon sponge/permutation, Merkle-cap trees, Keccak-f[1600].

Reference equivalents: plonky2's Poseidon hasher + `MerkleTree`/`MerkleCap`
(pin /root/reference/Cargo.lock:3441) and the keccak needed by witness/trie
code (/root/reference/leader/src/utils.rs:1-6).
"""

from . import constants, poseidon  # noqa: F401
