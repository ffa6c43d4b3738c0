"""Merkle-Patricia trie layer (host-side).

Reference equivalent: the `mpt_trie` crate (`HashedPartialTrie`, `Nibbles`,
`create_trie_subset`; pin /root/reference/Cargo.lock:2846) plus the RLP
encoding it relies on. Trie manipulation is pointer-chasing — host work by
design (SURVEY.md §2b): the STARK tables consume trie data as witness
bytes; nothing here touches the device.
"""

from . import rlp, nibbles, trie  # noqa: F401
from .trie import PartialTrie, EMPTY_TRIE_HASH  # noqa: F401
