"""Witness front-end: RPC gathering, GenerationInputs, padding/withdrawals.

Reference equivalent: the `leader rpc` path — `gather_witness` and friends
(/root/reference/leader/src/lib.rs:158-535, mpt.rs, rpc.rs,
padding_and_withdrawals.rs). All host-side: network I/O + trie surgery.
"""

from . import types, padding  # noqa: F401
from .types import GenerationInputs, TrieInputs, BlockMetadata, BlockHashes, TrieRoots  # noqa: F401
