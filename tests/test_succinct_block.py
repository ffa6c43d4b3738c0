"""END-TO-END succinct block proof: prove_block(recursion=True).

The flagship path (reference ops/src/lib.rs:52-101 + leader/src/
prover.rs:26-36): per-tx multi-table STARKs -> per-tx ROOT machine
proofs -> aggregation-ladder fold -> ONE constant-size machine proof
whose public inputs hash the block statement (seam + digest tree).
Everything here is MACHINE-PROVED — no interpreter shortcuts — at the
smallest viable FRI config (soundness-irrelevant, structure-complete).

Covers: recursion/state.py, runtime tasks tx_proof + agg_machine,
SuccinctBlockProof serde, verify_block's succinct tier, and both tamper
directions (leaf statement, top-proof FRI opening).
"""

import copy
import json

import pytest

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.hash.keccak import keccak256
from ethproof_tpu.runtime import serde
from ethproof_tpu.runtime.ops import verify_block
from ethproof_tpu.runtime.scheduler import Runtime, prove_block
from ethproof_tpu.tables.all import TableSizes
from ethproof_tpu.trie.nibbles import Nibbles
from ethproof_tpu.trie.trie import PartialTrie
from ethproof_tpu.witness.mpt import encode_account
from ethproof_tpu.witness.types import (
    BlockMetadata,
    GenerationInputs,
    TrieInputs,
    TrieRoots,
)

# smallest viable FRI config: 1 challenge, ONE query, no PoW. The point
# is structural completeness of the machine-proved path, not soundness —
# and the query count drives the verifier-circuit (hence root/agg
# machine) size, which dominates this test's multi-hour wall-clock
# (round-5 measurement: the 2-query fixture exceeded a 3h20m solo
# budget on the CPU tier).
TINY = StarkConfig(
    num_challenges=1,
    fri_config=FriConfig(
        rate_bits=2,
        cap_height=0,
        proof_of_work_bits=0,
        num_query_rounds=1,
        arity_bits=3,
        final_poly_bits=3,
    ),
)
SIZES = TableSizes(cpu=5, arithmetic=6, logic=4, bytepacking=9, memory=7, keccak=None)

PK = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF


def _key(addr):
    return Nibbles.from_bytes(keccak256(addr))


def _acct(nonce, balance):
    return encode_account(
        {
            "nonce": nonce,
            "balance": balance,
            "storage_root": PartialTrie().hash(),
            "code_hash": keccak256(b""),
        }
    )


def make_transfer_chain(n_txs: int = 2):
    """A block of `n_txs` chained zero-fee transfers from one sender:
    txn numbers, gas counters and state roots are continuous across the
    seams (what the agg circuit proves)."""
    from ethproof_tpu.evm.tx import private_key_to_address, sign_legacy_tx

    sender = private_key_to_address(PK)
    recipient = b"\xbb" * 20
    miner = b"\xcc" * 20
    state = PartialTrie()
    # all balances stay < 2^6: the transfer kernel range-checks values
    # against the arithmetic table (SIZES.arithmetic = 6)
    sender_bal, recv_bal = 40, 10
    nonce = 4
    state.insert(_key(sender), _acct(nonce, sender_bal))
    state.insert(_key(recipient), _acct(0, recv_bal))
    state.insert(_key(miner), _acct(0, 7))
    gis = []
    gas = 0
    for i in range(n_txs):
        value = 3 + i
        raw = sign_legacy_tx(
            nonce, 0, 21000, recipient, value, b"", PK, chain_id=1
        )
        post = state.copy()
        sender_bal -= value
        recv_bal += value
        nonce += 1
        post.insert(_key(sender), _acct(nonce, sender_bal))
        post.insert(_key(recipient), _acct(0, recv_bal))
        gis.append(
            GenerationInputs(
                txn_number_before=i,
                gas_used_before=gas,
                gas_used_after=gas + 21000,
                signed_txn=raw,
                tries=TrieInputs(state_trie=state.copy()),
                trie_roots_after=TrieRoots(state_root=post.hash()),
                checkpoint_state_trie_root=state.hash(),
                block_metadata=BlockMetadata(
                    block_beneficiary=miner, block_chain_id=1, block_base_fee=0
                ),
            )
        )
        gas += 21000
        state = post
    return gis


def _rstate(succ, config):
    """Rebuild the recursion ladder from the proof-declared identity —
    exactly what `cli verify` does (ethproof_tpu/cli.py cmd_verify)."""
    from ethproof_tpu.recursion.state import recursion_state

    return recursion_state(
        succ.sizes, config,
        binding_shape=succ.binding_shape,
        evm_shapes=succ.evm_shapes,
    )


@pytest.mark.slow
class TestSuccinctBlock:
    @pytest.fixture(scope="class")
    def block(self):
        gis = make_transfer_chain(2)
        bp = prove_block(
            gis, TINY, sizes=SIZES, runtime=Runtime(num_workers=2),
            recursion=True,
        )
        return bp

    def test_machine_proved_succinct_block(self, block):
        bp = block
        assert bp.succinct is not None, "recursion=True must emit succinct"
        assert bp.succinct.level == 1  # 2 leaves -> one agg level
        assert verify_block(bp, TINY, recursion=_rstate(bp.succinct, TINY))

    def test_serde_roundtrip_and_cli_style_verify(self, block):
        blob = json.dumps(serde.block_proof_to_json(block))
        back = serde.block_proof_from_json(json.loads(blob))
        assert back.succinct is not None
        assert verify_block(back, TINY, recursion=_rstate(back.succinct, TINY))

    def test_tampered_leaf_statement_rejected(self, block):
        bad = copy.deepcopy(block)
        # lie about the first tx's post-state root in the WITNESS: the
        # host-rederived leaf statement no longer matches the proved top
        bad.agg.left.gen_inputs.trie_roots_after.state_root = keccak256(b"no")
        assert not verify_block(bad, TINY, recursion=_rstate(bad.succinct, TINY))

    def test_tampered_top_proof_rejected(self, block):
        bad = copy.deepcopy(block)
        bad.succinct.top.proof.trace_query_openings.values[0, 0] ^= 1
        assert not verify_block(bad, TINY, recursion=_rstate(bad.succinct, TINY))

    def test_tampered_top_statement_rejected(self, block):
        bad = copy.deepcopy(block)
        pis = bad.succinct.top.proof.public_inputs
        pis[0] = (int(pis[0]) + 1) % ((1 << 64) - (1 << 32) + 1)
        assert not verify_block(bad, TINY, recursion=_rstate(bad.succinct, TINY))
