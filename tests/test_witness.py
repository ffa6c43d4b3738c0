"""Witness generation against a synthetic chain served by a fake RPC.

Exercises the full gather_witness pipeline: prestate/diff traces, proof
absorption, trie re-rooting, per-tx IR emission, padding, JSON round-trip.
"""

import json

import pytest

from ethproof_tpu.hash.keccak import keccak256
from ethproof_tpu.trie import rlp
from ethproof_tpu.trie.nibbles import Nibbles
from ethproof_tpu.trie.trie import PartialTrie
from ethproof_tpu.witness.gather import RpcClient, gather_witness
from ethproof_tpu.witness.mpt import encode_account
from ethproof_tpu.witness.types import witness_from_json, witness_to_json

GWEI = 10**9
A = "0x" + "aa" * 20  # sender
B = "0x" + "bb" * 20  # recipient
M = "0x" + "cc" * 20  # miner


def acct_key(addr_hex):
    return Nibbles.from_bytes(keccak256(bytes.fromhex(addr_hex[2:])))


def make_state(balances, nonces):
    t = PartialTrie()
    for addr, bal in balances.items():
        t.insert(
            acct_key(addr),
            encode_account(
                {
                    "nonce": nonces.get(addr, 0),
                    "balance": bal,
                    "storage_root": PartialTrie().hash(),
                    "code_hash": keccak256(b""),
                }
            ),
        )
    return t


class FakeRpc:
    """Synthetic 1-tx chain: A sends 1000 wei to B, fee 21000 wei to M."""

    def __init__(self):
        self.pre_balances = {A: 10**18, B: 5, M: 77}
        self.pre_nonces = {A: 4}
        self.value, self.fee = 1000, 21000
        self.pre_state = make_state(self.pre_balances, self.pre_nonces)
        post_bal = dict(self.pre_balances)
        post_bal[A] -= self.value + self.fee
        post_bal[B] += self.value
        post_bal[M] += self.fee
        self.post_nonces = {A: 5}
        self.post_state = make_state(post_bal, self.post_nonces)
        self.post_balances = post_bal

        self.raw_tx = b"\xf8\x64" + b"\x01" * 100  # opaque signed tx bytes
        self.tx_hash = "0x" + keccak256(self.raw_tx).hex()
        self.block_number = 5

        self.txns_trie = PartialTrie()
        self.txns_trie.insert(
            Nibbles.from_bytes(rlp.encode(rlp.int_to_bytes(0))), self.raw_tx
        )
        receipt_payload = rlp.encode(
            [rlp.int_to_bytes(1), rlp.int_to_bytes(21000), b"\x00" * 256, []]
        )
        self.receipts_trie = PartialTrie()
        self.receipts_trie.insert(
            Nibbles.from_bytes(rlp.encode(rlp.int_to_bytes(0))), receipt_payload
        )

        self.block_hashes = {
            n: bytes([n]) * 32 for n in range(0, self.block_number + 1)
        }

    # -- RPC surface ---------------------------------------------------------

    def transport(self, payload):
        method, params = payload["method"], payload["params"]
        return {"result": getattr(self, "_" + method)(*params)}

    def _eth_chainId(self):
        return hex(1)

    def _eth_getTransactionByHash(self, h):
        assert h == self.tx_hash
        return {
            "hash": self.tx_hash,
            "blockNumber": hex(self.block_number),
            "transactionIndex": "0x0",
        }

    def _block_header(self, n):
        is_cur = n == self.block_number
        state = self.post_state if is_cur else self.pre_state
        return {
            "number": hex(n),
            "hash": "0x" + self.block_hashes[n].hex(),
            "parentHash": "0x" + self.block_hashes.get(n - 1, b"\x00" * 32).hex(),
            "stateRoot": "0x" + state.hash().hex(),
            "transactionsRoot": "0x" + (self.txns_trie.hash().hex() if is_cur else PartialTrie().hash().hex()),
            "receiptsRoot": "0x" + (self.receipts_trie.hash().hex() if is_cur else PartialTrie().hash().hex()),
            "miner": M,
            "timestamp": hex(1700000000 + n),
            "difficulty": "0x0",
            "gasLimit": hex(30_000_000),
            "gasUsed": hex(21000 if is_cur else 0),
            "baseFeePerGas": "0x1",
            "mixHash": "0x" + "ab" * 32,
            "logsBloom": "0x" + "00" * 256,
            "transactions": [self.tx_hash] if is_cur else [],
        }

    def _eth_getBlockByNumber(self, num_hex, full=False):
        return self._block_header(int(num_hex, 16))

    def _eth_getTransactionReceipt(self, h):
        return {
            "transactionHash": h,
            "transactionIndex": "0x0",
            "type": "0x0",
            "status": "0x1",
            "gasUsed": hex(21000),
            "cumulativeGasUsed": hex(21000),
            "logsBloom": "0x" + "00" * 256,
            "logs": [],
        }

    def _eth_getRawTransactionByHash(self, h):
        return "0x" + self.raw_tx.hex()

    def _eth_getProof(self, address, slots, num_hex):
        state = (
            self.post_state
            if int(num_hex, 16) == self.block_number
            else self.pre_state
        )
        proof = state.prove(acct_key(address))
        return {
            "accountProof": ["0x" + p.hex() for p in proof],
            "storageHash": "0x" + PartialTrie().hash().hex(),
            "storageProof": [],
        }

    def _debug_traceTransaction(self, h, opts):
        if opts.get("tracerConfig", {}).get("diffMode"):
            return {
                "pre": {
                    A: {"balance": hex(self.pre_balances[A]), "nonce": 4},
                    B: {"balance": hex(self.pre_balances[B])},
                    M: {"balance": hex(self.pre_balances[M])},
                },
                "post": {
                    A: {"balance": hex(self.post_balances[A]), "nonce": 5},
                    B: {"balance": hex(self.post_balances[B])},
                    M: {"balance": hex(self.post_balances[M])},
                },
            }
        return {
            A: {"balance": hex(self.pre_balances[A]), "nonce": 4},
            B: {"balance": hex(self.pre_balances[B])},
            M: {"balance": hex(self.pre_balances[M])},
        }


class TestGatherWitness:
    def setup_method(self):
        self.chain = FakeRpc()
        self.client = RpcClient("fake://", transport=self.chain.transport)

    def test_witness_structure(self):
        ir = gather_witness(self.chain.tx_hash, self.client)
        # 1 real tx + 1 prepended dummy (no withdrawals)
        assert len(ir) == 2
        assert ir[0].signed_txn is None  # dummy first
        assert ir[1].signed_txn == self.chain.raw_tx

    def test_state_roots_chain(self):
        ir = gather_witness(self.chain.tx_hash, self.client)
        real = ir[1]
        assert real.tries.state_trie.hash() == self.chain.pre_state.hash()
        assert real.trie_roots_after.state_root == self.chain.post_state.hash()
        assert real.trie_roots_after.transactions_root == self.chain.txns_trie.hash()
        assert real.trie_roots_after.receipts_root == self.chain.receipts_trie.hash()
        assert real.checkpoint_state_trie_root == self.chain.pre_state.hash()

    def test_trimmed_state_readable(self):
        ir = gather_witness(self.chain.tx_hash, self.client)
        st = ir[1].tries.state_trie
        # all three touched accounts must be resolvable in the partial trie
        for addr in (A, B, M):
            assert st.get(acct_key(addr)) is not None

    def test_gas_and_txn_numbers(self):
        ir = gather_witness(self.chain.tx_hash, self.client)
        assert ir[1].gas_used_before == 0
        assert ir[1].gas_used_after == 21000
        assert ir[1].txn_number_before == 0
        # dummy mirrors the initial extra data
        assert ir[0].gas_used_before == ir[0].gas_used_after == 0

    def test_block_hashes(self):
        ir = gather_witness(self.chain.tx_hash, self.client)
        bh = ir[1].block_hashes
        assert len(bh.prev_hashes) == 256
        assert bh.cur_hash == self.chain.block_hashes[5]
        # last prev hash is the parent
        assert bh.prev_hashes[-1] == self.chain.block_hashes[4]
        assert bh.prev_hashes[-5] == self.chain.block_hashes[0]
        assert all(h == b"\x00" * 32 for h in bh.prev_hashes[:-5])

    def test_json_roundtrip(self):
        ir = gather_witness(self.chain.tx_hash, self.client)
        blob = json.dumps(witness_to_json(ir))
        back = witness_from_json(json.loads(blob))
        assert len(back) == len(ir)
        assert back[1].signed_txn == ir[1].signed_txn
        assert back[1].tries.state_trie.hash() == ir[1].tries.state_trie.hash()
        assert back[0].trie_roots_after.state_root == ir[0].trie_roots_after.state_root
        assert back[1].block_metadata.block_bloom == ir[1].block_metadata.block_bloom


class FakeRpc2Tx(FakeRpc):
    """Two transfers in one block: A->B then B->A (fees to M)."""

    def __init__(self):
        super().__init__()
        self.raw_tx2 = b"\xf8\x64" + b"\x02" * 100
        self.tx2_hash = "0x" + keccak256(self.raw_tx2).hex()
        # mid state = post of tx1 (already computed by super as post_state)
        self.mid_state = self.post_state
        self.mid_balances = dict(self.post_balances)
        v2, f2 = 500, 300  # B only holds 1005 wei mid-block
        final_bal = dict(self.mid_balances)
        final_bal[B] -= v2 + f2
        final_bal[A] += v2
        final_bal[M] += f2
        self.final_balances = final_bal
        self.final_state = make_state(final_bal, {A: 5, B: 1})
        self.v2, self.f2 = v2, f2

        self.txns_trie.insert(
            Nibbles.from_bytes(rlp.encode(rlp.int_to_bytes(1))), self.raw_tx2
        )
        receipt2 = rlp.encode(
            [rlp.int_to_bytes(1), rlp.int_to_bytes(42000), b"\x00" * 256, []]
        )
        self.receipts_trie.insert(
            Nibbles.from_bytes(rlp.encode(rlp.int_to_bytes(1))), receipt2
        )

    def _block_header(self, n):
        hdr = super()._block_header(n)
        if n == self.block_number:
            hdr["stateRoot"] = "0x" + self.final_state.hash().hex()
            hdr["gasUsed"] = hex(42000)
            hdr["transactions"] = [self.tx_hash, self.tx2_hash]
        return hdr

    def _eth_getTransactionByHash(self, h):
        if h == self.tx2_hash:
            return {
                "hash": self.tx2_hash,
                "blockNumber": hex(self.block_number),
                "transactionIndex": "0x1",
            }
        return super()._eth_getTransactionByHash(h)

    def _eth_getTransactionReceipt(self, h):
        base = super()._eth_getTransactionReceipt(h)
        if h == self.tx2_hash:
            base.update(
                {
                    "transactionIndex": "0x1",
                    "cumulativeGasUsed": hex(42000),
                }
            )
        return base

    def _eth_getRawTransactionByHash(self, h):
        return "0x" + (self.raw_tx2.hex() if h == self.tx2_hash else self.raw_tx.hex())

    def _eth_getProof(self, address, slots, num_hex):
        state = (
            self.final_state
            if int(num_hex, 16) == self.block_number
            else self.pre_state
        )
        return {
            "accountProof": ["0x" + p.hex() for p in state.prove(acct_key(address))],
            "storageHash": "0x" + PartialTrie().hash().hex(),
            "storageProof": [],
        }

    def _debug_traceTransaction(self, h, opts):
        diff_mode = opts.get("tracerConfig", {}).get("diffMode")
        if h == self.tx2_hash:
            if diff_mode:
                return {
                    "pre": {
                        A: {"balance": hex(self.mid_balances[A]), "nonce": 5},
                        B: {"balance": hex(self.mid_balances[B]), "nonce": 0},
                        M: {"balance": hex(self.mid_balances[M])},
                    },
                    "post": {
                        A: {"balance": hex(self.final_balances[A])},
                        B: {"balance": hex(self.final_balances[B]), "nonce": 1},
                        M: {"balance": hex(self.final_balances[M])},
                    },
                }
            return {
                A: {"balance": hex(self.mid_balances[A]), "nonce": 5},
                B: {"balance": hex(self.mid_balances[B])},
                M: {"balance": hex(self.mid_balances[M])},
            }
        return super()._debug_traceTransaction(h, opts)


class TestTwoTxWitness:
    def setup_method(self):
        self.chain = FakeRpc2Tx()
        self.client = RpcClient("fake://", transport=self.chain.transport)

    def test_two_payloads_chain(self):
        ir = gather_witness(self.chain.tx2_hash, self.client)
        assert len(ir) == 2  # two real txs, no padding needed
        assert ir[0].signed_txn == self.chain.raw_tx
        assert ir[1].signed_txn == self.chain.raw_tx2
        # roots chain: tx1 after == tx2 before
        assert ir[0].trie_roots_after.state_root == self.chain.mid_state.hash()
        assert ir[1].tries.state_trie.hash() == self.chain.mid_state.hash()
        assert ir[1].trie_roots_after.state_root == self.chain.final_state.hash()
        # gas chains
        assert ir[0].gas_used_after == 21000
        assert ir[1].gas_used_before == 21000
        assert ir[1].gas_used_after == 42000
        assert ir[1].txn_number_before == 1
        # final roots come from the header
        assert (
            ir[1].trie_roots_after.transactions_root == self.chain.txns_trie.hash()
        )


class FakeRpcTyped(FakeRpc):
    """Same chain, but the tx is a signed EIP-1559 (type-2) envelope —
    the receipts trie must carry the EIP-2718 type prefix and the raw
    bytes must decode through evm/tx.decode_tx."""

    def __init__(self):
        super().__init__()
        from ethproof_tpu.evm.tx import sign_eip1559_tx

        self.raw_tx = sign_eip1559_tx(
            1, 4, 1, 2, 21000, bytes.fromhex(B[2:]), self.value, b"",
            0xA11CE, access_list=(),
        )
        self.tx_hash = "0x" + keccak256(self.raw_tx).hex()
        self.txns_trie = PartialTrie()
        self.txns_trie.insert(
            Nibbles.from_bytes(rlp.encode(rlp.int_to_bytes(0))), self.raw_tx
        )
        receipt_payload = b"\x02" + rlp.encode(
            [rlp.int_to_bytes(1), rlp.int_to_bytes(21000), b"\x00" * 256, []]
        )
        self.receipts_trie = PartialTrie()
        self.receipts_trie.insert(
            Nibbles.from_bytes(rlp.encode(rlp.int_to_bytes(0))), receipt_payload
        )

    def _eth_getTransactionReceipt(self, h):
        d = super()._eth_getTransactionReceipt(h)
        d["type"] = "0x2"
        return d

    def _eth_getRawTransactionByHash(self, h):
        return "0x" + self.raw_tx.hex()


class TestTypedTxWitness:
    def setup_method(self):
        self.chain = FakeRpcTyped()
        client = RpcClient("fake://", transport=self.chain.transport)
        self.gis = gather_witness(self.chain.tx_hash, client)

    def test_signed_txn_decodes_as_type2(self):
        from ethproof_tpu.evm.tx import Eip1559Tx, decode_tx

        (gi,) = [g for g in self.gis if g.signed_txn is not None]
        tx = decode_tx(gi.signed_txn)
        assert isinstance(tx, Eip1559Tx)
        assert tx.to == bytes.fromhex(B[2:])
        assert tx.value == self.chain.value

    def test_receipt_carries_type_prefix(self):
        (gi,) = [g for g in self.gis if g.signed_txn is not None]
        key = Nibbles.from_bytes(rlp.encode(rlp.int_to_bytes(0)))
        raw = self.chain.receipts_trie.get(key)
        assert raw is not None and raw[0] == 0x02
