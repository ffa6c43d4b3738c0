"""Transaction decoding + sender recovery (legacy / EIP-155 type-0).

Reference equivalent: ethers' transaction types + the kernel's in-circuit
tx parsing [dep: from knowledge]. Round-1 scope: type-0 value transfers —
the reference's own witness path notes type-0 chain-id quirks
(/root/reference/leader/src/lib.rs:194-195).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..hash.keccak import keccak256
from ..trie import rlp
from . import secp256k1


@dataclass
class LegacyTx:
    nonce: int
    gas_price: int
    gas_limit: int
    to: bytes  # 20 bytes (empty = create)
    value: int
    data: bytes
    v: int
    r: int
    s: int

    @property
    def chain_id(self) -> Optional[int]:
        if self.v in (27, 28):
            return None
        return (self.v - 35) // 2

    def signing_hash(self) -> bytes:
        fields = [
            rlp.int_to_bytes(self.nonce),
            rlp.int_to_bytes(self.gas_price),
            rlp.int_to_bytes(self.gas_limit),
            self.to,
            rlp.int_to_bytes(self.value),
            self.data,
        ]
        cid = self.chain_id
        if cid is not None:
            fields += [rlp.int_to_bytes(cid), b"", b""]
        return keccak256(rlp.encode(fields))

    def recid(self) -> int:
        if self.v in (27, 28):
            return self.v - 27
        assert self.v >= 35, f"invalid legacy v {self.v}"
        return (self.v - 35) % 2

    def sender(self) -> bytes:
        # consensus validity (EIP-2): s must be in the low half of the
        # order; r, s in [1, N) is asserted inside recovery
        assert 1 <= self.s <= secp256k1.N // 2, "EIP-2: high-s signature"
        return secp256k1.recover_address(
            self.signing_hash(), self.r, self.s, self.recid()
        )


def decode_legacy_tx(raw: bytes) -> LegacyTx:
    items = rlp.decode(raw)
    assert isinstance(items, list) and len(items) == 9, "not a legacy tx"
    return LegacyTx(
        nonce=rlp.bytes_to_int(items[0]),
        gas_price=rlp.bytes_to_int(items[1]),
        gas_limit=rlp.bytes_to_int(items[2]),
        to=items[3],
        value=rlp.bytes_to_int(items[4]),
        data=items[5],
        v=rlp.bytes_to_int(items[6]),
        r=rlp.bytes_to_int(items[7]),
        s=rlp.bytes_to_int(items[8]),
    )


def sign_legacy_tx(
    nonce: int,
    gas_price: int,
    gas_limit: int,
    to: bytes,
    value: int,
    data: bytes,
    private_key: int,
    chain_id: Optional[int] = None,
) -> bytes:
    """Create a signed raw legacy tx (test fixtures / integration)."""
    fields = [
        rlp.int_to_bytes(nonce),
        rlp.int_to_bytes(gas_price),
        rlp.int_to_bytes(gas_limit),
        to,
        rlp.int_to_bytes(value),
        data,
    ]
    if chain_id is not None:
        presign = fields + [rlp.int_to_bytes(chain_id), b"", b""]
    else:
        presign = fields
    z = int.from_bytes(keccak256(rlp.encode(presign)), "big") % secp256k1.N
    # deterministic nonce k (RFC6979-ish via keccak; fine for fixtures)
    k = (
        int.from_bytes(
            keccak256(private_key.to_bytes(32, "big") + z.to_bytes(32, "big")), "big"
        )
        % secp256k1.N
    )
    R = secp256k1._mul(k, (secp256k1.GX, secp256k1.GY))
    assert R is not None
    r = R[0] % secp256k1.N
    s = (
        secp256k1._inv(k, secp256k1.N)
        * (z + r * private_key)
        % secp256k1.N
    )
    recid = R[1] % 2
    if s > secp256k1.N // 2:  # low-s normalization flips parity
        s = secp256k1.N - s
        recid ^= 1
    v = (35 + 2 * chain_id + recid) if chain_id is not None else (27 + recid)
    signed = fields + [rlp.int_to_bytes(v), rlp.int_to_bytes(r), rlp.int_to_bytes(s)]
    return rlp.encode(signed)


def private_key_to_address(private_key: int) -> bytes:
    q = secp256k1._mul(private_key, (secp256k1.GX, secp256k1.GY))
    assert q is not None
    pub = q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")
    return keccak256(pub)[12:]
