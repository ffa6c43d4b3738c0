"""Contract-call transactions: the EVM machine as the tx kernel.

Reference equivalent: evm_arithmetization's kernel executing an
arbitrary message call — `generate_txn_proof` on a witness whose tx
targets a contract (/root/reference/ops/src/lib.rs:52; SURVEY.md §2b
evm_arithmetization row). Here the call frame runs on the EVM machine
STARK (tables/evm.py): the machine proves the execution itself —
fetch/decode/execute over code bound to the account's code_hash,
storage reads/writes journaled against public inputs — while this
module supplies the transaction plumbing:

  - decode the signed tx, recover the sender, pull the callee's code
    from `contract_code` by the account's code_hash;
  - DISCOVER the touched storage slots by re-running the machine's
    host interpreter, growing `storage_pre` on UnknownStorageKey
    (values read from the callee's witness storage trie);
  - prove the 7-table machine proof;
  - host-side trie binding (documented fallback, like the transfer
    kernel's pre-binding era): re-derive the post state root from the
    witness tries + the machine's public journal (sender nonce/balance,
    miner fee, callee balance + storage-root update) and compare to
    `trie_roots_after.state_root`.

Envelope (Unsupported otherwise): type-0/1/2 txs (legacy, EIP-2930,
EIP-1559 — fee split per evm/tx.py: sender pays the effective gas
price, the miner receives the tip, the base fee is burned), direct
calls to an existing contract (no creation, no inner CALLs — the
machine is single-context), successful or reverting frames (a reverted
frame leaves storage untouched), machine opcode/keccak envelope per
tables/evm.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..fri.config import StarkConfig
from ..hash.keccak import keccak256
from ..stark.multi import MultiProof
from ..tables import all as A
from ..tables import evm as E
from ..trie.nibbles import Nibbles
from ..witness.mpt import decode_account, encode_account
from ..witness.types import GenerationInputs
from .kasm import le_word
from .transfer import _acct_key, _empty_account
from .tx import decode_tx

EMPTY_CODE_HASH = keccak256(b"")

# highest precompile address in the target fork (Shanghai: 0x09 blake2f;
# Cancun would raise this to 0x0a) — drives the EIP-2929 pre-warm set
N_PRECOMPILES_SHANGHAI = 9


def _slot_key(slot: int) -> Nibbles:
    return Nibbles.from_bytes(keccak256(slot.to_bytes(32, "big")))


def _storage_trie(gi: GenerationInputs, hashed_addr: bytes):
    for h, trie in gi.tries.storage_tries:
        if h == hashed_addr:
            return trie
    return None


def _decode_slot_value(raw: Optional[bytes]) -> int:
    if raw is None:
        return 0
    # storage values are RLP(minimal big-endian int), <= 32 bytes
    if len(raw) == 1 and raw[0] < 0x80:
        return raw[0]
    assert raw and 0x80 <= raw[0] < 0xB8, "storage slot RLP must be a short string"
    return int.from_bytes(raw[1: 1 + raw[0] - 0x80], "big")


def _encode_slot_value(v: int) -> bytes:
    if v == 0:
        return b"\x80"
    b = v.to_bytes((v.bit_length() + 7) // 8, "big")
    if len(b) == 1 and b[0] < 0x80:
        return b
    return bytes([0x80 + len(b)]) + b


@dataclass
class ContractCallProof:
    """Per-tx proof for a contract call: the machine multi-proof plus
    the witness-binding data the (host) verifier re-derives.

    In-circuit binding (evm/cbinding.py): `binding_multi` is a second
    kasm multi-proof whose kernel proves the storage-slot chain and the
    (sender, callee, miner) account updates against the state-root PI
    words; `cb_pi`/`cb_n_slots`/`cb_kshape` are its statement. When
    None, the binding is host-checked only (documented fallback tier)."""

    multi: Optional[MultiProof]
    shape: E.EvmShape
    machine_pi: List[int]
    gen_inputs: GenerationInputs
    sender: bytes
    to: bytes
    miner: bytes
    gas_used: int
    is_dummy: bool = False
    # succinct mode: the root machine proof subsumes `multi`
    root_proof: Optional[object] = None  # recursion.wrap.MachineProof
    # in-circuit state binding (second multi-proof; None = host tier)
    binding_multi: Optional[MultiProof] = None
    cb_pi: Optional[List[int]] = None
    cb_n_slots: int = 0
    cb_kshape: Optional[object] = None  # binding.KernelShape

    @property
    def pi_words(self) -> List[int]:
        """Statement words (tx_statement_digest input) — the machine PI."""
        return self.machine_pi

DEFAULT_LOG_ROWS = 10


def machine_inputs_for_tx(
    gi: GenerationInputs, log_rows: int = 10
) -> Tuple[E.EvmShape, E.EvmInputs, "E.EvmResult"]:
    """Decode the tx, discover touched slots, run the machine host
    interpreter. -> (shape, inputs, result)."""
    tx = decode_tx(gi.signed_txn)
    assert tx.chain_id in (None, gi.block_metadata.block_chain_id), (
        "EIP-155 chain id mismatch"
    )
    assert len(tx.to) == 20, "contract creation unsupported"
    sender = tx.sender()
    acct_raw = gi.tries.state_trie.get(_acct_key(tx.to))
    assert acct_raw is not None, "callee account missing from witness"
    acct = decode_account(acct_raw)
    if acct["code_hash"] == EMPTY_CODE_HASH:
        raise E.Unsupported("callee has no code (plain transfer)")
    code = gi.contract_code.get(acct["code_hash"])
    assert code is not None, "callee code missing from contract_code"
    hashed_addr = keccak256(tx.to)
    strie = _storage_trie(gi, hashed_addr)

    def slot_pre(slot: int) -> int:
        if strie is None:
            return 0
        return _decode_slot_value(strie.get(_slot_key(slot)))

    # EIP-2929: access-list keys for the callee are pre-warmed
    warm_pre = tuple(
        int.from_bytes(k, "big")
        for addr, keys in tx.access_list
        if addr == tx.to
        for k in keys
    )
    storage_pre: Dict[int, int] = {}
    caller = int.from_bytes(sender, "big")
    env = tx_env_words(gi, tx, caller)
    while True:
        try:
            return E.discover_and_execute(
                code, tx.data, caller, tx.value, storage_pre, log_rows,
                warm_pre=warm_pre, env=env,
            )
        except E.UnknownStorageKey as miss:
            storage_pre[miss.key] = slot_pre(miss.key)


def tx_env_words(gi: GenerationInputs, tx, caller: int) -> Dict[str, int]:
    """The machine's environment-opcode words, derived from the tx and
    the block metadata (single-frame: origin == caller), plus the gas
    budget, EIP-2929 pre-warmed addresses, and the environment-query
    resolver (BALANCE/EXTCODE*/BLOCKHASH answers from the witness)."""
    from .gas import intrinsic_gas

    bm = gi.block_metadata
    env = {
        "address": int.from_bytes(tx.to, "big"),
        "origin": caller,
        "gasprice": tx.effective_gas_price(bm.block_base_fee),
        "coinbase": int.from_bytes(bm.block_beneficiary, "big"),
        "timestamp": bm.block_timestamp,
        "number": bm.block_number,
        "gaslimit": bm.block_gaslimit,
        "chainid": bm.block_chain_id,
        "basefee": bm.block_base_fee,
        "gas_budget": tx.gas_limit - intrinsic_gas(tx),
    }
    # EIP-2929 pre-warm: origin, target, coinbase (EIP-3651), the
    # precompile range, and access-list addresses. The range is the
    # SHANGHAI set (0x01..0x09); a Cancun+ target fork must extend it
    # (0x0a point evaluation) or account-access queries against the new
    # precompiles charge cold 2600 instead of warm 100.
    warm = {caller, env["address"], env["coinbase"]}
    warm.update(range(1, N_PRECOMPILES_SHANGHAI + 1))
    warm.update(int.from_bytes(a, "big") for a, _k in tx.access_list)
    env["warm_addrs"] = tuple(sorted(warm))
    env["query_resolver"] = _witness_query_resolver(gi, tx, caller)
    return env


def _witness_query_resolver(gi: GenerationInputs, tx, caller: int):
    """Environment-query answers re-derived from the witness state
    (the same function serves the prover's trace generation and the
    verifier's PI re-derivation — both sides replay it)."""
    from ..tables.evm import (
        BALANCE, BLOCKHASH, EXTCODEHASH, EXTCODESIZE, SELFBALANCE,
    )

    bm = gi.block_metadata
    to_int = int.from_bytes(tx.to, "big")
    base_fee = bm.block_base_fee
    prepaid = tx.gas_limit * tx.effective_gas_price(base_fee)

    def balance_of(addr: int) -> int:
        raw = gi.tries.state_trie.get(
            _acct_key(addr.to_bytes(20, "big"))
        )
        bal = decode_account(raw)["balance"] if raw is not None else 0
        # mid-frame adjustments: the sender prepaid gas and sent value,
        # the callee was credited value (single-frame: no other moves)
        if addr == caller:
            bal -= prepaid + tx.value
        if addr == to_int:
            bal += tx.value
        return bal

    def resolve(op: int, arg: int) -> int:
        if op in (BALANCE, SELFBALANCE):
            return balance_of(arg)
        if op in (EXTCODESIZE, EXTCODEHASH):
            raw = gi.tries.state_trie.get(
                _acct_key(arg.to_bytes(20, "big"))
            )
            if raw is None:
                return 0
            ch = decode_account(raw)["code_hash"]
            if op == EXTCODEHASH:
                return int.from_bytes(ch, "big")
            if ch == EMPTY_CODE_HASH:
                return 0
            code = gi.contract_code.get(ch)
            assert code is not None, "EXTCODESIZE target code not in witness"
            return len(code)
        if op == BLOCKHASH:
            cur = bm.block_number
            n_prev = len(gi.block_hashes.prev_hashes)
            if cur - n_prev <= arg < cur:
                h = gi.block_hashes.prev_hashes[arg - (cur - n_prev)]
                return int.from_bytes(h, "big")
            return 0
        raise AssertionError(f"unexpected query opcode {op:#x}")

    return resolve


def consensus_gas_used(gi: GenerationInputs, res=None) -> int:
    """Re-derive the tx's consensus gas from the witness alone: intrinsic
    (EIP-2028/2930) + the machine frame's metered execution gas, minus
    the EIP-3529-capped refund. Matches gas_used_after - gas_used_before
    on a consensus-valid witness."""
    from .gas import intrinsic_gas, tx_gas_used

    tx = decode_tx(gi.signed_txn)
    if res is None:
        _, _, res = machine_inputs_for_tx(gi)
    return tx_gas_used(
        intrinsic_gas(tx), res.gas_used, res.gas_refund, res.success
    )


def prove_contract_call(
    gi: GenerationInputs,
    config: StarkConfig,
    sizes: Optional[A.TableSizes] = None,
    log_rows: int = 10,
    binding: object = "auto",
    binding_sizes: Optional[A.TableSizes] = None,
) -> ContractCallProof:
    """binding: "auto" (in-circuit state binding when the witness fits
    the envelope; silent host-checked fallback otherwise), None
    (host-checked only), a binding.KernelShape or "require" (in-circuit
    required — Unsupported/CircuitSizeError propagate)."""
    shape, inputs, res = machine_inputs_for_tx(gi, log_rows)
    tx = decode_tx(gi.signed_txn)
    sender = tx.sender()
    miner = gi.block_metadata.block_beneficiary
    gas_used = gi.gas_used_after - gi.gas_used_before
    assert gas_used == consensus_gas_used(gi, res), (
        "witness gas_used diverges from consensus gas accounting"
    )
    if sizes is None:
        counts = A.evm_table_counts(shape, res)
        sizes = A.TableSizes(
            cpu=shape.log_rows,
            arithmetic=16,
            logic=max(counts["logic"] - 1, 1).bit_length(),
            bytepacking=max(9, (counts["bytepacking"] - 1).bit_length()),
            memory=max(13, (counts["memory"] - 1).bit_length()),
            keccak=max(5, (counts["keccak"] - 1).bit_length()),
            keccak_sponge=max(8, (counts["keccak_sponge"] - 1).bit_length()),
        )
    machine = E.EvmStark(shape)
    proof = A.prove_evm_tables(machine, res, sizes, config)
    cb_multi = cb_pi = cb_kshape = None
    cb_n_slots = 0
    if binding is not None:
        cb_multi, cb_pi, cb_n_slots, cb_kshape = _prove_binding(
            gi, res.pi_words, shape, sender, tx.to, miner, gas_used,
            config, binding, binding_sizes,
        )
    ccp = ContractCallProof(
        multi=proof,
        shape=shape,
        machine_pi=list(res.pi_words),
        gen_inputs=gi,
        sender=sender,
        to=tx.to,
        miner=miner,
        gas_used=gas_used,
        binding_multi=cb_multi,
        cb_pi=cb_pi,
        cb_n_slots=cb_n_slots,
        cb_kshape=cb_kshape,
    )
    assert check_contract_binding(ccp), "witness binding failed"
    return ccp


def _binding_table_sizes(counts) -> A.TableSizes:
    """Fit the binding kernel's own multi-proof sizes (floors match the
    transfer binding's slow-tier shapes: 2^16 arithmetic range table for
    digest comparisons)."""

    def lg(n, floor):
        return max(floor, (max(n, 1) - 1).bit_length())

    return A.TableSizes(
        cpu=lg(counts["cpu"], 11),
        arithmetic=16,
        logic=lg(counts["logic"], 4),
        bytepacking=9,
        memory=lg(counts["memory"], 13),
        keccak=lg(counts["keccak"], 5),
        keccak_sponge=lg(counts["keccak_sponge"], 8),
    )


def _prove_binding(
    gi, machine_pi, mshape, sender, to, miner, gas_used, config,
    binding, binding_sizes,
):
    """Build + prove the in-circuit state-binding proof (evm/cbinding.py);
    returns (None, None, 0, None) on a permitted fallback."""
    from ..tables.all import CircuitSizeError, kernel_counts, prove_all_tables
    from ..tables.cpu import CpuStark
    from . import cbinding as CB
    from .binding import PRODUCTION_SHAPE, KernelShape
    from .binding import Unsupported as BUnsupported

    if isinstance(binding, KernelShape):
        kshape, required = binding, True
    elif binding == "require":
        kshape, required = PRODUCTION_SHAPE, True
    else:
        kshape, required = PRODUCTION_SHAPE, False
    try:
        pi = CB.expected_cb_pi(gi, machine_pi, mshape, sender, to, miner, gas_used)
        bw = CB.build_contract_binding_witness(
            gi, machine_pi, mshape, sender, to, miner, pi, kshape
        )
        n_slots = len(bw.slots)
        kasm = CB.build_contract_kernel(n_slots, kshape, pi, bw)
        counts = kernel_counts(kasm.prog, kasm.hash_requests())
        fitted = binding_sizes or _binding_table_sizes(counts)
        for name, log in (
            ("cpu", fitted.cpu), ("arithmetic", fitted.arithmetic),
            ("logic", fitted.logic), ("memory", fitted.memory),
            ("keccak", fitted.keccak), ("keccak_sponge", fitted.keccak_sponge),
        ):
            if counts[name] > (1 << log):
                raise CircuitSizeError(f"{name} needs {counts[name]} > 2^{log}")
        cpu = CpuStark(kasm.prog, CB.cb_num_pi_words(n_slots))
        multi, _ = prove_all_tables(
            cpu, pi, fitted, config,
            hash_requests=kasm.hash_requests(), kernel_witness=kasm.witness,
        )
        return multi, pi, n_slots, kshape
    except (BUnsupported, CircuitSizeError):
        if required:
            raise
        return None, None, 0, None


def expected_machine_pi(
    gi: GenerationInputs, shape: E.EvmShape
) -> Tuple[List[int], bytes, bytes]:
    """Re-derive the machine's public-input words from the witness alone
    (the verifier-side counterpart of execute_evm's pi_words): caller,
    callvalue, calldata words, codehash — and storage keys/pre-values
    checked against the callee's storage trie. Post-values and success
    are read from the proof's PI and validated by the trie binding."""
    tx = decode_tx(gi.signed_txn)
    sender = tx.sender()
    acct = decode_account(gi.tries.state_trie.get(_acct_key(tx.to)))
    code = gi.contract_code[acct["code_hash"]]
    assert len(code) == shape.code_len and len(tx.data) == shape.calldata_len
    cd_words = [
        int.from_bytes(tx.data[32 * w: 32 * w + 32].ljust(32, b"\0"), "big")
        for w in range(shape.n_calldata_words)
    ]
    code_padded = code + b"\0" * (len(code) % 2)
    caller = int.from_bytes(sender, "big")
    env = tx_env_words(gi, tx, caller)
    pi = [
        caller, tx.value, env["address"], env["origin"], env["gasprice"],
        env["coinbase"], env["timestamp"], env["number"], env["gaslimit"],
        env["chainid"], env["basefee"], env["gas_budget"],
    ] + cd_words
    pi.append(le_word(keccak256(code_padded)))
    return pi, sender, tx.to


def check_contract_binding(proof: ContractCallProof) -> bool:
    """Host-side witness binding: machine PI consistent with the witness
    and the post state root reachable from (tries, machine journal).

    In-circuit status: execution/storage-journal/code-hash are proved by
    the machine STARK; the TRIE binding below (account paths, storage
    trie rebuild) is host-side — the same documented fallback tier as
    check_trie_binding for transfers (evm/binding.py is the in-circuit
    upgrade path)."""
    gi = proof.gen_inputs
    shape = proof.shape
    lay = shape.pi_layout
    pi = proof.machine_pi
    try:
        head, sender, to = expected_machine_pi(gi, shape)
    except Exception:
        return False
    if pi[: len(head)] != head or sender != proof.sender or to != proof.to:
        return False
    tx = decode_tx(gi.signed_txn)
    # storage keys strictly increasing, pre-values match the trie, warm
    # flags match the tx access list (EIP-2929 pre-warming)
    hashed_addr = keccak256(to)
    strie = _storage_trie(gi, hashed_addr)
    warm_keys = {
        int.from_bytes(k, "big")
        for addr, keys_ in tx.access_list
        if addr == to
        for k in keys_
    }
    keys = []
    for i in range(shape.n_skeys):
        k = pi[lay["storage"] + 4 * i]
        warm0 = pi[lay["storage"] + 4 * i + 1]
        vpre = pi[lay["storage"] + 4 * i + 2]
        keys.append(k)
        if warm0 != (1 if k in warm_keys else 0):
            return False
        expect = (
            _decode_slot_value(strie.get(_slot_key(k))) if strie is not None else 0
        )
        if vpre != expect:
            return False
    if any(b <= a for a, b in zip(keys, keys[1:])):
        return False
    # consensus gas: the witness's claimed gas delta must equal the
    # re-derived intrinsic + capped-refund total, and the proof's PI
    # must carry the same frame gas/refund the interpreter re-derives
    from .gas import intrinsic_gas, tx_gas_used
    from ..gf import field_host as fh

    try:
        _, _, res = machine_inputs_for_tx(gi)
        if proof.gas_used != gi.gas_used_after - gi.gas_used_before:
            return False
        if proof.gas_used != tx_gas_used(
            intrinsic_gas(tx), res.gas_used, res.gas_refund, res.success
        ):
            return False
        if pi[lay["gas"]] != res.gas_used:
            return False
        if pi[lay["refund"]] != res.gas_refund % fh.P:
            return False
        # the full PI vector must equal the witness replay's — this
        # covers the environment-query tuples (BALANCE/EXTCODE*/
        # BLOCKHASH answers + EIP-2929 account-access gas) verbatim
        if list(pi) != list(res.pi_words):
            return False
    except Exception:
        return False
    success = pi[lay["success"]]
    # rebuild the post state root
    state = gi.tries.state_trie.copy()
    if gi.txn_number_before == 0 and state.hash() != gi.checkpoint_state_trie_root:
        return False
    base_fee = gi.block_metadata.block_base_fee
    fee = tx.effective_gas_price(base_fee) * proof.gas_used
    tip = tx.miner_tip_per_gas(base_fee) * proof.gas_used
    s_acc = decode_account(state.get(_acct_key(sender)))
    if tx.nonce != s_acc["nonce"]:
        return False
    value = tx.value if success else 0  # reverted frames keep their value
    # sequential updates: sender, callee, miner (may overlap)
    def get_acct(addr):
        raw = state.get(_acct_key(addr))
        return decode_account(raw) if raw is not None else _empty_account()

    def put_acct(addr, acc):
        state.insert(_acct_key(addr), encode_account(acc))

    s_acc["nonce"] += 1
    if s_acc["balance"] < value + fee:
        return False
    s_acc["balance"] -= value + fee
    put_acct(sender, s_acc)
    c_acc = get_acct(to)
    c_acc["balance"] += value
    if success and shape.n_skeys:
        st = (strie.copy() if strie is not None else None)
        if st is None:
            from ..trie.trie import PartialTrie

            st = PartialTrie()
        for i in range(shape.n_skeys):
            k = pi[lay["storage"] + 4 * i]
            vpost = pi[lay["storage"] + 4 * i + 3]
            if vpost == 0:
                st.delete(_slot_key(k))
            else:
                st.insert(_slot_key(k), _encode_slot_value(vpost))
        c_acc["storage_root"] = st.hash()
    put_acct(to, c_acc)
    m_acc = get_acct(proof.miner)
    m_acc["balance"] += tip  # EIP-1559: base_fee * gas is burned
    put_acct(proof.miner, m_acc)
    if state.hash() != gi.trie_roots_after.state_root:
        return False
    # receipts: the machine's PI-bound logs must reproduce the witness
    # receipts-root transition (skipped if the witness has no receipts
    # commitment)
    return check_receipts_binding(proof)


def verify_binding_proof(proof: ContractCallProof, config: StarkConfig) -> bool:
    """Verify the in-circuit state-binding proof: its PI words must
    re-derive from the witness + the machine's PI (word equality — this
    is the cross-proof link), and the kasm multi-proof must verify
    against the program rebuilt from the statement (n_slots, kshape)."""
    from ..tables.all import verify_all_tables
    from ..tables.cpu import CpuStark
    from . import cbinding as CB
    from .binding import Unsupported as BUnsupported

    if proof.binding_multi is None or proof.cb_pi is None:
        return False
    try:
        expected = CB.expected_cb_pi(
            proof.gen_inputs, proof.machine_pi, proof.shape,
            proof.sender, proof.to, proof.miner, proof.gas_used,
        )
    except Exception:
        return False
    if expected != proof.cb_pi:
        return False
    if proof.cb_n_slots != (len(expected) - CB.CB_SLOTS) // 2:
        return False
    kasm = CB.build_contract_kernel(proof.cb_n_slots, proof.cb_kshape)
    cpu = CpuStark(kasm.prog, CB.cb_num_pi_words(proof.cb_n_slots))
    return verify_all_tables(cpu, proof.cb_pi, proof.binding_multi, config)


def verify_contract_call(proof: ContractCallProof, config: StarkConfig) -> bool:
    """Full verification: machine STARK + state binding (in-circuit when
    the proof carries a binding multi-proof; the host re-derivation runs
    in both cases as the documented cross-check tier)."""
    if proof.multi is None:
        return False
    machine = E.EvmStark(proof.shape)
    if not A.verify_evm_tables(machine, proof.machine_pi, proof.multi, config):
        return False
    if proof.binding_multi is not None:
        if not verify_binding_proof(proof, config):
            return False
    return check_contract_binding(proof)


# -- receipts binding -----------------------------------------------------------


def _bloom_of(entries) -> bytes:
    """2048-bit logs bloom (consensus m3:2048): for each entry, set the
    three bits indexed by the first three big-endian 2-byte pairs of
    keccak(entry) mod 2048."""
    bloom = bytearray(256)
    for e in entries:
        h = keccak256(e)
        for k in (0, 2, 4):
            bit = ((h[k] << 8) | h[k + 1]) & 2047
            bloom[256 - 1 - bit // 8] |= 1 << (bit % 8)
    return bytes(bloom)


def machine_logs(proof: ContractCallProof):
    """(address, topics, data) per LOG event, from the machine's public
    inputs (the STARK binds them to the executed LOG operands)."""
    lay = proof.shape.pi_layout
    out = []
    for i, (nt, dl) in enumerate(proof.shape.log_shapes):
        base = lay["log_words"][i]
        topics = [
            proof.machine_pi[base + t].to_bytes(32, "big") for t in range(nt)
        ]
        data = b"".join(
            proof.machine_pi[base + nt + w].to_bytes(32, "big")
            for w in range(E.EvmShape.n_data_words(dl))
        )[:dl]
        out.append((proof.to, topics, data))
    return out


def expected_receipt(proof: ContractCallProof) -> bytes:
    """Consensus legacy-receipt RLP for this tx, rebuilt from the proof's
    public log inputs + the witness gas accounting."""
    from ..trie import rlp

    gi = proof.gen_inputs
    success = proof.machine_pi[proof.shape.pi_layout["success"]]
    logs = machine_logs(proof) if success else []
    entries = []
    for addr, topics, _data in logs:
        entries.append(addr)
        entries.extend(topics)
    body = rlp.encode(
        [
            rlp.int_to_bytes(int(success)),
            rlp.int_to_bytes(gi.gas_used_after),
            _bloom_of(entries),
            [[a, t, d] for a, t, d in logs],
        ]
    )
    # typed txs (EIP-2718): the receipts-trie value is type || rlp(receipt)
    tx = decode_tx(gi.signed_txn)
    return (bytes([tx.tx_type]) + body) if tx.tx_type else body


def check_receipts_binding(proof: ContractCallProof) -> bool:
    """Insert the rebuilt receipt into the witness receipts trie and
    compare against trie_roots_after.receipts_root. Skipped (True) when
    the witness carries no receipts commitment (all-zero root), matching
    the transfer kernel's current scope."""
    from ..trie import rlp

    gi = proof.gen_inputs
    want = gi.trie_roots_after.receipts_root
    if want == b"\x00" * 32:
        return True
    rt = gi.tries.receipts_trie.copy()
    rt.insert(
        Nibbles.from_bytes(rlp.encode(rlp.int_to_bytes(gi.txn_number_before))),
        expected_receipt(proof),
    )
    return rt.hash() == want
