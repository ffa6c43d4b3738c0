"""Proof (de)serialization to JSON.

Reference equivalent: the serde derives on proof types that let the
leader write proofs to stdout (/root/reference/leader/src/main.rs:60)
and paladin ship them between processes. JSON keeps the artifacts
diffable; u64 field elements ride as decimal ints (python ints are
arbitrary precision).
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ..evm.transfer import TxProof
from ..fri.prove import FriProof, FriQueryRound
from ..stark.multi import MultiProof
from ..stark.prove import StarkOpenings, StarkProof, TreeOpenings
from ..witness.types import GenerationInputs
from .ops import AggProof, DummyProof, GeneratedBlockProof


def _arr(a) -> list:
    return np.asarray(a, dtype=np.uint64).tolist()


def _unarr(x, dtype=np.uint64) -> np.ndarray:
    return np.asarray(x, dtype=dtype)


def fri_proof_to_json(p: FriProof) -> dict:
    return {
        "commit_caps": [_arr(c) for c in p.commit_caps],
        "query_rounds": [
            {"leaf_values": _arr(q.leaf_values), "merkle_paths": _arr(q.merkle_paths)}
            for q in p.query_rounds
        ],
        "final_poly": _arr(p.final_poly),
        "pow_witness": p.pow_witness,
        "degree_bits": p.degree_bits,
    }


def fri_proof_from_json(d: dict) -> FriProof:
    return FriProof(
        commit_caps=[_unarr(c) for c in d["commit_caps"]],
        query_rounds=[
            FriQueryRound(_unarr(q["leaf_values"]), _unarr(q["merkle_paths"]))
            for q in d["query_rounds"]
        ],
        final_poly=_unarr(d["final_poly"]),
        pow_witness=d["pow_witness"],
        degree_bits=d["degree_bits"],
        query_indices=None,
    )


def _tree_openings_to_json(t: TreeOpenings) -> dict:
    return {"values": _arr(t.values), "paths": _arr(t.paths)}


def _tree_openings_from_json(d) -> TreeOpenings:
    return TreeOpenings(values=_unarr(d["values"]), paths=_unarr(d["paths"]))


def stark_proof_to_json(p: StarkProof) -> dict:
    return {
        "degree_bits": p.degree_bits,
        "public_inputs": list(p.public_inputs),
        "trace_cap": _arr(p.trace_cap),
        "aux_cap": _arr(p.aux_cap) if p.aux_cap is not None else None,
        "quotient_cap": _arr(p.quotient_cap),
        "ctl_totals": list(p.ctl_totals),
        "openings": {
            "trace_at_zeta": _arr(p.openings.trace_at_zeta),
            "trace_at_gzeta": _arr(p.openings.trace_at_gzeta),
            "aux_at_zeta": _arr(p.openings.aux_at_zeta),
            "aux_at_gzeta": _arr(p.openings.aux_at_gzeta),
            "quotient_at_zeta": _arr(p.openings.quotient_at_zeta),
        },
        "fri_proof": fri_proof_to_json(p.fri_proof),
        "trace_query_openings": _tree_openings_to_json(p.trace_query_openings),
        "aux_query_openings": (
            _tree_openings_to_json(p.aux_query_openings)
            if p.aux_query_openings is not None
            else None
        ),
        "quotient_query_openings": _tree_openings_to_json(p.quotient_query_openings),
    }


def stark_proof_from_json(d: dict) -> StarkProof:
    return StarkProof(
        degree_bits=d["degree_bits"],
        public_inputs=list(d["public_inputs"]),
        trace_cap=_unarr(d["trace_cap"]),
        aux_cap=_unarr(d["aux_cap"]) if d["aux_cap"] is not None else None,
        quotient_cap=_unarr(d["quotient_cap"]),
        ctl_totals=list(d["ctl_totals"]),
        openings=StarkOpenings(
            trace_at_zeta=_unarr(d["openings"]["trace_at_zeta"]),
            trace_at_gzeta=_unarr(d["openings"]["trace_at_gzeta"]),
            aux_at_zeta=_unarr(d["openings"]["aux_at_zeta"]),
            aux_at_gzeta=_unarr(d["openings"]["aux_at_gzeta"]),
            quotient_at_zeta=_unarr(d["openings"]["quotient_at_zeta"]),
        ),
        fri_proof=fri_proof_from_json(d["fri_proof"]),
        trace_query_openings=_tree_openings_from_json(d["trace_query_openings"]),
        aux_query_openings=(
            _tree_openings_from_json(d["aux_query_openings"])
            if d["aux_query_openings"] is not None
            else None
        ),
        quotient_query_openings=_tree_openings_from_json(d["quotient_query_openings"]),
    )


def machine_proof_to_json(mp) -> dict:
    return {
        "proof": stark_proof_to_json(mp.proof),
        "log_n": mp.log_n,
        "variant": mp.variant,
        # statement preimage: needed by parent agg provers (fleet tasks
        # ship child proofs over the wire); verifiers re-derive it
        "seam": list(mp.seam) if mp.seam is not None else None,
        "digest": list(mp.digest) if mp.digest is not None else None,
    }


def machine_proof_from_json(d: dict):
    from ..recursion.wrap import MachineProof

    return MachineProof(
        proof=stark_proof_from_json(d["proof"]),
        log_n=int(d["log_n"]),
        variant=int(d["variant"]),
        seam=[int(x) for x in d["seam"]] if d.get("seam") is not None else None,
        digest=(
            [int(x) for x in d["digest"]] if d.get("digest") is not None else None
        ),
    )


def tx_proof_to_json(p: TxProof) -> dict:
    out = {
        "kind": "txn",
        # under recursion the multi-STARK is dropped after wrapping and
        # the succinct machine proof travels instead
        "multi": (
            [stark_proof_to_json(sp) for sp in p.multi.proofs]
            if p.multi is not None
            else None
        ),
        "root_proof": (
            machine_proof_to_json(p.root_proof)
            if p.root_proof is not None
            else None
        ),
        "pi_words": [str(w) for w in p.pi_words],  # 256-bit ints as strings
        "gen_inputs": p.gen_inputs.to_json(),
        "sender": p.sender.hex(),
        "recipient": p.recipient.hex(),
        "miner": p.miner.hex(),
    }
    if p.binding_shape is not None:
        out["binding_shape"] = {
            "levels": p.binding_shape.levels,
            "node_words": p.binding_shape.node_words,
        }
    return out


def tx_proof_from_json(d: dict) -> TxProof:
    shape = None
    if d.get("binding_shape") is not None:
        from ..evm.binding import KernelShape

        shape = KernelShape(
            levels=int(d["binding_shape"]["levels"]),
            node_words=int(d["binding_shape"]["node_words"]),
        )
    return TxProof(
        multi=(
            MultiProof(proofs=[stark_proof_from_json(x) for x in d["multi"]])
            if d["multi"] is not None
            else None
        ),
        pi_words=[int(w) for w in d["pi_words"]],
        gen_inputs=GenerationInputs.from_json(d["gen_inputs"]),
        sender=bytes.fromhex(d["sender"]),
        recipient=bytes.fromhex(d["recipient"]),
        miner=bytes.fromhex(d["miner"]),
        binding_shape=shape,
        root_proof=(
            machine_proof_from_json(d["root_proof"])
            if d.get("root_proof") is not None
            else None
        ),
    )


def _evm_shape_to_json(sh) -> dict:
    return {
        "code_len": sh.code_len,
        "calldata_len": sh.calldata_len,
        "n_skeys": sh.n_skeys,
        "log_rows": sh.log_rows,
        "n_queries": sh.n_queries,
        "call_shapes": [list(x) for x in sh.call_shapes],
        "log_shapes": [list(x) for x in sh.log_shapes],
    }


def _evm_shape_from_json(d: dict):
    from ..tables.evm import EvmShape

    return EvmShape(
        code_len=int(d["code_len"]),
        calldata_len=int(d["calldata_len"]),
        n_skeys=int(d["n_skeys"]),
        log_rows=int(d["log_rows"]),
        n_queries=int(d.get("n_queries", 0)),
        call_shapes=tuple(
            tuple(int(v) for v in x) for x in d.get("call_shapes", [])
        ),
        log_shapes=tuple(tuple(x) for x in d.get("log_shapes", [])),
    )


def contract_proof_to_json(p) -> dict:
    return {
        "kind": "contract",
        "multi": (
            [stark_proof_to_json(sp) for sp in p.multi.proofs]
            if p.multi is not None
            else None
        ),
        "root_proof": (
            machine_proof_to_json(p.root_proof)
            if p.root_proof is not None
            else None
        ),
        "shape": _evm_shape_to_json(p.shape),
        "machine_pi": [str(w) for w in p.machine_pi],
        "gen_inputs": p.gen_inputs.to_json(),
        "sender": p.sender.hex(),
        "to": p.to.hex(),
        "miner": p.miner.hex(),
        "gas_used": p.gas_used,
        "binding_multi": (
            [stark_proof_to_json(sp) for sp in p.binding_multi.proofs]
            if p.binding_multi is not None
            else None
        ),
        "cb_pi": [str(w) for w in p.cb_pi] if p.cb_pi is not None else None,
        "cb_n_slots": p.cb_n_slots,
        "cb_kshape": (
            {"levels": p.cb_kshape.levels, "node_words": p.cb_kshape.node_words}
            if p.cb_kshape is not None
            else None
        ),
        "inner_frames": [
            {
                "address": f.address.hex(),
                "shape": _evm_shape_to_json(f.shape),
                "machine_pi": [str(w) for w in f.machine_pi],
                "multi": (
                    [stark_proof_to_json(sp) for sp in f.multi.proofs]
                    if f.multi is not None
                    else None
                ),
                "root_proof": (
                    machine_proof_to_json(f.root_proof)
                    if f.root_proof is not None
                    else None
                ),
            }
            for f in (p.inner_frames or [])
        ],
    }


def contract_proof_from_json(d: dict):
    from ..evm.contract import ContractCallProof
    from ..stark.multi import MultiProof

    multi = None
    if d.get("multi") is not None:
        multi = MultiProof(proofs=[stark_proof_from_json(x) for x in d["multi"]])
    return ContractCallProof(
        multi=multi,
        shape=_evm_shape_from_json(d["shape"]),
        machine_pi=[int(w) for w in d["machine_pi"]],
        gen_inputs=GenerationInputs.from_json(d["gen_inputs"]),
        sender=bytes.fromhex(d["sender"]),
        to=bytes.fromhex(d["to"]),
        miner=bytes.fromhex(d["miner"]),
        gas_used=int(d["gas_used"]),
        root_proof=(
            machine_proof_from_json(d["root_proof"])
            if d.get("root_proof") is not None
            else None
        ),
        binding_multi=(
            MultiProof(
                proofs=[stark_proof_from_json(x) for x in d["binding_multi"]]
            )
            if d.get("binding_multi") is not None
            else None
        ),
        cb_pi=(
            [int(w) for w in d["cb_pi"]] if d.get("cb_pi") is not None else None
        ),
        cb_n_slots=int(d.get("cb_n_slots", 0)),
        cb_kshape=_kshape_from_json(d.get("cb_kshape")),
        inner_frames=[
            _inner_frame_from_json(f) for f in d.get("inner_frames", [])
        ],
    )


def _inner_frame_from_json(f: dict):
    from ..evm.contract import InnerFrameProof
    from ..stark.multi import MultiProof

    return InnerFrameProof(
        address=bytes.fromhex(f["address"]),
        shape=_evm_shape_from_json(f["shape"]),
        machine_pi=[int(w) for w in f["machine_pi"]],
        multi=(
            MultiProof(proofs=[stark_proof_from_json(x) for x in f["multi"]])
            if f.get("multi") is not None
            else None
        ),
        root_proof=(
            machine_proof_from_json(f["root_proof"])
            if f.get("root_proof") is not None
            else None
        ),
    )


def _kshape_from_json(d):
    if d is None:
        return None
    from ..evm.binding import KernelShape

    return KernelShape(levels=int(d["levels"]), node_words=int(d["node_words"]))


def aggregatable_to_json(p) -> dict:
    from ..evm.contract import ContractCallProof

    if isinstance(p, ContractCallProof):
        return contract_proof_to_json(p)
    if isinstance(p, AggProof):
        return {
            "kind": "agg",
            "left": aggregatable_to_json(p.left),
            "right": aggregatable_to_json(p.right),
            "txn_number_before": p.txn_number_before,
            "txn_number_after": p.txn_number_after,
            "gas_used_before": p.gas_used_before,
            "gas_used_after": p.gas_used_after,
            "state_root_before": p.state_root_before.hex(),
            "state_root_after": p.state_root_after.hex(),
        }
    if isinstance(p, DummyProof):
        return {
            "kind": "dummy",
            "gen_inputs": p.gen_inputs.to_json(),
            "root_proof": (
                machine_proof_to_json(p.root_proof)
                if p.root_proof is not None
                else None
            ),
        }
    return tx_proof_to_json(p)


def aggregatable_from_json(d: dict):
    kind = d["kind"]
    if kind == "agg":
        return AggProof(
            left=aggregatable_from_json(d["left"]),
            right=aggregatable_from_json(d["right"]),
            txn_number_before=d["txn_number_before"],
            txn_number_after=d["txn_number_after"],
            gas_used_before=d["gas_used_before"],
            gas_used_after=d["gas_used_after"],
            state_root_before=bytes.fromhex(d["state_root_before"]),
            state_root_after=bytes.fromhex(d["state_root_after"]),
        )
    if kind == "dummy":
        return DummyProof(
            gen_inputs=GenerationInputs.from_json(d["gen_inputs"]),
            root_proof=(
                machine_proof_from_json(d["root_proof"])
                if d.get("root_proof") is not None
                else None
            ),
        )
    if kind == "contract":
        return contract_proof_from_json(d)
    return tx_proof_from_json(d)


def block_proof_to_json(bp: GeneratedBlockProof) -> dict:
    out = {
        "b_height": bp.block_number,
        "state_root_before": bp.state_root_before.hex(),
        "state_root_after": bp.state_root_after.hex(),
        "agg": aggregatable_to_json(bp.agg),
        "parent": block_proof_to_json(bp.parent) if bp.parent else None,
    }
    if bp.succinct is not None:
        s = bp.succinct
        out["succinct"] = {
            "top": machine_proof_to_json(s.top),
            "level": s.level,
            "sizes": vars(s.sizes) if s.sizes is not None else None,
            "wd_counts": list(s.wd_counts) if s.wd_counts else None,
            "evm_shapes": (
                [_evm_shape_to_json(sh) for sh in s.evm_shapes]
                if s.evm_shapes
                else None
            ),
            "binding_shape": (
                {"levels": s.binding_shape.levels,
                 "node_words": s.binding_shape.node_words}
                if s.binding_shape is not None
                else None
            ),
            "block_wrap": (
                {
                    "mp": machine_proof_to_json(s.block_wrap.mp),
                    "seam": list(s.block_wrap.seam),
                    "digest": list(s.block_wrap.digest),
                    "e_parent": list(s.block_wrap.e_parent),
                    "is_base": s.block_wrap.is_base,
                }
                if s.block_wrap is not None
                else None
            ),
        }
    return out


def block_proof_from_json(d: dict) -> GeneratedBlockProof:
    succinct = None
    if d.get("succinct") is not None:
        from ..tables.all import TableSizes
        from .ops import SuccinctBlockProof

        s = d["succinct"]
        shape = None
        if s.get("binding_shape") is not None:
            from ..evm.binding import KernelShape

            shape = KernelShape(
                levels=int(s["binding_shape"]["levels"]),
                node_words=int(s["binding_shape"]["node_words"]),
            )
        evm_shapes = None
        if s.get("evm_shapes"):
            evm_shapes = [_evm_shape_from_json(e) for e in s["evm_shapes"]]
        bw = None
        if s.get("block_wrap") is not None:
            from ..recursion.block import BlockWrapProof

            w = s["block_wrap"]
            bw = BlockWrapProof(
                mp=machine_proof_from_json(w["mp"]),
                seam=[int(x) for x in w["seam"]],
                digest=[int(x) for x in w["digest"]],
                e_parent=[int(x) for x in w["e_parent"]],
                is_base=int(w["is_base"]),
            )
        succinct = SuccinctBlockProof(
            top=machine_proof_from_json(s["top"]),
            level=int(s["level"]),
            sizes=TableSizes(**s["sizes"]) if s.get("sizes") is not None else None,
            binding_shape=shape,
            evm_shapes=evm_shapes,
            block_wrap=bw,
            wd_counts=(
                [int(x) for x in s["wd_counts"]]
                if s.get("wd_counts")
                else None
            ),
        )
    return GeneratedBlockProof(
        block_number=d["b_height"],
        state_root_before=bytes.fromhex(d["state_root_before"]),
        state_root_after=bytes.fromhex(d["state_root_after"]),
        agg=aggregatable_from_json(d["agg"]),
        parent=block_proof_from_json(d["parent"]) if d["parent"] else None,
        succinct=succinct,
    )
