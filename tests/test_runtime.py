"""Runtime layer: range parsing (reference parity), config, fold, dummy-block."""

import os

import pytest

from ethproof_tpu.fri.config import standard_fast_config
from ethproof_tpu.hash.keccak import keccak256
from ethproof_tpu.runtime import ops, serde
from ethproof_tpu.runtime.parsing import (
    InvalidBound,
    MissingBound,
    MissingDelimiter,
    parse_range,
)
from ethproof_tpu.runtime.prover_state import CircuitConfig, DEFAULT_RANGES
from ethproof_tpu.runtime.scheduler import Runtime, prove_block, tree_fold
from ethproof_tpu.trie.trie import PartialTrie
from ethproof_tpu.witness.padding import (
    ExtraBlockData,
    PartialTrieState,
    pad_gen_inputs_with_dummy_inputs_if_needed,
)
from ethproof_tpu.witness.types import BlockHashes, BlockMetadata

CFG = standard_fast_config()


class TestParseRange:
    """Mirrors the reference's only unit-tested module
    (/root/reference/common/src/parsing.rs:57-105)."""

    def test_valid_range(self):
        assert parse_range("12..28") == range(12, 28)

    def test_missing_lhs(self):
        with pytest.raises(MissingBound):
            parse_range("..28")

    def test_missing_rhs(self):
        with pytest.raises(MissingBound):
            parse_range("12..")

    def test_empty(self):
        with pytest.raises(MissingDelimiter):
            parse_range("")

    def test_parse_errors(self):
        with pytest.raises(InvalidBound):
            parse_range("a..28")
        with pytest.raises(InvalidBound):
            parse_range("12..z")


class TestCircuitConfig:
    def test_env_override(self):
        cfg = CircuitConfig.from_env({"MEMORY_CIRCUIT_SIZE": "17..30"})
        assert cfg.ranges["memory"] == range(17, 30)
        assert cfg.ranges["cpu"] == DEFAULT_RANGES["cpu"]

    def test_digest_changes_with_ranges(self):
        a = CircuitConfig.from_env({})
        b = CircuitConfig.from_env({"MEMORY_CIRCUIT_SIZE": "17..30"})
        assert a.digest() != b.digest()
        assert a.digest() == CircuitConfig.from_env({}).digest()


class TestTreeFold:
    def test_order_preserving(self):
        out = tree_fold(lambda a, b: f"({a}{b})", list("abcde"))
        assert out == "((ab)(cd)e)" or "a" in out  # structure check below
        # associativity structure: leftmost leaf stays leftmost
        assert out.replace("(", "").replace(")", "") == "abcde"


def _empty_block_ir():
    """0-tx block: two dummies over the same tries (reference :48-57)."""
    state = PartialTrie()
    tries = PartialTrieState(state=state)
    extra = ExtraBlockData(checkpoint_state_trie_root=state.hash())
    ir = []
    pad_gen_inputs_with_dummy_inputs_if_needed(
        ir, BlockMetadata(), BlockHashes(), extra, extra, tries, tries, False
    )
    return ir


class TestDummyBlockPipeline:
    def test_empty_block_proof(self):
        ir = _empty_block_ir()
        assert len(ir) == 2
        bp = prove_block(ir, CFG, runtime=Runtime(num_workers=2))
        assert ops.verify_block(bp, CFG)
        assert bp.state_root_before == bp.state_root_after

    def test_seam_mismatch_rejected(self):
        ir = _empty_block_ir()
        bp = prove_block(ir, CFG)
        # corrupt the right dummy's claimed post-root after proving
        bp.agg.right.gen_inputs.trie_roots_after.state_root = keccak256(b"x")
        assert not ops.verify_block(bp, CFG)

    def test_prover_rejects_discontinuous_payloads(self):
        bad = _empty_block_ir()
        bad[0].trie_roots_after.state_root = keccak256(b"y")
        with pytest.raises(ops.FatalError):
            prove_block(bad, CFG)

    def test_serde_roundtrip(self):
        ir = _empty_block_ir()
        bp = prove_block(ir, CFG)
        import json

        blob = json.dumps(serde.block_proof_to_json(bp))
        back = serde.block_proof_from_json(json.loads(blob))
        assert back.state_root_after == bp.state_root_after
        assert ops.verify_block(back, CFG)

    def test_block_chaining(self):
        ir = _empty_block_ir()
        bp1 = prove_block(ir, CFG)
        bp2 = prove_block(ir, CFG, prev=bp1)
        assert ops.verify_block(bp2, CFG)
