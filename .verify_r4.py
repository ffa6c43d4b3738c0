"""Round-4 TPU drive: the succinct block path, machine-proved, on the
REAL chip (VERDICT r3 next #1's drive half).

Stages (each prints a line; any assertion failure is a drive failure):
  1. prove_block(recursion=True) over a 2-transfer chained block at the
     smallest viable FRI config: real per-tx ROOT machine proofs + one
     agg-ladder fold -> SuccinctBlockProof. All STARK proving (tables,
     root machines, agg machine) runs on the TPU.
  2. serde round-trip + cli-style verify (ladder rebuilt from the
     proof-declared identity).
  3. tamper a leaf witness root and a top-proof FRI opening -> reject.

Run:  python .verify_r4.py            (uses the tunneled TPU; ~minutes
                                       warm, longer on a cold XLA cache)
"""

import copy
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ethproof_tpu_cache")
os.environ.setdefault("ETHPROOF_ARTIFACT_DIR", "/tmp/ethproof_artifacts_tpu")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main() -> int:
    print("devices:", jax.devices(), flush=True)
    from test_succinct_block import SIZES, TINY, make_transfer_chain

    from ethproof_tpu.recursion.state import recursion_state
    from ethproof_tpu.runtime import serde
    from ethproof_tpu.runtime.ops import verify_block
    from ethproof_tpu.runtime.scheduler import prove_block

    gis = make_transfer_chain(2)
    t0 = time.time()
    bp = prove_block(gis, TINY, sizes=SIZES, recursion=True)
    t1 = time.time()
    assert bp.succinct is not None
    print(f"1. prove_block(recursion=True): {t1 - t0:.0f}s "
          f"(level={bp.succinct.level})", flush=True)

    def rstate(succ):
        return recursion_state(
            succ.sizes, TINY,
            binding_shape=succ.binding_shape, evm_shapes=succ.evm_shapes,
        )

    assert verify_block(bp, TINY, recursion=rstate(bp.succinct))
    print(f"   succinct verify: ok ({time.time() - t1:.0f}s)", flush=True)

    blob = json.dumps(serde.block_proof_to_json(bp))
    back = serde.block_proof_from_json(json.loads(blob))
    assert verify_block(back, TINY, recursion=rstate(back.succinct))
    print(f"2. serde round-trip + cli-style verify: ok "
          f"({len(blob)} bytes)", flush=True)

    bad = copy.deepcopy(back)
    from ethproof_tpu.hash.keccak import keccak256

    bad.agg.left.gen_inputs.trie_roots_after.state_root = keccak256(b"no")
    assert not verify_block(bad, TINY, recursion=rstate(bad.succinct))
    bad2 = copy.deepcopy(back)
    bad2.succinct.top.proof.trace_query_openings.values[0, 0] ^= 1
    assert not verify_block(bad2, TINY, recursion=rstate(bad2.succinct))
    print("3. tampered leaf root + tampered top FRI opening: rejected",
          flush=True)
    print("ROUND-4 DRIVE: ALL OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
