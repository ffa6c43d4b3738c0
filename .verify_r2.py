"""User-style TPU drive: recursion-machine proof + overlap transfer proof.

Ground truth comes from independent host computation (python ints +
poseidon host permutation), not the repo's CPU test suite.
"""
import time
import jax
print("devices:", jax.devices())
jax.config.update("jax_compilation_cache_dir", "/tmp/ethproof_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from ethproof_tpu.fri.config import FriConfig, StarkConfig
from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.hash import poseidon as ps
from ethproof_tpu.recursion.circuit import CBuilder, interpret
from ethproof_tpu.recursion.machine import RecursionStark, generate_trace
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.verify import stark_verify

P = fh.P
CFG = StarkConfig(num_challenges=2, fri_config=FriConfig(
    rate_bits=2, cap_height=1, proof_of_work_bits=4,
    num_query_rounds=12, arity_bits=2, final_poly_bits=2))

# 1. recursion machine on TPU
b = CBuilder()
x = b.wit("x")
y = b.add(b.add(b.mul(x, x), b.mulc(3, x)), b.const(5))
out = b.poseidon([y] + [b.const(0)] * 11)
for k in range(4):
    b.expose(out[k], k)
circuit = b.build()
xv = 424242
yv = (xv * xv + 3 * xv + 5) % P
digest = ps.permute_host([yv] + [0] * 11)[:4]  # independent ground truth
vals = interpret(circuit, [xv], digest)
stark = RecursionStark(circuit)
n = 1 << max(circuit.num_rows - 1, 1).bit_length()
tr = generate_trace(stark, vals, n)
t0 = time.time()
proof = stark_prove(stark, tr, digest, CFG)
t1 = time.time()
ok = stark_verify(stark, proof, CFG)
print(f"machine proof: n={n} prove={t1-t0:.1f}s verify={time.time()-t1:.1f}s ok={ok}")
assert ok
bad = stark_verify(stark, stark_prove(stark, tr, [digest[0] ^ 1] + digest[1:], CFG), CFG)
print("tampered-PI rejected:", not bad)
assert not bad

# 2. overlap transfer proof (miner == sender) with the range-fixed tables
import sys
sys.path.insert(0, "/root/repo/tests")
from test_transfer_e2e import CFG as TCFG, SIZES, make_transfer_witness
from ethproof_tpu.evm.transfer import prove_transfer, verify_transfer

gi = make_transfer_witness(miner_is_sender=True, gas_price=1, gas_used=30)
t0 = time.time()
txp = prove_transfer(gi, TCFG, SIZES)
t1 = time.time()
ok = verify_transfer(txp, TCFG)
print(f"overlap transfer: prove={t1-t0:.1f}s verify={time.time()-t1:.1f}s ok={ok}")
assert ok

# 3. BOUND transfer proof: the STARK verifies the state-root transition
# in-circuit (evm/binding.py); then tamper the post-root PI and check the
# STARK alone rejects (host trie layers skipped).
from ethproof_tpu.evm.binding import KernelShape
from ethproof_tpu.evm.transfer import PI_STATE_ROOT_POST, transfer_cpu_stark
from ethproof_tpu.tables.all import TableSizes, verify_all_tables

gib = make_transfer_witness()  # 3 distinct accounts, depth-2 paths
shape = KernelShape(levels=3, node_words=10)
sizes = TableSizes(
    cpu=14, arithmetic=16, logic=7, bytepacking=9, memory=16,
    keccak=10, keccak_sponge=9,
)
t0 = time.time()
bp = prove_transfer(gib, TCFG, sizes, binding=shape)
t1 = time.time()
assert bp.binding_shape == shape
ok = verify_transfer(bp, TCFG)
print(f"bound transfer: prove={t1-t0:.1f}s verify={time.time()-t1:.1f}s ok={ok}")
assert ok
cpu = transfer_cpu_stark(bp.overlap, bp.binding_shape)
bad_pi = list(bp.pi_words)
bad_pi[PI_STATE_ROOT_POST] ^= 1
assert not verify_all_tables(cpu, bad_pi, bp.multi, TCFG)
print("tampered post-root rejected by the STARK alone: True")

# 4. EVM machine: a real ERC-20 transfer(address,uint256) transaction —
# the machine fetches committed bytecode, binds it to code_hash via the
# sponge, journals storage; verify includes the host trie binding.
from test_contract_call import make_erc20_witness, SIZES as MSZ
from ethproof_tpu.evm import contract as C

gim = make_erc20_witness()
t0 = time.time()
ccp = C.prove_contract_call(gim, TCFG, MSZ)
t1 = time.time()
ok = C.verify_contract_call(ccp, TCFG)
print(f"ERC-20 machine proof: prove={t1-t0:.1f}s verify={time.time()-t1:.1f}s ok={ok}")
assert ok
bad = list(ccp.machine_pi)
bad[ccp.shape.pi_layout["storage"] + 5] += 1  # forge recipient balance
from ethproof_tpu.tables import all as TA, evm as EV
assert not TA.verify_evm_tables(EV.EvmStark(ccp.shape), bad, ccp.multi, TCFG)
print("forged token balance rejected by the machine STARK: True")
print("VERIFY PASS")
