"""ethproof_tpu — a TPU-native Ethereum transaction/block prover.

Built from scratch with the capabilities of ``0xPolygonZero/eth-tx-proof``
(reference mounted at /root/reference): witness generation from an Ethereum
JSON-RPC node, seven zkEVM STARK tables over the Goldilocks field, recursive
per-transaction -> aggregation -> block proofs, and a distributed proving
runtime. The compute path is JAX/XLA/Pallas over TPU device meshes; the
reference's Rust/AMQP fabric is replaced by SPMD sharding + host scheduling.

Layout (mirrors SURVEY.md section 7 build order):
  gf/        Goldilocks field GF(p), p = 2^64 - 2^32 + 1, as uint32-pair lanes
  poly/      NTT / iNTT / coset LDE with precomputed root tables
  hash/      Poseidon (width 12), Keccak-f[1600], Merkle-cap trees
  fri/       Fiat-Shamir challenger + FRI commit/fold/query prove & verify
  stark/     generic STARK engine (trace commit, constraints, quotient, openings)
  models/    the seven zkEVM STARK tables (Arithmetic, BytePacking, Cpu,
             Keccak, KeccakSponge, Logic, Memory) + AllStark
  ops/       proving operations: TxProof / AggProof / BlockProof
             (reference: ops/src/lib.rs)
  parallel/  device-mesh runtime replacing paladin-core (reference:
             leader/src/prover.rs + paladin AMQP fabric)
  witness/   RPC witness front-end: MPT reconstruction, tracing, padding
             (reference: leader/src/{lib,mpt,rpc,padding_and_withdrawals}.rs)
  utils/     range parsing, config plumbing, span timing
"""

__version__ = "0.1.0"
