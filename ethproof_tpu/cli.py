"""Leader-compatible CLI: `rpc` and `prove` subcommands.

Reference equivalent: the `leader` binary
(/root/reference/leader/src/{main,cli}.rs):

  leader rpc   -u <url> -t <tx-hash> [--request-miner-from-clique]
  leader prove -i <witness.json> --runtime in-memory --num-workers N
               [--persistence {none,disk}] [--<table>-circuit-size A..B]

plus a `verify` subcommand (the reference delegates verification to the
embedded plonky2 verifier; here it is a first-class command) and a
`worker` stub documenting the multi-host path. Witness JSON flows
rpc -> file -> prove, proof JSON to stdout (main.rs:36,60). Circuit
sizes resolve CLI flag -> env var -> default, like clap's env feature
(common/src/prover_state/cli.rs:25-54); a `.env` file in the cwd is
honored the way dotenvy is (leader/src/main.rs:21).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_dotenv() -> None:
    path = os.path.join(os.getcwd(), ".env")
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            os.environ.setdefault(k.strip(), v.strip())


def _add_circuit_flags(p: argparse.ArgumentParser) -> None:
    from .runtime.prover_state import ENV_KEYS

    for name in ENV_KEYS:
        p.add_argument(
            f"--{name.replace('_', '-')}-circuit-size",
            metavar="A..B",
            help=f"degree-bit range (env {ENV_KEYS[name]})",
        )
    p.add_argument(
        "--persistence",
        choices=["none", "disk"],
        default="disk",
        help="circuit/compilation cache persistence (default disk)",
    )


def _resolve_config(args) -> "CircuitConfig":
    from .runtime.parsing import parse_range
    from .runtime.prover_state import CircuitConfig, ENV_KEYS

    cfg = CircuitConfig.from_env()
    ranges = dict(cfg.ranges)
    for name in ENV_KEYS:
        flag = getattr(args, f"{name}_circuit_size", None)
        if flag:
            ranges[name] = parse_range(flag)
    return CircuitConfig(ranges)


def cmd_rpc(args) -> int:
    from .runtime.tracing import init_tracing
    from .witness.gather import RpcClient, gather_witness
    from .witness.types import witness_to_json

    init_tracing()
    client = RpcClient(args.rpc_url)
    ir = gather_witness(args.transaction_hash, client, clique=args.request_miner_from_clique)
    json.dump(witness_to_json(ir), sys.stdout)
    return 0


def cmd_prove(args) -> int:
    from .fri.config import standard_fast_config
    from .runtime import serde
    from .runtime.prover_state import set_prover_state_from_config
    from .runtime.scheduler import Runtime, prove_block
    from .runtime.tracing import init_tracing
    from .witness.types import witness_from_json

    init_tracing()
    config = _resolve_config(args)
    set_prover_state_from_config(config, persistence=args.persistence)
    with open(args.input_witness) as f:
        ir = witness_from_json(json.load(f))
    from .tables.all import TableSizes

    runtime = Runtime(num_workers=args.num_workers)
    try:
        bp = prove_block(
            ir,
            standard_fast_config(),
            sizes=TableSizes.from_config(config),
            runtime=runtime,
        )
    finally:
        runtime.close()
    json.dump(serde.block_proof_to_json(bp), sys.stdout)
    return 0


def cmd_verify(args) -> int:
    from .fri.config import standard_fast_config
    from .runtime import serde
    from .runtime.ops import verify_block
    from .runtime.tracing import init_tracing

    init_tracing()
    with open(args.input_proof) as f:
        bp = serde.block_proof_from_json(json.load(f))
    ok = verify_block(bp, standard_fast_config())
    print("valid" if ok else "INVALID", file=sys.stderr)
    return 0 if ok else 1


def cmd_worker(args) -> int:
    print(
        "multi-host workers are scheduled through jax.distributed (one SPMD\n"
        "program over the pod), not a broker; run `prove` on the coordinator\n"
        "with JAX distributed env configured. See ARCHITECTURE.md.",
        file=sys.stderr,
    )
    return 2


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="ethproof_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    rpc = sub.add_parser("rpc", help="generate a witness from a JSON-RPC node")
    rpc.add_argument("-u", "--rpc-url", required=True)
    rpc.add_argument("-t", "--transaction-hash", required=True)
    rpc.add_argument("--request-miner-from-clique", action="store_true")
    rpc.set_defaults(fn=cmd_rpc)

    prove = sub.add_parser("prove", help="prove a witness file")
    prove.add_argument("-i", "--input-witness", required=True)
    prove.add_argument("--runtime", choices=["in-memory"], default="in-memory")
    prove.add_argument("--num-workers", type=int, default=1)
    _add_circuit_flags(prove)
    prove.set_defaults(fn=cmd_prove)

    verify = sub.add_parser("verify", help="verify a proof file")
    verify.add_argument("-i", "--input-proof", required=True)
    verify.set_defaults(fn=cmd_verify)

    worker = sub.add_parser("worker", help="multi-host worker (see notes)")
    worker.add_argument("--runtime", default="amqp")
    worker.set_defaults(fn=cmd_worker)
    return parser


def main(argv=None) -> int:
    _load_dotenv()
    args = build_parser().parse_args(argv)
    # normalize dashes for circuit size attrs
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
