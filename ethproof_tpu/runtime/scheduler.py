"""The proving pipeline: map over txs, tree-fold, block step.

Reference equivalent: `ProverInput::prove` (/root/reference/leader/src/
prover.rs:20-44): IndexedStream::from(ir).map(&TxProof).fold(&AggProof),
then Literal(agg).map(&BlockProof). The paladin Directive DSL dissolves
into direct scheduling (SURVEY.md §2d): the fold is an order-preserving
binary tree over adjacent pairs (associativity is what made paladin's
out-of-order pairwise combining legal — we keep the tree, schedule it
level by level).

Runtimes:
- InMemoryRuntime(num_workers): host threads parallelize trace
  generation; device dispatch serializes naturally. The reference's
  in-memory runtime has the same role (README.md:60-70).
- Multi-host dispatch (one tx per host over DCN, jax.distributed) plugs
  in behind the same `Runtime.map` surface.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence

from ..fri.config import StarkConfig
from ..tables.all import TableSizes
from ..witness.types import GenerationInputs
from . import ops
from .tracing import span


class Runtime:
    """In-memory runtime (reference --runtime in-memory).

    Transient failures retry with backoff; `FatalError` aborts the job —
    the paladin retry/fatal split (reference ops/src/lib.rs:52 + the
    backoff dep, SURVEY.md §5.3).
    """

    def __init__(self, num_workers: int = 1, max_retries: int = 2):
        self.num_workers = max(1, num_workers)
        self.max_retries = max_retries

    def _run_one(self, fn: Callable, item):
        import time as _time

        from .ops import FatalError
        from .tracing import logger

        delay = 1.0
        for attempt in range(self.max_retries + 1):
            try:
                return fn(item)
            except FatalError:
                raise
            except Exception as e:
                if attempt == self.max_retries:
                    raise
                logger.warning(
                    "task failed (%s); retry %d/%d in %.0fs",
                    e, attempt + 1, self.max_retries, delay,
                )
                _time.sleep(delay)
                delay *= 2

    def map(self, fn: Callable, items: Sequence):
        one = lambda x: self._run_one(fn, x)
        if self.num_workers == 1 or len(items) <= 1:
            return [one(x) for x in items]
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            return list(pool.map(one, items))

    def close(self) -> None:
        pass


def tree_fold(combine: Callable, leaves: List) -> object:
    """Order-preserving binary-tree fold (adjacent pairs, level by level)."""
    assert leaves, "fold over zero leaves"
    level = list(leaves)
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level) - 1, 2):
            nxt.append(combine(level[i], level[i + 1]))
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    return level[0]


def prove_block(
    gen_inputs: List[GenerationInputs],
    config: StarkConfig,
    sizes: Optional[TableSizes] = None,
    runtime: Optional[Runtime] = None,
    prev: Optional[ops.GeneratedBlockProof] = None,
) -> ops.GeneratedBlockProof:
    """witness IR -> block proof (reference prover.rs:26-39)."""
    assert len(gen_inputs) >= 2, "padding guarantees >= 2 payloads"
    runtime = runtime or Runtime()
    with span("prove_block", txs=len(gen_inputs)):
        leaves = runtime.map(
            lambda gi: ops.tx_proof(gi, config, sizes), gen_inputs
        )
        agg = tree_fold(ops.agg_combine, leaves)
        if not isinstance(agg, ops.AggProof):
            raise ops.FatalError("fold must end in an aggregate (>=2 leaves)")
        return ops.block_proof(agg, prev)
