"""Tracing: per-operation spans with durations.

Reference equivalent: the tracing contract of leader/worker
(/root/reference/leader/src/init.rs, worker/src/init.rs — span-close
events log per-op latency; ops add explicit spans + Instant timing,
ops/src/lib.rs:48-58). Env var `ETHPROOF_LOG` plays the role of
`RUST_LOG` (deploy/paladin-worker@.service:24).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger("ethproof_tpu")


def init_tracing(level: str | None = None, pretty: bool = False) -> None:
    lvl = (level or os.environ.get("ETHPROOF_LOG", "info")).upper()
    fmt = (
        "%(asctime)s %(levelname)s %(name)s: %(message)s"
        if pretty
        else "%(levelname)s %(name)s: %(message)s"
    )
    logging.basicConfig(level=getattr(logging, lvl, logging.INFO), format=fmt)


@contextlib.contextmanager
def span(name: str, **fields):
    """One span per proof op, duration logged on close (the reference's
    FmtSpan::CLOSE contract)."""
    extra = " ".join(f"{k}={v}" for k, v in fields.items())
    logger.info("%s begin %s", name, extra)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.info("%s close time.busy=%.3fs %s", name, time.perf_counter() - t0, extra)


# Machine-readable per-phase accumulator (bench.py proof phases). Wall
# clock between phase boundaries; JAX dispatch is async, so a phase's
# time is attributed at its first host sync (each stark_prove phase ends
# in one — caps/openings cross to host). Cleared by the caller.
PHASE_TIMES: dict = {}


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        PHASE_TIMES[name] = (
            PHASE_TIMES.get(name, 0.0) + time.perf_counter() - t0
        )
