"""Prover state: per-table circuit size config + warm-start persistence.

Reference equivalent: `common/src/prover_state/{circuit,cli,mod,
persistence}.rs` — the 7-table degree-range config with `*_CIRCUIT_SIZE`
env keys (circuit.rs:90-100), code-default ranges (circuit.rs:77-87),
a config digest naming the on-disk cache `./prover_state_<digest>`
(persistence.rs:17,32-38), and the global once-initialized state
(mod.rs:22-31).

What persists here: the XLA compilation cache (the expensive, config-
shaped artifact — the analogue of the serialized recursive circuits) and
the NTT/constraint shapes implied by the ranges. Corrupt/missing cache
degrades to recompilation, like the reference (persistence.rs:49-55).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Dict, Optional

from .parsing import parse_range

# reference code-default ranges (circuit.rs:77-87)
DEFAULT_RANGES: Dict[str, range] = {
    "arithmetic": range(16, 23),
    "byte_packing": range(9, 21),
    "cpu": range(12, 25),
    "keccak": range(14, 20),
    "keccak_sponge": range(9, 15),
    "logic": range(12, 18),
    "memory": range(17, 28),
}

ENV_KEYS = {
    "arithmetic": "ARITHMETIC_CIRCUIT_SIZE",
    "byte_packing": "BYTE_PACKING_CIRCUIT_SIZE",
    "cpu": "CPU_CIRCUIT_SIZE",
    "keccak": "KECCAK_CIRCUIT_SIZE",
    "keccak_sponge": "KECCAK_SPONGE_CIRCUIT_SIZE",
    "logic": "LOGIC_CIRCUIT_SIZE",
    "memory": "MEMORY_CIRCUIT_SIZE",
}


@dataclass(frozen=True)
class CircuitConfig:
    ranges: Dict[str, range] = field(default_factory=lambda: dict(DEFAULT_RANGES))

    @classmethod
    def from_env(cls, env: Optional[Dict[str, str]] = None) -> "CircuitConfig":
        env = dict(os.environ) if env is None else env
        ranges = dict(DEFAULT_RANGES)
        for name, key in ENV_KEYS.items():
            if key in env:
                ranges[name] = parse_range(env[key])
        return cls(ranges)

    def digest(self) -> str:
        """Stable digest over the ranges — the cache-key (circuit.rs:177-197)."""
        text = "_".join(
            f"{name}_{r.start}..{r.stop}" for name, r in sorted(self.ranges.items())
        )
        return hashlib.sha256(text.encode()).hexdigest()[:16]


@dataclass
class ProverState:
    config: CircuitConfig
    cache_dir: Optional[str]


_P_STATE: Optional[ProverState] = None


def p_state() -> ProverState:
    """Global prover state (reference ops/src/lib.rs:16-18 `p_state`)."""
    assert _P_STATE is not None, "prover state accessed before initialization"
    return _P_STATE


def set_prover_state_from_config(
    config: CircuitConfig, persistence: str = "disk", base_dir: str = "."
) -> ProverState:
    """Initialize once (reference common/src/prover_state/mod.rs:59-95).

    persistence="disk" points the XLA compilation cache at
    `<base>/prover_state_<digest>`; "none" keeps compilation in-memory.
    """
    global _P_STATE
    if _P_STATE is not None:
        return _P_STATE
    cache_dir = None
    if persistence == "disk":
        cache_dir = os.path.join(base_dir, f"prover_state_{config.digest()}")
        os.makedirs(cache_dir, exist_ok=True)
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception as e:  # degrade to regeneration (persistence.rs:49-55)
            import logging

            logging.warning("prover-state cache unavailable (%s); regenerating", e)
            cache_dir = None
    _P_STATE = ProverState(config=config, cache_dir=cache_dir)
    return _P_STATE


def reset_prover_state() -> None:
    """Testing hook — the reference's OnceLock has no reset; tests need one."""
    global _P_STATE
    _P_STATE = None


def artifact_dir() -> Optional[str]:
    """Directory for deterministic prover artifacts (vkey caps, circuit
    programs) persisted NEXT TO the XLA cache — the analogue of the
    reference's serialized circuits in `./prover_state_<digest>`
    (/root/reference/common/src/prover_state/persistence.rs:32-88).

    Resolution: the initialized prover state's cache dir, else
    ETHPROOF_ARTIFACT_DIR (lets tests/workers opt in without the global
    once-init), else None (in-memory only)."""
    if _P_STATE is not None and _P_STATE.cache_dir:
        return _P_STATE.cache_dir
    d = os.environ.get("ETHPROOF_ARTIFACT_DIR")
    if d:
        os.makedirs(d, exist_ok=True)
        return d
    return None
