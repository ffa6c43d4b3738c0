"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's trick of testing multi-worker behavior without a
cluster via the in-memory runtime (reference README.md:7-11): we emulate an
8-chip TPU slice with xla_force_host_platform_device_count so sharding /
collective code paths compile and execute on one host.

Must run before any jax import, hence top of conftest.
"""

import os

# Force CPU: the ambient env points JAX at a (tunneled) TPU via a
# sitecustomize-registered plugin that IGNORES the JAX_PLATFORMS env var, so
# the config API is the only reliable override. The test suite must be
# hermetic, fast to compile, and able to emulate 8 devices.
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests prove each shape once: the jitted constraint sweep would pay its
# one-off trace+compile without ever amortizing it (block pipelines do).
os.environ.setdefault("ETHPROOF_JIT_SWEEP", "never")
# The 8 virtual devices emulate a TPU slice for the dedicated sharding
# tests; everything else must stay single-device (the default-mesh
# production path would otherwise shard EVERY proving test).
os.environ.setdefault("ETHPROOF_MESH", "off")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: proving tests too heavy for the CPU tier (run with --runslow "
        "or on TPU via the verify recipe)",
    )


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False)


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow proving test (use --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

# Persistent XLA compilation cache: the kernels compile big uint32 graphs;
# caching across pytest processes turns ~30s per distinct shape into ~ms.
jax.config.update("jax_compilation_cache_dir", "/tmp/ethproof_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

# Persistent prover artifacts (vkey caps, circuit programs): recursion
# tests rebuild root/agg circuits per process; content-keyed disk reuse
# (stark/prove.fixed_cap) makes that ~10x cheaper after first build.
os.environ.setdefault("ETHPROOF_ARTIFACT_DIR", "/tmp/ethproof_artifacts_cpu")
