"""Multi-chip parallelism: mesh construction + sharded proving kernels.

Reference equivalent: the paladin worker fleet + rayon intra-op threads
(SURVEY.md §2c/§2d), re-expressed TPU-natively: a `jax.sharding.Mesh`
with a `tx` axis (data-parallel transaction fan-out — the worker-pool
axis) and a `col` axis (trace columns sharded across chips — the
RAYON_NUM_THREADS axis), with XLA inserting ICI collectives where the
Merkle reduction crosses columns.
"""

from . import mesh  # noqa: F401
