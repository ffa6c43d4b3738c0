"""Device meshes and sharded proving steps.

Design (ARCHITECTURE.md "Parallelism axes"):

- `col` axis: trace columns are embarrassingly parallel through iNTT +
  coset LDE (each column transforms independently); the Merkle leaf
  digest reduces ACROSS columns, so XLA inserts an ICI collective at the
  leaf-tree stage; everything above the leaves is replicated (tiny).
- `tx` axis: independent transactions proved simultaneously — the
  reference's worker-pool fan-out (leader/src/prover.rs:26-27) without a
  broker: one SPMD program, one batch dimension.

The sharded step below is the compile surface the driver dry-runs on a
virtual 8-device mesh; on a real pod slice the same code spans hosts via
jax.distributed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gf import field as gfp
from ..gf.field import GF
from ..hash import merkle
from ..poly import ntt as nttm


def make_mesh(n_devices: Optional[int] = None, tx: int = 1) -> Mesh:
    """1- or 2-axis mesh: ('tx', 'col'). tx divides the device count."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % tx == 0
    arr = np.array(devs[:n]).reshape(tx, n // tx)
    return Mesh(arr, axis_names=("tx", "col"))


_DEFAULT_MESH = "unset"


def default_mesh() -> Optional[Mesh]:
    """The PRODUCTION mesh: built once per process when more than one
    local device is attached, so `cli prove` / fleet workers on a
    multi-chip host shard every trace commit over ICI without any flag
    (VERDICT r3 #7 — the reference's rayon intra-op axis is implicit
    too). ETHPROOF_MESH=off disables; =N caps the 'col' width. One chip
    (or CPU without forced host devices) -> None, the unsharded path."""
    global _DEFAULT_MESH
    if _DEFAULT_MESH != "unset":
        return _DEFAULT_MESH
    import os

    mode = os.environ.get("ETHPROOF_MESH", "auto")
    if mode == "off":
        _DEFAULT_MESH = None
        return None
    try:
        n = len(jax.devices())
    except Exception:
        n = 1
    if mode not in ("auto", ""):
        n = min(n, int(mode))
    _DEFAULT_MESH = make_mesh(n) if n > 1 else None
    return _DEFAULT_MESH


def reset_default_mesh() -> None:
    """Testing hook."""
    global _DEFAULT_MESH
    _DEFAULT_MESH = "unset"


def mesh_width(mesh: Mesh) -> int:
    return mesh.shape["col"]


def shard_gf(a: GF, mesh: Mesh, axis: int) -> GF:
    """Place a 2D GF array with `axis` sharded over the mesh 'col' axis.

    This is the production prover's layout control (stark/prove.py):
    columns (axis 0) are sharded through the per-column iNTT/LDE — each
    device transforms its own column block with zero communication — and
    the LDE is then resharded to the DOMAIN axis (axis 1) for Merkle leaf
    hashing and the constraint sweep, both elementwise in the domain. The
    reshard between the two stages is one all-to-all riding ICI — the NTT
    "transpose" of SURVEY §5.7.
    """
    spec: list = [None, None]
    spec[axis] = "col"
    s = NamedSharding(mesh, P(*spec))
    return GF(jax.device_put(a.lo, s), jax.device_put(a.hi, s))


def pad_cols(a: GF, multiple: int) -> GF:
    """Zero-pad axis 0 up to a multiple (sharding divisibility)."""
    cols = a.lo.shape[0]
    pad = (-cols) % multiple
    if pad == 0:
        return a
    z = jnp.zeros((pad, a.lo.shape[1]), dtype=a.lo.dtype)
    return GF(jnp.concatenate([a.lo, z]), jnp.concatenate([a.hi, z]))


def trace_commit_sharded(mesh: Mesh, cols: int, n: int, rate_bits: int = 2,
                         cap_height: int = 2, shift: int = 7):
    """Build a jitted column-sharded trace-commit step on `mesh`.

    Returns (fn, shard_fn): fn(trace_lo, trace_hi) -> (cap_lo, cap_hi);
    shard_fn places a host trace onto the mesh.
    """
    col_sharding = NamedSharding(mesh, P(None, "col", None))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(rep, rep))
    def commit(trace_lo, trace_hi):
        # leading axis = tx batch, middle = columns (sharded), last = rows
        trace = GF(trace_lo, trace_hi)
        coeffs = nttm._ntt_impl(trace, inverse=True)
        lde = nttm._coset_lde_impl(coeffs, rate_bits, shift)
        lde = GF(
            jax.lax.with_sharding_constraint(lde.lo, col_sharding),
            jax.lax.with_sharding_constraint(lde.hi, col_sharding),
        )

        def one_tx(lo, hi):
            levels = merkle._build_levels(GF(lo, hi), cap_height)
            cap = levels[-1]
            return cap.lo, cap.hi

        cap_lo, cap_hi = jax.vmap(one_tx)(lde.lo, lde.hi)
        return cap_lo, cap_hi

    def shard_fn(trace_lo: np.ndarray, trace_hi: np.ndarray):
        return (
            jax.device_put(trace_lo, col_sharding),
            jax.device_put(trace_hi, col_sharding),
        )

    return commit, shard_fn


def constraint_sweep_sharded(mesh: Mesh):
    """Column-sharded elementwise constraint sweep skeleton: the LDE rows
    live sharded; the alpha-weighted fold reduces across columns (psum
    inserted by XLA through with_sharding_constraint on the output)."""
    col_sharding = NamedSharding(mesh, P("col", None))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(rep, rep))
    def sweep(lde_lo, lde_hi, w_lo, w_hi):
        lde = GF(
            jax.lax.with_sharding_constraint(lde_lo, col_sharding),
            jax.lax.with_sharding_constraint(lde_hi, col_sharding),
        )
        w = GF(w_lo[:, None], w_hi[:, None])
        prod = gfp.mul(lde, w)
        # modular tree-reduction over the sharded axis
        k = prod.lo.shape[0]
        acc = prod
        while k > 1:
            half = k // 2
            s = gfp.add(
                GF(acc.lo[:half], acc.hi[:half]),
                GF(acc.lo[half : 2 * half], acc.hi[half : 2 * half]),
            )
            if k & 1:
                s = GF(
                    jnp.concatenate([s.lo, acc.lo[-1:]]),
                    jnp.concatenate([s.hi, acc.hi[-1:]]),
                )
                k = half + 1
            else:
                k = half
            acc = s
        return acc.lo[0], acc.hi[0]

    return sweep
