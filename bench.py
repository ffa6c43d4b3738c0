"""Headline benchmark: Goldilocks NTT throughput on one TPU chip.

This is BASELINE.md north-star metric #2 ("Goldilocks NTT butterflies/s/chip")
— the kernel that dominates STARK proving cost (SURVEY.md §3.5). The
reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is null until a reference CPU run is measured.

Timing methodology (the remote-device transport lies): `block_until_ready`
can return before execution and bulk readback is slow, so we jit a k-fold
NTT chain (lax.scan — no host round-trips, no cacheable repeated dispatch),
read back an 8-byte checksum to force completion, and difference k vs 2k
runs to cancel fixed dispatch/transfer overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ethproof_jax_cache")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from ethproof_tpu.gf import field as gfp
    import ethproof_tpu.poly.ntt as nttm

    import ethproof_tpu.poly.mxu_ntt as mx

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    variant = sys.argv[2] if len(sys.argv) > 2 else "mxu"
    n = 1 << log_n
    rng = np.random.default_rng(0)
    vals = rng.integers(0, gfp.P, size=(n,), dtype=np.uint64)
    a = gfp.from_u64(vals)
    ntt_fn = (
        (lambda c: mx._mxu_ntt_impl(c, inverse=False))
        if variant == "mxu"
        else (lambda c: nttm._ntt_impl(c, inverse=False))
    )

    def chain(k):
        @jax.jit
        def run(x):
            def body(c, _):
                return ntt_fn(c), None

            out, _ = jax.lax.scan(body, x, None, length=k)
            # fold to one element so only 8 bytes cross the transport
            return out.lo.astype(jnp.uint32).sum(), out.hi.sum()

        return run

    k1, k2 = 4, 12
    run1, run2 = chain(k1), chain(k2)

    def timed(run):
        lo, hi = run(a)
        _ = int(np.asarray(lo))  # forces completion
        t0 = time.perf_counter()
        lo, hi = run(a)
        _ = int(np.asarray(lo)), int(np.asarray(hi))
        return time.perf_counter() - t0

    t1 = timed(run1)
    t2 = timed(run2)
    per_ntt = (t2 - t1) / (k2 - k1)
    butterflies = (n // 2) * log_n
    print(
        json.dumps(
            {
                "metric": f"goldilocks_ntt_butterflies_per_s_2^{log_n}_{variant}",
                "value": round(butterflies / max(per_ntt, 1e-9), 1),
                "unit": "butterflies/s/chip",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
