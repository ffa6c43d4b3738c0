"""Pallas fused base-DFT kernel vs the XLA formulation (interpret mode).

The kernel's production surface is the TPU (verified on-chip against
python-bigint ground truth); this CPU-tier test runs it under the
Pallas interpreter so CI catches semantic regressions in the kernel
body (chunk extraction, bucket accumulation, limb recombination)."""

import numpy as np
import pytest

from ethproof_tpu.gf import field as gfp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # set the module flag directly: pallas_ntt may already be imported
    # (with the env unset) by an earlier test in the same process
    from ethproof_tpu.poly import pallas_ntt

    monkeypatch.setattr(pallas_ntt, "_INTERPRET", True)


@pytest.mark.parametrize("log_n,rows", [(7, 64), (8, 32), (5, 128)])
def test_kernel_matches_xla(log_n, rows):
    from ethproof_tpu.poly import mxu_ntt as mx
    from ethproof_tpu.poly import pallas_ntt

    rng = np.random.default_rng(log_n)
    vals = rng.integers(0, gfp.P, size=(rows, 1 << log_n), dtype=np.uint64)
    a = gfp.from_u64(vals)
    assert pallas_ntt.supported(a.lo.size, log_n)
    got = pallas_ntt.dft_last_axis(a, log_n, False)
    ref = mx._field_matmul_dft(a, log_n, False)
    assert bool((got.lo == ref.lo).all()) and bool((got.hi == ref.hi).all())


def test_kernel_inverse_matches_xla():
    from ethproof_tpu.poly import mxu_ntt as mx
    from ethproof_tpu.poly import pallas_ntt

    rng = np.random.default_rng(9)
    vals = rng.integers(0, gfp.P, size=(64, 128), dtype=np.uint64)
    a = gfp.from_u64(vals)
    got = pallas_ntt.dft_last_axis(a, 7, True)
    ref = mx._field_matmul_dft(a, 7, True)
    assert bool((got.lo == ref.lo).all()) and bool((got.hi == ref.hi).all())
