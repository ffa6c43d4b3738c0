"""Recursion circuit disk persistence (recursion/persist.py).

Reference parity: serialized AllRecursiveCircuits
(/root/reference/common/src/prover_state/persistence.rs:40-88) — here
circuit programs round-trip through compact numpy archives with
declarative hints, and a loaded circuit reproduces the SAME machine
(layout + fixed columns) as the freshly built one.
"""

import numpy as np
import pytest

from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.hash import poseidon as ps
from ethproof_tpu.recursion import persist
from ethproof_tpu.recursion.circuit import (
    CBuilder,
    circuit_from_arrays,
    circuit_to_arrays,
    interpret,
)
from ethproof_tpu.recursion.machine import RecursionStark

P = fh.P


def _toy_circuit():
    b = CBuilder()
    x = b.wit("x")
    inv = b.inverse(x)
    b.decompose_bits(x, 8)
    e = b.ext_wit("e")
    b.ext_inverse(e)
    h = b.poseidon([x, inv] + [b.const(0)] * 10)
    for k in range(4):
        b.expose(h[k], k)
    return b.build()


class TestCircuitArrays:
    def test_roundtrip_interprets_identically(self):
        c = _toy_circuit()
        c2 = circuit_from_arrays(
            {k: np.asarray(v) for k, v in circuit_to_arrays(c).items()}
        )
        x = 0xAB
        digest = ps.permute_host([x, pow(x, P - 2, P)] + [0] * 10)[:4]
        w = [x, 3, 5]
        assert interpret(c, w, digest, True) == interpret(c2, w, digest, True)

    def test_roundtrip_same_machine(self):
        """The loaded circuit must define the IDENTICAL machine: same
        lane layout and same fixed columns (the vkey preimage)."""
        c = _toy_circuit()
        c2 = circuit_from_arrays(
            {k: np.asarray(v) for k, v in circuit_to_arrays(c).items()}
        )
        s1, s2 = RecursionStark(c), RecursionStark(c2)
        assert s1.num_rows == s2.num_rows
        n = 1 << max((s1.num_rows - 1).bit_length(), 6)
        assert np.array_equal(s1.fixed_columns(n), s2.fixed_columns(n))


class TestDiskCache:
    def test_save_load_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ETHPROOF_ARTIFACT_DIR", str(tmp_path))
        c = _toy_circuit()
        path = persist.circ_path("test", ("k",))
        assert path is not None and str(tmp_path) in path
        persist.save_circuit(path, c, {"log_n": 9})
        hit = persist.load_circuit(path)
        assert hit is not None
        c2, ex = hit
        assert int(ex["log_n"]) == 9
        assert len(c2.gates) == len(c.gates)

    def test_corrupt_file_degrades_to_rebuild(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ETHPROOF_ARTIFACT_DIR", str(tmp_path))
        path = persist.circ_path("test", ("k2",))
        with open(path, "wb") as f:
            f.write(b"garbage")
        assert persist.load_circuit(path) is None

    def test_no_artifact_dir_is_noop(self, monkeypatch):
        monkeypatch.delenv("ETHPROOF_ARTIFACT_DIR", raising=False)
        monkeypatch.setattr(
            "ethproof_tpu.runtime.prover_state.artifact_dir", lambda: None
        )
        assert persist.circ_path("test", ("k",)) is None
        persist.save_circuit(None, _toy_circuit(), {})  # no-op
        assert persist.load_circuit(None) is None
