"""FRI end-to-end: device prover -> host verifier, plus negative cases."""

import numpy as np
import pytest

from ethproof_tpu.gf import extension as gf2
from ethproof_tpu.gf import field as gfp
from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.fri.challenger import Challenger
from ethproof_tpu.fri.config import FriConfig
from ethproof_tpu.fri.prove import fri_prove, grind_pow, pow_response
from ethproof_tpu.fri.verify import fri_verify
import ethproof_tpu.poly.ntt as nttm

P = fh.P
RNG = np.random.default_rng(3)

# small config so tests stay fast: 16 queries, tiny pow, arity 4
CFG = FriConfig(
    rate_bits=2,
    cap_height=1,
    proof_of_work_bits=4,
    num_query_rounds=16,
    arity_bits=2,
    final_poly_bits=2,
)


def _random_codeword(degree_bits, cfg):
    """LDE of a random degree < 2^degree_bits polynomial (extension coeffs)."""
    n = 1 << degree_bits
    ca = RNG.integers(0, P, size=(n,), dtype=np.uint64)
    cb = RNG.integers(0, P, size=(n,), dtype=np.uint64)
    ev_a = nttm.coset_lde(gfp.from_u64(ca), cfg.rate_bits, cfg.coset_shift)
    ev_b = nttm.coset_lde(gfp.from_u64(cb), cfg.rate_bits, cfg.coset_shift)
    return gf2.GF2(ev_a, ev_b), (ca, cb)


class TestChallenger:
    def test_deterministic(self):
        a, b = Challenger(), Challenger()
        a.observe_elements([1, 2, 3])
        b.observe_elements([1, 2, 3])
        assert a.get_challenge() == b.get_challenge()

    def test_order_sensitive(self):
        a, b = Challenger(), Challenger()
        a.observe_elements([1, 2])
        b.observe_elements([2, 1])
        assert a.get_challenge() != b.get_challenge()

    def test_many_challenges_distinct(self):
        c = Challenger()
        c.observe_element(42)
        xs = c.get_n_challenges(20)
        assert len(set(xs)) == 20


class TestPow:
    def test_grind_meets_threshold(self):
        w = grind_pow(123456789, 6)
        assert pow_response(123456789, w) < 1 << 58


class TestFri:
    def test_honest_proof_verifies(self):
        degree_bits = 6
        code, _ = _random_codeword(degree_bits, CFG)
        proof = fri_prove(code, degree_bits, CFG, Challenger())
        ok, openings = fri_verify(proof, CFG, Challenger())
        assert ok
        assert len(openings) == CFG.num_query_rounds
        # round-0 openings are authentic codeword values
        code_a = gfp.to_u64(code.a)
        code_b = gfp.to_u64(code.b)
        for idx, val in openings:
            assert val == (int(code_a[idx]), int(code_b[idx]))

    def test_tampered_final_poly_rejected(self):
        degree_bits = 6
        code, _ = _random_codeword(degree_bits, CFG)
        proof = fri_prove(code, degree_bits, CFG, Challenger())
        proof.final_poly = proof.final_poly.copy()
        proof.final_poly[0, 0] ^= 1
        ok, _ = fri_verify(proof, CFG, Challenger())
        assert not ok

    def test_tampered_leaf_rejected(self):
        degree_bits = 6
        code, _ = _random_codeword(degree_bits, CFG)
        proof = fri_prove(code, degree_bits, CFG, Challenger())
        proof.query_rounds[0].leaf_values[0, 0, 0] ^= 1
        ok, _ = fri_verify(proof, CFG, Challenger())
        assert not ok

    def test_high_degree_codeword_rejected(self):
        # codeword = LDE of degree-bound poly PLUS a high-degree monomial:
        # evaluations of x^(n * 2) on the big domain
        degree_bits = 6
        cfg = CFG
        code, _ = _random_codeword(degree_bits, cfg)
        big_n = 1 << (degree_bits + cfg.rate_bits)
        w = fh.primitive_root_of_unity(degree_bits + cfg.rate_bits)
        bad_exp = (1 << degree_bits) * 2
        bad = np.array(
            [pow(cfg.coset_shift, bad_exp, P) * pow(w, i * bad_exp, P) % P for i in range(big_n)],
            dtype=np.uint64,
        )
        code = gf2.GF2(gfp.add(code.a, gfp.from_u64(bad)), code.b)
        proof = fri_prove(code, degree_bits, cfg, Challenger())
        ok, _ = fri_verify(proof, cfg, Challenger())
        assert not ok
