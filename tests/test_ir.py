"""Constraint-IR differential tests (stark/ir.py).

The IR is the round-4 keystone: `Stark.eval` is recorded once per table
STRUCTURE, then (a) executed level-batched on device by the prover sweep,
(b) replayed over GF(p^2) host pairs by the verifier, and (c) replayed
over circuit wires by the recursion compiler. Soundness rests on all
backends evaluating the identical expression, so the tests here are
differential: IR vs the eager round-3 oracle, bit for bit.

Parity note: the reference's starky evaluates constraints via Rust
closures specialized per field (packed prover / ext verifier /
RecursiveConstraintConsumer); our IR is the TPU-shaped equivalent of that
one-definition-three-backends contract.
"""

import numpy as np
import pytest

from ethproof_tpu.gf import field_host as fh
from ethproof_tpu.stark.ir import (
    IRBuilder,
    KConst,
    Reg,
    SweepExecutor,
    record_sweep,
    replay,
)
from ethproof_tpu.stark.prove import stark_prove
from ethproof_tpu.stark.stark import (
    ConstraintConsumer,
    EvalContext,
    HostExtOps,
)
from ethproof_tpu.stark.verify import stark_verify

from test_stark import CFG, FibonacciStark, fib_trace

P = fh.P


def _proof_fingerprint(proof):
    """Every commitment + opening as a flat tuple for bit-exact compare."""
    parts = [
        tuple(proof.public_inputs),
        proof.trace_cap.tobytes(),
        proof.quotient_cap.tobytes(),
        tuple(proof.ctl_totals),
        proof.openings.trace_at_zeta.tobytes(),
        proof.openings.quotient_at_zeta.tobytes(),
    ]
    if proof.aux_cap is not None:
        parts.append(proof.aux_cap.tobytes())
    return tuple(parts)


class TestIRBuilder:
    def test_constant_folding(self):
        b = IRBuilder()
        x = b.new_input(("tl", 0))
        # const-only arithmetic never emits instructions
        c = b.mul(b.add(b.constant(3), b.constant(4)), b.constant(2))
        assert isinstance(c, KConst) and c.v == 14
        assert b.instrs == []
        # identities fold: x+0, x*1 pass through; x*0 is const 0
        assert b.add(x, b.constant(0)) is x
        assert b.mul(x, b.constant(1)) is x
        z = b.mul(x, b.constant(0))
        assert isinstance(z, KConst) and z.v == 0
        assert b.instrs == []

    def test_cse_dedupes(self):
        b = IRBuilder()
        x = b.new_input(("tl", 0))
        y = b.new_input(("tl", 1))
        r1 = b.mul(x, y)
        r2 = b.mul(y, x)  # commutative operands are canonicalized
        assert r1 is r2
        assert len(b.instrs) == 1

    def test_fold_vec_equals_horner(self):
        b = IRBuilder()
        vals = [b.new_input(("tl", i)) for i in range(5)]
        alpha = b.new_input(("alpha", 0))
        out = b.materialize(b.fold_vec(vals, alpha))
        prog_inputs = [7, 11, 13, 17, 19, 3]  # vals..., alpha
        prog = type("Prog", (), {})()

        class _Host:
            def add(self, a, c):
                return (a + c) % P

            def sub(self, a, c):
                return (a - c) % P

            def mul(self, a, c):
                return (a * c) % P

            def constant(self, c):
                return c % P

        vals_buf = list(prog_inputs)
        from ethproof_tpu.stark.ir import IRProgram

        program = IRProgram(
            input_keys=[("tl", i) for i in range(5)] + [("alpha", 0)],
            instrs=b.instrs,
            outputs=[out.i],
            meta={},
        )
        (got,) = replay(program, _Host(), vals_buf)
        want = 0
        for v in prog_inputs[:5]:
            want = (want * 3 + v) % P
        assert got == want


def _record_fib():
    return record_sweep(
        FibonacciStark(), (), num_challenges=CFG.num_challenges,
        n_lookup_alphas=0, has_aux=False,
    )


class TestRecordedProgram:
    def test_program_is_structure_only(self):
        """Recording is shape-independent and deterministic."""
        p1, p2 = _record_fib(), _record_fib()
        assert p1.input_keys == p2.input_keys
        assert p1.instrs == p2.instrs
        assert p1.outputs == p2.outputs

    def test_replay_matches_eager_eval_on_host_ext(self):
        """Replay over HostExtOps == direct ConstraintConsumer eval: the
        verifier's replacement path computes the identical accumulators."""
        rng = np.random.default_rng(7)

        def rext():
            return (int(rng.integers(P, dtype=np.uint64)), int(rng.integers(P, dtype=np.uint64)))

        stark = FibonacciStark()
        prog = _record_fib()
        ops = HostExtOps()
        local = [rext() for _ in range(2)]
        nxt = [rext() for _ in range(2)]
        pis = [ops.constant(int(rng.integers(P, dtype=np.uint64))) for _ in range(3)]
        alphas = [
            int(rng.integers(P, dtype=np.uint64))
            for _ in range(CFG.num_challenges)
        ]
        z_last, l_first, l_last = rext(), rext(), rext()

        # eager oracle (round-3 verifier path)
        consumer = ConstraintConsumer(ops, alphas, z_last, l_first, l_last)
        ctx = EvalContext(ops, local, nxt, pis, consumer, [], [])
        stark.eval(ctx)

        from ethproof_tpu.stark.ir import assemble_inputs

        got = replay(
            prog, ops,
            assemble_inputs(
                prog, local=local, nxt=nxt, fixed_l=[], fixed_n=[],
                aux_l=[], aux_n=[], pis=pis,
                alphas=[ops.challenge(a) for a in alphas],
                lookup_alphas=[], aux_challenges=[], betas=[], gammas=[],
                totals=[], z_last=z_last, l_first=l_first, l_last=l_last,
            ),
        )
        assert got == consumer.accs

    def test_executor_matches_replay(self):
        """Device level-batched execution == host replay, element-wise."""
        import jax.numpy as jnp

        from ethproof_tpu.gf import field as gfp

        prog = _record_fib()
        ex = SweepExecutor(prog)
        rng = np.random.default_rng(3)
        m = 8
        n_head = 4  # local(2) + next(2)
        head_w = rng.integers(P, size=(n_head, m), dtype=np.uint64)
        n_scal = prog.n_inputs - n_head - 3
        scal_w = rng.integers(P, size=(n_scal,), dtype=np.uint64)
        tail_w = rng.integers(P, size=(3, m), dtype=np.uint64)
        acc_lo, acc_hi = ex.run(
            gfp.from_u64(head_w), gfp.from_u64(scal_w), gfp.from_u64(tail_w),
            jit=False,
        )
        got = (
            np.asarray(acc_lo, dtype=np.uint64)
            + (np.asarray(acc_hi, dtype=np.uint64) << np.uint64(32))
        )

        class _Base:
            def add(self, a, c):
                return (a + c) % P

            def sub(self, a, c):
                return (a - c) % P

            def mul(self, a, c):
                return (a * c) % P

            def constant(self, c):
                return c % P

        for j in range(m):
            inputs = (
                [int(head_w[i, j]) for i in range(n_head)]
                + [int(v) for v in scal_w]
                + [int(tail_w[i, j]) for i in range(3)]
            )
            want = replay(prog, _Base(), inputs)
            assert [int(x) % P for x in got[:, j]] == [w % P for w in want]


class TestProverIntegration:
    def test_ir_proof_equals_eager_proof(self, monkeypatch):
        """End-to-end: ETHPROOF_SWEEP=ir and =eager produce bit-identical
        proofs (the IR's Horner-reassociation is value-identical mod p),
        and both verify."""
        trace, pis = fib_trace(64)
        monkeypatch.setenv("ETHPROOF_SWEEP", "eager")
        p_eager = stark_prove(FibonacciStark(), trace, pis, CFG)
        monkeypatch.setenv("ETHPROOF_SWEEP", "ir")
        p_ir = stark_prove(FibonacciStark(), trace, pis, CFG)
        assert _proof_fingerprint(p_ir) == _proof_fingerprint(p_eager)
        assert stark_verify(FibonacciStark(), p_ir, CFG)

    def test_ir_proof_with_lookups_matches_eager(self, monkeypatch):
        """Same differential over a table with lookup aux columns (the
        aux/lookup input blocks of the recorded program)."""
        from test_lookup import RangeCheckedStark, _trace

        tr = _trace([3, 7, 31, 0, 7], [1, 1, 1, 30, 2])
        monkeypatch.setenv("ETHPROOF_SWEEP", "eager")
        p_eager = stark_prove(RangeCheckedStark(), tr, [], CFG)
        monkeypatch.setenv("ETHPROOF_SWEEP", "ir")
        p_ir = stark_prove(RangeCheckedStark(), tr, [], CFG)
        assert _proof_fingerprint(p_ir) == _proof_fingerprint(p_eager)
        assert stark_verify(RangeCheckedStark(), p_ir, CFG)
