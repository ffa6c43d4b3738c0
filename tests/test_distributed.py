"""Distributed leader/worker runtime over localhost TCP.

Reference parity: paladin's AMQP runtime semantics
(/root/reference/worker/src/main.rs:19-33, SURVEY §2d) — location-
transparent registry ops, at-least-once redelivery on worker loss,
fatal-vs-transient error split — exercised against real sockets with
in-process worker threads (the reference's emulate-the-cluster-without-
a-cluster trick, README.md:7-11) plus one real `cli worker` subprocess.
"""

import subprocess
import sys
import threading
import time

import pytest

from ethproof_tpu.runtime.distributed import (
    DistributedRuntime,
    worker_main_loop,
)
from ethproof_tpu.runtime.ops import FatalError


def _spawn_worker_thread(addr, **kw):
    t = threading.Thread(
        target=worker_main_loop, args=(addr,), kwargs=kw, daemon=True
    )
    t.start()
    return t


@pytest.fixture
def runtime():
    rt = DistributedRuntime(listen=("127.0.0.1", 0))
    yield rt
    rt.close()


class TestDispatch:
    def test_results_in_task_order(self, runtime):
        for _ in range(2):
            _spawn_worker_thread(runtime.address)
        runtime.wait_for_workers(2, timeout=10)
        tasks = [("echo", {"value": i}) for i in range(7)]
        assert runtime.run_tasks(tasks) == list(range(7))

    def test_fatal_aborts(self, runtime):
        _spawn_worker_thread(runtime.address)
        runtime.wait_for_workers(1, timeout=10)
        with pytest.raises(FatalError):
            runtime.run_tasks([("echo", {"fatal": True, "msg": "boom"})])

    def test_transient_retries_then_fails(self, runtime):
        _spawn_worker_thread(runtime.address)
        runtime.wait_for_workers(1, timeout=10)
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            runtime.run_tasks([("echo", {"fail": True})])

    def test_worker_loss_redelivers(self, runtime):
        """Kill a worker mid-task: its task must requeue to the survivor."""

        class DyingWorker:
            """Connects, takes ONE task, dies without answering."""

            def run(self, addr):
                from multiprocessing.connection import Client

                from ethproof_tpu.runtime.distributed import _authkey

                conn = Client(addr, authkey=_authkey())
                conn.recv()  # swallow the task
                conn.close()  # die

        threading.Thread(
            target=DyingWorker().run, args=(runtime.address,), daemon=True
        ).start()
        runtime.wait_for_workers(1, timeout=10)
        # honest worker joins slightly later so the dying one gets the task
        # (leader pops the most recent joiner first: LIFO pool) — give the
        # first dispatch a head start
        results_holder = {}

        def run():
            results_holder["r"] = runtime.run_tasks(
                [("echo", {"value": 42, "sleep": 0.05})]
            )

        t = threading.Thread(target=run, daemon=True)
        t.start()
        time.sleep(0.3)
        _spawn_worker_thread(runtime.address)
        t.join(timeout=15)
        assert results_holder.get("r") == [42]


class TestCliWorker:
    def test_cli_worker_subprocess(self, runtime):
        """The deploy unit's ExecStart path: `cli worker --leader ...`
        must start, serve tasks, and exit 0 on leader shutdown (ADVICE r1:
        the round-1 stub crash-looped)."""
        host, port = runtime.address
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "ethproof_tpu.cli", "worker",
                "--leader", f"{host}:{port}", "--reconnect", "1",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        try:
            runtime.wait_for_workers(1, timeout=60)
            assert runtime.run_tasks([("echo", {"value": "hi"})]) == ["hi"]
            runtime.close()
            assert proc.wait(timeout=30) == 0
        finally:
            if proc.poll() is None:
                proc.kill()


class TestProveBlockDistributed:
    def test_prove_block_over_workers(self):
        """prove_block through the distributed runtime (two in-process
        workers over real sockets — GenerationInputs and proofs cross the
        wire pickled): identical semantics to the in-memory runtime."""
        from test_runtime import CFG, _empty_block_ir

        from ethproof_tpu.runtime.ops import verify_block
        from ethproof_tpu.runtime.scheduler import prove_block

        ir = _empty_block_ir()
        rt = DistributedRuntime(listen=("127.0.0.1", 0))
        try:
            for _ in range(2):
                _spawn_worker_thread(rt.address)
            rt.wait_for_workers(2, timeout=10)
            bp = prove_block(ir, CFG, runtime=rt)
            assert verify_block(bp, CFG)
        finally:
            rt.close()
