"""Multi-host distributed runtime: leader/worker over authenticated TCP.

Reference equivalent: paladin's AMQP runtime — leader publishes serialized
tasks to a RabbitMQ queue, a fleet of `worker` processes consumes,
executes via a shared op registry, and publishes results
(/root/reference/worker/src/main.rs:19-33, README.md:85-116,
SURVEY.md §2d). The TPU-native re-design deletes the broker: the leader
IS the queue. Workers dial the leader over authenticated TCP
(`multiprocessing.connection`, HMAC challenge on connect) and run a
`main_loop` of recv(op, payload) -> execute -> send(result). Properties
preserved from the reference (SURVEY §2d):

- location-transparent ops: the same REGISTRY on both sides
  (reference `registry!()`, ops/src/lib.rs:20-22);
- at-least-once delivery: a dropped connection requeues the task for
  another worker (AMQP unacked-redelivery analogue);
- fatal-vs-transient split: `FatalError` aborts the whole job; other
  exceptions retry up to a budget (paladin retry/backoff);
- single-tenant workers: one outstanding task per worker at a time
  (reference README.md:96-106).

Device sharding stays INSIDE each worker (a mesh over its local chips,
stark/prove.py `mesh=`); this channel carries only whole tasks/proofs —
tx-level fan-out over DCN, tensor-level exchange over ICI.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from multiprocessing.connection import Client, Listener
from typing import Dict, List, Optional, Sequence, Tuple

from .ops import FatalError
from .tracing import logger, span

Task = Tuple[str, dict]  # (op name, payload kwargs)

DEFAULT_AUTHKEY = b"ethproof"


def _authkey() -> bytes:
    return os.environ.get("ETHPROOF_AUTHKEY", "").encode() or DEFAULT_AUTHKEY


# -- op registry (reference ops/src/lib.rs registry!()) -----------------------


def _op_tx_proof(payload: dict):
    from . import ops

    rstate = None
    if payload.get("recursion"):
        from ..recursion.state import recursion_state

        rstate = recursion_state(
            payload["sizes"], payload["config"],
            binding_shape=payload.get("binding_shape"),
            evm_shapes=payload.get("evm_shapes"),
            wd_counts=payload.get("wd_counts"),
        )
    return ops.tx_proof(
        payload["gi"], payload["config"], payload["sizes"], recursion=rstate
    )


def _op_agg_combine(payload: dict):
    from . import ops

    return ops.agg_combine(payload["left"], payload["right"])


def _op_agg_machine(payload: dict):
    """One recursion-ladder aggregation: two child machine proofs -> one."""
    from ..recursion.state import recursion_state

    rstate = recursion_state(
        payload["sizes"], payload["config"],
        binding_shape=payload.get("binding_shape"),
        evm_shapes=payload.get("evm_shapes"),
        wd_counts=payload.get("wd_counts"),
    )
    agg = rstate.ladder.agg(payload["level"])
    return agg.prove(payload["left"], payload["right"], payload["config"])


def _op_echo(payload: dict):
    """Test op (dispatch/retry semantics without proving)."""
    if payload.get("fatal"):
        raise FatalError(payload.get("msg", "fatal"))
    if payload.get("fail"):
        raise RuntimeError(payload.get("msg", "transient"))
    if payload.get("sleep"):
        time.sleep(payload["sleep"])
    return payload.get("value")


REGISTRY = {
    "tx_proof": _op_tx_proof,
    "agg_combine": _op_agg_combine,
    "agg_machine": _op_agg_machine,
    "echo": _op_echo,
}


def execute_task(task: Task):
    op, payload = task
    return REGISTRY[op](payload)


# -- worker side ---------------------------------------------------------------


def worker_main_loop(
    address: Tuple[str, int],
    authkey: Optional[bytes] = None,
    reconnect: int = 5,
    backoff_s: float = 5.0,
) -> int:
    """Dial the leader and process tasks until it hangs up.

    Reference WorkerRuntime::main_loop (worker/src/main.rs:29-30). A lost
    leader is retried `reconnect` times with fixed backoff (systemd
    Restart=on-failure handles anything beyond that, deploy unit)."""
    attempts = 0
    while True:
        try:
            conn = Client(address, authkey=authkey or _authkey())
        except (ConnectionError, OSError) as e:
            attempts += 1
            if attempts > reconnect:
                logger.error("worker: leader unreachable (%s); giving up", e)
                return 1
            logger.warning(
                "worker: connect failed (%s); retry %d/%d in %.0fs",
                e, attempts, reconnect, backoff_s,
            )
            time.sleep(backoff_s)
            continue
        attempts = 0
        logger.info("worker: connected to leader %s", address)
        try:
            while True:
                msg = conn.recv()
                if msg[0] == "shutdown":
                    logger.info("worker: shutdown from leader")
                    return 0
                assert msg[0] == "task", msg[0]
                _, op, payload = msg
                with span("worker_task", op=op):
                    try:
                        result = execute_task((op, payload))
                        conn.send(("ok", result))
                    except FatalError as e:
                        conn.send(("fatal", str(e)))
                    except Exception as e:  # transient: leader decides
                        logger.warning("worker: task %s failed: %r", op, e)
                        conn.send(("err", repr(e)))
        except EOFError:
            logger.info("worker: leader hung up")
            return 0
        except (ConnectionError, OSError) as e:
            logger.warning("worker: connection lost (%s); redialing", e)
        finally:
            conn.close()


# -- leader side ----------------------------------------------------------------


class DistributedRuntime:
    """Leader: accept workers, dispatch tasks, gather results in order.

    Same `run_tasks` surface as the in-memory Runtime (scheduler.py), so
    `prove_block` is runtime-agnostic — the reference's swap-the-channel-
    keep-the-ops design (SURVEY §4 in-memory runtime trick)."""

    def __init__(
        self,
        listen: Tuple[str, int] = ("0.0.0.0", 9041),
        authkey: Optional[bytes] = None,
        max_retries: int = 2,
    ):
        self._listener = Listener(listen, authkey=authkey or _authkey())
        self.address = self._listener.address
        self.max_retries = max_retries
        self._conns: List = []
        self._lock = threading.Condition()
        self._closed = False
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True
        )
        self._accept_thread.start()

    def _accept_loop(self) -> None:
        while not self._closed:
            try:
                conn = self._listener.accept()
            except (OSError, EOFError):
                return  # listener closed
            except Exception as e:  # auth failure etc.
                logger.warning("leader: rejected connection (%s)", e)
                continue
            with self._lock:
                self._conns.append(conn)
                self._lock.notify_all()
            logger.info(
                "leader: worker joined (%d connected)", len(self._conns)
            )

    def wait_for_workers(self, n: int, timeout: float = 300.0) -> None:
        deadline = time.time() + timeout
        with self._lock:
            while len(self._conns) < n:
                remaining = deadline - time.time()
                if remaining <= 0:
                    raise TimeoutError(
                        f"only {len(self._conns)}/{n} workers joined"
                    )
                self._lock.wait(remaining)

    @property
    def num_workers(self) -> int:
        with self._lock:
            return len(self._conns)

    def _take_worker(self):
        with self._lock:
            while not self._conns:
                if self._closed:
                    raise RuntimeError("runtime closed")
                self._lock.wait(1.0)
            return self._conns.pop()

    def _return_worker(self, conn) -> None:
        with self._lock:
            self._conns.append(conn)
            self._lock.notify_all()

    def run_tasks(self, tasks: Sequence[Task]) -> List:
        """Dispatch tasks to the fleet; results in task order.

        At-least-once: a worker that dies mid-task gets its task requeued.
        A task failing `max_retries` transient times, or any FatalError,
        aborts the job (reference FatalError, ops/src/lib.rs:52)."""
        pending: "queue.Queue[Tuple[int, Task, int]]" = queue.Queue()
        for i, t in enumerate(tasks):
            pending.put((i, t, 0))
        results: Dict[int, object] = {}
        errors: List[BaseException] = []
        done = threading.Event()

        def dispatcher():
            active = [0]
            active_lock = threading.Lock()

            def run_on_worker(idx: int, task: Task, attempt: int):
                try:
                    try:
                        conn = self._take_worker()
                    except RuntimeError as e:
                        errors.append(e)
                        done.set()
                        return
                    try:
                        conn.send(("task", task[0], task[1]))
                        status, value = conn.recv()
                    except (EOFError, ConnectionError, OSError) as e:
                        # worker died: drop it, requeue (at-least-once)
                        logger.warning(
                            "leader: worker lost mid-task (%s); requeueing", e
                        )
                        try:
                            conn.close()
                        except OSError:
                            pass
                        pending.put((idx, task, attempt))
                        return
                    self._return_worker(conn)
                    if status == "ok":
                        results[idx] = value
                    elif status == "fatal":
                        errors.append(FatalError(value))
                        done.set()
                    else:  # transient error on the worker
                        if attempt + 1 > self.max_retries:
                            errors.append(
                                RuntimeError(
                                    f"task {task[0]}[{idx}] failed after "
                                    f"{attempt + 1} attempts: {value}"
                                )
                            )
                            done.set()
                        else:
                            pending.put((idx, task, attempt + 1))
                finally:
                    with active_lock:
                        active[0] -= 1
                    if len(results) == len(tasks):
                        done.set()

            while not done.is_set():
                try:
                    idx, task, attempt = pending.get(timeout=0.1)
                except queue.Empty:
                    with active_lock:
                        if active[0] == 0 and len(results) == len(tasks):
                            done.set()
                    continue
                with active_lock:
                    active[0] += 1
                threading.Thread(
                    target=run_on_worker, args=(idx, task, attempt), daemon=True
                ).start()

        t = threading.Thread(target=dispatcher, daemon=True)
        t.start()
        done.wait()
        if errors:
            raise errors[0]
        return [results[i] for i in range(len(tasks))]

    def map(self, fn, items: Sequence):  # Runtime-interface compat
        raise NotImplementedError(
            "DistributedRuntime ships registry ops, not closures; "
            "use run_tasks (prove_block does)"
        )

    def close(self) -> None:
        self._closed = True
        with self._lock:
            conns, self._conns = self._conns, []
        for conn in conns:
            try:
                conn.send(("shutdown",))
                conn.close()
            except (OSError, EOFError):
                pass
        try:
            self._listener.close()
        except OSError:
            pass
