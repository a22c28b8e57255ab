"""Party-to-party communication backends.

Design mirrors the reference's two-level split (mpc-net + per-protocol
network traits, SURVEY.md section 2.2):
  * ``LocalNetwork`` — in-process queues for N parties in one process
    (the reference's tests/src/rep3_network.rs fake-cluster pattern). This is
    also the deployment shape for "3 parties co-located on one TPU host"
    benchmarking.
  * ``TcpNetwork`` — real sockets with length-delimited frames for genuinely
    distinct hosts (mpc-net/src/lib.rs QUIC mesh equivalent, DCN path).

Payloads are pytrees of numpy/jax arrays; byte counters are tracked per
connection (parity: mpc-net/src/lib.rs:174-194).
"""

from __future__ import annotations

import pickle
import queue
import socket
import struct
import threading
from typing import Any

import jax
import numpy as np


class ComputeGate:
    """Optional serialization of device compute across in-process party
    threads: XLA:CPU intermittently segfaults when one thread compiles while
    others execute (LLVM ORC JIT race, jax 0.9). When enabled, each party
    thread holds the gate while computing and releases it inside blocking
    network receives — full correctness, no deadlocks (recv is the only
    blocking point), at the cost of test-local parallelism."""

    _lock = threading.Lock()
    _tls = threading.local()
    enabled = False

    @classmethod
    def acquire(cls):
        if not cls.enabled:
            return
        cls._lock.acquire()
        cls._tls.held = True

    @classmethod
    def release(cls):
        if getattr(cls._tls, "held", False):
            cls._tls.held = False
            cls._lock.release()

    @classmethod
    def pause(cls):
        """context manager: release while blocking, reacquire after."""

        class _Pause:
            def __enter__(self_inner):
                self_inner.was_held = getattr(cls._tls, "held", False)
                if self_inner.was_held:
                    cls.release()

            def __exit__(self_inner, *exc):
                if self_inner.was_held:
                    cls.acquire()

        return _Pause()


def _to_host(obj):
    """Materialize a pytree onto the host (numpy leaves)."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), obj)


def _nbytes(obj) -> int:
    return sum(
        leaf.nbytes if hasattr(leaf, "nbytes") else 8 for leaf in jax.tree.leaves(obj)
    )


class Network:
    """Abstract N-party network; party ids 0..n-1."""

    id: int
    n_parties: int

    def send(self, to: int, obj: Any) -> None:
        raise NotImplementedError

    def recv(self, frm: int) -> Any:
        raise NotImplementedError

    # --- ring helpers (REP3 convention: next = (id+1) % n) ---

    @property
    def next_id(self) -> int:
        return (self.id + 1) % self.n_parties

    @property
    def prev_id(self) -> int:
        return (self.id - 1) % self.n_parties

    def send_next(self, obj) -> None:
        self.send(self.next_id, obj)

    def send_prev(self, obj) -> None:
        self.send(self.prev_id, obj)

    def recv_prev(self) -> Any:
        return self.recv(self.prev_id)

    def recv_next(self) -> Any:
        return self.recv(self.next_id)

    def broadcast(self, obj) -> list:
        """Send to all others, receive from all others; result[i] = party i's
        value (own slot holds obj). Parity: shamir/network.rs broadcast."""
        for to in range(self.n_parties):
            if to != self.id:
                self.send(to, obj)
        out = []
        for frm in range(self.n_parties):
            out.append(obj if frm == self.id else self.recv(frm))
        return out

    def broadcast_next(self, obj, num: int) -> list:
        """Send to the next num-1 parties on the ring; receive from the
        previous num-1. result[0] = own, result[k] = from (id-k) mod n.
        Parity: shamir/network.rs:233 broadcast_next."""
        for k in range(1, num):
            self.send((self.id + k) % self.n_parties, obj)
        out = [obj]
        for k in range(1, num):
            out.append(self.recv((self.id - k) % self.n_parties))
        return out


class LocalNetwork(Network):
    """In-process queue mesh (one object per party, shared queue table)."""

    def __init__(self, pid: int, n: int, queues, counters):
        self.id = pid
        self.n_parties = n
        self._queues = queues
        self._counters = counters

    @classmethod
    def create(cls, n: int = 3) -> list["LocalNetwork"]:
        queues = {(i, j): queue.Queue() for i in range(n) for j in range(n) if i != j}
        counters = {"sent": [0] * n, "recv": [0] * n}
        return [cls(i, n, queues, counters) for i in range(n)]

    def send(self, to: int, obj: Any) -> None:
        host_obj = _to_host(obj)
        self._counters["sent"][self.id] += _nbytes(host_obj)
        self._queues[(self.id, to)].put(host_obj)

    def recv(self, frm: int) -> Any:
        with ComputeGate.pause():
            obj = self._queues[(frm, self.id)].get(timeout=600)
        self._counters["recv"][self.id] += _nbytes(obj)
        return obj

    def stats(self):
        return {
            "sent_bytes": self._counters["sent"][self.id],
            "recv_bytes": self._counters["recv"][self.id],
        }


class TcpNetwork(Network):
    """Full-mesh TCP with 4-byte length-delimited pickle frames.

    Connection setup mirrors mpc-net (lib.rs:45-171): party i accepts from
    parties j > i and connects to parties j < i; ids are exchanged on
    connect. Each pair gets one socket; reads run on a background thread per
    peer feeding per-peer queues (channel.rs:135-236 reader/writer tasks)."""

    MAX_FRAME = 1 << 30

    def __init__(self, pid: int, addresses: list[tuple[str, int]], timeout: float = 60.0):
        self.id = pid
        self.n_parties = len(addresses)
        self._socks: dict[int, socket.socket] = {}
        self._queues: dict[int, queue.Queue] = {}
        self._sent = 0
        self._recvd = 0
        self._lock = threading.Lock()
        self._connect_mesh(addresses, timeout)
        self._readers = []
        for peer, s in self._socks.items():
            q = queue.Queue()
            self._queues[peer] = q
            t = threading.Thread(target=self._reader, args=(s, q), daemon=True)
            t.start()
            self._readers.append(t)

    def _connect_mesh(self, addresses, timeout):
        host, port = addresses[self.id]
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(self.n_parties)
        srv.settimeout(timeout)

        expected_in = [j for j in range(self.n_parties) if j > self.id]
        to_connect = [j for j in range(self.n_parties) if j < self.id]

        def accept_all():
            for _ in expected_in:
                conn, _ = srv.accept()
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                peer = struct.unpack("<I", self._recv_exact(conn, 4))[0]
                self._socks[peer] = conn

        acc = threading.Thread(target=accept_all)
        acc.start()
        import time

        for j in to_connect:
            deadline = time.time() + timeout
            while True:
                try:
                    s = socket.create_connection(addresses[j], timeout=timeout)
                    break
                except OSError:
                    if time.time() > deadline:
                        raise
                    time.sleep(0.05)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            s.sendall(struct.pack("<I", self.id))
            self._socks[j] = s
        acc.join(timeout)
        srv.close()

    @staticmethod
    def _recv_exact(sock, n):
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf += chunk
        return buf

    def _reader(self, sock, q):
        try:
            while True:
                hdr = self._recv_exact(sock, 4)
                (ln,) = struct.unpack("<I", hdr)
                if ln > self.MAX_FRAME:
                    raise ValueError("frame too large")
                q.put(pickle.loads(self._recv_exact(sock, ln)))
        except (ConnectionError, OSError):
            q.put(ConnectionError("peer closed"))

    def send(self, to: int, obj: Any) -> None:
        payload = pickle.dumps(_to_host(obj), protocol=pickle.HIGHEST_PROTOCOL)
        frame = struct.pack("<I", len(payload)) + payload
        with self._lock:
            self._sent += len(frame)
        self._socks[to].sendall(frame)

    def recv(self, frm: int) -> Any:
        with ComputeGate.pause():
            obj = self._queues[frm].get(timeout=600)
        if isinstance(obj, ConnectionError):
            raise obj
        with self._lock:
            self._recvd += _nbytes(obj)
        return obj

    def stats(self):
        return {"sent_bytes": self._sent, "recv_bytes": self._recvd}

    def close(self):
        for s in self._socks.values():
            try:
                s.close()
            except OSError:
                pass
