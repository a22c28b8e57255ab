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

import os
import queue
import socket
import ssl
import struct
import threading
from typing import Any

import jax
import numpy as np

from .codec import decode as _decode
from .codec import encode as _encode


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
    """Materialize a pytree onto the host (numpy leaves); wire-native
    primitives (bytes/str/int/None) pass through untouched."""

    def leaf(x):
        if x is None or isinstance(x, (bytes, bytearray, str, int)):
            return x
        return np.asarray(jax.device_get(x))

    return jax.tree.map(leaf, obj, is_leaf=lambda x: x is None or isinstance(x, (bytes, bytearray, str)))


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
    """In-process queue mesh (one object per party, shared queue table).

    device=True keeps payloads as device arrays (zero-copy handoff for
    co-located parties sharing one chip — the bench deployment); the
    default materializes to host numpy like a real wire would."""

    def __init__(self, pid: int, n: int, queues, counters, device=False):
        self.id = pid
        self.n_parties = n
        self._queues = queues
        self._counters = counters
        self._device = device

    @classmethod
    def create(cls, n: int = 3, device: bool = False) -> list["LocalNetwork"]:
        queues = {(i, j): queue.Queue() for i in range(n) for j in range(n) if i != j}
        counters = {"sent": [0] * n, "recv": [0] * n}
        return [cls(i, n, queues, counters, device) for i in range(n)]

    def send(self, to: int, obj: Any) -> None:
        host_obj = obj if self._device else _to_host(obj)
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
    """Full-mesh TCP with 4-byte length-delimited frames and a fixed-schema
    codec (mpc/codec.py — no pickle; decoding a malicious peer's bytes can
    only yield plain data).

    Connection setup mirrors mpc-net (lib.rs:45-171): party i accepts from
    parties j > i and connects to parties j < i; ids are exchanged on
    connect and VERIFIED against the expected direction (a connecting
    socket cannot claim an id that should have dialed us). Each pair gets
    one socket; reads run on a background thread per peer feeding per-peer
    queues (channel.rs:135-236 reader/writer tasks).

    Mutual TLS (the reference's rustls/QUIC posture, mpc-net/src/lib.rs:47-78):
    pass ``tls=TlsConfig(...)`` — every connection then requires the exact
    pinned peer certificate (self-signed, generated by the `gen-cert`
    subcommand, parity mpc-net/src/bin/gen_cert.rs). The claimed party id
    is BOUND to that party's specific pinned certificate (per-party
    cert_path, mpc-net/src/config.rs:52-98): a holder of party 1's cert
    cannot claim id 2 — the presented cert must byte-equal
    party_cert_paths[claimed_id] in both connect directions."""

    MAX_FRAME = 1 << 30

    def __init__(
        self,
        pid: int,
        addresses: list[tuple[str, int]],
        timeout: float = 60.0,
        tls: "TlsConfig | None" = None,
    ):
        self.id = pid
        self.n_parties = len(addresses)
        self._socks: dict[int, socket.socket] = {}
        self._queues: dict[int, queue.Queue] = {}
        self._sent = 0
        self._recvd = 0
        self._lock = threading.Lock()
        self._tls = tls
        # open once here (not lazily in _netlog): send() may be called from
        # several threads and a check-then-act open would race/leak handles
        path = os.environ.get("COCIRCOM_NET_LOG")
        self._log = open(path, "a", buffering=1) if path else None
        self._connect_mesh(addresses, timeout)
        self._readers = []
        for peer, s in self._socks.items():
            q = queue.Queue()
            self._queues[peer] = q
            t = threading.Thread(target=self._reader, args=(s, q), daemon=True)
            t.start()
            self._readers.append(t)

    def _wrap_tls(self, sock, server_side: bool, peer_hint: int | None):
        """Wrap a mesh socket in mutual TLS pinned to the party certs."""
        ctx = ssl.SSLContext(
            ssl.PROTOCOL_TLS_SERVER if server_side else ssl.PROTOCOL_TLS_CLIENT
        )
        ctx.load_cert_chain(self._tls.cert_path, self._tls.key_path)
        ctx.verify_mode = ssl.CERT_REQUIRED
        ctx.check_hostname = False  # pinned self-signed certs, not PKI names
        for path in self._tls.peer_cert_paths:
            ctx.load_verify_locations(path)
        return ctx.wrap_socket(sock, server_side=server_side)

    def _cert_matches_id(self, conn, claimed_id: int) -> bool:
        """True iff the TLS peer presented EXACTLY the certificate pinned
        for `claimed_id`. Without this, any holder of any pinned cert could
        claim any id (party 1 impersonating party 2 toward party 0 —
        protocol-breaking under semi-honest-with-bad-network). The
        reference binds party->cert via per-party config
        (mpc-net/src/config.rs:52-98). No-op (True) when TLS is off or the
        TlsConfig carries no per-id map (legacy construction)."""
        if self._tls is None:
            return True
        want = self._tls.der_for_id(claimed_id)
        if want is None:
            return True
        try:
            got = conn.getpeercert(binary_form=True)
        except (ssl.SSLError, OSError, AttributeError):
            return False
        return got == want

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
            pending = set(expected_in)
            while pending:
                conn, _ = srv.accept()
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                if self._tls:
                    conn = self._wrap_tls(conn, True, None)
                peer = struct.unpack("<I", self._recv_exact(conn, 4))[0]
                if peer not in pending:
                    # wrong direction or duplicate claim — refuse
                    conn.close()
                    continue
                if not self._cert_matches_id(conn, peer):
                    # claimed id not backed by that party's pinned cert
                    conn.close()
                    continue
                pending.discard(peer)
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
            if self._tls:
                s = self._wrap_tls(s, False, j)
                if not self._cert_matches_id(s, j):
                    s.close()
                    raise ConnectionError(
                        f"party {j} presented a certificate that is not "
                        f"the one pinned for id {j}"
                    )
            s.sendall(struct.pack("<I", self.id))
            self._socks[j] = s
        acc.join(timeout)
        srv.close()
        if len(self._socks) != self.n_parties - 1:
            raise ConnectionError(
                f"mesh incomplete: {sorted(self._socks)} of {self.n_parties - 1} peers"
            )
        # the handshake timeout must NOT outlive the handshake: sockets from
        # create_connection (and accepted ones, depending on the platform)
        # keep a 60 s timeout, so any round gap longer than that — e.g. a
        # party stuck in a long XLA compile — made the idle peer's reader
        # raise socket.timeout (an OSError), which was indistinguishable
        # from "peer closed" and tore the mesh down. Readers block forever;
        # liveness detection lives at the recv() queue timeout instead.
        for s in self._socks.values():
            s.settimeout(None)

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
                q.put(_decode(self._recv_exact(sock, ln)))
        except (ConnectionError, OSError):
            q.put(ConnectionError("peer closed"))
        except ValueError as e:  # malformed frame from a bad peer
            q.put(ConnectionError(f"bad frame: {e}"))

    def _netlog(self, line: str) -> None:
        """COCIRCOM_NET_LOG=<path>: append one line per send/recv — a
        round-schedule trace for debugging cross-party divergence."""
        if self._log is None:
            return
        self._log.write(line + "\n")

    def send(self, to: int, obj: Any) -> None:
        payload = _encode(_to_host(obj))
        frame = struct.pack("<I", len(payload)) + payload
        with self._lock:
            self._sent += len(frame)
        self._netlog(f"send to={to} n={len(payload)}")
        self._socks[to].sendall(frame)

    def recv(self, frm: int) -> Any:
        self._netlog(f"recv frm={frm}")
        with ComputeGate.pause():
            obj = self._queues[frm].get(timeout=600)
        if isinstance(obj, ConnectionError):
            raise obj
        with self._lock:
            self._recvd += _nbytes(obj)
        return obj

    def stats(self):
        return {"sent_bytes": self._sent, "recv_bytes": self._recvd}

    def close(self, linger: float = 10.0):
        """Graceful teardown: half-close (FIN) every connection, then give
        reader threads up to `linger` seconds to drain peers' in-flight
        frames and observe their FIN — so a party that finishes a protocol
        first cannot yank data out from under slower peers."""
        for s in self._socks.values():
            try:
                if isinstance(s, ssl.SSLSocket):
                    s.close()  # SSL needs close_notify, not half-close
                else:
                    s.shutdown(socket.SHUT_WR)
            except OSError:
                pass
        for t in self._readers:
            t.join(timeout=linger)
        for s in self._socks.values():
            try:
                s.close()
            except OSError:
                pass
        if self._log is not None:
            self._log.close()
            self._log = None


class TlsConfig:
    """Mutual-TLS material for one party: own key/cert + every peer's
    pinned certificate (parity: NetworkConfig key_path/cert_path,
    mpc-net/src/config.rs:64-98).

    `party_cert_paths` (preferred) maps party id -> that party's pinned
    cert, binding claimed ids to specific certificates
    (TcpNetwork._cert_matches_id). The legacy `peer_cert_paths` list-only
    form still pins the trust store but cannot bind ids."""

    def __init__(self, key_path: str, cert_path: str,
                 peer_cert_paths: list[str] | None = None,
                 party_cert_paths: dict[int, str] | list[str] | None = None):
        self.key_path = key_path
        self.cert_path = cert_path
        self._by_id: dict[int, str] = {}
        if party_cert_paths is not None:
            if isinstance(party_cert_paths, dict):
                self._by_id = {int(k): v for k, v in party_cert_paths.items()}
            else:
                self._by_id = dict(enumerate(party_cert_paths))
            self.peer_cert_paths = list(self._by_id.values())
        else:
            self.peer_cert_paths = list(peer_cert_paths or [])
        self._der_cache: dict[int, bytes] = {}

    def der_for_id(self, party_id: int) -> bytes | None:
        """DER bytes of the cert pinned for `party_id` (None if unmapped)."""
        path = self._by_id.get(party_id)
        if path is None:
            return None
        if party_id not in self._der_cache:
            with open(path) as fh:
                self._der_cache[party_id] = ssl.PEM_cert_to_DER_cert(fh.read())
        return self._der_cache[party_id]


def gen_self_signed_cert(key_out: str, cert_out: str, dns_name: str = "localhost",
                         days: int = 365) -> None:
    """Write a fresh self-signed certificate + private key (PEM).
    Parity: mpc-net/src/bin/gen_cert.rs:21-31 (rcgen self-signed certs)."""
    import datetime
    import secrets

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    key = ec.generate_private_key(ec.SECP256R1())
    # unique subject DN per cert: OpenSSL looks trust-store roots up by
    # subject name, and several distinct self-signed party certs sharing
    # one CN collide (the mesh loads all peers into one store)
    name = x509.Name(
        [
            x509.NameAttribute(
                NameOID.COMMON_NAME, f"{dns_name}-{secrets.token_hex(8)}"
            )
        ]
    )
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=days))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName(dns_name)]), critical=False
        )
        .sign(key, hashes.SHA256())
    )
    with open(key_out, "wb") as fh:
        fh.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption(),
            )
        )
    with open(cert_out, "wb") as fh:
        fh.write(cert.public_bytes(serialization.Encoding.PEM))
