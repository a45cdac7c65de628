"""Redis-protocol (RESP2) cache backend for ``KVCache`` callers.

The one reference component with no functional twin until now was its
Redis instance (reference app/redis_setup.py:1-6): both API workers
share table/schema metadata, the 44-day query-result cache, and the
export retry-throttle keys through it. The repo's default
``service.cache.KVCache`` is process-local — correct semantics,
invisible across workers.

This module proves the "pluggable backend" claim with a real wire
protocol, std-lib only:

- ``RespClient`` — a minimal RESP2 client (socket + parser). Commands
  are sent as RESP arrays; replies cover the five types (+simple,
  -error, :integer, $bulk, *array).
- ``RedisKVCache`` — the ``KVCache`` interface over any RESP server.
  Values are pickled (the cache is private to the service; the
  reference stores opaque blobs the same way). TTLs map to ``PX`` /
  ``PEXPIRE`` so sub-second test TTLs are exact.
  ``invalidate_prefix`` walks ``SCAN ... MATCH prefix*`` cursors —
  O(keys) server-side, never ``KEYS`` (which blocks a production
  instance).
- ``MiniRedisServer`` — an in-process RESP2 server implementing the
  exact command subset the adapter uses, with per-key expiry. The
  environment has no redis-server binary, so the contract tests run
  the adapter against this fake over a real TCP socket; pointing
  ``RedisKVCache`` at an actual Redis is a host/port change.
"""

from __future__ import annotations

import fnmatch
import pickle
import socket
import socketserver
import threading
import time
from typing import Any


class _Missing:
    pass


_MISSING = _Missing()


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------

class RespClient:
    """Tiny RESP2 client. One socket, blocking, thread-safe via a lock
    (the engine's cache calls are short and infrequent; a pool would be
    premature here and is an implementation detail behind KVCache)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6379, timeout: float = 5.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        self._lock = threading.Lock()

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    # -- wire format -------------------------------------------------

    def command(self, *parts: bytes | str | int) -> Any:
        """Send one command, return the parsed reply. -ERR replies
        raise ``RespError``."""
        out = [b"*%d\r\n" % len(parts)]
        for p in parts:
            if isinstance(p, int):
                p = str(p).encode()
            elif isinstance(p, str):
                p = p.encode()
            out.append(b"$%d\r\n%s\r\n" % (len(p), p))
        with self._lock:
            self._sock.sendall(b"".join(out))
            return self._read_reply()

    def _read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("RESP server closed connection")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n + 2:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("RESP server closed connection")
            self._buf += chunk
        data, self._buf = self._buf[:n], self._buf[n + 2:]
        return data

    def _read_reply(self) -> Any:
        line = self._read_line()
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest.decode()
        if kind == b"-":
            raise RespError(rest.decode())
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            return None if n == -1 else self._read_exact(n)
        if kind == b"*":
            n = int(rest)
            return None if n == -1 else [self._read_reply() for _ in range(n)]
        raise RespError(f"unknown RESP type byte: {line[:1]!r}")


class RespError(Exception):
    pass


# ---------------------------------------------------------------------------
# KVCache adapter
# ---------------------------------------------------------------------------

class RedisKVCache:
    """``service.cache.KVCache`` interface over a RESP server.

    Drop-in for every caller (catalog metadata, query-result handles,
    export throttle keys); being server-backed makes the cache shared
    across workers and restart-surviving, matching the reference's
    Redis deployment.

    Multi-HOST deployments: query STATE crosses processes through
    this cache, but query RESULTS live in each registry's local
    ``results_dir``. Workers on different hosts must point
    ``results_dir`` at shared storage (NFS etc.) for peer cache hits
    to be serveable; QueryRegistry.cached_query_id probes the
    published path with os.path.exists and falls back to a fresh run
    when the peer's result is not visible locally, so a non-shared
    results_dir degrades to duplicate work, never a dead link."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6379, *, client: RespClient | None = None):
        self._c = client or RespClient(host, port)

    def close(self) -> None:
        self._c.close()

    def get(self, key: str, default: Any = None) -> Any:
        raw = self._c.command("GET", key)
        return default if raw is None else pickle.loads(raw)

    def set(self, key: str, value: Any, ttl_seconds: float | None = None) -> None:
        blob = pickle.dumps(value, protocol=pickle.HIGHEST_PROTOCOL)
        if ttl_seconds is None:
            self._c.command("SET", key, blob)
        else:
            self._c.command("SET", key, blob, "PX", max(1, int(ttl_seconds * 1000)))

    def exists(self, key: str) -> bool:
        return self._c.command("EXISTS", key) == 1

    def delete(self, key: str) -> None:
        self._c.command("DEL", key)

    def expire(self, key: str, ttl_seconds: float) -> None:
        self._c.command("PEXPIRE", key, max(1, int(ttl_seconds * 1000)))

    def invalidate_prefix(self, prefix: str) -> None:
        # SCAN, not KEYS: cursors bound each round trip so a prod
        # instance with millions of keys is never blocked.
        pattern = prefix + "*"
        cursor = b"0"
        while True:
            reply = self._c.command("SCAN", cursor, "MATCH", pattern, "COUNT", 512)
            cursor, keys = reply[0], reply[1]
            if keys:
                self._c.command("DEL", *[k for k in keys])
            if cursor in (b"0", "0", 0):
                break


# ---------------------------------------------------------------------------
# In-process fake server (test double; the env ships no redis-server)
# ---------------------------------------------------------------------------

class _Store:
    def __init__(self):
        self.data: dict[bytes, tuple[bytes, float | None]] = {}
        self.lock = threading.Lock()

    def sweep(self, key: bytes) -> bytes | None:
        entry = self.data.get(key)
        if entry is None:
            return None
        value, expires_at = entry
        if expires_at is not None and time.monotonic() >= expires_at:
            del self.data[key]
            return None
        return value


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # noqa: C901 - one dispatch table
        store: _Store = self.server.store  # type: ignore[attr-defined]
        while True:
            try:
                line = self.rfile.readline()
            except OSError:
                return
            if not line:
                return
            if not line.startswith(b"*"):
                self.wfile.write(b"-ERR protocol\r\n")
                return
            n = int(line[1:].rstrip())
            parts = []
            for _ in range(n):
                ln = self.rfile.readline()
                size = int(ln[1:].rstrip())
                parts.append(self.rfile.read(size + 2)[:-2])
            cmd = parts[0].upper()
            with store.lock:
                self.wfile.write(self._dispatch(store, cmd, parts[1:]))
            self.wfile.flush()

    def _dispatch(self, store: _Store, cmd: bytes, args: list[bytes]) -> bytes:
        if cmd == b"PING":
            return b"+PONG\r\n"
        if cmd == b"SET":
            key, value, ttl = args[0], args[1], None
            if len(args) >= 4 and args[2].upper() == b"PX":
                ttl = time.monotonic() + int(args[3]) / 1000.0
            store.data[key] = (value, ttl)
            return b"+OK\r\n"
        if cmd == b"GET":
            value = store.sweep(args[0])
            return b"$-1\r\n" if value is None else b"$%d\r\n%s\r\n" % (len(value), value)
        if cmd == b"EXISTS":
            return b":%d\r\n" % sum(1 for k in args if store.sweep(k) is not None)
        if cmd == b"DEL":
            n = 0
            for k in args:
                if store.sweep(k) is not None:
                    del store.data[k]
                    n += 1
            return b":%d\r\n" % n
        if cmd == b"PEXPIRE":
            key = args[0]
            if store.sweep(key) is None:
                return b":0\r\n"
            value = store.data[key][0]
            store.data[key] = (value, time.monotonic() + int(args[1]) / 1000.0)
            return b":1\r\n"
        if cmd == b"SCAN":
            # Single-pass cursor: the fake holds few keys, so one round
            # returns everything and cursor 0 ends the loop (real Redis
            # semantics allow exactly this).
            pattern = b"*"
            if len(args) >= 3 and args[1].upper() == b"MATCH":
                pattern = args[2]
            live = [k for k in list(store.data) if store.sweep(k) is not None]
            keys = [k for k in live if fnmatch.fnmatchcase(k.decode(), pattern.decode())]
            body = b"".join(b"$%d\r\n%s\r\n" % (len(k), k) for k in keys)
            return b"*2\r\n$1\r\n0\r\n*%d\r\n%s" % (len(keys), body)
        if cmd == b"FLUSHDB":
            store.data.clear()
            return b"+OK\r\n"
        return b"-ERR unknown command '%s'\r\n" % cmd


class MiniRedisServer:
    """Threaded RESP2 server bound to an ephemeral localhost port."""

    def __init__(self):
        self._server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Handler)
        self._server.daemon_threads = True
        self._server.store = _Store()  # type: ignore[attr-defined]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def __enter__(self) -> "MiniRedisServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
