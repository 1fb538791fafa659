"""RESP (Redis protocol) facade over the engine — the reference's actual
user entry point, re-expressed as a thin driver-side control plane.

The reference serves five custom commands from a Microsoft Garnet server
(``Services/GarnetService.cs:92-104`` registers VEC.ADD / VEC.UPSERT /
VEC.DEL / VEC.SEARCH / VEC.STATS; argument grammar in
``Extensions/VectorCommandParser.cs:171-340``; response shapes in
``Extensions/VectorCommandSet.cs:557-912``).  This module speaks the same
wire protocol (RESP2) with the same command grammar, error codes
(``Extensions/VectorErrorCodes.cs``) and reply shapes, but every handler
delegates to the engine's existing operators:

- VEC.ADD / VEC.UPSERT / VEC.DEL -> :class:`~pyrope_spark.store
  .vector_store.VectorStore` ``add`` / ``upsert`` / ``delete`` (the same
  MERGE semantics the batch and streaming ingest paths use);
- VEC.SEARCH -> ``VectorStore.search`` (head∪tail live view, tombstone +
  has-ALL tag filter) + :func:`~pyrope_spark.operators.knn.hydrate` for
  WITH_META, with the reference's TRACE stage timings;
- VEC.STATS -> the reference ``MetricsCollector.GetStats`` Prometheus
  text format (``Services/MetricsCollector.cs:54-100``), counters
  maintained by this facade.

Scale shape — and an honest caveat: a single RESP command is ONE Spark
job (~0.1-1 s on a warm driver), so per-request latency cannot match an
in-process C# server; this facade exists for drop-in protocol
compatibility and functional parity.  Throughput-critical ingest and
query fan-out belong on the batch/streaming paths (``bench.py`` measures
those head-to-head: bulk load 204k vec/s vs the reference's 23k).  The
server itself is dependency-free stdlib ``socketserver`` and is safe to
run against the same store tables the batch jobs use.
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
import time
from typing import Any, Callable

__all__ = [
    "RespError",
    "VecFrontend",
    "RespServer",
    "parse_vector_payload_bytes",
    "encode_resp",
    "decode_command",
]

OK = "VEC_OK"
ERR_DIM = "VEC_ERR_DIM"
ERR_NOT_FOUND = "VEC_ERR_NOT_FOUND"
ERR_QUOTA = "VEC_ERR_QUOTA"
ERR_BUSY = "VEC_ERR_BUSY"
ERR_AUTH = "VEC_ERR_AUTH"


class RespError(Exception):
    """Carries the wire error line (``-<code> <message>``)."""

    def __init__(self, code: str, message: str = ""):
        self.code = code
        self.message = message
        super().__init__(f"{code} {message}".strip())


# --------------------------------------------------------------------------
# RESP2 codec
# --------------------------------------------------------------------------


class _Simple(str):
    """Marker: encode as a RESP simple string (+...)."""


def encode_resp(value: Any) -> bytes:
    """Python value -> RESP2 bytes.  Strings/bytes -> bulk, floats ->
    bulk numeric (Garnet's RESP2 ``WriteDoubleNumeric`` shape), lists ->
    arrays, None -> null bulk, ``_Simple`` -> simple string,
    ``RespError`` -> error line."""
    if isinstance(value, RespError):
        msg = f"-{value.code} {value.message}".rstrip() + "\r\n"
        return msg.encode()
    if isinstance(value, _Simple):
        return f"+{value}\r\n".encode()
    if value is None:
        return b"$-1\r\n"
    if isinstance(value, float):
        text = format(value, ".17g")
        return f"${len(text)}\r\n{text}\r\n".encode()
    if isinstance(value, int):
        return f":{value}\r\n".encode()
    if isinstance(value, str):
        value = value.encode()
    if isinstance(value, (bytes, bytearray)):
        return b"$%d\r\n%s\r\n" % (len(value), bytes(value))
    if isinstance(value, (list, tuple)):
        return b"*%d\r\n%s" % (
            len(value),
            b"".join(encode_resp(v) for v in value),
        )
    raise TypeError(f"cannot RESP-encode {type(value)!r}")


def decode_command(read: Callable[[int], bytes], readline: Callable[[], bytes]):
    """One client command (RESP array of bulk strings) -> list[bytes].
    Returns None on a cleanly closed connection."""
    line = readline()
    if not line:
        return None
    if line[:1] != b"*":
        raise RespError("ERR", "Protocol error: expected array")
    try:
        n = int(line[1:].strip())
    except ValueError as exc:
        raise RespError("ERR", "Protocol error: bad array length") from exc
    args: list[bytes] = []
    for _ in range(n):
        hdr = readline()
        if hdr[:1] != b"$":
            raise RespError("ERR", "Protocol error: expected bulk string")
        ln = int(hdr[1:].strip())
        buf = read(ln + 2)
        if len(buf) != ln + 2:
            return None
        args.append(buf[:ln])
    return args


# --------------------------------------------------------------------------
# Payload parsing (reference VectorParsing.ParseVector: JSON array first,
# then comma/space separated text, else raw little-endian float32)
# --------------------------------------------------------------------------


def parse_vector_payload_bytes(payload: bytes) -> list[float]:
    text = None
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if text is not None:
        stripped = text.strip()
        if stripped.startswith("["):
            try:
                arr = json.loads(stripped)
            except json.JSONDecodeError as exc:
                raise RespError("ERR", "Invalid JSON vector payload.") from exc
            if not isinstance(arr, list) or not all(
                isinstance(v, (int, float)) for v in arr
            ):
                raise RespError("ERR", "Vector must be a numeric array.")
            return [float(v) for v in arr]
        toks = stripped.replace(",", " ").split()
        if toks:
            try:
                return [float(t) for t in toks]
            except ValueError:
                pass  # fall through to binary
    if len(payload) % 4 == 0 and payload:
        return list(struct.unpack(f"<{len(payload) // 4}f", payload))
    raise RespError("ERR", "Unable to parse vector payload.")


def _parse_tags(raw: str) -> list[str]:
    raw = raw.strip()
    if raw.startswith("["):
        try:
            arr = json.loads(raw)
        except json.JSONDecodeError as exc:
            raise RespError("ERR", "Invalid TAGS payload.") from exc
        if not all(isinstance(t, str) for t in arr):
            raise RespError("ERR", "TAGS must be strings.")
        return arr
    return [t for t in (s.strip() for s in raw.split(",")) if t]


# --------------------------------------------------------------------------
# Command frontend
# --------------------------------------------------------------------------


class VecFrontend:
    """Maps the five VEC.* commands onto a :class:`VectorStore`.

    ``api_keys``: optional {tenant_id: key}; tenants present in the map
    must authenticate (VEC_ERR_AUTH otherwise) — reference
    ``ITenantAuthenticator``.  ``qps_limit``: optional per-tenant
    sliding-1s window cap (VEC_ERR_QUOTA), the serving-side analog of
    the engine's streaming quota operator (G1)."""

    def __init__(
        self,
        store,
        *,
        api_keys: dict[str, str] | None = None,
        qps_limit: int | None = None,
        default_metric: str = "l2",
        clock: Callable[[], float] = time.monotonic,
    ):
        self.store = store
        self.api_keys = api_keys or {}
        self.qps_limit = qps_limit
        self.default_metric = default_metric
        self._clock = clock
        self._lock = threading.Lock()
        self._qps: dict[str, list[float]] = {}
        self.cache_hits = 0
        self.cache_misses = 0
        self.evictions = 0
        self.ai_fallbacks = 0
        # reference latency buckets (MetricsCollector.cs:78-95)
        self._bucket_edges = (1.0, 5.0, 10.0, 50.0, 100.0)
        self._buckets = [0] * (len(self._bucket_edges) + 1)

    # -- cross-cutting ----------------------------------------------------

    def _auth(self, tenant: str, api_key: str | None) -> None:
        want = self.api_keys.get(tenant)
        if want is not None and api_key != want:
            raise RespError(ERR_AUTH, "Invalid API key.")

    def _quota(self, tenant: str) -> None:
        if self.qps_limit is None:
            return
        now = self._clock()
        with self._lock:
            window = [t for t in self._qps.get(tenant, []) if now - t < 1.0]
            if len(window) >= self.qps_limit:
                self._qps[tenant] = window
                raise RespError(ERR_QUOTA, "Tenant quota exceeded.")
            window.append(now)
            self._qps[tenant] = window

    def _observe_latency(self, ms: float) -> None:
        with self._lock:
            for i, edge in enumerate(self._bucket_edges):
                if ms <= edge:
                    self._buckets[i] += 1
                    return
            self._buckets[-1] += 1

    # -- write path -------------------------------------------------------

    def _parse_write(self, args: list[bytes]):
        if len(args) < 5:
            raise RespError(
                "ERR", "Expected at least 4 arguments: index id VECTOR <payload>."
            )
        tenant = args[0].decode()
        index = args[1].decode()
        vid = args[2].decode()
        if args[3].decode().upper() != "VECTOR":
            raise RespError("ERR", "Expected VECTOR token before payload.")
        vector = parse_vector_payload_bytes(args[4])
        meta = None
        tags: list[str] = []
        numeric: dict[str, float] = {}
        api_key = None
        i = 5
        while i < len(args):
            tok = args[i].decode().upper()
            if tok == "META":
                if i + 1 >= len(args):
                    raise RespError("ERR", "META requires a JSON payload.")
                meta = args[i + 1].decode()
                try:
                    json.loads(meta)
                except json.JSONDecodeError as exc:
                    raise RespError("ERR", "META must be valid JSON.") from exc
                i += 2
            elif tok == "TAGS":
                if i + 1 >= len(args):
                    raise RespError(
                        "ERR", "TAGS requires a JSON array or comma-separated list."
                    )
                tags = _parse_tags(args[i + 1].decode())
                i += 2
            elif tok == "NUMERIC_FIELDS":
                if i + 1 >= len(args):
                    raise RespError("ERR", "NUMERIC_FIELDS requires a JSON object.")
                try:
                    obj = json.loads(args[i + 1].decode())
                except json.JSONDecodeError as exc:
                    raise RespError(
                        "ERR", "NUMERIC_FIELDS must be valid JSON."
                    ) from exc
                if not isinstance(obj, dict):
                    raise RespError("ERR", "NUMERIC_FIELDS must be an object.")
                numeric = {k: float(v) for k, v in obj.items()}
                i += 2
            elif tok == "API_KEY":
                if i + 1 >= len(args):
                    raise RespError(ERR_AUTH, "API_KEY requires a value.")
                api_key = args[i + 1].decode()
                i += 2
            else:
                raise RespError("ERR", f"Unknown token '{args[i].decode()}'.")
        return tenant, index, vid, vector, meta, tags, numeric, api_key

    def _record_df(self, tenant, index, vid, vector, meta, tags, numeric):
        from pyspark.sql import Row

        spark = self.store.spark
        return spark.createDataFrame(
            [
                Row(
                    tenant_id=tenant,
                    index_name=index,
                    id=vid,
                    vector=[float(v) for v in vector],
                    meta=meta,
                    tags=tags,
                    numeric_fields=numeric,
                )
            ],
            schema=(
                "tenant_id string, index_name string, id string, "
                "vector array<float>, meta string, tags array<string>, "
                "numeric_fields map<string,double>"
            ),
        )

    def _cmd_add(self, args: list[bytes], *, upsert: bool):
        from pyrope_spark.store.vector_store import DuplicateIdError

        tenant, index, vid, vector, meta, tags, numeric, key = self._parse_write(
            args
        )
        self._auth(tenant, key)
        self._quota(tenant)
        df = self._record_df(tenant, index, vid, vector, meta, tags, numeric)
        try:
            if upsert:
                self.store.upsert(df)
            else:
                self.store.add(df)
        except DuplicateIdError as exc:
            raise RespError("ERR", "Vector already exists.") from exc
        except ValueError as exc:
            if "dim" in str(exc).lower():
                raise RespError(ERR_DIM, str(exc)) from exc
            raise RespError("ERR", str(exc)) from exc
        return _Simple(OK)

    def _cmd_del(self, args: list[bytes]):
        if len(args) < 3:
            raise RespError("ERR", "Expected 2 arguments: index id.")
        tenant, index, vid = (a.decode() for a in args[:3])
        api_key = None
        i = 3
        while i < len(args):
            tok = args[i].decode().upper()
            if tok == "API_KEY":
                if i + 1 >= len(args):
                    raise RespError(ERR_AUTH, "API_KEY requires a value.")
                api_key = args[i + 1].decode()
                i += 2
            else:
                raise RespError("ERR", f"Unknown token '{args[i].decode()}'.")
        self._auth(tenant, api_key)
        self._quota(tenant)
        if self.store.registry.get(tenant, index) is None:
            raise RespError(ERR_NOT_FOUND, "Index not found.")
        self.store.delete([(tenant, index, vid)])
        return _Simple(OK)

    # -- read path --------------------------------------------------------

    def _cmd_search(self, args: list[bytes]):
        t_total = time.time()
        if len(args) < 6:
            raise RespError(
                "ERR", "Expected at least 5 arguments: index TOPK <k> VECTOR <payload>."
            )
        tenant = args[0].decode()
        index = args[1].decode()
        if args[2].decode().upper() != "TOPK":
            raise RespError("ERR", "Expected TOPK token after index name.")
        try:
            k = int(args[3].decode())
        except ValueError:
            k = 0
        if k <= 0:
            raise RespError("ERR", "TOPK must be a positive integer.")
        if args[4].decode().upper() != "VECTOR":
            raise RespError("ERR", "Expected VECTOR token before payload.")
        vector = parse_vector_payload_bytes(args[5])
        filter_tags: list[str] = []
        with_meta = trace = False
        request_id = api_key = None
        i = 6
        while i < len(args):
            tok = args[i].decode().upper()
            if tok == "FILTER":
                if i + 1 >= len(args):
                    raise RespError("ERR", "FILTER requires tag list.")
                filter_tags = _parse_tags(args[i + 1].decode())
                i += 2
            elif tok == "WITH_META":
                with_meta = True
                i += 1
            elif tok == "TRACE":
                trace = True
                i += 1
            elif tok == "REQUEST_ID":
                if i + 1 >= len(args):
                    raise RespError("ERR", "REQUEST_ID requires a value.")
                request_id = args[i + 1].decode()
                i += 2
            elif tok == "CACHE_HINT":
                if i + 1 >= len(args):
                    raise RespError("ERR", "CACHE_HINT requires a value.")
                i += 2  # accepted for grammar parity; facade has no cache
            elif tok == "API_KEY":
                if i + 1 >= len(args):
                    raise RespError(ERR_AUTH, "API_KEY requires a value.")
                api_key = args[i + 1].decode()
                i += 2
            else:
                raise RespError("ERR", f"Unknown token '{args[i].decode()}'.")
        self._auth(tenant, api_key)
        self._quota(tenant)
        if self.store.registry.get(tenant, index) is None:
            raise RespError(ERR_NOT_FOUND, "Index not found.")
        policy_ms = (time.time() - t_total) * 1000

        from pyspark.sql import functions as F

        spark = self.store.spark
        t0 = time.time()
        queries = spark.createDataFrame(
            [(request_id or "q0", [float(v) for v in vector], filter_tags)],
            schema=(
                "query_id string, vector array<float>, filter_tags array<string>"
            ),
        )
        hits_df = self.store.search(
            queries, k=k, tenant_id=tenant, index_name=index
        )
        if with_meta:
            from pyrope_spark.operators.knn import hydrate

            live = self.store.live(tenant, index)
            hits_df = hydrate(hits_df, live, include_meta=True)
        rows = hits_df.orderBy("rank").collect()
        faiss_ms = (time.time() - t0) * 1000
        with self._lock:
            self.cache_misses += 1

        t0 = time.time()
        hits = []
        for r in rows:
            hit = [r["id"], float(r["score"])]
            if with_meta:
                hit.append(r["meta"])
            hits.append(hit)
        metadata_ms = (time.time() - t0) * 1000
        total_ms = (time.time() - t_total) * 1000
        self._observe_latency(total_ms)
        if not trace:
            return hits
        trace_json = json.dumps(
            {
                "RequestId": request_id,
                "CacheHit": False,
                "LatencyMs": total_ms,
                "PolicyMs": policy_ms,
                "CacheMs": 0.0,
                "FaissMs": faiss_ms,
                "MetadataMs": metadata_ms,
                "BudgetAdjustment": None,
            }
        )
        return [hits, trace_json]

    def _cmd_stats(self, args: list[bytes]):
        if not args:
            raise RespError("ERR", "Expected tenant key.")
        tenant = args[0].decode()
        api_key = None
        if len(args) >= 3 and args[1].decode().upper() == "API_KEY":
            api_key = args[2].decode()
        elif len(args) > 1:
            raise RespError("ERR", f"Unknown token '{args[1].decode()}'.")
        self._auth(tenant, api_key)
        with self._lock:
            hits, misses = self.cache_hits, self.cache_misses
            evict, fallb = self.evictions, self.ai_fallbacks
            buckets = list(self._buckets)
        lines = [
            "# HELP cache_hit_total Total number of cache hits",
            "# TYPE cache_hit_total counter",
            f"cache_hit_total {hits}",
            "# HELP cache_miss_total Total number of cache misses",
            "# TYPE cache_miss_total counter",
            f"cache_miss_total {misses}",
            "# HELP cache_eviction_total Total number of cache evictions",
            "# TYPE cache_eviction_total counter",
            f"cache_eviction_total {evict}",
            "# HELP ai_fallback_total Total number of AI fallback events",
            "# TYPE ai_fallback_total counter",
            f"ai_fallback_total {fallb}",
            "# HELP vector_search_latency_ms Latency buckets",
            "# TYPE vector_search_latency_ms histogram",
        ]
        count = 0
        for edge, b in zip(self._bucket_edges, buckets):
            count += b
            le = format(edge, "g")
            lines.append(f'vector_search_latency_ms_bucket{{le="{le}"}} {count}')
        count += buckets[-1]
        lines.append(f'vector_search_latency_ms_bucket{{le="+Inf"}} {count}')
        lines.append(f"vector_search_latency_ms_count {count}")
        lines.append("vector_search_latency_ms_sum 0")
        # facade extension: per-index gauges from the registry
        metas = [
            m for m in self.store.registry.all() if m.tenant_id == tenant
        ]
        for m in metas:
            lab = f'{{tenant="{tenant}",index="{m.index_name}"}}'
            lines.append(f"vector_index_dimension{lab} {m.dim}")
            lines.append(
                f"vector_index_count{lab} "
                f"{self.store.count(tenant, m.index_name)}"
            )
        return "\n".join(lines) + "\n"

    # -- dispatch ---------------------------------------------------------

    def execute(self, args: list[bytes]):
        if not args:
            raise RespError("ERR", "Empty command.")
        cmd = args[0].decode().upper()
        rest = args[1:]
        if cmd == "PING":
            return _Simple("PONG")
        if cmd == "VEC.ADD":
            return self._cmd_add(rest, upsert=False)
        if cmd == "VEC.UPSERT":
            return self._cmd_add(rest, upsert=True)
        if cmd == "VEC.DEL":
            return self._cmd_del(rest)
        if cmd == "VEC.SEARCH":
            return self._cmd_search(rest)
        if cmd == "VEC.STATS":
            return self._cmd_stats(rest)
        raise RespError("ERR", f"unknown command '{cmd}'")


# --------------------------------------------------------------------------
# TCP server
# --------------------------------------------------------------------------


class RespServer:
    """Threaded TCP server speaking RESP2; each connection is a session,
    each command dispatches to :class:`VecFrontend` (Spark supports
    concurrent driver-side job submission from threads)."""

    def __init__(self, frontend: VecFrontend, host: str = "127.0.0.1",
                 port: int = 0):
        self.frontend = frontend
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                while True:
                    try:
                        args = decode_command(
                            self.rfile.read, self.rfile.readline
                        )
                    except RespError as exc:
                        self.wfile.write(encode_resp(exc))
                        return
                    except (ConnectionError, OSError):
                        return
                    if args is None:
                        return
                    try:
                        result = outer.frontend.execute(args)
                        payload = encode_resp(result)
                    except RespError as exc:
                        payload = encode_resp(exc)
                    except Exception as exc:  # engine-side failure
                        payload = encode_resp(RespError("ERR", str(exc)[:200]))
                    try:
                        self.wfile.write(payload)
                    except (ConnectionError, OSError):
                        return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    def start(self) -> "RespServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


class RespClient:
    """Minimal blocking RESP2 client (tests + scripts)."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""

    def close(self) -> None:
        self._sock.close()

    def _readline(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise ConnectionError("server closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_n(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise ConnectionError("server closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_value(self):
        line = self._readline()
        t, body = line[:1], line[1:]
        if t == b"+":
            return body.decode()
        if t == b"-":
            raise RespError(*(body.decode().split(" ", 1) + [""])[:2])
        if t == b":":
            return int(body)
        if t == b"$":
            n = int(body)
            if n == -1:
                return None
            data = self._read_n(n + 2)[:-2]
            return data.decode("utf-8", errors="replace")
        if t == b"*":
            return [self._read_value() for _ in range(int(body))]
        raise RespError("ERR", f"bad reply type {t!r}")

    def execute(self, *args) -> Any:
        parts = []
        for a in args:
            if isinstance(a, str):
                a = a.encode()
            elif not isinstance(a, (bytes, bytearray)):
                a = str(a).encode()
            parts.append(b"$%d\r\n%s\r\n" % (len(a), bytes(a)))
        self._sock.sendall(b"*%d\r\n%s" % (len(args), b"".join(parts)))
        return self._read_value()
