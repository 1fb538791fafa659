"""RESP wire facade — the reference's user entry point
(GarnetService.cs:92-104) served by a stdlib TCP server that delegates
to the engine's VectorStore/knn operators.  The end-to-end scenario
mirrors SURVEY §5's smoke test: add vectors, search, tag-filter,
delete, search again — over a REAL socket with RESP2 framing."""

from __future__ import annotations

import json
import struct

import pytest

from pyrope_spark.serving.resp import (
    RespClient,
    RespError,
    RespServer,
    VecFrontend,
    decode_command,
    encode_resp,
    parse_vector_payload_bytes,
)
from pyrope_spark.store.vector_store import VectorStore


# --------------------------------------------------------------------------
# protocol-level units (no Spark)
# --------------------------------------------------------------------------


def test_encode_resp_shapes():
    assert encode_resp(None) == b"$-1\r\n"
    assert encode_resp(3) == b":3\r\n"
    assert encode_resp("ab") == b"$2\r\nab\r\n"
    assert encode_resp(1.5) == b"$3\r\n1.5\r\n"
    assert encode_resp(["a", 1]) == b"*2\r\n$1\r\na\r\n:1\r\n"
    assert encode_resp(RespError("ERR", "boom")) == b"-ERR boom\r\n"


def test_decode_command_roundtrip():
    raw = b"*2\r\n$4\r\nPING\r\n$3\r\nabc\r\n"
    pos = [0]

    def read(n):
        out = raw[pos[0] : pos[0] + n]
        pos[0] += n
        return out

    def readline():
        end = raw.index(b"\r\n", pos[0]) + 2
        out = raw[pos[0] : end]
        pos[0] = end
        return out

    assert decode_command(read, readline) == [b"PING", b"abc"]


def test_parse_vector_payload_forms():
    assert parse_vector_payload_bytes(b"[1, 2.5, -3]") == [1.0, 2.5, -3.0]
    assert parse_vector_payload_bytes(b"1,2.5,-3") == [1.0, 2.5, -3.0]
    assert parse_vector_payload_bytes(b"1 2.5 -3") == [1.0, 2.5, -3.0]
    raw = struct.pack("<3f", 1.0, 2.5, -3.0)
    assert parse_vector_payload_bytes(raw) == [1.0, 2.5, -3.0]
    with pytest.raises(RespError):
        parse_vector_payload_bytes(b"[1, oops]")
    with pytest.raises(RespError):
        parse_vector_payload_bytes(b"")


# --------------------------------------------------------------------------
# end-to-end over a real socket
# --------------------------------------------------------------------------


@pytest.fixture()
def server(spark, tmp_path):
    store = VectorStore(spark, str(tmp_path / "store"))
    frontend = VecFrontend(store, api_keys={"locked": "sesame"})
    srv = RespServer(frontend).start()
    client = RespClient(srv.host, srv.port)
    yield client, frontend
    client.close()
    srv.stop()


def test_smoke_scenario_over_the_wire(server):
    """SURVEY §5 smoke: add 2, search, filter, delete, search."""
    c, _ = server
    assert c.execute("PING") == "PONG"
    assert (
        c.execute(
            "VEC.ADD", "t1", "idx", "a", "VECTOR", "[1,0,0,0]",
            "META", '{"lang":"en"}', "TAGS", "red,hot",
        )
        == "VEC_OK"
    )
    assert (
        c.execute(
            "VEC.ADD", "t1", "idx", "b", "VECTOR", "[0,1,0,0]",
            "TAGS", '["blue"]',
        )
        == "VEC_OK"
    )

    hits = c.execute(
        "VEC.SEARCH", "t1", "idx", "TOPK", "2", "VECTOR", "[1,0,0,0]"
    )
    assert [h[0] for h in hits] == ["a", "b"]
    assert float(hits[0][1]) == pytest.approx(0.0)  # l2 to itself

    # has-ALL tag filter drops 'a' when asking for a tag it lacks
    hits = c.execute(
        "VEC.SEARCH", "t1", "idx", "TOPK", "2", "VECTOR", "[1,0,0,0]",
        "FILTER", "blue",
    )
    assert [h[0] for h in hits] == ["b"]

    # WITH_META returns 3-element hit rows with the stored JSON
    hits = c.execute(
        "VEC.SEARCH", "t1", "idx", "TOPK", "1", "VECTOR", "[1,0,0,0]",
        "WITH_META",
    )
    assert hits[0][0] == "a" and json.loads(hits[0][2]) == {"lang": "en"}

    assert c.execute("VEC.DEL", "t1", "idx", "a") == "VEC_OK"
    hits = c.execute(
        "VEC.SEARCH", "t1", "idx", "TOPK", "2", "VECTOR", "[1,0,0,0]"
    )
    assert [h[0] for h in hits] == ["b"]  # tombstone filtered


def test_duplicate_add_and_upsert_semantics(server):
    c, _ = server
    assert c.execute("VEC.ADD", "t1", "i", "x", "VECTOR", "[1,2]") == "VEC_OK"
    with pytest.raises(RespError, match="already exists"):
        c.execute("VEC.ADD", "t1", "i", "x", "VECTOR", "[9,9]")
    assert c.execute("VEC.UPSERT", "t1", "i", "x", "VECTOR", "[9,9]") == "VEC_OK"
    hits = c.execute("VEC.SEARCH", "t1", "i", "TOPK", "1", "VECTOR", "[9,9]")
    assert hits[0][0] == "x" and float(hits[0][1]) == pytest.approx(0.0)


def test_error_codes_on_the_wire(server):
    c, _ = server
    # dim mismatch against a registered index
    c.execute("VEC.ADD", "t1", "i", "x", "VECTOR", "[1,2,3]")
    with pytest.raises(RespError) as exc:
        c.execute("VEC.ADD", "t1", "i", "y", "VECTOR", "[1,2]")
    assert exc.value.code == "VEC_ERR_DIM"
    # unknown index on DEL and SEARCH
    with pytest.raises(RespError) as exc:
        c.execute("VEC.DEL", "t1", "nope", "x")
    assert exc.value.code == "VEC_ERR_NOT_FOUND"
    with pytest.raises(RespError) as exc:
        c.execute("VEC.SEARCH", "t1", "nope", "TOPK", "1", "VECTOR", "[1]")
    assert exc.value.code == "VEC_ERR_NOT_FOUND"
    # grammar errors
    with pytest.raises(RespError, match="TOPK"):
        c.execute("VEC.SEARCH", "t1", "i", "BAD", "1", "VECTOR", "[1,2,3]")
    with pytest.raises(RespError, match="Unknown token"):
        c.execute("VEC.ADD", "t1", "i", "z", "VECTOR", "[1,2,3]", "WAT")
    # auth: tenant in the key map must present the right API_KEY
    with pytest.raises(RespError) as exc:
        c.execute("VEC.ADD", "locked", "i", "x", "VECTOR", "[1]")
    assert exc.value.code == "VEC_ERR_AUTH"
    assert (
        c.execute(
            "VEC.ADD", "locked", "i", "x", "VECTOR", "[1]",
            "API_KEY", "sesame",
        )
        == "VEC_OK"
    )


def test_trace_reply_is_two_element_array(server):
    c, _ = server
    c.execute("VEC.ADD", "t1", "i", "x", "VECTOR", "[1,2]")
    reply = c.execute(
        "VEC.SEARCH", "t1", "i", "TOPK", "1", "VECTOR", "[1,2]",
        "TRACE", "REQUEST_ID", "r-7",
    )
    assert len(reply) == 2
    hits, trace = reply
    assert hits[0][0] == "x"
    t = json.loads(trace)
    assert t["RequestId"] == "r-7" and t["CacheHit"] is False
    assert t["LatencyMs"] >= t["FaissMs"] >= 0


def test_stats_prometheus_text(server):
    c, _ = server
    c.execute("VEC.ADD", "t1", "i", "x", "VECTOR", "[1,2]")
    c.execute("VEC.SEARCH", "t1", "i", "TOPK", "1", "VECTOR", "[1,2]")
    text = c.execute("VEC.STATS", "t1")
    assert "# TYPE cache_hit_total counter" in text
    assert "cache_miss_total 1" in text
    assert 'vector_search_latency_ms_bucket{le="+Inf"} 1' in text
    assert 'vector_index_dimension{tenant="t1",index="i"} 2' in text
    assert 'vector_index_count{tenant="t1",index="i"} 1' in text


def test_qps_quota_enforced():
    clock = [0.0]
    frontend = VecFrontend.__new__(VecFrontend)
    # minimal init without a store: quota path only
    import threading

    frontend.qps_limit = 2
    frontend._clock = lambda: clock[0]
    frontend._lock = threading.Lock()
    frontend._qps = {}
    frontend._quota("t")
    frontend._quota("t")
    with pytest.raises(RespError) as exc:
        frontend._quota("t")
    assert exc.value.code == "VEC_ERR_QUOTA"
    clock[0] += 1.5  # window slides
    frontend._quota("t")
