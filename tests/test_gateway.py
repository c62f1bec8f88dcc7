"""Embedded SQL gateway tests (reference flink-sql-gateway REST v1:
OpenSessionHandler, ExecuteStatementHandler, FetchResultsHandler):
session lifecycle, async statements, paged fetches, error surfaces —
exercised over real HTTP."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest


@pytest.fixture(scope="module")
def gw(spark):
    from flink_spark.gateway import SqlGatewayServer

    server = SqlGatewayServer(spark)
    port = server.start()
    yield f"http://127.0.0.1:{port}"
    server.stop()


def _call(base, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wait_finished(base, sh, oh, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        _, st = _call(base, "GET", f"/v1/sessions/{sh}/operations/{oh}/status")
        if st["status"] != "RUNNING":
            return st
        time.sleep(0.1)
    raise TimeoutError


def test_info_and_versions(gw):
    code, info = _call(gw, "GET", "/v1/info")
    assert code == 200 and info["productName"] == "flink-spark-sql-gateway"
    _, vers = _call(gw, "GET", "/v1/api_versions")
    assert vers["versions"] == ["V1"]


def test_statement_lifecycle_and_paged_fetch(gw):
    _, s = _call(gw, "POST", "/v1/sessions", {"properties": {"k": "v"}})
    sh = s["sessionHandle"]
    _, props = _call(gw, "GET", f"/v1/sessions/{sh}")
    assert props["properties"] == {"k": "v"}
    code, _ = _call(gw, "POST", f"/v1/sessions/{sh}/heartbeat", {})
    assert code == 200

    # DDL through the gateway: the full dialect is reachable over HTTP
    _, op = _call(gw, "POST", f"/v1/sessions/{sh}/statements", {
        "statement": "CREATE TABLE gw_v (a STRING, b STRING) "
                     "WITH ('connector' = 'values', 'data' = 'x|1;y|2;z|3')"
    })
    st = _wait_finished(gw, sh, op["operationHandle"])
    assert st["status"] == "FINISHED"

    _, op = _call(gw, "POST", f"/v1/sessions/{sh}/statements", {
        "statement": "SELECT a, CAST(b AS INT) AS b FROM gw_v ORDER BY a"
    })
    oh = op["operationHandle"]
    assert _wait_finished(gw, sh, oh)["status"] == "FINISHED"
    _, res = _call(gw, "GET", f"/v1/sessions/{sh}/operations/{oh}/result/0")
    assert res["resultType"] == "PAYLOAD"
    cols = [c["name"] for c in res["results"]["columns"]]
    assert cols == ["a", "b"]
    assert res["results"]["data"] == [["x", 1], ["y", 2], ["z", 3]]
    # past-the-end token → EOS page
    _, eos = _call(gw, "GET", f"/v1/sessions/{sh}/operations/{oh}/result/1")
    assert eos["resultType"] == "EOS" and eos["results"]["data"] == []

    _, closed = _call(gw, "POST", f"/v1/sessions/{sh}/operations/{oh}/close", {})
    assert closed["status"] == "CLOSED"
    _, closed = _call(gw, "DELETE", f"/v1/sessions/{sh}")
    assert closed["status"] == "CLOSED"
    code, _ = _call(gw, "GET", f"/v1/sessions/{sh}")
    assert code == 404


def test_error_statement_surfaces(gw):
    _, s = _call(gw, "POST", "/v1/sessions", {})
    sh = s["sessionHandle"]
    _, op = _call(gw, "POST", f"/v1/sessions/{sh}/statements", {
        "statement": "SELECT * FROM definitely_missing_table_xyz"
    })
    st = _wait_finished(gw, sh, op["operationHandle"])
    assert st["status"] == "ERROR" and st["errors"]
    code, res = _call(
        gw, "GET",
        f"/v1/sessions/{sh}/operations/{op['operationHandle']}/result/0",
    )
    assert code == 500 and res["resultType"] == "ERROR"
    _call(gw, "DELETE", f"/v1/sessions/{sh}")


def test_multi_page_results(gw, spark):
    from flink_spark.gateway import PAGE_SIZE

    _, s = _call(gw, "POST", "/v1/sessions", {})
    sh = s["sessionHandle"]
    n = PAGE_SIZE + 5
    _, op = _call(gw, "POST", f"/v1/sessions/{sh}/statements", {
        "statement": f"SELECT id FROM range({n}) ORDER BY id"
    })
    oh = op["operationHandle"]
    assert _wait_finished(gw, sh, oh)["status"] == "FINISHED"
    _, p0 = _call(gw, "GET", f"/v1/sessions/{sh}/operations/{oh}/result/0")
    assert len(p0["results"]["data"]) == PAGE_SIZE
    assert p0["nextResultUri"].endswith("/result/1")
    _, p1 = _call(gw, "GET", p0["nextResultUri"].replace(gw, ""))
    assert len(p1["results"]["data"]) == 5 and "nextResultUri" not in p1
    _call(gw, "DELETE", f"/v1/sessions/{sh}")


def test_cancel_interrupts_running_job(gw):
    """Cancel must reach the Spark jobs (cancelJobGroup on the operation
    handle), not just flip the HTTP status — a deliberately huge
    aggregation finishes as CANCELED well before it could complete."""
    _, s = _call(gw, "POST", "/v1/sessions", {})
    sh = s["sessionHandle"]
    _, op = _call(gw, "POST", f"/v1/sessions/{sh}/statements", {
        "statement": "SELECT COUNT(*) AS n FROM range(1000000000) a "
                     "CROSS JOIN range(100000) b"
    })
    oh = op["operationHandle"]
    time.sleep(1.0)  # let the job start
    _, c = _call(gw, "POST", f"/v1/sessions/{sh}/operations/{oh}/cancel", {})
    assert c["status"] == "CANCELED"
    st = _wait_finished(gw, sh, oh, timeout=30)
    assert st["status"] == "CANCELED"
    _call(gw, "DELETE", f"/v1/sessions/{sh}")
