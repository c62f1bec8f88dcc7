"""Embedded SQL gateway: the reference's REST protocol over
TableEnvironment (reference flink-table/flink-sql-gateway
rest/handler/session/OpenSessionHandler.java, CloseSessionHandler.java,
statement/ExecuteStatementHandler.java, FetchResultsHandler.java,
SqlGatewayRestAPIVersion.java — v1 URL shapes).

Endpoints (v1):

    GET    /v1/info                                → product/version
    GET    /v1/api_versions                        → ["V1"]
    POST   /v1/sessions                            → sessionHandle
    GET    /v1/sessions/{sh}                       → session properties
    DELETE /v1/sessions/{sh}                       → close
    POST   /v1/sessions/{sh}/heartbeat             → keepalive
    POST   /v1/sessions/{sh}/statements            → operationHandle
    GET    /v1/sessions/{sh}/operations/{oh}/status
    GET    /v1/sessions/{sh}/operations/{oh}/result/{token}
    POST   /v1/sessions/{sh}/operations/{oh}/cancel
    POST   /v1/sessions/{sh}/operations/{oh}/close

Execution model: statements run on a worker pool; fetches page through
the materialized result with a row-count token exactly like the
reference's FetchResultsHandler (PAYLOAD pages then an EOS page with no
nextResultUri). Statements route through TableEnvironment.execute_sql,
so the whole DDL dialect (window TVFs, MATCH_RECOGNIZE, materialized
tables, connectors) is reachable over HTTP.

Honest divergences from the reference, by construction: sessions share
the single SparkSession catalog (Flink isolates per-session catalogs);
there is no JDBC driver (the protocol surface is REST-only); results are
fully materialized per operation rather than streamed incrementally —
acceptable for gateway-sized result sets, and paging bounds each
response. The scale story is unchanged: the gateway only fronts plans
that run distributed."""

from __future__ import annotations

import base64
import json
import re
import threading
import uuid
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession

PAGE_SIZE = 1000

_ROUTES = [
    ("GET", re.compile(r"^/v1/info$"), "info"),
    ("GET", re.compile(r"^/v1/api_versions$"), "api_versions"),
    ("POST", re.compile(r"^/v1/sessions$"), "open_session"),
    ("GET", re.compile(r"^/v1/sessions/(?P<sh>[\w-]+)$"), "get_session"),
    ("DELETE", re.compile(r"^/v1/sessions/(?P<sh>[\w-]+)$"), "close_session"),
    ("POST", re.compile(r"^/v1/sessions/(?P<sh>[\w-]+)/heartbeat$"), "heartbeat"),
    ("POST", re.compile(r"^/v1/sessions/(?P<sh>[\w-]+)/statements$"), "execute"),
    ("GET",
     re.compile(r"^/v1/sessions/(?P<sh>[\w-]+)/operations/(?P<oh>[\w-]+)/status$"),
     "op_status"),
    ("GET",
     re.compile(r"^/v1/sessions/(?P<sh>[\w-]+)/operations/(?P<oh>[\w-]+)"
                r"/result/(?P<token>\d+)$"),
     "op_result"),
    ("POST",
     re.compile(r"^/v1/sessions/(?P<sh>[\w-]+)/operations/(?P<oh>[\w-]+)/cancel$"),
     "op_cancel"),
    ("POST",
     re.compile(r"^/v1/sessions/(?P<sh>[\w-]+)/operations/(?P<oh>[\w-]+)/close$"),
     "op_close"),
]


def _json_value(v):
    """JSON-encode one result cell (timestamps/decimals/bytes → portable)."""
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, list):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    return v


class _Operation:
    def __init__(self) -> None:
        self.status = "RUNNING"
        self.error: str | None = None
        self.columns: list[dict] = []
        self.rows: list[list] = []
        self.done = threading.Event()


class _Session:
    def __init__(self, spark: SparkSession, properties: dict) -> None:
        from flink_spark.catalog import TableEnvironment

        self.env = TableEnvironment(spark)
        self.properties = dict(properties)
        self.operations: dict[str, _Operation] = {}


class SqlGatewayServer:
    """Threaded embedded gateway; ``start()`` returns the bound port."""

    def __init__(self, spark: SparkSession, host: str = "127.0.0.1",
                 port: int = 0, workers: int = 4) -> None:
        self.spark = spark
        self.sessions: dict[str, _Session] = {}
        self.pool = ThreadPoolExecutor(max_workers=workers,
                                       thread_name_prefix="sql-gateway")
        gateway = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _dispatch(self, method: str) -> None:
                for m, rx, name in _ROUTES:
                    if m != method:
                        continue
                    match = rx.match(self.path.split("?")[0])
                    if match:
                        body = {}
                        ln = int(self.headers.get("Content-Length") or 0)
                        if ln:
                            try:
                                body = json.loads(self.rfile.read(ln) or b"{}")
                            except json.JSONDecodeError:
                                return self._send(400, {"errors": ["bad json"]})
                        try:
                            code, payload = getattr(gateway, f"_h_{name}")(
                                body, **match.groupdict()
                            )
                        except KeyError:
                            code, payload = 404, {"errors": ["unknown handle"]}
                        return self._send(code, payload)
                self._send(404, {"errors": [f"no route {method} {self.path}"]})

            def _send(self, code: int, payload: dict) -> None:
                raw = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_DELETE(self):
                self._dispatch("DELETE")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> int:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="sql-gateway-http", daemon=True
        )
        self._thread.start()
        return self.httpd.server_address[1]

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self.pool.shutdown(wait=False, cancel_futures=True)

    # -- handlers ----------------------------------------------------------

    def _h_info(self, body):
        return 200, {"productName": "flink-spark-sql-gateway", "version": "2.0"}

    def _h_api_versions(self, body):
        return 200, {"versions": ["V1"]}

    def _h_open_session(self, body):
        sh = uuid.uuid4().hex
        self.sessions[sh] = _Session(self.spark, body.get("properties", {}))
        return 200, {"sessionHandle": sh}

    def _h_get_session(self, body, sh):
        return 200, {"properties": self.sessions[sh].properties}

    def _h_close_session(self, body, sh):
        self.sessions.pop(sh)
        return 200, {"status": "CLOSED"}

    def _h_heartbeat(self, body, sh):
        self.sessions[sh]  # 404 via KeyError if expired
        return 200, {}

    def _h_execute(self, body, sh):
        sess = self.sessions[sh]
        stmt = body.get("statement", "")
        oh = uuid.uuid4().hex
        op = _Operation()
        sess.operations[oh] = op

        def run() -> None:
            sc = self.spark.sparkContext
            try:
                # job group = operation handle (thread-local), so cancel
                # reaches the actual Spark jobs, not just the HTTP state
                sc.setJobGroup(oh, f"sql-gateway {oh}", interruptOnCancel=True)
                res = sess.env.execute_sql(stmt)
                if isinstance(res, DataFrame):
                    op.columns = [
                        {"name": f.name, "logicalType": f.dataType.simpleString()}
                        for f in res.schema.fields
                    ]
                    op.rows = [
                        [_json_value(v) for v in row] for row in res.collect()
                    ]
                else:
                    op.columns = [{"name": "result", "logicalType": "string"}]
                    op.rows = [["OK"]]
                if op.status == "RUNNING":
                    op.status = "FINISHED"
            except Exception as e:  # noqa: BLE001
                if op.status != "CANCELED":
                    op.status = "ERROR"
                    op.error = str(e)
            finally:
                try:
                    sc.setJobGroup(None, None)
                except Exception:  # noqa: BLE001
                    pass
                op.done.set()

        self.pool.submit(run)
        return 200, {"operationHandle": oh}

    def _h_op_status(self, body, sh, oh):
        op = self.sessions[sh].operations[oh]
        out = {"status": op.status}
        if op.error:
            out["errors"] = [op.error]
        return 200, out

    def _h_op_result(self, body, sh, oh, token):
        op = self.sessions[sh].operations[oh]
        if op.status == "RUNNING":
            return 200, {"resultType": "NOT_READY",
                         "nextResultUri": self._result_uri(sh, oh, token)}
        if op.status in ("ERROR", "CANCELED"):
            return 500, {"resultType": op.status, "errors": [op.error or ""]}
        start = int(token) * PAGE_SIZE
        page = op.rows[start : start + PAGE_SIZE]
        if not page and start > 0:
            return 200, {"resultType": "EOS",
                         "results": {"columns": op.columns, "data": []}}
        out = {
            "resultType": "PAYLOAD",
            "results": {"columns": op.columns, "data": page},
        }
        if start + PAGE_SIZE < len(op.rows):
            out["nextResultUri"] = self._result_uri(sh, oh, int(token) + 1)
        return 200, out

    def _h_op_cancel(self, body, sh, oh):
        op = self.sessions[sh].operations[oh]
        if op.status == "RUNNING":
            op.status = "CANCELED"
            # interrupt the Spark jobs tagged with this operation
            try:
                self.spark.sparkContext.cancelJobGroup(oh)
            except Exception:  # noqa: BLE001
                pass
        return 200, {"status": op.status}

    def _h_op_close(self, body, sh, oh):
        self.sessions[sh].operations.pop(oh)
        return 200, {"status": "CLOSED"}

    @staticmethod
    def _result_uri(sh: str, oh: str, token) -> str:
        return f"/v1/sessions/{sh}/operations/{oh}/result/{token}"
