"""Loopback Confluent-style Schema Registry over HTTP (SURVEY §2.4 C5).

The reference's publisher talks to a REAL Schema Registry over REST —
register-or-reuse then BACKWARD compatibility testing
(``kafka_publisher.py:101-141``). The sandbox has no Confluent stack,
so the previously-offline ``SchemaRegistry``/``backward_issues``
semantics are now served over an actual HTTP wire on 127.0.0.1: a
stdlib ``http.server`` speaking the registry's endpoint shapes, plus a
stdlib ``urllib`` client — the full register → compat-test → fetch
loop the reference runs, minus nothing but the hostname. Pointing the
client at a real Confluent deployment is a base-URL change.

Endpoints (Confluent REST API v1 shapes):
  GET  /subjects
  GET  /subjects/<s>/versions
  GET  /subjects/<s>/versions/latest
  POST /subjects/<s>/versions                 {"schema": <json>}
  POST /compatibility/subjects/<s>/versions/latest   {"schema": <json>}

Schemas travel as Spark StructType JSON (the engine's canonical schema
format; the reference uses Avro JSON — same wire shape, different
payload dialect).
"""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import types as T

from .schema_compat import SchemaRegistry


def _schema_from_payload(body: bytes) -> T.StructType:
    payload = json.loads(body.decode())
    return T.StructType.fromJson(json.loads(payload["schema"]))


class _Handler(BaseHTTPRequestHandler):
    registry: SchemaRegistry  # injected by serve()
    lock: threading.Lock  # guards registry mutations (threaded server)

    def log_message(self, *a):  # silence request logging in tests
        pass

    def _send(self, code: int, obj) -> None:
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        parts = [p for p in self.path.split("/") if p]
        reg = self.registry
        if parts == ["subjects"]:
            self._send(200, reg.subjects())
        elif len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
            subject = parts[1]
            if subject not in reg.subjects():
                self._send(404, {"error_code": 40401, "message": "subject not found"})
            else:
                self._send(200, reg.versions(subject))
        elif (
            len(parts) == 4
            and parts[0] == "subjects"
            and parts[2] == "versions"
            and parts[3] == "latest"
        ):
            subject = parts[1]
            if subject not in reg.subjects():
                self._send(404, {"error_code": 40401, "message": "subject not found"})
            else:
                version = reg.versions(subject)[-1]  # 1-based
                self._send(
                    200,
                    {
                        "subject": subject,
                        "version": version,
                        # SchemaRegistry.get takes a 0-based list index
                        "schema": reg.get(subject, version - 1).json(),
                    },
                )
        else:
            self._send(404, {"error_code": 404, "message": "unknown route"})

    def do_POST(self) -> None:  # noqa: N802
        length = int(self.headers.get("Content-Length", "0"))
        body = self.rfile.read(length)
        parts = [p for p in self.path.split("/") if p]
        reg = self.registry
        try:
            schema = _schema_from_payload(body)
        except Exception as ex:  # malformed schema payload
            self._send(422, {"error_code": 42201, "message": str(ex)})
            return
        if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
            subject = parts[1]
            # register-or-reuse lives INSIDE SchemaRegistry.register —
            # pre-checking compatibility here would wrongly 409 a
            # re-registration of an older existing version (Confluent
            # hands back its id). One lock covers check+mutate.
            with self.lock:
                try:
                    self._send(200, {"id": reg.register(subject, schema)})
                except ValueError as ex:
                    self._send(409, {"error_code": 409, "message": str(ex)})
        elif (
            len(parts) == 5
            and parts[0] == "compatibility"
            and parts[1] == "subjects"
            and parts[3] == "versions"
            and parts[4] == "latest"
        ):
            subject = parts[2]
            with self.lock:
                issues = reg.test_compatibility(subject, schema)
            self._send(
                200, {"is_compatible": not issues, "messages": issues}
            )
        else:
            self._send(404, {"error_code": 404, "message": "unknown route"})


def serve(registry: SchemaRegistry | None = None):
    """Start the loopback registry on an ephemeral port; returns
    (base_url, server). Caller stops with server.shutdown() AND
    server.server_close() (shutdown only ends the serve loop; close
    releases the listening socket)."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {"registry": registry or SchemaRegistry(), "lock": threading.Lock()},
    )
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    return f"http://{host}:{port}", server


class RegistryClient:
    """Stdlib-urllib client speaking the registry wire format — the
    engine-side half of the reference's ``get_schema_id`` /
    ``test_compatibility`` loop."""

    def __init__(self, base_url: str) -> None:
        self.base_url = base_url.rstrip("/")

    def _call(self, method: str, path: str, payload: dict | None = None):
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            method=method,
            data=None if payload is None else json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read().decode())
        except urllib.error.HTTPError as ex:
            return ex.code, json.loads(ex.read().decode())

    def subjects(self) -> list[str]:
        return self._call("GET", "/subjects")[1]

    def register(self, subject: str, schema: T.StructType) -> int:
        code, body = self._call(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": schema.json()},
        )
        if code != 200:
            raise ValueError(f"registration rejected: {body['message']}")
        return body["id"]

    def latest(self, subject: str) -> tuple[int, T.StructType]:
        code, body = self._call("GET", f"/subjects/{subject}/versions/latest")
        if code != 200:
            raise KeyError(body["message"])
        return body["version"], T.StructType.fromJson(json.loads(body["schema"]))

    def test_compatibility(self, subject: str, schema: T.StructType):
        _, body = self._call(
            "POST",
            f"/compatibility/subjects/{subject}/versions/latest",
            {"schema": schema.json()},
        )
        return body["is_compatible"], body["messages"]
