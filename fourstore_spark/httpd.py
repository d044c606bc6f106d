"""SPARQL protocol HTTP endpoint (stdlib-only).

Mirrors the reference's httpd surface (/root/reference/src/http/httpd.c):

- ``GET/POST /sparql/`` — params ``query``, ``output`` (json|xml|csv|tsv),
  ``soft-limit`` (httpd.c:1102-1195, :1133-1140)
- ``POST /update/`` — param ``update`` (httpd.c:1314+)
- ``PUT /data/<graph-uri>`` — replace graph with request body
  (N-Triples/Turtle; httpd.c:687-753)
- ``POST /data/`` — append body to graph given by ``graph`` param
  (httpd.c:755-810)
- ``DELETE /data/<graph-uri>`` — drop graph
- ``GET /status/`` and ``/status/size/`` (httpd.c:363-370)

This is a thin driver-side façade: every request builds lazy DataFrames
and streams results; Spark does the heavy lifting exactly as in the
library API. Single-process by design — at scale you put any HTTP tier in
front of a long-lived SparkSession the same way.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from fourstore_spark.sparql.engine import SparqlEngine
from fourstore_spark.sparql.update import UpdateEngine

_CONTENT_TYPES = {
    "json": "application/sparql-results+json",
    "xml": "application/sparql-results+xml",
    "csv": "text/csv",
    "tsv": "text/tab-separated-values",
    "ntriples": "application/n-triples",
}


class SparqlHttpServer:
    """serve() blocks; start()/stop() run it on a thread (for tests)."""

    def __init__(
        self,
        spark: SparkSession,
        update_engine: UpdateEngine | None = None,
        host: str = "127.0.0.1",
        port: int = 8890,
    ):
        self.spark = spark
        self.ue = update_engine or UpdateEngine(spark)
        self.host = host
        self.port = port
        # ThreadingHTTPServer handles requests concurrently, but every
        # write path is a read-modify-write of ue.quads — serialize them
        # (the reference's backends serialize imports per segment the same
        # way; readers stay lock-free on the immutable DataFrame snapshot)
        self._write_lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        # queries against the live store must see updates: engine reads
        # ue.quads at request time
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, body: str, ctype: str = "text/plain"):
                data = body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", ctype + "; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _params(self) -> dict:
                url = urllib.parse.urlparse(self.path)
                params = dict(urllib.parse.parse_qsl(url.query))
                length = int(self.headers.get("Content-Length") or 0)
                if length:
                    body = self.rfile.read(length).decode("utf-8")
                    ctype = self.headers.get("Content-Type", "")
                    if "application/x-www-form-urlencoded" in ctype:
                        params.update(dict(urllib.parse.parse_qsl(body)))
                    elif "application/sparql-query" in ctype:
                        params["query"] = body
                    elif "application/sparql-update" in ctype:
                        params["update"] = body
                    else:
                        params["__body"] = body
                return params

            def _query(self, params: dict):
                text = params.get("query")
                if not text:
                    return self._send(400, "missing query parameter")
                fmt = params.get("output", "json")
                soft = params.get("soft-limit")
                try:
                    eng = SparqlEngine(outer.spark, outer.ue.quads)
                    res = eng.query(
                        text, soft_limit=int(soft) if soft else None
                    )
                    if res.form in ("CONSTRUCT", "DESCRIBE"):
                        fmt = "ntriples"
                    body = res.serialize(fmt)
                except Exception as exc:  # noqa: BLE001 — 4xx per httpd.c
                    return self._send(400, f"parser error: {exc}")
                self._send(200, body, _CONTENT_TYPES.get(fmt, "text/plain"))

            def do_GET(self):
                url = urllib.parse.urlparse(self.path)
                if url.path.rstrip("/") == "/sparql":
                    return self._query(self._params())
                if url.path.rstrip("/") == "/status":
                    return self._send(200, "4store-spark: running\n")
                if url.path.rstrip("/") == "/status/size":
                    return self._send(200, f"{outer.ue.quads.count()}\n")
                self._send(404, "not found")

            def do_POST(self):
                url = urllib.parse.urlparse(self.path)
                params = self._params()
                path = url.path.rstrip("/")
                if path == "/sparql":
                    return self._query(params)
                if path == "/update":
                    text = params.get("update")
                    if not text:
                        return self._send(400, "missing update parameter")
                    try:
                        with outer._write_lock:
                            outer.ue.update(text)
                    except Exception as exc:  # noqa: BLE001
                        return self._send(400, f"update error: {exc}")
                    return self._send(200, "update successful\n")
                if path == "/data":
                    graph = params.get("graph")
                    body = params.get("__body", "")
                    if not graph:
                        return self._send(400, "missing graph parameter")
                    return self._load(graph, body, replace=False)
                self._send(404, "not found")

            def _load(self, graph: str, body: str, replace: bool):
                from fourstore_spark.sources.rdfio import (
                    quads_from_nt_text,
                    quads_from_turtle,
                )
                from fourstore_spark.sparql.update import quads_add

                try:
                    try:
                        quads = quads_from_nt_text(outer.spark, body, graph)
                    except ValueError:
                        quads = quads_from_turtle(outer.spark, body, graph)
                    with outer._write_lock:
                        if replace:
                            outer.ue.update(f"CLEAR SILENT GRAPH <{graph}>")
                        outer.ue.quads = quads_add(outer.ue.quads, quads)
                except Exception as exc:  # noqa: BLE001
                    return self._send(400, f"import error: {exc}")
                self._send(201 if replace else 200, "import successful\n")

            def do_PUT(self):
                graph = self.path[len("/data/"):]
                if not self.path.startswith("/data/") or not graph:
                    return self._send(404, "PUT expects /data/<graph-uri>")
                graph = urllib.parse.unquote(graph)
                params = self._params()
                self._load(graph, params.get("__body", ""), replace=True)

            def do_DELETE(self):
                graph = self.path[len("/data/"):]
                if not self.path.startswith("/data/") or not graph:
                    return self._send(404, "DELETE expects /data/<graph-uri>")
                graph = urllib.parse.unquote(graph)
                try:
                    with outer._write_lock:
                        outer.ue.update(f"CLEAR SILENT GRAPH <{graph}>")
                except Exception as exc:  # noqa: BLE001
                    return self._send(400, str(exc))
                self._send(200, "deleted\n")

        self._handler_cls = Handler

    def start(self) -> None:
        self._httpd = ThreadingHTTPServer((self.host, self.port), self._handler_cls)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()

    def serve(self) -> None:
        self._httpd = ThreadingHTTPServer((self.host, self.port), self._handler_cls)
        self._httpd.serve_forever()
