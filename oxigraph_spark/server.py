"""Minimal SPARQL 1.1 Protocol endpoint over a Store (SURVEY §2.1 S11).

Reference: the upstream server binary (``cli/src/main.rs`` — Query/
Update routes with content negotiation over the results serializers).
Spark re-expression: this is an INTEROP endpoint for bounded result
sets — the handler collects each response driver-side through the
bounded ``results_io`` document writers (responses are protocol
payloads, not datasets).  It is NOT a high-QPS serving layer: Spark's
per-query job latency (~100 ms locally) and the driver-side collect
bound it to development, testing, and federation targets (our own
SERVICE client speaks to it — see ``tests/test_server.py``).  Big
exports go through the distributed writers instead.

Routes (SPARQL 1.1 Protocol §2):
- ``GET  /query?query=…``             (URL-encoded)
- ``POST /query``  with ``application/sparql-query`` (raw body) or
  ``application/x-www-form-urlencoded`` (``query=…``)
- ``POST /update`` with ``application/sparql-update`` or form
  (``update=…``) — mutates the served store (batch semantics)

Content negotiation (Accept): SELECT → results JSON (default) / XML /
CSV / TSV; ASK → JSON / XML boolean; CONSTRUCT/DESCRIBE → N-Triples.
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .algebra import ast as A
from .algebra.parser import ParseError, parse_query

MAX_RESULT_ROWS = 100_000  # bounded protocol responses (see module doc)


class SparqlEndpoint:
    """Wraps a Store behind the protocol; ``start()`` returns the bound
    (host, port)."""

    def __init__(self, store, max_rows: int = MAX_RESULT_ROWS):
        self._store = store
        self._lock = threading.Lock()
        self.max_rows = max_rows
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- protocol operations (driver-side) ---------------------------------

    def query_response(self, sparql: str, accept: str):
        """→ (content_type, payload str).  Raises ParseError upward."""
        from .sources import results_io as R
        from .sources.ntriples import format_term
        from pyspark.sql import functions as F
        ast = parse_query(sparql)
        with self._lock:
            df = self._store.query(sparql)
        if isinstance(ast, A.AskQuery):
            val = len(df.take(1)) > 0
            if "xml" in accept:
                return ("application/sparql-results+xml",
                        '<?xml version="1.0"?><sparql xmlns="http://www.w3.'
                        'org/2005/sparql-results#"><head/><boolean>'
                        f'{"true" if val else "false"}</boolean></sparql>')
            return ("application/sparql-results+json",
                    '{"head":{},"boolean":%s}' % ("true" if val else "false"))
        if isinstance(ast, (A.ConstructQuery, A.DescribeQuery)):
            rows = df.select(F.concat(
                format_term(df["s"]), F.lit(" "), format_term(df["p"]),
                F.lit(" "), format_term(df["o"]), F.lit(" .")
            ).alias("nt")).limit(self.max_rows).collect()
            return ("application/n-triples",
                    "\n".join(r.nt for r in rows) + "\n")
        if "tab-separated-values" in accept:
            return ("text/tab-separated-values",
                    R.to_tsv_document(df, limit=self.max_rows))
        if "csv" in accept:
            return ("text/csv", R.to_csv_document(df, limit=self.max_rows))
        if "sparql-results+xml" in accept:
            return ("application/sparql-results+xml",
                    R.to_xml_document(df, limit=self.max_rows))
        return ("application/sparql-results+json",
                R.to_json_document(df, limit=self.max_rows))

    def update(self, sparql: str) -> None:
        with self._lock:
            self._store = self._store.update(sparql)

    # -- http wiring --------------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 0):
        ep = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, ctype: str, payload: str):
                data = payload.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _run_query(self, q: str):
                try:
                    ctype, payload = ep.query_response(
                        q, self.headers.get("Accept", "") or "")
                    self._send(200, ctype, payload)
                except ParseError as ex:
                    self._send(400, "text/plain", f"parse error: {ex}")
                except Exception as ex:       # noqa: BLE001
                    self._send(500, "text/plain", f"error: {ex}")

            def do_GET(self):
                url = urllib.parse.urlparse(self.path)
                if url.path != "/query":
                    return self._send(404, "text/plain", "not found")
                qs = urllib.parse.parse_qs(url.query)
                if "query" not in qs:
                    return self._send(400, "text/plain", "missing query=")
                self._run_query(qs["query"][0])

            def do_POST(self):
                url = urllib.parse.urlparse(self.path)
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n).decode("utf-8")
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if url.path == "/query":
                    if ctype == "application/sparql-query":
                        return self._run_query(body)
                    qs = urllib.parse.parse_qs(body)
                    if "query" not in qs:
                        return self._send(400, "text/plain", "missing query=")
                    return self._run_query(qs["query"][0])
                if url.path == "/update":
                    if ctype == "application/sparql-update":
                        upd = body
                    else:
                        qs = urllib.parse.parse_qs(body)
                        if "update" not in qs:
                            return self._send(400, "text/plain",
                                              "missing update=")
                        upd = qs["update"][0]
                    try:
                        ep.update(upd)
                        return self._send(204, "text/plain", "")
                    except ParseError as ex:
                        return self._send(400, "text/plain",
                                          f"parse error: {ex}")
                    except Exception as ex:   # noqa: BLE001
                        return self._send(500, "text/plain", f"error: {ex}")
                return self._send(404, "text/plain", "not found")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        return self._httpd.server_address

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None
