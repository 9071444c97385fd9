"""Thin REST serving layer over VectorStore — S11 wire parity.

Replicates the reference's six REST routes and status codes
(API.gRPC/Services/RestServices.cs:15-92):

    POST   /vector                  -> 201 + Location header (Add)
    GET    /vector/{id}             -> 200 / 404
    PUT    /vector/{id}             -> 200 / 404 (Update)
    DELETE /vector/{id}             -> 204 / 404
    POST   /vectors/searchNearest?k=N -> 200 (SearchNearest; k query param)
    DELETE /db/clear                -> 204

Pure stdlib (http.server) — no web framework in this container; the layer
only parses/serializes JSON and delegates to adapters.VectorStore, exactly
the "thin HTTP wrapper would delegate to these methods" contract in
adapters.py. Vector JSON shape mirrors VectorDto: {"id", "values",
"tags", "original_text"} (values == the embedding array).

Serving model: this is a DRIVER-side convenience for interactive use and
tests — the engine itself is a batch library (north star: MLlib batch
indexing, not online ANN serving). Handlers run on the HTTP thread pool
and call Spark actions; mutations serialize behind a lock (the reference
takes per-collection locks the same way).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import functions as F

from neighborly_spark.adapters import VectorStore


def _row_to_dto(row, id_col: str) -> dict:
    d = row.asDict()
    return {
        "id": d[id_col],
        "values": [float(v) for v in d["embedding"]],
        "tags": [int(t) for t in d["tags"]] if d.get("tags") is not None else [],
        "original_text": d.get("original_text") or "",
    }


class RestServer:
    """ThreadingHTTPServer wrapper; start() binds (host, port) — port 0
    picks an ephemeral port, read it back from .port."""

    def __init__(self, store: VectorStore, host: str = "127.0.0.1", port: int = 0):
        self.store = store
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test runs
                pass

            def _json(self, code: int, payload=None, headers=None):
                body = json.dumps(payload).encode() if payload is not None else b""
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _body(self):
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"{}")

            def _rows_df(self, dto):
                # build the single row against the STORE's schema (the id
                # column keeps whatever dtype the store has — a hardcoded
                # string would silently widen a numeric-id store's schema on
                # the first POST via union type-coercion)
                spark = outer.store.df.sparkSession
                cols = outer.store.df.columns
                dtypes = dict(outer.store.df.dtypes)
                base = spark.createDataFrame(
                    [(str(dto["id"]), [float(v) for v in dto.get("values") or dto.get("embedding")],
                      [int(t) for t in dto.get("tags") or []], dto.get("original_text") or "")],
                    f"{outer.store.id_col} string, embedding array<float>, "
                    "tags array<smallint>, original_text string",
                ).withColumn(
                    outer.store.id_col,
                    F.col(outer.store.id_col).cast(dtypes[outer.store.id_col]),
                )
                for c in cols:
                    if c not in base.columns:
                        base = base.withColumn(c, F.lit(None).cast(dtypes[c]))
                return base.select(cols)

            def do_GET(self):
                if self.path.startswith("/vector/"):
                    vid = self.path.rsplit("/", 1)[1]
                    rows = outer.store.get_vector_by_id(vid).collect()
                    if not rows:
                        self._json(404)
                    else:
                        self._json(200, _row_to_dto(rows[0], outer.store.id_col))
                else:
                    self._json(404)

            def do_POST(self):
                if self.path == "/vector":
                    dto = self._body()
                    with outer._lock:
                        outer.store.add_vector(self._rows_df(dto))
                    self._json(201, dto, headers={"Location": f"/vector/{dto['id']}"})
                elif self.path.startswith("/vectors/searchNearest"):
                    from urllib.parse import parse_qs, urlparse

                    k = int(parse_qs(urlparse(self.path).query).get("k", ["10"])[0])
                    dto = self._body()
                    q = [float(v) for v in dto.get("values") or dto.get("embedding")]
                    rows = outer.store.search_nearest(q, k=k).collect()
                    self._json(200, [_row_to_dto(r, outer.store.id_col) for r in rows])
                else:
                    self._json(404)

            def do_PUT(self):
                if self.path.startswith("/vector/"):
                    vid = self.path.rsplit("/", 1)[1]
                    dto = self._body()
                    dto["id"] = vid
                    with outer._lock:
                        if not outer.store.get_vector_by_id(vid).collect():
                            self._json(404)
                            return
                        outer.store.update_vector(self._rows_df(dto))
                    self._json(200, dto)
                else:
                    self._json(404)

            def do_DELETE(self):
                if self.path == "/db/clear":
                    with outer._lock:
                        outer.store.clear_vectors()
                    self._json(204)
                elif self.path.startswith("/vector/"):
                    vid = self.path.rsplit("/", 1)[1]
                    with outer._lock:
                        if not outer.store.get_vector_by_id(vid).collect():
                            self._json(404)
                            return
                        outer.store.remove_vector(vid)
                    self._json(204)
                else:
                    self._json(404)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
