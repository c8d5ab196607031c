"""REST API surface.

Endpoint-compatible with the reference Express server (api-server/app.js:
``GET / /health /test /apartments /process-pending /process/:id /results
/export``), implemented on the stdlib ThreadingHTTPServer (no Node/Express in
this image), plus a ``POST /analyze`` inference endpoint that feeds the
dynamic batcher.

Fixes over the reference surface (SURVEY.md §3 integration gaps):
- ``/export`` performs the export directly instead of shelling out to a
  nonexistent script (app.js:105-112);
- ``/process-pending`` and ``/results`` read the collections the worker
  actually writes (the reference reads never-written ``pending``/``results``
  collections, app.js:68-102).
"""

from __future__ import annotations

import io
import json
import re
import threading
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, Optional

from aiic_tpu.serve.db import InMemoryDB


def make_server(
    db=None,
    analyze_fn: Optional[Callable[[bytes], Dict[str, Any]]] = None,
    port: int = 3000,
    host: str = "127.0.0.1",
    ready_fn: Optional[Callable[[], bool]] = None,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server. ``analyze_fn`` maps raw image bytes
    to a result dict (wired to the batcher by the CLI). ``ready_fn`` backs
    ``GET /ready`` — load balancers should gate traffic on it; ``/health``
    stays liveness-only (the server accepts connections while the model is
    still warming, reference gap noted in SURVEY §5c)."""
    db = db if db is not None else InMemoryDB()

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: the default HTTP/1.0 closes the connection
        # after every response, so load-balancer/SDK clients reusing
        # connections hit resets under concurrency (measured: 135/1465
        # failed requests at 64 keep-alive clients) and every request pays
        # TCP setup. Safe because _json always sends Content-Length.
        protocol_version = "HTTP/1.1"

        def _json(self, obj, code: int = 200, headers: Optional[Dict[str, str]] = None):
            body = json.dumps(obj, ensure_ascii=False, default=str).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Access-Control-Allow-Origin", "*")
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/":
                self._json({
                    "message": "Interior Analysis API is running!",
                    "endpoints": {
                        "health": "/health", "ready": "/ready", "test": "/test",
                        "apartments": "/apartments",
                        "process_pending": "/process-pending",
                        "process_id": "/process/:id",
                        "results": "/results", "export": "/export",
                        "analyze": "POST /analyze (image bytes)",
                    },
                    "timestamp": datetime.now().isoformat(),
                })
            elif self.path == "/health":
                self._json({"status": "OK", "message": "API is working!",
                            "timestamp": datetime.now().isoformat()})
            elif self.path == "/ready":
                ready = bool(ready_fn()) if ready_fn is not None else True
                self._json({"ready": ready,
                            "timestamp": datetime.now().isoformat()},
                           200 if ready else 503)
            elif self.path == "/test":
                self._json({"message": "Hello World! Test successful!"})
            elif self.path == "/apartments":
                self._json({"apartments": db.list_apartments()})
            elif self.path == "/process-pending":
                self._json({"pending": db.get_pending_apartments()})
            elif self.path.startswith("/process/"):
                apt_id = self.path[len("/process/"):]
                apt = db.get_apartment_with_images(apt_id)
                if apt is None:
                    self._json({"error": f"apartment {apt_id} not found"}, 404)
                else:
                    self._json(apt)
            elif self.path == "/results":
                self._json({"results": db.list_results()})
            elif self.path == "/export":
                path = db.export_analysis_results()
                self._json({"exported": path})
            elif self.path == "/metrics":
                from aiic_tpu.serve.metrics import GLOBAL_METRICS

                self._json(GLOBAL_METRICS.snapshot())
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            if self.path == "/analyze":
                if analyze_fn is None:
                    self._json({"error": "no analyzer attached"}, 503)
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0 or length > 64 * 1024 * 1024:
                    self._json({"error": "bad content length"}, 400)
                    return
                data = self.rfile.read(length)
                try:
                    self._json(analyze_fn(data))
                except TimeoutError as e:
                    self._json({"error": f"analysis timed out: {e}",
                                "dead_lettered": True}, 504)
                except Exception as e:
                    from aiic_tpu.serve.batcher import BatcherOverloaded

                    if isinstance(e, BatcherOverloaded):
                        # Admission control: fast-fail instead of queueing
                        # doomed work; clients should back off and retry.
                        self._json({"error": str(e)}, 503,
                                   headers={"Retry-After": "1"})
                    else:
                        self._json({"error": str(e)}, 500)
            else:
                self._json({"error": "not found"}, 404)

    class Server(ThreadingHTTPServer):
        # socketserver's default accept backlog is 5; a 64-client burst
        # overflows it and the overflow connections get RST (measured:
        # 46/1554 failed requests at 64 keep-alive clients with no error
        # anywhere else in the stack). daemon_threads so a hung client
        # never blocks interpreter shutdown.
        request_queue_size = 128
        daemon_threads = True

    return Server((host, port), Handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
