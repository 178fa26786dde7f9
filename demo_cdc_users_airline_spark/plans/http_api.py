"""Thin HTTP surface for published pipes: the reference's consumer API.

The reference publishes every pipe at ``GET /v0/pipes/<name>.json``
guarded by a READ token (pipe files line 1, e.g.
``active_flights_past_hour.pipe:1: TOKEN "…_endpoint_read_2287" READ``;
the dashboard fetches with ``Authorization: Bearer <token>`` —
``modules/tb_functions.py:264-273``, ``dash_airport.py:25-36``). This
module closes that last end-to-end gap with a stdlib-only shim (the
container has no Flask/FastAPI): a threaded ``http.server`` that
resolves the pipe through the Registry, coerces query parameters via
the pipe's typed ``Param`` declarations, and renders the exact
``{meta, data, rows, statistics}`` envelope from ``to_api_json``.

Serving is deliberately out of the analytic hot path — the server is a
driver-side convenience for parity with the reference's consumer; a
production deployment would put the same Registry behind a real ASGI
stack. Responses are capped by ``to_api_json``'s default row limit, so
an endpoint over a large table cannot collect unbounded data.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlparse

from ..core.clock import Clock
from .endpoints import DEFAULT_MAX_ROWS, to_api_json
from .framework import Registry


@dataclass
class Token:
    """A READ token: grants access to the pipes named in ``scopes``
    (``{"*"}`` = read-everything, the reference's ``Dashboard_Read``)."""

    name: str
    secret: str
    scopes: set[str] = field(default_factory=lambda: {"*"})

    def allows(self, pipe_name: str) -> bool:
        return "*" in self.scopes or pipe_name in self.scopes


class TokenRegistry:
    def __init__(self, tokens: list[Token] | None = None):
        self._by_secret = {t.secret: t for t in (tokens or [])}

    def add(self, token: Token) -> None:
        self._by_secret[token.secret] = token

    def check(self, secret: str | None, pipe_name: str) -> bool:
        t = self._by_secret.get(secret or "")
        return t is not None and t.allows(pipe_name)

    def revoke_for_pipe(self, pipe_name: str) -> int:
        """Token lifecycle parity with the reference's delete-pipe flow
        (modules/tb_functions.py:321-354: removing a pipe deletes its
        endpoint-read tokens): tokens scoped ONLY to this pipe are
        deleted outright; wider scoped tokens just lose the pipe from
        their scope. Wildcard tokens are untouched (the reference's
        admin/dashboard tokens outlive any one pipe). Returns the number
        of tokens fully deleted."""
        deleted = 0
        for secret, t in list(self._by_secret.items()):
            if "*" in t.scopes:
                continue
            t.scopes.discard(pipe_name)
            if not t.scopes:
                del self._by_secret[secret]
                deleted += 1
        return deleted


def unpublish_pipe(registry: Registry, tokens: TokenRegistry,
                   pipe_name: str) -> int:
    """Unpublish an endpoint: remove the pipe from the registry AND
    revoke its tokens — after this, requests for the pipe 404 and a
    token that only granted this pipe 403s everywhere (both paths
    exercised in tests/test_http_api.py)."""
    registry._pipes.pop(pipe_name, None)
    return tokens.revoke_for_pipe(pipe_name)


class PipeApiServer:
    """``GET /v0/pipes/<name>.json?param=…`` over a Registry.

    Auth: ``Authorization: Bearer <secret>`` header or ``?token=`` query
    param (both accepted by the reference API). Start with ``port=0``
    for an ephemeral port (tests); ``base_url`` gives the bound address.
    """

    def __init__(self, registry: Registry, tokens: TokenRegistry,
                 clock: Clock | None = None, host: str = "127.0.0.1",
                 port: int = 0, max_rows: int = DEFAULT_MAX_ROWS):
        self.registry = registry
        self.tokens = tokens
        self.clock = clock or Clock.system()
        self.max_rows = max_rows
        self._httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self._thread: threading.Thread | None = None

    # -- lifecycle --------------------------------------------------------

    @property
    def base_url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "PipeApiServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # -- request handling -------------------------------------------------

    def _handle(self, path: str, headers) -> tuple[int, dict]:
        url = urlparse(path)
        parts = [p for p in url.path.split("/") if p]
        if len(parts) != 3 or parts[:2] != ["v0", "pipes"] \
                or not parts[2].endswith(".json"):
            return 404, {"error": "not found: expected /v0/pipes/<name>.json"}
        name = parts[2][: -len(".json")]
        params = dict(parse_qsl(url.query))
        secret = params.pop("token", None)
        auth = headers.get("Authorization", "")
        if auth.startswith("Bearer "):
            secret = auth[len("Bearer "):]
        if not self.tokens.check(secret, name):
            return 403, {"error": "invalid token or insufficient scope"}
        if name not in self.registry._pipes:
            return 404, {"error": f"pipe '{name}' not found"}
        try:
            df = self.registry.endpoint(name, clock=self.clock, **params)
            return 200, to_api_json(df, max_rows=self.max_rows)
        except Exception as e:  # surface as the reference's error envelope
            return 400, {"error": f"{type(e).__name__}: {e}"}

    def _handler_class(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                status, body = outer._handle(self.path, self.headers)
                payload = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args):  # keep test output quiet
                pass

        return Handler
