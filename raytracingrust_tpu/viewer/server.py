"""Progressive render worker + stdlib HTTP server for the web viewer.

Replaces the reference's window shell (winit event loop + pixels framebuffer
blit, src/main.rs:18-124) and the egui panel's render trigger + wall-clock
label (src/gui.rs:324-337).  Two deliberate upgrades over the reference:

  * rendering happens on a worker thread — the reference renders
    synchronously inside the UI callback and freezes the window
    (SURVEY.md section 3.2);
  * samples accumulate progressively across passes instead of re-rendering
    from scratch on every edit (continuous mode in the reference restarts
    the full render each frame, src/gui.rs:333-337).

Zero dependencies beyond the stdlib: ``http.server`` + the in-repo PNG
encoder.  State edits go through viewer.editable (the Editable analog).
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse

import numpy as np

from ..io.png import png_bytes
from ..models.scene import SceneBuilder
from ..utils import color as color_mod
from .editable import apply_edits, editable_schema, editable_values
from .html import PAGE


class ViewerApp:
    """Render state machine: owns the SceneBuilder, an accumulator, and a
    worker thread that traces one progressive pass at a time."""

    def __init__(self, builder: SceneBuilder, width: int, height: int, *,
                 seed: int = 0, spp_per_pass: int | None = None,
                 max_passes: int = 1024, engine: str = "auto"):
        self.builder = builder
        self.width = int(width)
        self.height = int(height)
        self.seed = int(seed)
        self.spp_per_pass = spp_per_pass
        self.max_passes = int(max_passes)
        self.engine = engine

        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._stop = False
        self._version = 0          # bumps on every edit -> restart accumulation
        self._render_requested = True
        self.continuous = True     # the reference's continuous checkbox
        self._sum = np.zeros((self.height, self.width, 3), np.float32)
        self._passes = 0
        self._frame_version = 0
        self._last_pass_ms = 0.0
        self._last_error = ""
        self._thread = threading.Thread(target=self._worker, daemon=True)

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "ViewerApp":
        self._thread.start()
        return self

    def stop(self) -> None:
        with self._wake:
            self._stop = True
            self._wake.notify_all()
        self._thread.join(timeout=10)

    # -- edits ---------------------------------------------------------------
    def edit(self, edits: dict) -> None:
        with self._wake:
            apply_edits(self.builder, edits)
            self._version += 1
            self._sum[:] = 0.0
            self._passes = 0
            self._wake.notify_all()

    def request_render(self) -> None:
        """The 'Render Image' button (src/gui.rs:324-327): one more pass."""
        with self._wake:
            self._render_requested = True
            self._wake.notify_all()

    def set_continuous(self, on: bool) -> None:
        with self._wake:
            self.continuous = bool(on)
            self._wake.notify_all()

    def save_scene(self, path: str) -> None:
        with self._lock:
            self.builder.save(path)

    # -- views ---------------------------------------------------------------
    def frame_png(self) -> bytes:
        with self._lock:
            mean = self._sum / max(self._passes, 1)
        gamma = np.sqrt(np.maximum(mean, 0.0))  # lib/core/render.rs:103-107
        return png_bytes(np.asarray(color_mod.np_to_rgba8(gamma)))

    def status(self) -> dict:
        import jax
        with self._lock:
            spp = self.spp_per_pass or self.builder.settings.samples_per_pixel
            return {
                "passes": self._passes,
                "total_spp": self._passes * spp,
                "frame_version": self._frame_version,
                "scene_version": self._version,
                "last_pass_ms": round(self._last_pass_ms, 1),
                "continuous": self.continuous,
                "rendering": self._render_requested
                or (self.continuous and self._passes < self.max_passes),
                "width": self.width,
                "height": self.height,
                # analog of the reference's thread-count label (src/gui.rs:331)
                "device": f"{jax.devices()[0].platform} x "
                          f"{jax.local_device_count()}",
                "error": self._last_error,
            }

    def state(self) -> dict:
        with self._lock:
            return {
                "schema": editable_schema(self.builder),
                "values": editable_values(self.builder),
            }

    # -- worker --------------------------------------------------------------
    def _snapshot(self):
        """Copy what a pass needs under the lock; build outside it."""
        settings = self.builder.settings
        if self.spp_per_pass is not None:
            settings = dataclasses.replace(
                settings, samples_per_pixel=self.spp_per_pass
            )
        b = SceneBuilder()
        b.camera = self.builder.camera
        b.settings = settings
        b.background = self.builder.background
        b.materials = list(self.builder.materials)
        b.objects = [dict(r) for r in self.builder.objects]
        return b, self._version

    def _worker(self) -> None:
        from ..render.render import render_linear

        while True:
            with self._wake:
                while not self._stop and not (
                    self._render_requested
                    or (self.continuous and self._passes < self.max_passes)
                ):
                    self._wake.wait()
                if self._stop:
                    return
                self._render_requested = False
                builder, version = self._snapshot()
                pass_index = self._passes

            t0 = time.perf_counter()
            try:
                scene = builder.build()
                img = np.asarray(render_linear(
                    scene, self.width, self.height,
                    seed=self.seed * 1_000_003 + pass_index,
                    engine=self.engine,
                ))
                err = ""
            except Exception as e:  # surface in the UI, keep serving
                img, err = None, f"{type(e).__name__}: {e}"
            dt = (time.perf_counter() - t0) * 1000.0

            with self._lock:
                self._last_pass_ms = dt
                self._last_error = err
                if img is not None and version == self._version:
                    self._sum += img
                    self._passes = pass_index + 1
                    self._frame_version += 1


def _make_handler(app: ViewerApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, code: int = 200) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/":
                self._send(200, PAGE.encode(), "text/html; charset=utf-8")
            elif path == "/frame.png":
                self._send(200, app.frame_png(), "image/png")
            elif path == "/api/status":
                self._json(app.status())
            elif path == "/api/state":
                self._json(app.state())
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            path = urlparse(self.path).path
            n = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._json({"error": "bad json"}, 400)
            try:
                if path == "/api/edit":
                    app.edit(body)
                elif path == "/api/render":
                    app.request_render()
                elif path == "/api/continuous":
                    app.set_continuous(body.get("on", True))
                elif path == "/api/save":
                    app.save_scene(body["path"])
                else:
                    return self._send(404, b"not found", "text/plain")
            except Exception as e:
                return self._json({"error": f"{type(e).__name__}: {e}"}, 400)
            self._json({"ok": True})

    return Handler


def make_server(app: ViewerApp, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), _make_handler(app))


def serve(builder: SceneBuilder, width: int, height: int, *,
          host: str = "127.0.0.1", port: int = 8000, **kw) -> None:
    """Blocking entry point: start the worker + HTTP server."""
    app = ViewerApp(builder, width, height, **kw).start()
    httpd = make_server(app, host, port)
    print(f"viewer: http://{host}:{httpd.server_address[1]}/  "
          f"({width}x{height}, ctrl-c to quit)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        app.stop()
        httpd.server_close()
