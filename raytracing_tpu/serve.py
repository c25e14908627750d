"""Minimal production serving layer: ray tracing over HTTP.

The reference is an interactive stdin script; a production deployment wants
a long-lived process with warm compiled kernels answering requests.  This is
a dependency-free (stdlib http.server) JSON API over the fused-kernel tier:

    GET  /healthz            -> {"status": "ok", "device": ...}
    GET  /v1/models          -> scenarios, ops, extensions
    POST /v1/trace           -> {"scenario", "op", "rays", "n_turns", ...}
                                => final-state metrics + throughput

Compiled executables are cached by (op, field, steps, block) through the
jit caches underneath ``fast_trace``, so the first request per
configuration pays compilation and subsequent ones run at kernel speed.

    python -m raytracing_tpu.serve --port 8080
"""
from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax

import raytracing_tpu as rt
from raytracing_tpu import config
from raytracing_tpu.calibrated import calibrated as calibrated_table
from raytracing_tpu.engine.fast import fast_trace
from raytracing_tpu.ops.registry import EXTENSION_OPS, OP_NAMES, canonical


# Serving-side resource bounds.  ``steps`` is a static kernel trip count:
# each new value compiles a fresh executable, and huge trip counts both
# blow the compile budget and request unbounded VMEM — so every derived
# step count is capped, not just ``rays``.
MAX_RAYS = 16_777_216
MAX_STEPS = 2_000_000
MAX_TURNS = 1_000


def _trace_request(body: dict) -> dict:
    scen = config.scenario(str(body.get("scenario", "fisheye")))
    op = canonical(str(body.get("op", "op6")))
    rays = int(body.get("rays", 1024))
    if not 1 <= rays <= MAX_RAYS:
        raise ValueError(f"rays must be in [1, {MAX_RAYS}], got {rays}")
    n_turns = int(body.get("n_turns", 1))
    if not 1 <= n_turns <= MAX_TURNS:
        raise ValueError(f"n_turns must be in [1, {MAX_TURNS}], got {n_turns}")

    if "delta_s" in body:
        delta_s = float(body["delta_s"])
        if not (np.isfinite(delta_s) and delta_s > 0):
            raise ValueError(f"delta_s must be finite and > 0, got {delta_s}")
        divisor = int(body.get("divisor", round(2 * np.pi / delta_s))) if scen.is_fisheye else None
        if divisor is not None and not 1 <= divisor <= MAX_STEPS:
            raise ValueError(f"divisor must be in [1, {MAX_STEPS}], got {divisor}")
    else:
        from raytracing_tpu.calibrated import calibrated_with_fallback
        delta_s, divisor = calibrated_with_fallback(op, scen.name)

    if scen.is_fisheye:
        theta0 = np.full(rays, np.pi / 2.0, np.float32)
        pos0 = np.tile(np.array([[1.0, 0.0]], np.float32), (rays, 1))
        steps = scen.max_size(delta_s, int(divisor) + 1, n_turns) - 1
    else:
        theta0 = np.linspace(scen.theta0[0], scen.theta0[-1], rays).astype(np.float32)
        pos0 = np.tile(scen.pos0[:1].astype(np.float32), (rays, 1))
        steps = scen.max_size(delta_s) - 1
    if not 1 <= steps <= MAX_STEPS:
        raise ValueError(
            f"configuration implies {steps} integration steps "
            f"(bounds: [1, {MAX_STEPS}]); raise delta_s or lower n_turns")

    medium_kind = str(body.get("medium", "analytic"))
    if medium_kind == "analytic":
        medium = rt.analytic_medium(scen.field)
    elif medium_kind == "stratified":
        if scen.is_fisheye:
            raise ValueError("stratified medium needs an x-independent "
                             "field; fisheye samples in 2-D — use "
                             "medium=grid")
        from raytracing_tpu import models
        medium = models.get(scen.name, medium="stratified").medium
    elif medium_kind == "grid":
        # the reference's full 2-D sampled-spline pipeline; fast_trace
        # routes it through the tiled window kernel (models caches the
        # sampled tables per scenario)
        from raytracing_tpu import models
        medium = models.get(scen.name, medium="grid").medium
    elif medium_kind in ("c1", "c1-stratified"):
        # consistent-gradient family (media/c1.py, PARITY.md #29)
        if medium_kind == "c1-stratified" and scen.is_fisheye:
            raise ValueError("c1-stratified needs an x-independent field; "
                             "fisheye samples in 2-D — use medium=c1")
        from raytracing_tpu import models
        medium = models.get(scen.name, medium=medium_kind).medium
    else:
        raise ValueError(f"medium must be 'analytic', 'stratified', 'grid', "
                         f"'c1' or 'c1-stratified', got {medium_kind!r}")
    precision = str(body.get("precision", "standard"))
    t0 = time.perf_counter()
    out = fast_trace(op, scen, medium, delta_s=delta_s, steps=steps,
                     pos0=pos0, theta0=theta0, precision=precision)
    pos = np.asarray(out.pos)
    dt = time.perf_counter() - t0

    resp = {
        "scenario": scen.name, "op": op, "rays": rays, "steps": int(steps),
        "medium": medium_kind,
        "delta_s": float(delta_s), "engine": out.engine,
        "seconds": round(dt, 4),
        "ray_steps_per_sec": round(rays * steps / dt, 1),
        "escaped_rays": int(rays - np.asarray(out.active).sum()),
        "mean_final_pos": [float(v) for v in pos.mean(0)],
    }
    if scen.is_fisheye:
        resp["closure_error_pct"] = float(
            100 * np.linalg.norm(pos[0] - [1, 0]) / (2 * np.pi))
    return resp


class _Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, payload: dict):
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, {"status": "ok",
                             "device": str(jax.devices()[0]),
                             "version": rt.__version__})
        elif self.path == "/v1/models":
            self._send(200, {"scenarios": list(config.SCENARIO_NAMES),
                             "ops": list(OP_NAMES),
                             "extensions": list(EXTENSION_OPS)})
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/v1/trace":
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            self._send(200, _trace_request(body))
        except (ValueError, KeyError, TypeError, OverflowError,
                ZeroDivisionError, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})

    def log_message(self, fmt, *args):  # quiet by default
        pass


def create_server(host: str = "127.0.0.1", port: int = 8080) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), _Handler)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="raytracing_tpu serving endpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args(argv)
    srv = create_server(args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"(device: {jax.devices()[0]})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
