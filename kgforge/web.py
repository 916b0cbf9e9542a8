"""Thin web job launcher — the reference's last uncovered entry point.

The reference ships a Flask UI server (src/web/web_server.py) whose one
real action endpoint, ``POST /api/import`` (:179-327), validates a JSON
config and shells the loader CLI via ``subprocess.run`` with a 300 s
timeout, returning per-run success/output JSON; ``GET /api/excel-files``
(:53-63) lists the data directory's workbooks and ``GET /api/health``
(:330-337) reports liveness. This module is the same contract over the
kgforge pipeline CLI, stdlib-only (http.server — Flask is not in the
sandbox, and a job launcher does not need it):

- ``GET  /api/health``       -> {status, data_dir, jobs}
- ``GET  /api/excel-files``  -> sorted *.xlsx names in data_dir (:53-63)
- ``POST /api/import``       -> validate, shell ``python -m
  kgforge.pipeline`` asynchronously, return ``{job_id, status}`` 202
- ``GET  /api/jobs/<id>``    -> job status JSON; when finished carries
  returncode/success plus the pipeline's stats block parsed from stdout

Differences from the reference, by design: jobs run ASYNC with a
pollable status (the reference blocks the HTTP request for up to five
minutes — a launcher that holds a socket per import does not survive
real use), and there is no per-database fan-out (kgforge's sinks are
the pipeline's own; the connector legs are exercised elsewhere). The
reference's 300 s subprocess timeout is kept (BASELINE.md "web import
timeout bound").

Validation mirrors the reference's: excelFile required (:188-189),
must exist (:209-210), and additionally must resolve INSIDE data_dir
(the reference joins unchecked user input onto DATA_DIR — a path
traversal this version closes; documented divergence).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

IMPORT_TIMEOUT_S = 300  # reference web_server.py:281 (5-minute bound)


class JobRegistry:
    """In-memory job table: monotonically numbered, thread-safe."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._jobs: dict[str, dict] = {}
        self._n = 0

    def create(self, cmd: list[str]) -> str:
        with self._lock:
            self._n += 1
            job_id = f"job-{self._n}"
            self._jobs[job_id] = {"job_id": job_id, "status": "running", "cmd": cmd}
        return job_id

    def finish(self, job_id: str, **fields) -> None:
        with self._lock:
            self._jobs[job_id].update(fields)

    def get(self, job_id: str) -> dict | None:
        with self._lock:
            job = self._jobs.get(job_id)
            return dict(job) if job else None

    def count(self) -> int:
        with self._lock:
            return len(self._jobs)


def _run_job(registry: JobRegistry, job_id: str, cmd: list[str]) -> None:
    try:
        result = subprocess.run(
            cmd, capture_output=True, text=True, timeout=IMPORT_TIMEOUT_S
        )
        stats = None
        # the pipeline prints one JSON stats blob on stdout (possibly
        # pretty-printed); parse from the first '{' if present
        out = result.stdout
        brace = out.find("{")
        if brace >= 0:
            try:
                stats = json.loads(out[brace:])
            except ValueError:
                stats = None
        registry.finish(
            job_id,
            status="finished",
            success=result.returncode == 0,
            returncode=result.returncode,
            stats=stats,
            stderr_tail=result.stderr[-2000:],
        )
    except subprocess.TimeoutExpired:
        # reference web_server.py:324-325 — 504 on the 5-minute bound
        registry.finish(job_id, status="timeout", success=False)
    except Exception as e:  # pragma: no cover — launcher must not die
        registry.finish(job_id, status="error", success=False, error=str(e))


def make_handler(data_dir: str, registry: JobRegistry):
    data_dir = os.path.realpath(data_dir)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: tests scrape stdout
            pass

        def _json(self, code: int, payload: dict | list) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            if self.path in ("/api/graphdb-repositories", "/api/neo4j-databases"):
                # reference web_server.py:109-114 / :174-176 — discovery
                # endpoints degrade to [] when the backing store is
                # unreachable (no GraphDB/Neo4j in this deployment; the
                # delivery legs live in kgforge.connector)
                self._json(200, [])
            elif self.path == "/api/jobs":
                self._json(200, {"jobs": registry.count()})
            elif self.path == "/api/health":
                self._json(
                    200,
                    {"status": "healthy", "data_dir": data_dir, "jobs": registry.count()},
                )
            elif self.path == "/api/excel-files":
                try:
                    names = sorted(
                        f
                        for f in os.listdir(data_dir)
                        if f.endswith(".xlsx") and not f.startswith("~")
                    )
                    self._json(200, names)
                except OSError as e:
                    self._json(500, {"error": str(e)})
            elif self.path.startswith("/api/jobs/"):
                job = registry.get(self.path.rsplit("/", 1)[-1])
                if job is None:
                    self._json(404, {"error": "unknown job"})
                else:
                    self._json(200, job)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self) -> None:
            if self.path != "/api/import":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                config = json.loads(self.rfile.read(n) or b"{}")
            except ValueError:
                self._json(400, {"error": "Invalid JSON data"})
                return
            if not isinstance(config, dict) or not config.get("excelFile"):
                self._json(400, {"error": "Excel file is required"})
                return
            excel_path = os.path.realpath(
                os.path.join(data_dir, str(config["excelFile"]))
            )
            if os.path.commonpath([excel_path, data_dir]) != data_dir:
                self._json(400, {"error": "excelFile escapes the data directory"})
                return
            if not os.path.exists(excel_path):
                self._json(404, {"error": f"Excel file not found: {config['excelFile']}"})
                return
            # reference validator bounds (src/core/validation.py:295-311):
            # batchSize must be a positive int <= 10,000
            if "batchSize" in config:
                try:
                    batch = int(config["batchSize"])
                except (TypeError, ValueError):
                    self._json(400, {"error": "Batch size must be an integer"})
                    return
                if batch <= 0:
                    self._json(400, {"error": "Batch size must be positive"})
                    return
                if batch > 10000:
                    self._json(400, {"error": "Batch size too large (max 10000)"})
                    return
            cmd = [sys.executable, "-m", "kgforge.pipeline", "--excel", excel_path]
            if config.get("outDir"):
                out_dir = os.path.realpath(str(config["outDir"]))
                cmd = [
                    sys.executable, "-m", "kgforge.pipeline",
                    "--excel", excel_path, "/root/testdata/sf0.001", out_dir,
                ]
            if config.get("strictNames"):
                cmd.append("--strict-names")
            job_id = registry.create(cmd)
            threading.Thread(
                target=_run_job, args=(registry, job_id, cmd), daemon=True
            ).start()
            self._json(202, {"job_id": job_id, "status": "running"})

    return Handler


def serve(data_dir: str, port: int = 0, host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Bind (port=0 -> ephemeral), print the bound port as one JSON line
    (the launch contract tests/clients scrape), and return the server;
    caller runs serve_forever()."""
    registry = JobRegistry()
    server = ThreadingHTTPServer((host, port), make_handler(data_dir, registry))
    print(json.dumps({"listening": server.server_address[1]}), flush=True)
    return server


def main(argv: list[str] | None = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="kgforge web job launcher")
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--port", type=int, default=0)
    args = p.parse_args(argv)
    serve(args.data_dir, args.port).serve_forever()


if __name__ == "__main__":
    main()
